"""Wave AD: Hilbert clustering, heavy-hitter sketches, spatial ops.

The Hilbert kernel is checked against the curve's DEFINING properties
(bijectivity + unit-step adjacency) on exhaustive grids; geohash is
checked against an independent interval-refinement encoder (the
classic algorithm — a different construction than the bit-interleave
the operator uses); the sketch and radius join are checked against
exact brute force, including adversarial inputs (tiny summary budget,
cell-boundary-straddling points).
"""

from __future__ import annotations

import tempfile
from itertools import product

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.spacecurve import hilbert_index
from lakehouse_test_spark.operators.sketches import heavy_hitters
from lakehouse_test_spark.operators.spatial import (
    GEOHASH_ALPHABET,
    geohash_col,
    radius_join_pairs,
)


@pytest.mark.parametrize("k,bits", [(2, 4), (3, 3), (2, 6), (4, 3)])
def test_hilbert_bijective_and_unit_step(k, bits):
    """Defining properties: the curve VISITS EVERY CELL ONCE
    (bijective onto [0, 2^(bits*k))) and CONSECUTIVE INDEXES ARE
    ADJACENT CELLS (L1 distance exactly 1 — the property Morton
    order lacks at power-of-two seams)."""
    pts = np.array(list(product(range(1 << bits), repeat=k)), dtype=np.int64)
    h = hilbert_index(pts, bits)
    n = (1 << bits) ** k
    assert sorted(h.tolist()) == list(range(n))
    order = pts[np.argsort(h)]
    steps = np.abs(np.diff(order, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_rejects_bad_shapes():
    with pytest.raises(ValueError):
        hilbert_index(np.zeros((4, 1), dtype=np.int64), 8)
    with pytest.raises(ValueError):
        hilbert_index(np.zeros((4, 5), dtype=np.int64), 16)  # 80 bits


def test_hilbert_cluster_prunes_box_and_preserves_data(spark):
    """After hilbert_cluster on (x, y), a small 2-D box scan must
    skip files on BOTH axes' zone maps, and the restate must preserve
    every row (data_change=False: pure reclustering)."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_hc_"))
    t.append(df.repartition(8, "id"), stats_cols=["x", "y"])
    c = t.hilbert_cluster(["x", "y"], target_partitions=8)
    assert c.data_change is False
    assert t.snapshot().count() == 4096
    got, scanned, total = t.scan_pruned_box({"x": (0, 15), "y": (0, 15)})
    assert scanned < total  # the clustered layout actually skipped
    assert got.count() == 16 * 16
    # values survive the rewrite byte-for-byte
    assert got.agg(F.sum("id")).first()[0] == sum(
        i for i in range(4096) if i % 64 <= 15 and i // 64 <= 15
    )


def test_hilbert_beats_single_axis_sort_on_the_off_axis(spark):
    """The point of multi-dim clustering: a lead-column sort gives
    zone maps that are useless on the OTHER axis; the Hilbert layout
    skips files for a pure-y box while the x-sorted layout scans
    everything."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
    )
    sorted_t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_xsort_"))
    sorted_t.append(
        df.repartitionByRange(8, "x").sortWithinPartitions("x"),
        stats_cols=["x", "y"],
    )
    _, scanned_sorted, total_sorted = sorted_t.scan_pruned_box({"y": (0, 7)})

    hil = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_hil_"))
    hil.append(df.repartition(8, "x"), stats_cols=["x", "y"])
    hil.hilbert_cluster(["x", "y"], target_partitions=8)
    _, scanned_hil, total_hil = hil.scan_pruned_box({"y": (0, 7)})

    assert scanned_sorted == total_sorted  # x-sort: no skipping on y
    assert scanned_hil < total_hil  # curve layout: y zone maps tight


def test_heavy_hitters_exact_on_fixture_tokens(spark, sf_dir):
    """The sketch + rescore equals the exact full aggregation on the
    documents corpus, and the Zipf head clears the n/(s+1) recall
    threshold with real margin (the exactness precondition)."""
    from lakehouse_test_spark.session import load_table

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t"))
        .where(F.col("t") != "")
    )
    got = heavy_hitters(toks, "t", k=10, summary_size=4096).collect()
    exact = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("t"))
        .limit(10)
        .collect()
    )
    assert [(r["item"], r["n"]) for r in got] == [
        (r["t"], r["n"]) for r in exact
    ]
    n_total = toks.count()
    threshold = n_total / 4097
    assert min(r["n"] for r in exact) > 10 * threshold  # ample margin


def test_heavy_hitters_tiny_budget_adversarial(spark):
    """Adversarial: ONE planted heavy item (~30%) drowned in unique
    noise, summary budget of only 8 counters, several partitions —
    the Misra-Gries guarantee (freq > n/(s+1) survives) must hold,
    and the rescore must report the EXACT count."""
    n_noise, n_heavy = 7000, 3000
    df = spark.range(n_noise).select(
        F.concat(F.lit("u"), F.col("id")).alias("v")
    ).union(
        spark.range(n_heavy).select(F.lit("HEAVY").alias("v"))
    ).repartition(8)
    top = heavy_hitters(df, "v", k=1, summary_size=8).collect()
    assert top[0]["item"] == "HEAVY"
    assert top[0]["n"] == n_heavy


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Independent reference: the classic interval-refinement encoder
    (per the public geohash spec), no bit interleaving."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = [], [], True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
        if len(bits) == 5:
            out.append(GEOHASH_ALPHABET[int("".join(map(str, bits)), 2)])
            bits = []
    return "".join(out)


def test_geohash_matches_interval_refinement_reference(spark):
    """The bit-interleave encoder must agree with the independent
    interval-refinement construction on a spread of points including
    hemisphere boundaries and near-pole coordinates."""
    pts = [
        (0.0, 0.0),
        (-90.0, -180.0),
        (89.99, 179.99),
        (-0.01, 0.01),
        (48.8566, 2.3522),
        (-33.8688, 151.2093),
        (37.7749, -122.4194),
        (89.999, -0.001),
        (-89.999, 179.5),
    ] + [
        (((i * i % 18000) * 7919 % 18000) / 100.0 - 90.0,
         ((i * i % 36000) * 104729 % 36000) / 100.0 - 180.0)
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {
        (r["lat"], r["lon"]): r["gh"]
        for r in df.select(
            "lat", "lon", geohash_col(F.col("lat"), F.col("lon"), 6).alias("gh")
        ).collect()
    }
    for lat, lon in pts:
        assert got[(lat, lon)] == _ref_geohash(lat, lon, 6), (lat, lon)


def test_radius_join_equals_bruteforce_with_boundary_pairs(spark):
    """Grid-cell candidate generation must not lose pairs that
    straddle cell boundaries (the classic spatial-join bug): points
    placed just inside/outside cell edges, checked against the O(n²)
    answer."""
    pts = [
        (1, 0.0, 0.0),
        (2, 0.999, 0.0),     # same cell
        (3, 1.001, 0.0),     # adjacent cell, within radius of 1 & 2
        (4, 0.0, 1.999),     # lon scaled by 0.5 → v = 0.9995
        (5, -0.001, -0.001), # negative-cell straddle
        (6, 5.0, 5.0),       # isolated
        (7, 2.0, 0.0),       # exactly radius*2 from 1 on lat axis
    ]
    df = spark.createDataFrame(pts, "pid int, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join_pairs(df, "pid", "lat", "lon", 1.0, 0.5).collect()
    }
    rows = [(p, la, lo) for p, la, lo in pts]
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            d = ((a[1] - b[1]) ** 2 + ((a[2] - b[2]) * 0.5) ** 2) ** 0.5
            if d <= 1.0:
                want.add((min(a[0], b[0]), max(a[0], b[0])))
    assert got == want and len(want) >= 4


def test_hilbert_cluster_interplay_rename_and_dv(spark):
    """Interplay: a rename (metadata-only column mapping) and a DV
    delete land BEFORE the Hilbert rewrite — the rewrite must cluster
    on the LOGICAL name, physically drop the DV'd rows (restates
    materialize deletes), and leave pruned box scans working on the
    renamed column afterwards."""
    from pyspark.sql import functions as F

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    df = spark.range(2048).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y_old"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_hcmix_"))
    t.append(df.repartition(4, "id"), stats_cols=["x", "y_old"])
    t.rename_column("y_old", "y")
    t.delete_where_dv("x >= 32")  # DV delete: no files rewritten yet
    c = t.hilbert_cluster(["x", "y"], target_partitions=4)
    assert c.dv_files is None or not c.dv_files  # deletes materialized
    snap = t.snapshot()
    assert snap.count() == 1024
    assert snap.where(F.col("x") >= 32).count() == 0
    got, scanned, total = t.scan_pruned_box({"x": (0, 7), "y": (0, 7)})
    assert scanned < total
    assert got.count() == 8 * 8
