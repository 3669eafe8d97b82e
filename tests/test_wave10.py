"""Wave-H tests: geospatial grid join, Kaplan-Meier, periodogram,
Theil-Sen, BFS, Benford, decision stump, substring spans, KMV.

The DuckDB oracle gate (tools/check_oracle.py) hash-checks every one
of these at sf0.01; the tests here pin the *structural* properties —
plan shapes, invariants, and numpy parity for the stump — at the
smoke scale.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave10 import (
    dedup_substring_spans,
    dq_benford_first_digit,
    geo_grid_neighbor_pairs,
    geo_nearest_supplier,
    graph_bfs_levels,
    ml_decision_stump,
    sketch_kmv_distinct,
    stats_theil_sen_trend,
    survival_kaplan_meier,
    timeseries_periodogram,
)
from lakehouse_test_spark.session import load_table


def test_geo_grid_join_plans_as_equi_join(spark, sf_dir):
    """The 150 km pair search must plan as a hash/merge equi-join on
    the cell id — never a cartesian/broadcast nested loop (that's the
    whole point of gridding)."""
    plan = geo_grid_neighbor_pairs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_grid_matches_brute_force(spark, sf_dir):
    """Grid-join pair count equals the O(n²) cross-join count at the
    smoke scale (the oracle proves this at sf0.01 too; here it's
    asserted engine-side only, via a cartesian recompute)."""
    row = geo_grid_neighbor_pairs(spark, sf_dir).collect()[0]

    c = load_table(spark, sf_dir, "customer")
    from lakehouse_test_spark.queries_wave10 import _haversine_km, _u01

    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + 120 * _u01("lat", F.col("c_custkey").cast("string"))).alias("lat"),
        (F.lit(-170) + 340 * _u01("lon", F.col("c_custkey").cast("string"))).alias("lon"),
    )
    a = pts.select(F.col("id").alias("aid"), F.col("lat").alias("alat"), F.col("lon").alias("alon"))
    b = pts.select(F.col("id").alias("bid"), F.col("lat").alias("blat"), F.col("lon").alias("blon"))
    brute = (
        a.crossJoin(b)
        .where(F.col("aid") < F.col("bid"))
        .where(
            _haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
            <= 150
        )
        .count()
    )
    assert row["n_pairs"] == brute


def test_geo_nearest_supplier_counts(spark, sf_dir):
    rows = geo_nearest_supplier(spark, sf_dir).collect()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert rows
    for r in rows:
        assert 0 <= r["n_within_2000km"] <= n_supp
        assert r["nearest_km"] >= 0


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    rows = survival_kaplan_meier(spark, sf_dir).orderBy("lifetime_days").collect()
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 < r["survival"] <= 1.0 + 1e-9
        assert r["survival"] <= prev + 1e-9
        assert r["n_at_risk"] >= r["n_events"] >= 1
        prev = r["survival"]


def test_periodogram_shape(spark, sf_dir):
    rows = timeseries_periodogram(spark, sf_dir).orderBy("k").collect()
    assert [r["k"] for r in rows] == list(range(1, 17))
    assert all(r["power_1e9"] >= 0 for r in rows)


def test_theil_sen_pair_count_exact(spark, sf_dir):
    row = stats_theil_sen_trend(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    days = o.select(F.to_date("o_orderdate").alias("d")).distinct().count()
    assert row["n_pairs"] == days * (days - 1) // 2


def test_bfs_levels_invariants(spark, sf_dir):
    rows = {r["level"]: r["n_nodes"] for r in graph_bfs_levels(spark, sf_dir).collect()}
    assert rows[0] == 1
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(rows.values()) <= n_parts
    # levels are contiguous from 0
    assert sorted(rows) == list(range(len(rows)))


def test_benford_probabilities_sum_to_one(spark, sf_dir):
    rows = dq_benford_first_digit(spark, sf_dir).collect()
    assert {r["d"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    # benford_p column is the closed form, independent of data
    for r in rows:
        assert abs(r["benford_p"] - math.log10(1 + 1 / r["d"])) < 1e-6


def test_decision_stump_matches_numpy_brute_force(spark, sf_dir):
    """The windowed histogram-method split must equal an O(C·N) numpy
    brute force over every candidate threshold (both features,
    deterministic tiebreak)."""
    row = ml_decision_stump(spark, sf_dir).collect()[0]

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_returnflag"
    ).toPandas()
    y = (li["l_returnflag"] == "R").to_numpy(dtype=np.int64)
    best = None
    for feature in ("discount", "quantity"):  # alphabetical for tiebreak
        f = li[f"l_{feature}"].to_numpy(dtype=np.float64)
        for thr in np.unique(f):
            m = f <= thr
            nl, nr = int(m.sum()), int((~m).sum())
            if nl == 0 or nr == 0:
                wg = 1e9
            else:
                pl, pr = y[m].sum() / nl, y[~m].sum() / nr
                wg = (
                    nl * (1 - pl * pl - (1 - pl) ** 2)
                    + nr * (1 - pr * pr - (1 - pr) ** 2)
                ) / (nl + nr)
            key = (wg, feature, thr)
            if best is None or key < best[0]:
                best = (key, feature, thr, nl, nr, wg)
    assert row["feature"] == best[1]
    assert row["threshold"] == pytest.approx(round(best[2], 2))
    assert row["n_left"] == best[3]
    assert row["n_right"] == best[4]
    assert row["weighted_gini"] == pytest.approx(best[5], abs=1e-6)


def test_substring_spans_zero_python_udfs(spark, sf_dir):
    """The 8-gram expansion must stay in codegen (transform/sequence
    in-plan) — no BatchEvalPython / ArrowEvalPython stages."""
    plan = dedup_substring_spans(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    row = dedup_substring_spans(spark, sf_dir).collect()[0]
    assert row["n_dup_spans"] >= 0
    if row["n_dup_spans"]:
        assert row["total_occurrences"] > row["n_dup_spans"]


def test_kmv_estimate_within_theory_bound(spark, sf_dir):
    """KMV with k=64 has ~1/sqrt(k-2) ≈ 12.7% relative standard
    error; assert the estimate lands within 4 sigma (or is exact when
    the population is smaller than k)."""
    row = sketch_kmv_distinct(spark, sf_dir).collect()[0]
    true = row["true_distinct"]
    if row["k_used"] < 64:
        # fewer distinct hashes than k: the sketch degenerates to exact
        assert row["k_used"] == true
    else:
        assert abs(row["est_distinct"] - true) / true < 4 / math.sqrt(62)
