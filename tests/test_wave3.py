"""Round-3 wave: time-series, BM25, linkage, prefix-filter join,
triangles, HLL sketches, format roundtrips.

Each test pins a *property* the oracle can't (exactness of the
prefix filter vs brute force, sketch error bounds, grid continuity)
— the value-level comparison itself lives in the driver gate /
tools/check_oracle.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark import queries_wave3 as w3
from lakehouse_test_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_gapfill_grid_is_continuous(spark):
    rows = w3.timeseries_gapfill_locf(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        hours = [r.hour for r in series]
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600, "hole in resampled grid"
        # gap-filled rows carry no events and inherit the last value
        for prev, cur in zip(series, series[1:]):
            if cur.gap_filled:
                assert cur.n_events == 0
                assert cur.value_locf == prev.value_locf


def test_ohlc_bounds_and_volume(spark):
    rows = w3.timeseries_ohlc_hourly(spark, SF).collect()
    assert rows
    for r in rows:
        lo, hi = float(r.low), float(r.high)
        assert lo <= hi
        # open/close are observed values, so they lie within [low, high]
        assert lo - 1e-4 <= float(r.open) <= hi + 1e-4
        assert lo - 1e-4 <= float(r.close) <= hi + 1e-4
        if r.n_events == 1:
            assert r.open == r.close


def test_bm25_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [t for t in __import__("re").split(r"[^a-z0-9]+", r.text.lower()) if t] for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    k1, b = w3._BM25_K1, w3._BM25_B
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in w3._BM25_TERMS
    }
    expected = {}
    for doc_id, terms in toks.items():
        s = 0.0
        for t in w3._BM25_TERMS:
            tf = terms.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(terms) / avgdl))
        if s > 0:
            expected[doc_id] = s
    top = sorted(expected.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:15]
    got = [(r.doc_id, r.bm25) for r in w3.text_bm25_search(spark, SF).collect()]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (_, g), (_, e) in zip(got, top):
        assert abs(float(g) - e) < 1e-3


def test_prefix_filter_equals_bruteforce(spark):
    """The prefix filter must be lossless: candidate pruning can never
    drop a pair with Jaccard >= t (AllPairs/PPJoin correctness)."""
    filtered = {
        (r.doc_a, r.doc_b)
        for r in w3.dedup_jaccard_prefix_filter(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("ts"),
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    un = F.size("ts_a") + F.size("ts_b") - inter
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .where(inter * 1.0 / un >= w3._JACC_T)
        .collect()
    }
    assert filtered == brute


def test_triangle_count_consistent(spark):
    row = w3.graph_triangle_count(spark, SF).collect()[0]
    assert row.n_edges >= 0 and row.n_triangles >= 0
    if row.n_edges:
        assert row.n_nodes >= 2
        # a graph with E edges has at most E*(E-1)/6-ish triangles;
        # the real bound we care about: triangles need >= 3 edges
        assert row.n_triangles == 0 or row.n_edges >= 3


def test_hll_estimates_within_5pct(spark):
    rows = w3.agg_hll_union(spark, SF).collect()
    per_type = [r for r in rows if r.grain == "per_type"]
    assert per_type
    for r in per_type:
        assert r.exact_users > 0
        rel = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel < 0.05, f"{r.event_type}: HLL off by {rel:.1%}"
    union = [r for r in rows if r.grain == "union"][0]
    e = load_table(spark, SF, "events")
    exact_total = e.select("user_id").distinct().count()
    assert abs(union.approx_users - exact_total) / exact_total < 0.05


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_format_roundtrip_preserves_values(spark, fmt):
    fn = w3.format_json_roundtrip if fmt == "json" else w3.format_orc_roundtrip
    got = {r.o_orderstatus: (r.n_orders, float(r.total_price)) for r in fn(spark, SF).collect()}
    orders = load_table(spark, SF, "orders")
    exp = {
        r.o_orderstatus: (r.n, float(r.tp))
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("tp"),
        )
        .collect()
    }
    assert got == exp
