"""Wave B tests: VARIANT shredding, scalar CSV/XML codecs, linear
interpolation — properties beyond the driver's value-hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_test_spark import queries_wave4 as w4
from lakehouse_test_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_variant_shred_matches_direct(spark):
    got = {
        r.status: (r.n_orders, float(r.total_price), r.max_key)
        for r in w4.variant_shred_orders(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    exp = {
        r.s: (r.n, float(r.tp), r.mk)
        for r in o.groupBy(F.col("o_orderstatus").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("tp"),
            F.max("o_orderkey").alias("mk"),
        )
        .collect()
    }
    assert got == exp


def test_try_variant_get_null_on_miss(spark):
    e = load_table(spark, SF, "events").limit(5)
    rows = e.select(
        F.try_variant_get(F.parse_json("props"), "$.does_not_exist", "bigint").alias("x"),
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    ).collect()
    assert all(r.x is None for r in rows)
    assert all(r.k is not None for r in rows)


def test_csv_codec_row_identity(spark):
    o = load_table(spark, SF, "orders").limit(100)
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    parsed = F.from_csv(line, w4._CSV_SCHEMA.simpleString())
    bad = o.select(
        "o_orderkey", "o_totalprice", "o_orderpriority", parsed.alias("r")
    ).where(
        (F.col("r.okey") != F.col("o_orderkey"))
        | (F.col("r.price") != F.col("o_totalprice"))
        | (F.col("r.prio") != F.col("o_orderpriority"))
    )
    assert bad.count() == 0


def test_interpolation_properties(spark):
    rows = w4.timeseries_interpolate_linear(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        # interpolated values are bounded by their observed neighbors
        obs_idx = [i for i, r in enumerate(series) if not r.interpolated]
        for i, r in enumerate(series):
            if not r.interpolated:
                continue
            prev = max((j for j in obs_idx if j < i), default=None)
            nxt = min((j for j in obs_idx if j > i), default=None)
            assert r.v_interp is not None
            if prev is not None and nxt is not None:
                lo = min(float(series[prev].v_interp), float(series[nxt].v_interp))
                hi = max(float(series[prev].v_interp), float(series[nxt].v_interp))
                assert lo - 1e-3 <= float(r.v_interp) <= hi + 1e-3
            elif prev is not None:
                assert float(r.v_interp) == float(series[prev].v_interp)
            else:
                assert float(r.v_interp) == float(series[nxt].v_interp)


def test_transform_with_state_totals(spark):
    from lakehouse_test_spark.operators import udfs

    if not udfs._has_protobuf():
        import pytest

        pytest.skip("protobuf not available: transformWithStateInPandas gated off")
    got = {
        r.user_id: (r.total_events, float(r.total_value))
        for r in udfs.udf_transform_with_state(spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    exp = {
        r.user_id: (r.n, float(r.tv))
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0]
