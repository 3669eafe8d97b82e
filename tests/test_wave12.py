"""Wave-J tests: PIT SCD2 join, weighted median, PMI collocations,
funnel time-to-convert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave12 import (
    agg_weighted_median,
    dim_scd2_point_in_time,
    events_funnel_time_to_convert,
    text_collocations_pmi,
)
from lakehouse_test_spark.session import load_table


def test_pit_join_is_hash_join_not_nlj(spark, sf_dir):
    plan = (
        dim_scd2_point_in_time(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pit_join_covers_every_order(spark, sf_dir):
    """Every order matches exactly one dimension version (validity
    intervals tile time), so counts sum to the order count."""
    rows = dim_scd2_point_in_time(spark, sf_dir).collect()
    total = sum(r["n_orders"] for r in rows)
    assert total == load_table(spark, sf_dir, "orders").count()


def test_weighted_median_brute_force(spark, sf_dir):
    """The window construction equals a per-group python brute force
    over the (price, weight) pairs."""
    rows = {r["l_returnflag"]: r for r in agg_weighted_median(spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        g = grp.sort_values("l_extendedprice")
        tw = int(g["l_quantity"].sum())
        cw = 0
        for price, wt in zip(g["l_extendedprice"], g["l_quantity"]):
            cw += int(wt)
            if cw * 2 >= tw:
                assert rows[flag]["weighted_median_price"] == pytest.approx(
                    round(price, 2)
                )
                assert rows[flag]["total_weight"] == tw
                break


def test_pmi_stays_jvm_side(spark, sf_dir):
    plan = (
        text_collocations_pmi(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pmi_support_gate_and_order(spark, sf_dir):
    rows = text_collocations_pmi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["pair_count"] >= 5
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_funnel_durations_nonnegative(spark, sf_dir):
    rows = {r["step"]: r for r in events_funnel_time_to_convert(spark, sf_dir).collect()}
    assert set(rows) == {"view_to_click", "click_to_purchase"}
    for r in rows.values():
        if r["n_users"]:
            assert r["median_sec"] >= 0
            assert r["p90_sec"] >= r["median_sec"]


def test_contamination_strategies_agree(spark, sf_dir):
    """The literal-intersect and broadcast-join contamination paths
    must produce identical rows (the auto switch is a plan-size
    guard, not a semantic change)."""
    from lakehouse_test_spark.operators.tokens import _contamination_overlap

    lit = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["overlap_frac"], r["contaminated"])
        for r in _contamination_overlap(spark, sf_dir, "literal").collect()
    }
    join = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["overlap_frac"], r["contaminated"])
        for r in _contamination_overlap(spark, sf_dir, "join").collect()
    }
    assert lit == join
