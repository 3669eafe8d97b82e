"""Bucketed co-located joins + lakehouse MERGE/DELETE tests."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.session import load_table
from lakehouse_test_spark.sources.synthetic import person_stream


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key removes the per-query
    shuffle: the join plan must contain no Exchange. This is the
    'co-located join' strategy for repeated large-large joins at
    100 TB — pay the shuffle once at write time.
    """
    import shutil
    from urllib.parse import urlparse

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)  # stale dirs from dead sessions
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
    )
    ob = spark.table("orders_b")
    cb = spark.table("customer_b")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select("o_orderkey", "c_name")

    # force the large-large strategy (broadcast would mask bucketing —
    # at real scale neither side fits in an executor)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan
        # and it is still correct
        expected = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_lakehouse_merge_upsert(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "m"))
    t.append(person_stream(spark, 100))
    # update keys 0..9 (new score), insert keys 100..104
    updates = person_stream(spark, 105).where(
        (F.col("ba") < 10) | (F.col("ba") >= 100)
    ).withColumn("score", F.lit(999.0))
    t.merge(updates, key_cols=["ba"])
    snap = t.snapshot()
    assert snap.count() == 105
    assert snap.where(F.col("score") == 999.0).count() == 15
    # time travel: pre-merge snapshot unchanged
    assert t.snapshot(version=0).where(F.col("score") == 999.0).count() == 0
    t.drop()


def test_lakehouse_delete_where(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "d"))
    t.append(person_stream(spark, 100))
    t.delete_where("ba % 2 = 0")
    assert t.snapshot().count() == 50
    assert t.snapshot().where("ba % 2 = 0").count() == 0
    assert t.snapshot(version=0).count() == 100  # time travel intact
    t.drop()


def test_stateful_counter_totals(spark, sf_dir):
    """applyInPandasWithState totals must equal the batch group counts."""
    from lakehouse_test_spark.operators.udfs import udf_stateful_session_counter

    got = {
        r.user_id: r.total_events
        for r in udf_stateful_session_counter(spark, sf_dir).collect()
    }
    expected = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
