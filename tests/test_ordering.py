"""operators/ordering.py — hierarchical global ranking parity.

The helper must be bit-identical to the single-partition
``row_number() OVER (ORDER BY ...)`` / ``ntile(n)`` it replaces,
at any partitioning of the input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.ordering import (
    global_row_number,
    ntile_from_rank,
)


def _expected(spark, df, keys):
    return {
        r["id"]: r["pos"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*keys)).alias("pos")
        ).collect()
    }


@pytest.mark.parametrize("nparts", [1, 3, 32])
def test_global_row_number_matches_window(spark, nparts):
    df = (
        spark.range(500)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .repartition(nparts)
    )
    keys = ["k", "h", "id"]
    want = _expected(spark, df, keys)
    got = {
        r["id"]: r["pos"]
        for r in global_row_number(df, keys, "pos").collect()
    }
    assert got == want


def test_global_row_number_with_explicit_partitions(spark):
    df = spark.range(100).select("id", (F.col("id") % 3).alias("k"))
    got = {
        r["id"]: r["pos"]
        for r in global_row_number(df, ["k", "id"], "pos", num_partitions=5).collect()
    }
    assert got == _expected(spark, df, ["k", "id"])


@pytest.mark.parametrize("total,n", [(100, 4), (103, 4), (7, 4), (3, 4), (1, 1), (64, 7)])
def test_ntile_from_rank_matches_sql_ntile(spark, total, n):
    df = spark.range(1, total + 1).select(F.col("id"))
    want = {
        r["id"]: r["b"]
        for r in df.select(
            "id", F.ntile(n).over(Window.orderBy("id")).alias("b")
        ).collect()
    }
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id",
            ntile_from_rank(F.col("id"), F.lit(total), n).cast("int").alias("b"),
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_window(spark):
    """global_cumsum is bit-identical to the single-partition window
    it replaces, including multi-column mode, decimals, and negative
    values."""
    from pyspark.sql import Window, functions as F

    from lakehouse_test_spark.operators.ordering import global_cumsum

    df = (
        spark.range(0, 5000)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 37) % 101 - 50).alias("a"),
            ((F.col("id") * 13) % 7).cast("decimal(18,6)").alias("b"),
        )
        .repartition(16)
    )
    got = (
        global_cumsum(df, ["k"], ["a", "b"], ["ca", "cb"])
        .orderBy("k")
        .collect()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select(
            "k",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        )
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.ca, r.cb) for r in got] == [
        (r.k, r.ca, r.cb) for r in want
    ]


def test_global_cumsum_descending_keys(spark):
    from pyspark.sql import Window, functions as F

    from lakehouse_test_spark.operators.ordering import global_cumsum

    df = spark.range(0, 3000).select(
        (F.col("id") % 500).alias("v"), F.col("id").alias("k"), F.lit(1).alias("one")
    )
    got = (
        global_cumsum(df, [F.desc("v"), "k"], "one", "c")
        .orderBy(F.desc("v"), "k")
        .collect()
    )
    assert [r.c for r in got] == list(range(1, 3001))
