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
