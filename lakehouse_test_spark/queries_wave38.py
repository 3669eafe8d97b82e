"""Round-8 wave AL: CDF catch-up admission (snapshot-seeded start).

- ``streaming_cdf_snapshot_seed`` — a fresh ``lakehouse_cdf`` stream
  with ``startingMode=snapshot`` over a table whose BACKLOG contains
  a full restate (poison for an ``earliest`` start) and a live
  deletion vector: the first micro-batch is the net live snapshot
  (one partition per live file, DVs applied, provenance
  ``_commit_version`` per row), hash-checked against a pure-SQL
  reconstruction. This is the reference's bounded catch-up admission
  (offload-watermark-gated reads, PerformanceConsumer.java:221-232)
  re-expressed for a change feed: a consumer joining a 10⁴-commit
  table pays O(live data), never O(change history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "streaming_cdf_snapshot_seed",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k,
             CAST(o_orderkey % 1000 + 0.5 AS DECIMAL(12,2)) AS price
      FROM orders
    ),
    live AS (
      SELECT k, price, 2 AS v FROM src
      WHERE k % 3 IN (0, 1) AND k % 10 <> 7
      UNION ALL
      SELECT k, price, 3 AS v FROM src WHERE k % 3 = 2
    )
    SELECT k, price, 'insert' AS _change_type,
           CAST(v AS INTEGER) AS _commit_version
    FROM live WHERE price >= 500
    """,
    tags=("streaming", "lakehouse", "cdf", "snapshot", "datasource"),
)
def streaming_cdf_snapshot_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startingMode=snapshot: the stream's first micro-batch is the
    LIVE snapshot — appends at v0/v1, a full-restate DELETE at v2 (an
    ``earliest`` start would raise on it), an append at v3, a
    deletion vector at v4. The drained feed must equal the net live
    rows: restate-surviving rows surface under the restate's version
    (v2), the post-restate append under its own (v3), DV'd rows are
    absent, every row an ``insert``.

    Scale: seed partitions map 1:1 to LIVE files (the checkpoint-
    backed live-set fold), so a 10⁴-commit backlog plans like a scan
    of the table, not a replay of its history; DV position lists stay
    executor-side.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register
    from lakehouse_test_spark.streaming.jobs import _drain_to_memory

    register(spark)
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 1000 + F.lit(0.5))
        .cast("decimal(12,2)")
        .alias("price"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfseed_"))
    t.append(o.where(F.col("k") % 3 == 0).repartition(2))  # v0
    t.append(o.where(F.col("k") % 3 == 1).repartition(2))  # v1
    t.delete_where("k % 10 = 7")  # v2: full restate (earliest-poison)
    t.append(o.where(F.col("k") % 3 == 2).repartition(2))  # v3
    t.delete_where_dv("price < 500")  # v4: live DV
    stream = (
        spark.readStream.format("lakehouse_cdf")
        .option("path", str(t.path))
        .option("startingMode", "snapshot")
        .load()
    )
    return _drain_to_memory(stream, "append")
