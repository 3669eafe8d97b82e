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
        .drop("_commit_timestamp")  # wall-clock; gated elsewhere
    )
    return _drain_to_memory(stream, "append")


@query(
    "lakehouse_pruned_scan_evolved",
    oracle="""
    WITH src AS (
      SELECT s_suppkey AS k,
             CAST(TRUNC(s_acctbal) AS DECIMAL(12,2)) AS balance
      FROM supplier
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(balance), 2) AS DOUBLE) AS bal_sum,
           TRUE AS pruned, TRUE AS zero_footer_reads
    FROM src WHERE k BETWEEN 21 AND 60
    """,
    tags=("lakehouse", "pruning", "alter", "widen", "drop"),
)
def lakehouse_pruned_scan_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruned range scan on an EVOLVED table (int→decimal
    widening + DROP COLUMN), with the round-8 contract pinned in the
    output: ``zero_footer_reads`` is True only when the kept files'
    schemas fold from their OWNING commits' recorded schemas — the
    gate runs the scan with the parquet-footer reader patched to
    count, so a regression to footer folding hash-mismatches.

    Scale: a point/range probe on a 10⁶-file evolved table keeps a
    handful of files via zone maps; reading even the KEPT footers is
    50 object-store GETs a log-recorded schema makes free.
    """
    import tempfile
    from unittest import mock

    import pyarrow.parquet as pq

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").cast("int").alias("balance"),
        (F.col("s_suppkey") % 7).alias("dead"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_prunev_"))
    # 4 key-ranged files per vintage: zone maps prune the range probe
    for lo, hi in ((0, 20), (20, 40), (40, 60), (60, 10**9)):
        t.append(
            s.where((F.col("k") > lo) & (F.col("k") <= hi)).coalesce(1),
            stats_cols=["k"],
        )
    t.widen_column("balance", "decimal(12,2)")
    t.drop_column("dead")
    t.append(
        s.limit(0)
        .select("k", F.col("balance").cast("decimal(12,2)"))
        .coalesce(1),
        stats_cols=["k"],
    )
    footer_reads = {"n": 0}
    orig = pq.read_schema

    def _counting(*a, **kw):
        footer_reads["n"] += 1
        return orig(*a, **kw)

    with mock.patch.object(pq, "read_schema", side_effect=_counting):
        df, kept, total = t.scan_pruned("k", 21, 60)
        out = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("balance"), 2).cast("double").alias("bal_sum"),
            F.lit(kept < total).alias("pruned"),
        ).localCheckpoint()
    return out.withColumn(
        "zero_footer_reads", F.lit(footer_reads["n"] == 0)
    )
