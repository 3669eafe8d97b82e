"""Round-7 wave AK: CDF typed-feed coverage + spec-native widening.

Two gates for the round-7 lakehouse fixes:

- ``streaming_cdf_decimal_feed`` — the CDF streaming DataSource over
  a table whose columns are decimal(12,2) and date (the TPC-H shape
  it previously rejected at ``schema()``), hash-checked against a
  pure-SQL reconstruction of the feed.
- ``lakehouse_widen_compact_native`` — OPTIMIZE as the spec-native
  migration for non-spec type promotions: after ``widen_column``
  (int → decimal) and ``compact()``, every live file's parquet
  footer physically carries the widened type (the gate surfaces the
  footer-vintage count as a column, so a regression hash-mismatches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "streaming_cdf_decimal_feed",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k,
             CAST(o_orderkey % 100000 + 0.25 AS DECIMAL(12,2)) AS price,
             CAST(o_orderdate AS DATE) AS od
      FROM orders
    )
    SELECT k, price, od, 'insert' AS _change_type,
           CAST(k % 2 AS INTEGER) AS _commit_version
    FROM src
    UNION ALL
    SELECT k, price, od, 'delete' AS _change_type,
           CAST(2 AS INTEGER) AS _commit_version
    FROM src WHERE price < 750
    """,
    tags=("streaming", "lakehouse", "cdf", "decimal", "datasource"),
)
def streaming_cdf_decimal_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDF streaming source over a DECIMAL + DATE table — the
    column shape every TPC-H-style table has (and the one the source
    used to reject outright): even keys commit at v0, odd at v1, a
    deletion vector removes the cheap rows at v2; the drained feed
    must hash-match the SQL reconstruction, types included.

    Scale: same plan as streaming_cdf_source — one partition per data
    file for inserts, one per DV FILE for deletes (each executor
    groups its DV's positions by base file; the driver never holds a
    position list), Arrow RecordBatches end to end.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register
    from lakehouse_test_spark.streaming.jobs import _drain_to_memory

    register(spark)
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 100000 + F.lit(0.25))
        .cast("decimal(12,2)")
        .alias("price"),
        F.to_date("o_orderdate").alias("od"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfdec_"))
    t.append(o.where(F.col("k") % 2 == 0).repartition(2))
    t.append(o.where(F.col("k") % 2 == 1).repartition(2))
    t.delete_where_dv("price < 750")
    stream = (
        spark.readStream.format("lakehouse_cdf")
        .option("path", str(t.path))
        .load()
    )
    return _drain_to_memory(stream, "append")


@query(
    "lakehouse_widen_compact_native",
    oracle="""
    SELECT p_brand AS brand,
           CAST(round(sum(CAST(p_size AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS sum_v,
           count(*) AS n_parts,
           CAST(1 AS INTEGER) AS n_footer_vintages
    FROM part GROUP BY p_brand
    """,
    tags=("lakehouse", "alter", "widen", "compact"),
)
def lakehouse_widen_compact_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE materializes type widening: int→decimal is NOT in
    Iceberg's blessed promotion set, so pre-widen files need an
    explicit-schema crutch for foreign readers — until a compaction
    rewrites them. compact() reads through the widened schema, so the
    rewritten files physically carry decimal(12,2); the gate surfaces
    the live footer-vintage count as a column (expected 1) and
    aggregates the widened column, so both a physical-type regression
    and a value corruption hash-mismatch.

    Scale: the widening itself is pure metadata (zero rewrite); the
    materialization piggybacks on OPTIMIZE, which a 100 TB table runs
    bin-by-bin anyway — no dedicated migration pass.
    """
    import tempfile

    import pyarrow.parquet as pq

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    p = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("int").alias("v"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_widcomp_"))
    t.append(p.where(F.col("k") % 2 == 0))
    t.widen_column("v", "decimal(12,2)")
    t.append(
        p.where(F.col("k") % 2 == 1).withColumn(
            "v", F.col("v").cast("decimal(12,2)")
        )
    )
    t.compact(target_partitions=2)
    vintages = {
        str(pq.read_schema(f).field("v").type) for f in t._files_for()
    }
    return (
        t.snapshot()
        .groupBy("brand")
        .agg(
            F.round(F.sum("v"), 2).cast("double").alias("sum_v"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .withColumn("n_footer_vintages", F.lit(len(vintages)).cast("int"))
    )
