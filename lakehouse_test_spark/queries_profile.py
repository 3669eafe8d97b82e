"""Data-profiling + reshaping operators (SURVEY.md §2b adjuncts):
column profiling (the data-quality pass every ingest pipeline runs),
histograms, UNPIVOT (wide→long), and ANSI-safe try-arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "profile_columns",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           count(*) AS n_rows,
           count(o_custkey) AS n_nonnull,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS DOUBLE) AS min_val,
           CAST(max(o_custkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(round(min(o_totalprice), 2) AS DOUBLE),
           CAST(round(max(o_totalprice), 2) AS DOUBLE)
    FROM orders
    """,
    tags=("profile", "agg"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null/distinct/min/max per column) — the
    data-quality pass before any pipeline stage; one scan computes
    all columns' profiles in parallel aggregates."""
    o = T(spark, sf_dir, "orders")
    prof = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("k_nonnull"),
        F.countDistinct("o_custkey").alias("k_distinct"),
        F.min("o_custkey").cast("double").alias("k_min"),
        F.max("o_custkey").cast("double").alias("k_max"),
        F.count("o_totalprice").alias("p_nonnull"),
        F.countDistinct("o_totalprice").alias("p_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("p_min"),
        F.round(F.max("o_totalprice"), 2).alias("p_max"),
    )
    k = prof.select(
        F.lit("o_custkey").alias("column_name"),
        "n_rows",
        F.col("k_nonnull").alias("n_nonnull"),
        F.col("k_distinct").alias("n_distinct"),
        F.col("k_min").alias("min_val"),
        F.col("k_max").alias("max_val"),
    )
    p = prof.select(
        F.lit("o_totalprice").alias("column_name"),
        "n_rows",
        F.col("p_nonnull").alias("n_nonnull"),
        F.col("p_distinct").alias("n_distinct"),
        F.col("p_min").alias("min_val"),
        F.col("p_max").alias("max_val"),
    )
    return k.unionByName(p)


@query(
    "histogram_price_buckets",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
           count(*) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS bucket_min,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS bucket_max
    FROM orders
    GROUP BY 1
    """,
    tags=("profile", "agg", "histogram"),
)
def histogram_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (floor bucketing with a clamped tail) —
    the distribution profile behind skew detection and salting
    decisions."""
    o = T(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, metric, CAST(round(val, 4) AS DOUBLE) AS val FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
      UNION ALL
      SELECT o_orderkey, 'order_year', CAST(year(o_orderdate) AS DOUBLE) FROM orders
    )
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) via DataFrame.unpivot — the inverse
    of the pivot queries; long form feeds per-metric aggregation."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
        F.year("o_orderdate").cast("double").alias("order_year"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey", "order_year"],
        variableColumnName="metric",
        valueColumnName="val0",
    ).select("o_orderkey", "metric", F.round("val0", 4).alias("val"))


@query(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CASE WHEN l_discount = 0 THEN NULL
                     ELSE round(l_extendedprice / l_discount, 4) END AS DOUBLE) AS price_per_disc,
           CAST(round(l_quantity / nullif(l_tax, 0), 4) AS DOUBLE) AS qty_per_tax
    FROM lineitem
    """,
    tags=("scalar", "ansi"),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs with ansi.enabled=true, so
    plain division by zero *throws*; try_divide / nullif are the
    idiomatic null-on-error forms (matching SQL NULLIF semantics)."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", F.when(F.col("l_discount") == 0, None).otherwise(F.col("l_discount"))), 4).alias(
            "price_per_disc"
        ),
        F.round(F.try_divide("l_quantity", F.nullif(F.col("l_tax"), F.lit(0.0))), 4).alias(
            "qty_per_tax"
        ),
    )


@query("sample_stratified", oracle=None, tags=("sample", "approx"))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (sampleBy): 30% of clicks, 100% of
    purchases — the class-rebalancing step of training-data prep.
    Rows-only: sampling is seed+partitioning-deterministic but has no
    SQL twin; the summary shape (counts per type) is stable."""
    e = T(spark, sf_dir, "events")
    sampled = e.sampleBy(
        "event_type", fractions={"click": 0.3, "purchase": 1.0}, seed=42
    )
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))
