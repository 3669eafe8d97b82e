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


@query(
    "cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    cohorts AS (
      SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           date_diff('day', c.cohort_day, a.day) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "cohort", "agg"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted on each subsequent active day offset — THE product
    analytics table every event pipeline feeds.

    Scale: two shuffles on user_id (distinct user-days, then first-day
    cohort), both with map-side partials; the cohort join is on the
    already-aggregated per-user rows (users ≪ events), and the final
    rollup groups a users×days-bounded frame, never raw events.
    """
    e = T(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "outliers_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(round(3 * 1.4826 * m.mad, 4) AS DOUBLE) AS threshold
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.mad
    """,
    tags=("events", "profile", "stats"),
)
def outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: |x - median| >
    3 × 1.4826 × MAD (the consistency-scaled median absolute
    deviation) — the screen that survives heavy-tailed value
    distributions where z-scores drown.

    Scale: two exact-percentile aggregations on the 5-key event_type
    (tiny reduce side both times) + a broadcast join of the per-type
    med/MAD back onto events; the event scan never shuffles. For
    percentile at extreme group cardinalities swap percentile() for
    approx_percentile — here exact keeps the oracle tight.
    """
    e = T(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    thresh = F.lit(3 * 1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("adev") > thresh, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "n_outliers",
            F.round(F.lit(3 * 1.4826) * F.col("mad"), 4).alias("threshold"),
        )
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("events", "window", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user — the path-analysis matrix behind 'what do users do
    after X' product questions.

    Scale: one shuffle (window partitioned by user_id, ordered by
    event time with event_id tiebreak for determinism); the rollup
    groups a |types|²-bounded frame. No self-join — the lag window is
    the linear-cost formulation.
    """
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "histogram_equidepth",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
      FROM orders
    )
    SELECT CAST((CASE WHEN o_totalprice > q[1] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[2] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[3] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[4] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[5] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[6] THEN 1 ELSE 0 END
           + CASE WHEN o_totalprice > q[7] THEN 1 ELSE 0 END) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS bucket_min,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS bucket_max
    FROM orders CROSS JOIN cuts
    GROUP BY 1
    """,
    tags=("profile", "agg", "histogram"),
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) 8-bucket histogram via exact octile
    cutpoints — the bucket layout range partitioners, ZORDER cuts, and
    skew detectors actually want (equi-WIDTH buckets collapse under
    skew; equi-depth buckets are balanced by construction).

    Scale: one percentile aggregate (swap percentile -> approx_
    percentile at 100 TB: deterministic sketch, same contract) + one
    scan with the 7 cutpoints folded in as literals + a partial-agg
    rollup on 8 keys. Spark's percentile and DuckDB's quantile_cont
    share the linear-interpolation definition, so the boundary is
    oracle-exact.
    """
    o = T(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr(
            "percentile(o_totalprice, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        )
    ).first()[0]
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col("o_totalprice") > F.lit(float(c)), 1).otherwise(0)
    return (
        o.groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )
