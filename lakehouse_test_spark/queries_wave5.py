"""Round-3 wave C: windowed order statistics, running distinct
counts, sequential pattern detection, and the SQL PIVOT clause.

These close the remaining analytic-window and event-sequence gaps in
the mandated surface (SURVEY.md §2b windows/events groups): rolling
medians are the robust-statistics twin of the moving average, running
distinct counts are the classic "DISTINCT is illegal in a window
frame" composition, and sequence detection is the batch shape of
funnel/session analytics (the MATCH_RECOGNIZE use case, expressed
with lead() so it stays in one window pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, event_type,
           round(median(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS roll_median
    FROM events
    """,
    tags=("window", "events"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-row median of event value per type — the robust
    (outlier-immune) twin of window_moving_avg.

    Spark disallows ``median()`` with a window frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the median is
    composed from frame-capable built-ins: collect the ≤10-value
    frame, array_sort it, take the middle (or mean of the two middle)
    elements — the exact same interpolation DuckDB's median applies.

    Scale: one shuffle on event_type, then a bounded ROWS frame: the
    executor keeps at most 10 values per frame, so memory is O(frame)
    regardless of partition size (the trap would be an unbounded
    collect_list). Both engines compute the identical IEEE double, so
    6-dp rounding is hash-stable.
    """
    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    mid_hi = (n / 2 + 1).cast("int")  # 1-based upper-middle index
    mid_lo = ((n + 1) / 2).cast("int")  # equals mid_hi when n is odd
    med = (F.element_at(vals, mid_lo) + F.element_at(vals, mid_hi)) / 2
    return e.select(
        "event_id",
        "event_type",
        F.round(med, 6).alias("roll_median"),
    )


@query(
    "window_running_distinct_users",
    oracle="""
    WITH flagged AS (
      SELECT event_id, event_type, ts,
             CASE WHEN row_number() OVER (
                 PARTITION BY event_type, user_id ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, event_type,
           sum(first_seen) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS distinct_users_so_far
    FROM flagged
    """,
    tags=("window", "events"),
)
def window_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT user_id) per event type — DISTINCT is
    illegal inside a window frame in every engine, so it is composed
    as a first-occurrence flag (row_number over (type, user)) summed
    cumulatively. Two window passes, each O(1) state per row.

    Scale: pass 1 shuffles on (event_type, user_id), pass 2 on
    event_type — the second reuses nothing from the first, but both
    are single-key hash exchanges; no collect_set O(n)-state frame,
    which is the naive trap at 100 TB (a per-frame set of every user
    seen so far).
    """
    e = T(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.sum("first_seen").over(w_run).alias("distinct_users_so_far"),
    )


@query(
    "events_pattern_detect",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2,
             lead(CAST(ts AS TIMESTAMP), 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS start_event_id,
           epoch_us(ts2) - epoch_us(ts) AS span_us
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND epoch_us(ts2) - epoch_us(ts) <= 1800 * 1000000
    """,
    tags=("events", "window", "funnel"),
)
def events_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection: strictly consecutive
    view → click → purchase per user within 30 minutes — the
    MATCH_RECOGNIZE / CEP use case expressed as lead() projections so
    the whole match runs in ONE window pass (no self-joins).

    Scale: one shuffle on user_id; each row carries O(pattern length)
    lookahead state. The self-join formulation (events e1 JOIN e2
    JOIN e3 ON adjacency) would be three shuffles and quadratic on
    hot users; lead() is linear and skew-immune.
    """
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    span = F.unix_micros("ts2") - F.unix_micros("ts")
    return seq.where(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (span <= 1800 * 1_000_000)
    ).select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        span.alias("span_us"),
    )


@query(
    "sql_pivot_clause",
    oracle="""
    SELECT n_name,
           CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
           CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
           CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium,
           CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS low
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "pivot", "agg"),
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause end-to-end: order-priority counts per
    nation, rotated to columns. The oracle states the equivalent
    conditional aggregation — exactly what Catalyst rewrites PIVOT
    into, so the hash match proves the rewrite.

    Scale: PIVOT with explicit IN values is a single hash aggregate
    (no second shuffle, no distinct-values pre-pass that an implicit
    pivot would need); nation/customer joins broadcast under AQE.
    """
    for name in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT n_name, o_orderpriority
          FROM v_orders
          JOIN v_customer ON o_custkey = c_custkey
          JOIN v_nation ON c_nationkey = n_nationkey
        )
        PIVOT (
          count(1) AS cnt
          FOR o_orderpriority IN (
            '1-URGENT' AS urgent, '2-HIGH' AS high,
            '3-MEDIUM' AS medium, '5-LOW' AS low
          )
        )
        """
    )
