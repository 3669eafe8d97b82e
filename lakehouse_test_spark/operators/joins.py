"""Join patterns Spark SQL lacks as built-ins: as-of join and binned
range join — implemented as compositions of DataFrame ops (no UDFs).

As-of join (trades/quotes pattern): vanilla Spark has no ASOF JOIN;
the naive left-join + row_number explodes (every left row × all
earlier right rows) at scale. We use the union-sort construction:
tag both streams, union, and take a running "last known right value"
window per key — ONE shuffle on the key, O(n log n) within
partitions, no pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per ``on`` key; NULLs when none.

    Construction: tag right rows is_right=1, left rows 0; union on
    (key, time, is_right, tiebreak); last(value, ignoreNulls) over an
    unbounded-preceding window ordered so right rows at time t sort
    *before* left rows at t (inclusive semantics) and same-time right
    rows resolve by the tiebreak. Left rows then carry the latest
    right value, and we filter back to left rows only.

    Scale: single hash shuffle on the key; per-partition sort; zero
    row amplification. Skewed keys → AQE or pre-salting.
    """
    tb = right_tiebreak or right_time
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),  # right sorts first at equal time
        F.col(tb).alias("__tb"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    lcols = left.columns
    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__v"].dataType).alias("__v"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    unioned = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = unioned.withColumn("__asof", F.last("__v", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    out = joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__asof.{c}").alias(c) for c in value_cols],
    )
    return out


@query(
    "join_asof_events",
    oracle="""
    WITH c AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
               FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS pid, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                      value FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.event_id, c.user_id, p.value,
                      row_number() OVER (PARTITION BY c.event_id
                                         ORDER BY p.t DESC, p.pid DESC) AS rn
               FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.t <= c.t)
    SELECT event_id, user_id,
           CAST(round(value, 4) AS DOUBLE) AS last_purchase_value
    FROM j WHERE rn = 1
    """,
    tags=("join", "asof", "events"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the value of the user's most recent
    purchase at-or-before the click (ties → highest event_id).

    Spark side runs the scalable union-sort asof_join operator; the
    oracle uses the naive join+row_number SQL (fine at sf0.01, which
    is exactly why the operator exists for 100 TB).
    """
    e = load_table(spark, sf_dir, "events").withColumn("t", F.unix_timestamp("ts"))
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "t")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "t", F.col("event_id").alias("pid"), F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="t",
        right_time="t",
        value_cols=["purchase_value"],
        right_tiebreak="pid",
    )
    return joined.select(
        "event_id", "user_id", F.round("purchase_value", 4).alias("last_purchase_value")
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Big-big interval join without a nested loop: bin the point side
    and explode each interval across the bins it overlaps, then
    equi-join on bin and filter the exact containment.

    Scale: turns O(|L|·|R|) into a hash join on bin ids; bin_width
    trades replication (intervals spanning many bins) against bucket
    selectivity. Both sides shuffle once.
    """
    lb = left.withColumn("__bin", F.floor(F.col(left_point) / bin_width).cast("bigint"))
    rb = right.withColumn(
        "__bins",
        F.sequence(
            F.floor(F.col(right_lo) / bin_width).cast("bigint"),
            F.floor(F.col(right_hi) / bin_width).cast("bigint"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    return lb.join(rb, "__bin").where(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    ).drop("__bin")


@query(
    "join_range_events_sessions",
    oracle="""
    WITH sessions AS (
      SELECT user_id AS s_user, CAST(floor(epoch(ts)) AS BIGINT) AS s_start,
             CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS s_end, event_id AS signup_id
      FROM events WHERE event_type = 'signup'
    ),
    clicks AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, s.signup_id
    FROM clicks c JOIN sessions s
      ON c.user_id = s.s_user AND c.t >= s.s_start AND c.t <= s.s_end
    """,
    tags=("join", "range", "events"),
)
def join_range_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join: clicks landing within 1 h of a
    signup by the same user (key + range → hash join with residual,
    not a nested loop)."""
    e = load_table(spark, sf_dir, "events").withColumn("t", F.unix_timestamp("ts"))
    sessions = e.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("t").alias("s_start"),
        (F.col("t") + 3600).alias("s_end"),
        F.col("event_id").alias("signup_id"),
    )
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "t")
    return clicks.join(
        sessions,
        (clicks.user_id == sessions.s_user)
        & (clicks.t >= sessions.s_start)
        & (clicks.t <= sessions.s_end),
    ).select("event_id", "user_id", "signup_id")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int = 8,
    spread_col: str = "event_id",
) -> DataFrame:
    """Skew-buster shuffle join: the big (left) side gets a
    deterministic salt from ``spread_col`` (pmod(hash), so retries
    re-salt identically), the small-but-not-broadcastable right side
    is exploded ``n_salt`` ways, and the join key becomes
    (on…, _salt) — one hot key now spreads across n_salt reducers.

    Use when the right side is too big to broadcast AND the join key
    is low-cardinality/skewed (AQE's skew splitter handles skewed
    *partitions*, but a single giant KEY still lands in one reducer
    without salting — this is the standing fix). Result set is
    provably identical to the unsalted join (oracle-checked by
    join_salted_skew).
    """
    l = left.withColumn("_salt", F.pmod(F.hash(F.col(spread_col)), F.lit(n_salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l.join(r.hint("shuffle_hash"), on + ["_salt"]).drop("_salt")


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
      SELECT * FROM (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                            ('signup', 5.0), ('error', 0.0))
             AS t(event_type, weight)
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,6)) * CAST(d.weight AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("join", "skew", "events"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key join done safely: events (only 5 distinct join keys —
    the pathological case where every row of a key lands on one
    reducer) joined to a per-type weight dim through ``salted_join``,
    then rolled up. The oracle runs the UNSALTED join — passing proves
    salting is result-invariant.

    Scale: without salting, a 100 TB events table with 5 event types
    puts ~20 TB through single reducers; with n_salt=8 the same join
    runs on 40 balanced keys. The dim explode costs n_salt × |dim|
    rows — nothing. (Broadcast would also work for THIS dim; the query
    pins the salted-shuffle shape for the case where it can't.)
    """
    from lakehouse_test_spark.fpsafe import dround

    e = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        ["event_type", "weight"],
    )
    joined = salted_join(e, dim, on=["event_type"], n_salt=8)
    wv = F.sum(
        F.col("value").cast("decimal(18,6)") * F.col("weight").cast("decimal(18,6)")
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(wv, 2).alias("weighted_value"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
             AS n_view_click,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
                AS BIGINT) AS n_full_funnel,
           CAST(round(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
                * 1.0 / nullif(count(t_view), 0), 4) AS DOUBLE) AS conversion
    FROM stages
    """,
    tags=("events", "funnel", "window"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view → click → purchase, counting users
    whose FIRST occurrence of each stage respects the order — the
    standard product-analytics conversion query.

    Scale: one shuffle (groupBy user_id) with conditional-min partial
    aggregation map-side; the stage ordering is then row-local. No
    self-joins, no windows over raw events — the naive 3-way self-join
    formulation shuffles the events table three times; this shuffles
    the per-user stage triple once.
    """
    e = load_table(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = e.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    full = (F.col("t_purchase") > F.col("t_click")) & (
        F.col("t_click") > F.col("t_view")
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(F.when(full, 1)).alias("n_full_funnel"),
        F.round(
            F.count(F.when(full, 1)).cast("double")
            / F.nullif(F.count("t_view"), F.lit(0)),
            4,
        ).alias("conversion"),
    )
