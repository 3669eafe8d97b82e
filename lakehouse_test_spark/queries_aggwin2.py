"""Extended aggregate + window battery (SURVEY.md §2b): ordered-
statistics (median/percentiles), correlation/covariance, arg-min/max,
boolean/conditional aggregates, array & string aggregation, and the
analytic window functions the first wave didn't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           CAST(round(median(o_totalprice), 4) AS DOUBLE) AS median_price,
           CAST(round(quantile_cont(o_totalprice, 0.25), 4) AS DOUBLE) AS p25_price,
           CAST(round(quantile_cont(o_totalprice, 0.90), 4) AS DOUBLE) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ordered statistics (median / p25 / p90, linear
    interpolation — Spark ``percentile`` ≡ DuckDB ``quantile_cont``).

    Scale note: exact percentiles buffer per-group values; at 100 TB
    swap to ``approx_percentile`` (t-digest, mergeable sketch) — see
    agg_approx_sketches for that path.
    """
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90_price"),
    )


@query("agg_approx_sketches", oracle=None, tags=("agg", "approx", "sketch"))
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregates — the 100 TB path for distincts and
    percentiles: HLL++ (approx_count_distinct) and t-digest
    (approx_percentile). Rows-only: sketch internals are
    implementation-specific, no DuckDB twin; determinism holds for a
    fixed input+config, asserted by the driver's stable-rows check.
    """
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_median_price"),
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS qty_price_corr,
           CAST(round(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS qty_price_covar,
           CAST(round(var_samp(l_discount), 8) AS DOUBLE) AS discount_var
    FROM lineitem
    """,
    tags=("agg", "stats"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr/covar/variance) in one pass."""
    li = T(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.var_samp("l_discount"), 8).alias("discount_var"),
    )


@query(
    "agg_argmin_argmax",
    oracle="""
    SELECT o_orderstatus,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           arg_max(o_custkey, o_totalprice) AS priciest_customer
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "argminmax"),
)
def agg_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/max aggregates (min_by/max_by). o_totalprice values are
    distinct enough at every SF that ties cannot make this ambiguous."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.max_by("o_custkey", "o_totalprice").alias("priciest_customer"),
    )


@query(
    "agg_bool_and_conditional",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_acctbal > 9000)   AS any_rich,
           count(*) FILTER (WHERE c_acctbal < 0) AS n_debtors,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))) FILTER (WHERE c_acctbal > 0), 2) AS DOUBLE) AS positive_balance
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "boolean"),
)
def agg_bool_and_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates + FILTER-clause conditional aggregation."""
    c = T(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_debtors"),
        dround(dsum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), 2).alias(
            "positive_balance"
        ),
    )


@query(
    "agg_distinct_sums",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(DISTINCT l_quantity), 2) AS DOUBLE) AS sum_distinct_qty,
           CAST(round(avg(DISTINCT l_quantity), 4) AS DOUBLE) AS avg_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT-qualified sums/averages (dedup-then-agg expansion)."""
    li = T(spark, sf_dir, "lineitem")
    d = li.select("l_returnflag", "l_quantity").distinct()
    return d.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_distinct_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_distinct_qty"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
           CAST(len(list(n_name)) AS INTEGER) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "array"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list) made deterministic by sorting
    before serialization — collection order is partition-dependent,
    sorted output is not."""
    n = T(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.size(F.collect_list("n_name")).cast("int").alias("n_nations"),
    )


@query(
    "agg_deterministic_mode",
    oracle="""
    SELECT o_orderstatus, priority AS top_priority, cnt AS top_priority_count
    FROM (
      SELECT o_orderstatus, o_orderpriority AS priority, count(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
    tags=("agg", "mode"),
)
def agg_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a deterministic tiebreak (built-in ``mode()`` picks
    ties arbitrarily — count+rank makes the answer engine-stable)."""
    o = T(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("priority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("priority").alias("top_priority"),
            F.col("cnt").alias("top_priority_count"),
        )
    )


@query(
    "window_analytic_battery",
    oracle="""
    SELECT p_partkey, p_brand,
           first_value(p_partkey) OVER w_run AS cheapest_in_brand,
           nth_value(p_partkey, 2) OVER w_run AS second_cheapest,
           CAST(round(percent_rank() OVER w_rank, 6) AS DOUBLE) AS price_pct_rank,
           CAST(round(cume_dist() OVER w_rank, 6) AS DOUBLE) AS price_cume_dist
    FROM part
    WINDOW w_run AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_rank AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    tags=("window",),
)
def window_analytic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / percent_rank / cume_dist battery.

    Rank-family functions (percent_rank/cume_dist) require their
    default frame, so they get a frameless window; first/nth_value
    run on an explicit running ROWS frame.
    """
    p = T(spark, sf_dir, "part")
    w_run = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        F.first("p_partkey").over(w_run).alias("cheapest_in_brand"),
        F.nth_value("p_partkey", 2).over(w_run).alias("second_cheapest"),
        F.round(F.percent_rank().over(w_rank), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w_rank), 6).alias("price_cume_dist"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, t,
           count(*) OVER (PARTITION BY user_id ORDER BY t
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS events_last_hour
    FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events)
    """,
    tags=("window", "range", "events"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over numeric event time: per-user trailing-hour
    event counts (value-based frame, not row-based)."""
    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t").rangeBetween(-3600, 0)
    return e.select(
        "event_id", "user_id", "t", F.count(F.lit(1)).over(w).alias("events_last_hour")
    )


@query(
    "window_lag_default_offset",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey, 2, CAST(-1 AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_2_back,
           lead(o_orderkey, 3, CAST(-1 AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_3_ahead
    FROM orders
    """,
    tags=("window",),
)
def window_lag_default_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with multi-row offsets and non-null defaults."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 2, -1).over(w).alias("order_2_back"),
        F.lead("o_orderkey", 3, -1).over(w).alias("order_3_ahead"),
    )


@query(
    "filter_predicate_battery",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY')
      AND p_name LIKE '%a%'
      AND p_name NOT LIKE 'z%'
      AND p_size BETWEEN 10 AND 40
      AND p_retailprice IS NOT NULL
      AND (p_brand = 'Brand#5' OR p_size % 2 = 0)
    """,
    tags=("filter",),
)
def filter_predicate_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: IN / LIKE / NOT LIKE / BETWEEN / IS NOT
    NULL / OR — all pushable or codegen'd."""
    p = T(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_name").like("%a%")
        & ~F.col("p_name").like("z%")
        & F.col("p_size").between(10, 40)
        & F.col("p_retailprice").isNotNull()
        & ((F.col("p_brand") == "Brand#5") | (F.col("p_size") % 2 == 0))
    ).select("p_partkey", "p_name")
