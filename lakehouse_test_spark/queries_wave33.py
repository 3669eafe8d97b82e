"""Round-4 wave AG: ML evaluation metrics as distributed queries.

Model-eval at corpus scale is itself a data-engineering op: confusion
counts, calibration tables, and ranking quality are aggregations over
(label, score) or (rank, relevance) frames. Each query is hash-gated;
NDCG's irrational log weights enter BOTH engines as identical DECIMAL
literals, so the metric is bit-stable (exact, associative decimal
arithmetic) instead of trusting two libm implementations to agree.

The scores here are deterministic proxies from the fixtures (the
METRIC pipeline is the operator under test, not the model).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# confusion matrix + precision/recall/F1 at a threshold
# --------------------------------------------------------------------------


@query(
    "ml_confusion_threshold",
    oracle="""
    WITH scored AS (
      SELECT (l_returnflag = 'R') AS label,
             l_discount * 10 >= 0.5 AS pred
      FROM lineitem
    ), m AS (
      SELECT count(*) FILTER (WHERE label AND pred) AS tp,
             count(*) FILTER (WHERE NOT label AND pred) AS fp,
             count(*) FILTER (WHERE label AND NOT pred) AS fn,
             count(*) FILTER (WHERE NOT label AND NOT pred) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           CAST(round(tp * 1.0 / (tp + fp), 6) AS DOUBLE) AS precision,
           CAST(round(tp * 1.0 / (tp + fn), 6) AS DOUBLE) AS recall,
           CAST(round(2.0 * tp / (2 * tp + fp + fn), 6) AS DOUBLE) AS f1
    FROM m
    """,
    tags=("ml", "eval", "lineitem"),
)
def ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at threshold 0.5 over a
    deterministic score column — one conditional-count aggregate, the
    distributed half of every eval harness (the model call is
    upstream; the counting is the data op).

    Scale: single pass, 4 FILTER counts, map-side partials; nothing
    label-cardinality-sized is collected.
    """
    li = T(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").alias("label"),
        (F.col("l_discount") * 10 >= 0.5).alias("pred"),
    )
    m = li.agg(
        F.count(F.when(F.col("label") & F.col("pred"), 1)).alias("tp"),
        F.count(F.when(~F.col("label") & F.col("pred"), 1)).alias("fp"),
        F.count(F.when(F.col("label") & ~F.col("pred"), 1)).alias("fn"),
        F.count(F.when(~F.col("label") & ~F.col("pred"), 1)).alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6)
        .cast("double")
        .alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6)
        .cast("double")
        .alias("recall"),
        F.round(2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6)
        .cast("double")
        .alias("f1"),
    )


# --------------------------------------------------------------------------
# calibration (reliability) table
# --------------------------------------------------------------------------


@query(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT l_discount * 10 AS score,
             CAST(l_returnflag = 'R' AS INT) AS y
      FROM lineitem
    )
    SELECT LEAST(CAST(floor(score * 10) AS INT), 9) AS bin,
           count(*) AS n,
           CAST(round(sum(CAST(score AS DECIMAL(18,6))) / count(*), 6)
                AS DOUBLE) AS mean_score,
           CAST(round(sum(y) * 1.0 / count(*), 6) AS DOUBLE) AS frac_positive
    FROM scored GROUP BY 1
    """,
    tags=("ml", "eval", "calibration", "lineitem"),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: decile-binned score vs observed positive
    rate — the input to a calibration curve / ECE computation and the
    standard post-training diagnostic. Decimal-exact mean per bin.

    Scale: one bounded group-by (10 bins), map-side combine; the
    curve is O(bins) however large the eval set.
    """
    li = T(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") * 10).alias("score"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    return (
        li.groupBy(
            F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("score").cast("decimal(18,6)")) / F.count(F.lit(1)), 6
            )
            .cast("double")
            .alias("mean_score"),
            F.round(F.sum("y") / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("frac_positive"),
        )
    )


# --------------------------------------------------------------------------
# NDCG@5 with decimal-literal log weights
# --------------------------------------------------------------------------

_K = 5
#: 1/log2(pos+1) for pos 1..5, rounded to 12 decimals and injected as
#: DECIMAL literals into BOTH engines — exact, associative arithmetic
#: instead of two libm log2 implementations agreeing to the last ulp
_W = [round(1.0 / math.log2(p + 1), 12) for p in range(1, _K + 1)]


def _ndcg_weight_case(rank_col: str) -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN {rank_col} = {p} THEN CAST({w:.12f} AS DECIMAL(16,12))"
            for p, w in zip(range(1, _K + 1), _W)
        )
        + " ELSE CAST(0 AS DECIMAL(16,12)) END"
    )


@query(
    "ml_ndcg_at_k",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey,
             CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2 AS rel,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rnk,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY (CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2) DESC,
                        o_orderkey
             ) AS ideal_rnk
      FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             sum(CASE WHEN rel THEN {_ndcg_weight_case("rnk")}
                 ELSE CAST(0 AS DECIMAL(16,12)) END) AS dcg,
             sum(CASE WHEN rel THEN {_ndcg_weight_case("ideal_rnk")}
                 ELSE CAST(0 AS DECIMAL(16,12)) END) AS idcg
      FROM ranked WHERE rnk <= {_K} OR ideal_rnk <= {_K}
      GROUP BY o_custkey
    )
    SELECT count(*) AS n_customers,
           CAST(round(sum(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END)
                      / count(*), 6) AS DOUBLE) AS mean_ndcg_at_5
    FROM per_cust
    """,
    tags=("ml", "eval", "ranking", "orders"),
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean NDCG@5 of a price-ordered ranking against priority
    relevance, per customer then averaged — the ranking-eval op of
    every recsys/retrieval pipeline. The log-discount weights enter
    both engines as identical DECIMAL literals, making the metric
    exact and order-independent (associative decimal sums), not a
    cross-engine libm coin flip.

    Scale: two per-key window ranks (hash-shuffled on customer, no
    global sort), rows beyond position k drop BEFORE the aggregate,
    and the final mean is one tiny reduce.
    """
    o = T(spark, sf_dir, "orders")
    from pyspark.sql import Window

    rel = (F.substring("o_orderpriority", 1, 1).cast("int") <= 2).alias("rel")
    w_pred = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_ideal = Window.partitionBy("o_custkey").orderBy(
        F.col("rel").desc(), F.col("o_orderkey")
    )
    ranked = (
        o.select("o_custkey", "o_totalprice", "o_orderkey", rel)
        .withColumn("rnk", F.row_number().over(w_pred))
        .withColumn("ideal_rnk", F.row_number().over(w_ideal))
        .where((F.col("rnk") <= _K) | (F.col("ideal_rnk") <= _K))
    )
    wcase = F.expr(_ndcg_weight_case("rnk"))
    wcase_i = F.expr(_ndcg_weight_case("ideal_rnk"))
    zero = F.expr("CAST(0 AS DECIMAL(16,12))")
    per = ranked.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("rel"), wcase).otherwise(zero)).alias("dcg"),
        F.sum(F.when(F.col("rel"), wcase_i).otherwise(zero)).alias("idcg"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                    F.lit(0)
                )
            )
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("mean_ndcg_at_5"),
    )


# --------------------------------------------------------------------------
# cross-table reconciliation (the migration / replication check)
# --------------------------------------------------------------------------


@query(
    "dq_cross_table_reconciliation",
    oracle="""
    WITH src AS (
      SELECT CAST(o_orderkey % 8 AS INT) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM orders GROUP BY 1
    ), tgt AS (
      SELECT CAST(o_orderkey % 8 AS INT) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM orders WHERE NOT (o_orderkey % 97 = 0 AND o_orderkey % 2 = 0)
      GROUP BY 1
    )
    SELECT src.bucket,
           src.n AS src_rows, tgt.n AS tgt_rows,
           src.n - tgt.n AS missing_rows,
           CAST(round(src.s - tgt.s, 2) AS DOUBLE) AS value_drift,
           (src.n = tgt.n) AS reconciled
    FROM src JOIN tgt ON src.bucket = tgt.bucket
    """,
    tags=("dq", "reconciliation", "orders"),
)
def dq_cross_table_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-target reconciliation by hash bucket — count and
    decimal-exact value sums per bucket, with the drift localized to
    the buckets that lost rows. THE check after any 100 TB migration,
    replication, or format conversion: full-table equality is one
    shuffle each side at bucket granularity (here 8; thousands in
    production), and a mismatch points at 1/N of the data instead of
    'somewhere'. The gate's target deliberately drops a slice, so the
    query must localize the loss to exactly the right buckets.
    """
    o = T(spark, sf_dir, "orders")
    tgt_rows = o.where(~((F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 2 == 0)))

    def _sums(df: DataFrame):
        return df.groupBy(
            (F.col("o_orderkey") % 8).cast("int").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )

    src, tgt = _sums(o), _sums(tgt_rows)
    return (
        src.alias("src")
        .join(tgt.alias("tgt"), "bucket")
        .select(
            "bucket",
            F.col("src.n").alias("src_rows"),
            F.col("tgt.n").alias("tgt_rows"),
            (F.col("src.n") - F.col("tgt.n")).alias("missing_rows"),
            F.round(F.col("src.s") - F.col("tgt.s"), 2)
            .cast("double")
            .alias("value_drift"),
            (F.col("src.n") == F.col("tgt.n")).alias("reconciled"),
        )
    )


# --------------------------------------------------------------------------
# M4 time-series downsampling
# --------------------------------------------------------------------------


@query(
    "timeseries_m4_downsample",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS ts, value
      FROM events WHERE user_id <= 20
    )
    SELECT user_id,
           CAST(date_trunc('day', ts) AS DATE) AS bucket,
           min_by(value, ts) AS v_first,
           max_by(value, ts) AS v_last,
           min(value) AS v_min,
           max(value) AS v_max,
           count(*) AS n_points
    FROM e GROUP BY 1, 2
    """,
    tags=("timeseries", "downsample", "events"),
)
def timeseries_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (first/last/min/max per time bucket) — the
    error-free line-chart downsampling operator (Jugel et al., VLDB
    2014): those four points per pixel-bucket reproduce the exact
    rendered line at any zoom, collapsing millions of points to
    4×buckets.

    Scale: ONE hash aggregate with min_by/max_by — no window, no
    sort, map-side partials; this is the shape that lets a 100 TB
    series downsample in a single shuffle of 4-value partials.
    min_by/max_by tie-break identically in Spark and DuckDB here
    because event timestamps are unique per user in the fixture.
    """
    e = T(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    ts = F.date_trunc("second", F.col("ts").cast("timestamp"))
    e = e.select("user_id", ts.alias("ts"), "value")
    return e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("bucket")
    ).agg(
        F.min_by("value", "ts").alias("v_first"),
        F.max_by("value", "ts").alias("v_last"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.count(F.lit(1)).alias("n_points"),
    )
