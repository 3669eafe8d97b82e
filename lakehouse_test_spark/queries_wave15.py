"""Round-3 wave M: deterministic subsample bootstrap CIs and
data-freshness SLA auditing. Oracle hash-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "stats_subsample_ci",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS x
      FROM orders GROUP BY 1
    ), reps AS (
      SELECT b.b,
             CAST(sum(x) AS DOUBLE) / count(*) AS rep_mean
      FROM daily, LATERAL (SELECT unnest(generate_series(1, 200)) AS b) b
      WHERE CAST(CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '|' ||
                 CAST(b.b AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
            / 4294967296.0 < 0.5
      GROUP BY b.b
    ), point AS (
      SELECT CAST(sum(x) AS DOUBLE) / count(*) AS mean_daily_rev FROM daily
    )
    SELECT round((SELECT mean_daily_rev FROM point), 2) AS mean_daily_rev,
           round(quantile_cont(rep_mean, 0.025), 2) AS ci_lo,
           round(quantile_cont(rep_mean, 0.975), 2) AS ci_hi,
           CAST(count(*) AS BIGINT) AS n_replicates
    FROM reps
    """,
    tags=("stats", "bootstrap", "sampling"),
)
def stats_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsample bootstrap confidence interval for mean daily revenue:
    200 half-sample replicates whose membership is decided by a hash
    of (day, replicate) — fully deterministic, engine-portable
    resampling (no RNG state), CI from the 2.5/97.5 exact percentiles
    of the replicate means. The error-bar machinery every metrics
    platform needs, reproducible across reruns and engines.

    Scale: replication happens on the AGGREGATED day grain (bounded
    rows × 200 — never the fact table); each replicate mean uses
    decimal-exact sums; the percentile runs over 200 values.
    """
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("x"))
    reps = spark.range(1, 201).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("d").cast("string"), F.lit("|"), F.col("b").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    rep_means = (
        daily.join(F.broadcast(reps))
        .where(u < 0.5)
        .groupBy("b")
        .agg((F.sum("x").cast("double") / F.count(F.lit(1))).alias("rep_mean"))
    )
    point = daily.agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 2).alias("mean_daily_rev")
    )
    ci = rep_means.agg(
        F.round(F.expr("percentile(rep_mean, 0.025)"), 2).alias("ci_lo"),
        F.round(F.expr("percentile(rep_mean, 0.975)"), 2).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
    )
    return point.join(F.broadcast(ci)).select(
        "mean_daily_rev", "ci_lo", "ci_hi", "n_replicates"
    )


@query(
    "dq_freshness_sla",
    oracle="""
    WITH per_source AS (
      SELECT event_type,
             max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ), ref AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type, last_ts, n_events,
           CAST(date_diff('second', last_ts, now_ts) AS BIGINT) AS lag_seconds,
           date_diff('second', last_ts, now_ts) > 172800 AS sla_breach
    FROM per_source CROSS JOIN ref
    """,
    tags=("dq", "freshness", "events"),
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-freshness audit: each event source's latest
    arrival, its lag behind the newest data in the lake, and a 48-hour
    SLA breach flag — the staleness monitor every ingestion contract
    needs (the reference's counter-based progress reporting,
    re-expressed as a table-level SLA). The reference clock is
    max(ts) over the lake, so the audit is deterministic and
    engine-portable (a production run substitutes current_timestamp).

    Scale: one map-combinable max/count aggregate per source plus a
    broadcast of the single-row global max.
    """
    e = T(spark, sf_dir, "events")
    per_source = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    ref = e.agg(F.max("ts").alias("now_ts"))
    lag = F.unix_timestamp("now_ts") - F.unix_timestamp("last_ts")
    return per_source.join(F.broadcast(ref)).select(
        "event_type",
        "last_ts",
        "n_events",
        lag.cast("bigint").alias("lag_seconds"),
        (lag > 172800).alias("sla_breach"),
    )


def masked_view(df: DataFrame, policies: dict[str, str]) -> DataFrame:
    """Column-masking policy engine (governance layer): project a
    DataFrame with per-column masking policies applied —
    ``hash`` (md5, join-preserving pseudonymization), ``redact``
    (constant), ``last4`` (suffix-only reveal), ``bucket_1000``
    (numeric generalization). Unlisted columns pass through. Pure
    projection: zero shuffle, composes under any downstream query —
    the SELECT-rewrite that row/column security layers perform.
    """
    cols = []
    for c in df.columns:
        p = policies.get(c)
        if p is None:
            cols.append(F.col(c))
        elif p == "hash":
            cols.append(F.md5(F.col(c).cast("string")).alias(c))
        elif p == "redact":
            cols.append(F.lit("***").alias(c))
        elif p == "last4":
            cols.append(
                F.concat(F.lit("***"), F.substring(F.col(c).cast("string"), -4, 4)).alias(c)
            )
        elif p == "bucket_1000":
            cols.append(
                (F.floor(F.col(c) / 1000) * 1000).cast("double").alias(c)
            )
        else:
            raise ValueError(f"unknown masking policy {p!r} for column {c}")
    return df.select(*cols)


@query(
    "dq_column_masking",
    oracle="""
    SELECT md5(CAST(c_custkey AS VARCHAR)) AS c_custkey,
           concat('***', substr(c_name, length(c_name) - 3, 4)) AS c_name,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS c_acctbal,
           '***' AS c_nationkey
    FROM customer
    """,
    tags=("dq", "privacy", "governance"),
)
def dq_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven column masking over the customer table: keys
    pseudonymized (join-preserving md5), names suffix-revealed,
    balances generalized to 1000-buckets, nation redacted — the
    data-release projection that pairs with dq_k_anonymity (mask the
    identifiers, THEN check the quasi-identifier group sizes).
    """
    c = T(spark, sf_dir, "customer")
    return masked_view(
        c,
        {
            "c_custkey": "hash",
            "c_name": "last4",
            "c_acctbal": "bucket_1000",
            "c_nationkey": "redact",
        },
    )
