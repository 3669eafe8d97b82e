"""Round-3 wave L: privacy (k-anonymity / l-diversity), optimizer-
style join-cardinality estimation from key samples, and record-
linkage blocking quality. All oracle hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "dq_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS sens
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT sens) AS BIGINT) AS l_diversity,
           count(*) < 10 AS below_k10
    FROM qi GROUP BY c_nationkey, c_mktsegment
    """,
    tags=("dq", "privacy"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit before a dataset release: every
    quasi-identifier group (nation × market segment) with its size
    (k) and the number of distinct sensitive values it exposes (l —
    balance band here). Groups below k=10 are re-identification
    risks; l=1 groups leak the sensitive attribute outright. The
    generalize-and-recheck loop every privacy review runs.

    Scale: one map-combinable aggregate over the QI columns —
    count + small exact distinct per group; swap approx_count_distinct
    for l at extreme sensitive-domain sizes.
    """
    c = T(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct("sens").cast("bigint").alias("l_diversity"),
        )
        .withColumn("below_k10", F.col("group_size") < 10)
    )


@query(
    "stats_join_cardinality_estimate",
    oracle="""
    WITH sampled_keys AS (
      SELECT o_orderkey FROM orders
      WHERE CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
                 AS BIGINT) % 16 = 0
    ), sample_join AS (
      SELECT count(*) AS c
      FROM lineitem l JOIN sampled_keys s ON l.l_orderkey = s.o_orderkey
    ), true_join AS (
      SELECT count(*) AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(sj.c AS BIGINT) AS sampled_rows,
           CAST(sj.c * 16 AS BIGINT) AS estimated_rows,
           CAST(tj.c AS BIGINT) AS true_rows,
           round(abs(sj.c * 16.0 - tj.c) / tj.c, 4) AS rel_error
    FROM sample_join sj CROSS JOIN true_join tj
    """,
    tags=("stats", "optimizer", "sampling"),
)
def stats_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by CORRELATED KEY SAMPLING — the
    optimizer-statistics technique: hash-sample 1/16 of the JOIN KEYS
    (not rows — row sampling breaks join estimates because matching
    rows must be kept together), count the join restricted to those
    keys, scale by 16. Unbiased for key-partitioned joins; reported
    against ground truth with the realized relative error.

    Scale: the sampled probe touches 1/16 of the join; the hash
    predicate pushes into both scans. This is how you cost a 100 TB
    join before running it.
    """
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    keyhash = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    sampled = o.where(keyhash % 16 == 0).select("o_orderkey")
    sj = (
        li.join(sampled, li.l_orderkey == sampled.o_orderkey)
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("c").cast("bigint").alias("sampled_rows"),
            (F.col("c") * 16).cast("bigint").alias("estimated_rows"),
        )
    )
    tj = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_rows"))
    )
    return (
        sj.join(F.broadcast(tj))
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("estimated_rows").cast("double") - F.col("true_rows"))
                / F.col("true_rows"),
                4,
            ),
        )
    )


@query(
    "linkage_blocking_quality",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 8) AS block_key
      FROM documents
    ), true_pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j,
             a.block_key = b.block_key AS same_block
      FROM norm a JOIN norm b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ), cand AS (
      SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_candidates
      FROM (SELECT count(*) AS n FROM norm GROUP BY block_key)
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_recs FROM norm
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
           CAST(sum(CASE WHEN same_block THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_in_block,
           round(sum(CASE WHEN same_block THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS pair_completeness,
           (SELECT n_candidates FROM cand) AS n_candidate_pairs,
           round(1.0 - (SELECT n_candidates FROM cand) * 1.0
                 / ((SELECT n_recs FROM tot) * ((SELECT n_recs FROM tot) - 1) / 2), 6)
             AS reduction_ratio
    FROM true_pairs
    """,
    tags=("dedup", "linkage", "eval"),
)
def linkage_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking evaluation: against ground-truth
    duplicate pairs (identical normalized fingerprints), measure the
    prefix-blocking scheme's PAIR COMPLETENESS (recall: true pairs
    that share a block) and REDUCTION RATIO (1 − candidates/all-
    pairs) — THE two numbers that justify any blocking scheme before
    a 100 TB linkage run, computed without materializing the
    candidate pairs (sum n·(n−1)/2 over block sizes).

    Scale: two aggregates (per-block sizes, fingerprint groups); the
    true-pair join is bounded by the duplicate rate, never all-pairs.
    """
    d = T(spark, sf_dir, "documents")
    normed = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    norm = d.select(
        "doc_id",
        F.md5(normed).alias("fp"),
        F.substring(normed, 1, 8).alias("block_key"),
    )
    a = norm.select(F.col("doc_id").alias("i"), F.col("fp"), F.col("block_key").alias("bi"))
    b = norm.select(F.col("doc_id").alias("j"), F.col("fp"), F.col("block_key").alias("bj"))
    true_pairs = a.join(b, "fp").where(F.col("i") < F.col("j")).select(
        (F.col("bi") == F.col("bj")).alias("same_block")
    )
    cand = (
        norm.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("n_candidate_pairs"))
    )
    tot = norm.agg(F.count(F.lit(1)).cast("bigint").alias("n_recs"))
    stats = true_pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"),
        F.sum(F.when(F.col("same_block"), 1).otherwise(0)).cast("bigint").alias(
            "n_true_in_block"
        ),
    )
    return (
        stats.join(F.broadcast(cand))
        .join(F.broadcast(tot))
        .select(
            "n_true_pairs",
            "n_true_in_block",
            F.round(
                F.col("n_true_in_block") * F.lit(1.0) / F.col("n_true_pairs"), 6
            ).alias("pair_completeness"),
            "n_candidate_pairs",
            F.round(
                F.lit(1.0)
                - F.col("n_candidate_pairs")
                * F.lit(1.0)
                / (F.col("n_recs") * (F.col("n_recs") - 1) / 2),
                6,
            ).alias("reduction_ratio"),
        )
    )
