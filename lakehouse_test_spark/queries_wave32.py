"""Round-4 wave AF: ML feature-engineering ops for training pipelines.

The feature-prep stage between curated data and a trainer — encoders,
the hashing trick, scaler fits, and vocabulary coverage — each as a
hash-gated query with an exact SQL twin (portable md5-derived hashes
where hashing is intrinsic, decimal-exact moments where floats would
drift across engines).

Reference parity: extends §2b's "pandas_udf for vectorized custom
ops (UDF/UDAF surface)" mandate with the JVM-side feature-prep
battery a 100 TB training pipeline runs before the UDF stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# smoothed target encoding
# --------------------------------------------------------------------------


@query(
    "ml_target_encoding",
    oracle="""
    WITH g AS (
      SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                    / count(*), 6) AS DOUBLE) AS gmean
      FROM customer
    ), seg AS (
      SELECT c_mktsegment, count(*) AS n_rows,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_rows,
           CAST(round((s + 10 * gmean) / (n_rows + 10), 4) AS DOUBLE)
             AS target_enc
    FROM seg, g
    """,
    tags=("ml", "features", "encoding", "customer"),
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column —
    ``enc = (Σ target + m·global_mean) / (n + m)`` with m=10, the
    leakage-resistant categorical encoder for tree/linear models.

    Scale: one partial-aggregated group-by plus a BROADCAST of the
    1-row global mean — no second data pass, no window. Rare
    categories shrink toward the global mean exactly as the formula
    dictates, which is the point of the smoothing term.
    """
    c = T(spark, sf_dir, "customer")
    g = F.broadcast(
        c.agg(
            F.round(
                dsum(F.col("c_acctbal")) / F.count(F.lit(1)), 6
            ).cast("double").alias("gmean")
        )
    )
    seg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("c_acctbal")).cast("double").alias("s"),
    )
    return seg.crossJoin(g).select(
        "c_mktsegment",
        "n_rows",
        F.round(
            (F.col("s") + 10 * F.col("gmean")) / (F.col("n_rows") + 10), 4
        ).cast("double").alias("target_enc"),
    )


# --------------------------------------------------------------------------
# the hashing trick (feature hashing)
# --------------------------------------------------------------------------


@query(
    "ml_feature_hashing",
    oracle="""
    WITH toks AS (
      SELECT p_partkey, unnest(string_split_regex(lower(p_type), '\\s+')) AS tok
      FROM part
    ), hashed AS (
      SELECT tok,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 32 AS bucket
      FROM toks
    )
    SELECT bucket, count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct_tokens
    FROM hashed GROUP BY bucket
    """,
    tags=("ml", "features", "hashing", "part"),
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: project an unbounded token vocabulary onto
    a fixed 32-bucket feature space with a PORTABLE hash (md5 hex →
    60-bit int, bit-identical in Spark and DuckDB — same idiom as the
    KMV gate), so the bucket histogram itself is hash-checked.

    Scale: feature hashing is THE encoder that needs no fitted
    vocabulary — no dictionary build, no broadcast, no OOV handling;
    one projection + one bounded group-by (32 groups) regardless of
    corpus size. Collisions are the accepted trade (here visible as
    n_distinct_tokens > 1 per bucket).
    """
    p = T(spark, sf_dir, "part")
    toks = p.select(
        F.explode(F.split(F.lower("p_type"), r"\s+")).alias("tok")
    )
    hashed = toks.select(
        "tok",
        (
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint") % 32
        ).alias("bucket"),
    )
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
    )


# --------------------------------------------------------------------------
# scaler fit (the params a Standard/MinMax/Robust scaler ships to training)
# --------------------------------------------------------------------------


@query(
    "ml_scaler_fit",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             min(l_extendedprice) AS mn,
             max(l_extendedprice) AS mx,
             sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS s1,
             sum(CAST(l_extendedprice AS DECIMAL(28,8))
                 * CAST(l_extendedprice AS DECIMAL(28,8))) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, mn, mx,
           CAST(round(s1 / n, 4) AS DOUBLE) AS mean_price,
           CAST(round((s2 - s1 * s1 / n) / (n - 1), 4) AS DOUBLE)
             AS var_price
    FROM m
    """,
    tags=("ml", "features", "scaling", "lineitem"),
)
def ml_scaler_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group scaler FIT — min/max (MinMaxScaler), mean/variance
    (StandardScaler) — computed from DECIMAL power sums so the fitted
    parameters are bit-identical across engines (a float stddev would
    drift below the hash gate's rounding).

    Scale: one partial-aggregated pass; the `transform` half of the
    scaler is then a pure per-row projection against these few
    broadcast rows. Welford-style streaming moments are equivalent;
    power sums in decimal are exact AND associative, which is what a
    distributed partial aggregate needs.
    """
    li = T(spark, sf_dir, "lineitem")
    d = F.col("l_extendedprice").cast("decimal(28,8)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"),
    )
    return m.select(
        "l_returnflag",
        "n",
        "mn",
        "mx",
        F.round(F.col("s1") / F.col("n"), 4).cast("double").alias("mean_price"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1),
            4,
        )
        .cast("double")
        .alias("var_price"),
    )


# --------------------------------------------------------------------------
# vocabulary coverage / OOV rate of a held-out split
# --------------------------------------------------------------------------


@query(
    "ml_oov_rate",
    oracle="""
    WITH train_vocab AS (
      SELECT DISTINCT unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents WHERE doc_id % 10 < 8
    ), val_toks AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT count(*) AS n_val_tokens,
           count(*) FILTER (
             WHERE tok NOT IN (SELECT tok FROM train_vocab)
           ) AS n_oov,
           CAST(CASE WHEN count(*) = 0 THEN NULL
                ELSE round(count(*) FILTER (
                       WHERE tok NOT IN (SELECT tok FROM train_vocab)
                     ) * 1.0 / count(*), 6) END AS DOUBLE) AS oov_rate
    FROM val_toks
    """,
    tags=("ml", "llm", "vocab", "documents"),
)
def ml_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate of the held-out split against the
    training split's vocabulary — the coverage number that decides
    tokenizer vocab size and flags train/val distribution drift.

    Scale: the train vocabulary is DISTINCT tokens (bounded by the
    vocabulary, not the corpus — Heaps' law), so the membership test
    is a broadcast-friendly anti-join of val tokens against a small
    distinct set; no O(corpus × corpus) anything.
    """
    d = T(spark, sf_dir, "documents")
    toks = lambda df: df.select(  # noqa: E731
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    train_vocab = toks(d.where(F.col("doc_id") % 10 < 8)).distinct()
    val = toks(d.where(F.col("doc_id") % 10 >= 8))
    flagged = val.join(
        train_vocab.withColumn("__in_vocab", F.lit(1)), "tok", "left"
    )
    n = F.count(F.lit(1))
    n_oov = F.count(F.when(F.col("__in_vocab").isNull(), 1))
    return flagged.agg(
        n.alias("n_val_tokens"),
        n_oov.alias("n_oov"),
        # empty held-out split (degenerate corpora): rate is NULL,
        # never an ANSI divide-by-zero
        F.when(n > 0, F.round(n_oov / n, 6))
        .cast("double")
        .alias("oov_rate"),
    )
