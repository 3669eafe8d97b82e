"""Round-3 wave G: text normalization, incremental dedup admission,
and embedding whitening (format roundtrips already live in
queries_wave3; this wave fills the remaining pre-processing gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "text_normalize_battery",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_md5,
           CAST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                AS BIGINT) AS norm_len,
           CAST(length(text) - length(regexp_replace(text, '[aeiouAEIOU]', '', 'g'))
                AS BIGINT) AS n_vowels,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word
    FROM documents
    """,
    tags=("text", "llm", "scalar"),
)
def text_normalize_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalization pre-pass every text pipeline runs before
    fingerprinting: lowercase → whitespace collapse → trim, plus
    regex extraction/counting — all codegen projections, zero
    shuffle, content-verified via md5 of the normalized form."""
    d = T(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("bigint").alias("norm_len"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[aeiouAEIOU]", ""))
        )
        .cast("bigint")
        .alias("n_vowels"),
        F.regexp_extract(F.col("text"), "^([a-z]+)", 1).alias("first_word"),
    )


@query(
    "dedup_incremental_admission",
    oracle="""
    WITH corpus AS (
      SELECT md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 10 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS batch_docs,
           CAST(sum(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS admitted,
           CAST(sum(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rejected
    FROM batch b LEFT JOIN (SELECT DISTINCT fp FROM corpus) c USING (fp)
    """,
    tags=("dedup", "llm", "incremental"),
)
def dedup_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup at ingest time: a new batch (every 10th doc,
    standing in for today's crawl) admits only docs whose fingerprint
    is absent from the existing corpus — the anti-join shape that
    keeps a 100 TB corpus duplicate-free WITHOUT re-deduping history:
    cost is O(batch) probe against the fingerprint table (broadcast
    the batch, or bucket both sides on fp at scale)."""
    d = T(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    corpus = d.where(F.col("doc_id") % 10 != 0).select(fp.alias("fp")).distinct()
    batch = d.where(F.col("doc_id") % 10 == 0).select("doc_id", fp.alias("fp"))
    admitted = batch.join(corpus, "fp", "left_anti")
    n_batch = batch.count()
    n_admitted = admitted.count()
    return spark.createDataFrame(
        [(n_batch, n_admitted, n_batch - n_admitted)],
        "batch_docs bigint, admitted bigint, rejected bigint",
    )


def _zca_matrix(base, K: int):
    """(mu, W): mean vector and ZCA whitening matrix of the first K
    dims — ONE map-side co-moment aggregate pass; 16×16 eigensolve on
    the driver (index-sized metadata, like IVF centroids)."""
    import numpy as np

    stats = base.agg(
        *[F.avg(f"d{i}").alias(f"m{i}") for i in range(K)],
        *[
            F.avg(F.col(f"d{i}") * F.col(f"d{j}")).alias(f"p_{i}_{j}")
            for i in range(K)
            for j in range(i, K)
        ],
    ).head()
    mu = np.array([stats[f"m{i}"] for i in range(K)])
    cov = np.zeros((K, K))
    for i in range(K):
        for j in range(i, K):
            cov[i, j] = cov[j, i] = stats[f"p_{i}_{j}"] - mu[i] * mu[j]
    vals, vecs = np.linalg.eigh(cov)
    W = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 1e-12))) @ vecs.T
    return mu, W


def _whiten_expr(mu, W, K: int):
    """Whitened-coordinates array expression from d0..d{K-1} columns."""
    W_lit = F.lit([[float(x) for x in row] for row in W])
    mu_lit = F.lit([float(x) for x in mu])
    centered = F.array(*[F.col(f"d{i}") - F.element_at(mu_lit, i + 1) for i in range(K)])
    return F.transform(
        W_lit,
        lambda row: F.aggregate(
            F.zip_with(row, centered, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


@query("embedding_whitening", oracle=None, tags=("embeddings", "llm", "ml"))
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening of the first 16 embedding dimensions: covariance
    via ONE map-side aggregate pass (256 co-moment aggregates),
    eigendecomposition driver-side (16×16 — index metadata, like
    IVF centroids), whitening matrix folded into the plan as a
    literal, applied as a pure projection. Output verifies the
    transform: per-dimension variance of the whitened data (should
    be ~1) and the max |off-diagonal| covariance (should be ~0) —
    the audit a retrieval pipeline runs before cosine-as-dot
    shortcuts. Rows-only gate (eigendecomposition has no SQL twin).
    """
    K = 16
    e = T(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", *[F.col("embedding")[i].cast("double").alias(f"d{i}") for i in range(K)]
    )
    mu, W = _zca_matrix(base, K)
    whitened = _whiten_expr(mu, W, K)
    wcols = base.select(
        *[F.element_at(whitened, i + 1).alias(f"w{i}") for i in range(K)]
    )
    audit = wcols.agg(
        *[F.round(F.var_pop(f"w{i}"), 4).alias(f"v{i}") for i in range(K)],
        *[
            F.avg(F.col(f"w{i}") * F.col(f"w{j}")).alias(f"c_{i}_{j}")
            for i in range(K)
            for j in range(i + 1, K)
        ],
    ).head()
    max_off = max(abs(audit[f"c_{i}_{j}"]) for i in range(K) for j in range(i + 1, K))
    rows = [(i, float(audit[f"v{i}"]), round(float(max_off), 4)) for i in range(K)]
    return spark.createDataFrame(
        rows, "dim int, whitened_variance double, max_abs_offdiag_cov double"
    )


@query("embedding_outliers_mahalanobis", oracle=None, tags=("embeddings", "llm", "ml", "anomaly"))
def embedding_outliers_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scan: Mahalanobis distance (= L2 norm
    in ZCA-whitened coordinates) of every vector's first 16 dims
    against the corpus distribution, top-10 most anomalous — the
    statistically-calibrated version of 'find the weird embeddings'
    (distance² is χ²(16) under normality, so thresholds transfer
    across corpora). Same cost shape as the whitening audit: one
    aggregate pass for (μ, Σ), then a pure projection. Rows-only
    gate (driver-side eigensolve)."""
    K = 16
    e = T(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", *[F.col("embedding")[i].cast("double").alias(f"d{i}") for i in range(K)]
    )
    mu, W = _zca_matrix(base, K)
    whitened = _whiten_expr(mu, W, K)
    d2 = F.aggregate(whitened, F.lit(0.0), lambda acc, v: acc + v * v)
    return (
        base.select("vec_id", F.round(F.sqrt(d2), 4).alias("mahalanobis"))
        .orderBy(F.desc("mahalanobis"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "marketing_attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT p.event_id, p.value, o.o_orderpriority,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM p
      JOIN orders o
        ON o.o_custkey = p.user_id AND o.o_orderdate <= p.ts
    )
    SELECT o_orderpriority AS prior_order_priority,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS attributed_value
    FROM j WHERE rn = 1
    GROUP BY o_orderpriority
    """,
    tags=("join", "asof", "events", "analytics"),
)
def marketing_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution across the fact tables: each purchase
    EVENT credits the customer's most recent prior ORDER (priority
    class as the "campaign" dimension), purchase value rolled up per
    class. Runs on the scalable union-sort as-of operator (one
    shuffle on the user key, no windowed self-join blowup); the
    oracle is the naive join+row_number SQL — fine at sf0.01,
    quadratic-ish at 100 TB, which is the point of the operator.
    Decimal-cast value keeps the rollup order-exact.
    """
    from lakehouse_test_spark.operators.joins import asof_join

    p = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        "value",
    )
    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_timestamp("o_orderdate").alias("t"),
        F.col("o_orderkey").alias("okey"),
        "o_orderpriority",
    )
    joined = asof_join(
        p,
        o,
        on="user_id",
        left_time="t",
        right_time="t",
        value_cols=["o_orderpriority"],
        right_tiebreak="okey",
    )
    return (
        joined.where(F.col("o_orderpriority").isNotNull())
        .groupBy(F.col("o_orderpriority").alias("prior_order_priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )
