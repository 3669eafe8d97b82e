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
    import numpy as np

    K = 16
    e = T(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", *[F.col("embedding")[i].cast("double").alias(f"d{i}") for i in range(K)]
    )
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
    W = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 1e-12))) @ vecs.T  # ZCA
    W_lit = F.lit([[float(x) for x in row] for row in W])
    mu_lit = F.lit([float(x) for x in mu])
    centered = F.array(*[F.col(f"d{i}") - F.element_at(mu_lit, i + 1) for i in range(K)])
    whitened = F.transform(
        W_lit,
        lambda row: F.aggregate(
            F.zip_with(row, centered, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
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
