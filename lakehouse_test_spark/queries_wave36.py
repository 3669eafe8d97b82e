"""Round-6 wave AJ: preference-data construction + rank fusion.

Two pipeline shapes the modern (post-RLHF) training-data stack runs
that the registry lacked: building chosen/rejected PREFERENCE PAIRS
from a scored candidate pool (DPO/RLHF data prep), and RECIPROCAL
RANK FUSION of independent ranking signals (retrieval ensembling for
data selection). Both are single-aggregate / partitioned-window plans
— no global ordering, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "pipeline_preference_pairs",
    oracle="""
    WITH cand AS (
      SELECT user_id AS prompt_id, event_id AS cand_id, value AS score
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ), ranked AS (
      SELECT prompt_id, cand_id, score,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score DESC, cand_id DESC) AS rb,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score ASC, cand_id ASC) AS rw,
             count(*) OVER (PARTITION BY prompt_id) AS n_cand
      FROM cand
    ), pool AS (
      SELECT prompt_id,
             max(CASE WHEN rb = 1 THEN cand_id END) AS chosen_id,
             max(CASE WHEN rw = 1 THEN cand_id END) AS rejected_id,
             max(score) AS best, min(score) AS worst, max(n_cand) AS n_cand
      FROM ranked GROUP BY prompt_id
    )
    SELECT prompt_id, chosen_id, rejected_id,
           CAST(round(best - worst, 6) AS DOUBLE) AS margin
    FROM pool
    WHERE n_cand >= 2 AND best - worst > 0.5
    """,
    tags=("pipeline", "preference", "llm"),
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction from a scored candidate
    pool: per prompt (user analog), the best- and worst-scored
    candidates become (chosen, rejected), keeping only pairs whose
    score margin clears a threshold (weak pairs teach nothing). Ties
    break deterministically on candidate id — ``max_by``/``min_by``
    over a (score, id) struct, so both engines pick the same pair
    bit-for-bit.

    Scale: ONE hash aggregate on prompt_id (map-side partials, no
    window, no self-join, pairs never materialized beyond one row per
    prompt) — at 100 TB this is a single shuffle of the candidate
    pool, the minimum any grouping needs.
    """
    c = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("cand_id"),
        F.col("value").alias("score"),
    )
    key = F.struct(F.col("score"), F.col("cand_id"))
    pool = c.groupBy("prompt_id").agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.max_by(F.col("cand_id"), key).alias("chosen_id"),
        F.min_by(F.col("cand_id"), key).alias("rejected_id"),
        F.max("score").alias("best"),
        F.min("score").alias("worst"),
    )
    return (
        pool.where((F.col("n_cand") >= 2) & (F.col("best") - F.col("worst") > 0.5))
        .select(
            "prompt_id",
            "chosen_id",
            "rejected_id",
            F.round(F.col("best") - F.col("worst"), 6)
            .cast("double")
            .alias("margin"),
        )
    )


@query(
    "streaming_cdf_logical_names",
    oracle="""
    SELECT s_suppkey AS k,
           CAST(round(s_acctbal, 2) AS DOUBLE) AS bal_usd,
           'insert' AS _change_type,
           CAST(s_suppkey % 2 AS INTEGER) AS _commit_version
    FROM supplier
    """,
    tags=("streaming", "lakehouse", "cdf", "schema"),
)
def streaming_cdf_logical_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed replayed under the CURRENT LOGICAL schema
    (``logicalNames=true``): commit v0 was written BEFORE the rename
    (its files physically carry ``bal``), v1 after — the stream
    surfaces BOTH vintages as ``bal_usd``, so a consumer can join the
    feed against logical-schema snapshots without per-vintage mapping.
    The default physical-layout contract stays available (documented
    in sources/cdf_datasource.py).

    Scale: identical plan to streaming_cdf_source — one partition per
    file per micro-batch, Arrow batches, the rename applied per file
    at zero cost (a column-name swap on the RecordBatch schema)."""
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register
    from lakehouse_test_spark.streaming.jobs import _drain_to_memory

    register(spark)
    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.round("s_acctbal", 2).alias("bal"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfln_"))
    t.append(s.where(F.col("k") % 2 == 0).repartition(2))
    t.rename_column("bal", "bal_usd")
    t.append(
        s.where(F.col("k") % 2 == 1)
        .withColumnRenamed("bal", "bal_usd")
        .repartition(2)
    )
    stream = (
        spark.readStream.format("lakehouse_cdf")
        .option("path", str(t.path))
        .option("logicalNames", "true")
        .load()
        .drop("_commit_timestamp")  # wall-clock; gated elsewhere
    )
    return _drain_to_memory(stream, "append")


@query(
    "search_reciprocal_rank_fusion",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             n_chars,
             length(text) - length(replace(text, ' ', '')) AS n_spaces
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS r_len,
             row_number() OVER (PARTITION BY lang ORDER BY n_spaces DESC, doc_id) AS r_tok
      FROM scored
    ), fused AS (
      SELECT doc_id, lang,
             1.0 / (60 + r_len) + 1.0 / (60 + r_tok) AS rrf
      FROM ranked
    ), top AS (
      SELECT doc_id, lang, rrf,
             row_number() OVER (PARTITION BY lang ORDER BY rrf DESC, doc_id) AS rk
      FROM fused
    )
    SELECT lang, doc_id, rk AS fused_rank,
           CAST(round(rrf, 9) AS DOUBLE) AS rrf_score
    FROM top WHERE rk <= 5
    """,
    tags=("search", "ranking", "llm"),
)
def search_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion (RRF, k=60) of two independent ranking
    signals over the corpus — the standard ensembling step when a
    data-selection pipeline combines heterogeneous scorers (here: doc
    length and whitespace-token count, both deterministic). Top-5 per
    language by the fused score, ties on doc_id.

    Scale: every window PARTITIONS BY lang (bounded domain — never an
    Exchange SinglePartition over the corpus); within a language the
    rankings shuffle once on lang and sort locally. For a corpus where
    one language dominates, the hierarchical global_row_number
    (operators/ordering.py) is the drop-in per-signal replacement.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), " ", ""))
        ).alias("n_spaces"),
    )
    w_len = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w_tok = Window.partitionBy("lang").orderBy(F.desc("n_spaces"), F.asc("doc_id"))
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w_len).alias("r_len"),
        F.row_number().over(w_tok).alias("r_tok"),
    )
    fused = ranked.withColumn(
        "rrf",
        F.lit(1.0) / (F.lit(60) + F.col("r_len"))
        + F.lit(1.0) / (F.lit(60) + F.col("r_tok")),
    )
    w_top = Window.partitionBy("lang").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w_top))
        .where(F.col("rk") <= 5)
        .select(
            "lang",
            "doc_id",
            F.col("rk").alias("fused_rank"),
            F.round("rrf", 9).cast("double").alias("rrf_score"),
        )
    )
