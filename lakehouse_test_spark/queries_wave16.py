"""Round-3 wave N: event path mining, readability scoring, ABC
(Pareto) classification, and hard-negative mining for metric
learning. All oracle hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t1 || '>' || t2 AS path,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path LIMIT 20
    """,
    tags=("events", "paths", "analytics"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step behavioral path mining: the most common consecutive
    event-type triples across user streams — the n-gram
    generalization of events_transition_matrix (1-step) that product
    analytics "path explorer" views are built on.

    Scale: one shuffle on user_id, per-user ordered window (bounded
    by per-user event counts), then a map-combinable path rollup and
    a TakeOrdered — path cardinality is |event_types|³ at worst.
    """
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).where(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(20)
    )


@query(
    "text_readability_scores",
    oracle="""
    WITH stats AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(CASE WHEN n_words = 0 THEN 0.0 ELSE
             0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59 END, 4)
             AS fk_grade
    FROM stats
    """,
    tags=("text", "llm", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per document (vowel-group syllable
    heuristic, sentence split on terminal punctuation) — the
    readability axis of corpus quality filtering, complementing
    text_quality_scores/text_gopher_filters (a pretraining mix often
    targets a grade-level band).

    Scale: three regexp_extract_all counts per row — pure codegen
    projection, zero shuffle.
    """
    d = T(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syl = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0))
    fk = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.lit(0.39) * (n_words.cast("double") / n_sent)
        + F.lit(11.8) * (n_syl.cast("double") / n_words)
        - F.lit(15.59)
    )
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
        F.round(fk, 4).alias("fk_grade"),
    )


@query(
    "parts_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT CAST(sum(revenue) AS DOUBLE) AS total FROM rev),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS DOUBLE)
               AS cum_rev
      FROM rev
    )
    SELECT l_partkey,
           CAST(round(revenue, 2) AS DOUBLE) AS revenue,
           round(cum_rev / total, 6) AS cum_share,
           CASE WHEN cum_rev / total <= 0.7 THEN 'A'
                WHEN cum_rev / total <= 0.9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked CROSS JOIN tot
    """,
    tags=("agg", "analytics", "pareto"),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    cumulative-share classes A (top 70% of revenue), B (to 90%), C
    (tail) — the 80/20 workhorse behind assortment and stocking
    decisions (pareto_frontier_parts is the multi-objective skyline;
    this is the single-metric cumulative cut).

    Determinism: exact decimal revenue, cumulative sum over a total
    order (revenue DESC, partkey). Scale: the part grain GROWS with
    the catalog, so the cumulative sum is the HIERARCHICAL
    global_cumsum (range shuffle + per-partition offsets — no
    Exchange SinglePartition), bit-identical to the global window
    it replaces.
    """
    from lakehouse_test_spark.operators.ordering import global_cumsum

    li = T(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").cast("double").alias("total"))
    ranked = global_cumsum(
        rev, [F.desc("revenue"), "l_partkey"], "revenue", "cum_rev"
    ).withColumn("cum_rev", F.col("cum_rev").cast("double"))
    share = F.col("cum_rev") / F.col("total")
    return ranked.join(F.broadcast(tot)).select(
        "l_partkey",
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@query(
    "embedding_hard_negatives",
    oracle="""
    WITH anchors AS (
      SELECT vec_id AS a_id, label AS a_label, embedding AS a_emb
      FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 2000
    ), scored AS (
      SELECT a.a_id, a.a_label, e.label,
             sqrt(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(a.a_emb[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))
                    * (CAST(a.a_emb[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))),
               'sum')) AS dist
      FROM anchors a JOIN embeddings e ON e.vec_id <> a.a_id
    )
    SELECT a_id,
           round(min(CASE WHEN label = a_label THEN dist END), 6) AS d_positive,
           round(min(CASE WHEN label <> a_label THEN dist END), 6) AS d_hard_negative,
           min(CASE WHEN label <> a_label THEN dist END)
             - min(CASE WHEN label = a_label THEN dist END) < 0.1 AS margin_violated
    FROM scored GROUP BY a_id, a_label
    """,
    tags=("embedding", "llm", "ml", "mining"),
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for metric learning: per anchor, the
    nearest SAME-label distance (positive) and nearest OTHER-label
    distance (hard negative), flagging triplet-margin violations
    (d⁻ − d⁺ < 0.1) — the batch that contrastive/triplet training
    loops actually want, as a corpus query.

    Scale: the anchor set is BOUNDED (≤100 regardless of corpus
    size — the id cap; the probe caught the unbounded variant at
    16× wall-clock for 10× data because anchors×corpus is
    quadratic when both grow), broadcast against the corpus;
    per-pair distance is a sequential in-plan fold; the
    conditional-min rollup is map-combinable. At billions of vectors
    route candidate generation through the ANN index
    (similarity_index_*) and rerank exactly — same final operator.
    """
    e = T(spark, sf_dir, "embeddings")
    anchors = e.where((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2000)).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").cast("array<double>").alias("a_emb"),
    )
    pairs = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    ).join(F.broadcast(anchors), F.col("vec_id") != F.col("a_id"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("a_emb"), F.col("emb"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = pairs.select("a_id", "a_label", "label", dist.alias("dist"))
    d_pos = F.min(F.when(F.col("label") == F.col("a_label"), F.col("dist")))
    d_neg = F.min(F.when(F.col("label") != F.col("a_label"), F.col("dist")))
    return scored.groupBy("a_id", "a_label").agg(
        F.round(d_pos, 6).alias("d_positive"),
        F.round(d_neg, 6).alias("d_hard_negative"),
        ((d_neg - d_pos) < 0.1).alias("margin_violated"),
    ).drop("a_label")


@query(
    "format_avro_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(round(c_acctbal, 2) AS DOUBLE) AS c_acctbal
    FROM customer
    """,
    tags=("format", "avro", "codec"),
)
def format_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Avro wire path (op 20) under the oracle gate:
    every customer row is binary-encoded with OUR vectorized Avro
    codec (numpy bulk zigzag/varint, mapInArrow) and decoded back;
    the hash match against the raw table proves byte-exact
    serialization of long/string/double fields — the
    produce→consume identity as a first-class query, completing
    format_json_roundtrip / format_orc_roundtrip.

    Scale: Arrow-batched codec, zero shuffle — wire-speed per
    partition, same shape the Kafka sink/source uses.
    """
    from lakehouse_test_spark.sources.avro_codec import avro_roundtrip

    schema = {
        "type": "record",
        "name": "Customer",
        "fields": [
            {"name": "c_custkey", "type": "long"},
            {"name": "c_name", "type": "string"},
            {"name": "c_mktsegment", "type": "string"},
            {"name": "c_acctbal", "type": "double"},
        ],
    }
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    return avro_roundtrip(c, schema)


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), scored AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             abs(date_diff('second', c.ts, p.ts)) AS gap_s,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(date_diff('second', c.ts, p.ts)), c.event_id
             ) AS rn
      FROM p JOIN c ON c.user_id = p.user_id
      WHERE abs(date_diff('second', c.ts, p.ts)) <= 604800
    )
    SELECT purchase_id, click_id, CAST(gap_s AS BIGINT) AS gap_s
    FROM scored WHERE rn = 1
    """,
    tags=("join", "asof", "events"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with tolerance: each purchase
    pairs with the temporally closest click by the same user within
    ±7 days (ties broken on event id) — the pandas
    merge_asof(direction='nearest') semantics, completing the
    backward as-of operator (join_asof_events).

    Scale: one shuffle on user_id; the tolerance bounds the candidate
    window per purchase, and the per-purchase argmin is a window with
    WindowGroupLimit pushdown. A true giant-scale variant runs the
    union-sort construction twice (backward + forward) and takes the
    closer — same single-shuffle cost profile.
    """
    e = T(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    gap = F.abs(F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
    joined = p.join(c, (F.col("c_user") == F.col("p_user")) & (gap <= 604800)).select(
        "purchase_id", "click_id", gap.alias("gap_s")
    )
    w = Window.partitionBy("purchase_id").orderBy("gap_s", "click_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("purchase_id", "click_id", F.col("gap_s").cast("bigint").alias("gap_s"))
    )


@query(
    "corpus_quality_report",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ), toks AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t FROM base
    ), m AS (
      SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM base
      UNION ALL
      SELECT 'total_chars', CAST(sum(n_chars) AS DOUBLE) FROM base
      UNION ALL
      SELECT 'mean_doc_chars',
             round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) FROM base
      UNION ALL
      SELECT 'exact_dup_rate',
             round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) FROM base
      UNION ALL
      SELECT 'pct_lang_en',
             round(CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
                   / count(*), 6) FROM base
      UNION ALL
      SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM base
      UNION ALL
      SELECT 'total_tokens', CAST(count(*) AS DOUBLE) FROM toks WHERE t <> ''
      UNION ALL
      SELECT 'vocab_size', CAST(count(DISTINCT t) AS DOUBLE)
      FROM toks WHERE t <> ''
    )
    SELECT metric, value FROM m
    """,
    tags=("llm", "pipeline", "report"),
)
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus health dashboard in one query: document and token
    volumes, exact-duplicate rate, language mix, source diversity,
    vocabulary size — the numbers a pretraining-data review starts
    from, each of which has a dedicated drill-down operator elsewhere
    in the registry (dedup_*, text_lang_id, corpus_*).

    Scale: two scans (docs, exploded tokens), each a map-combinable
    aggregate; every metric is a tiny tall-frame row so the report
    stays one collect regardless of corpus size.
    """
    d = T(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    base = d.select("doc_id", "lang", "source", "n_chars", fp.alias("fp"))
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("t")
    ).where(F.col("t") != "")

    def row(metric: str, col) -> DataFrame:
        return base.agg(F.lit(metric).alias("metric"), col.alias("value"))

    doc_rows = [
        row("n_docs", F.count(F.lit(1)).cast("double")),
        row("total_chars", F.sum("n_chars").cast("double")),
        row(
            "mean_doc_chars",
            F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4),
        ),
        row(
            "exact_dup_rate",
            F.round(
                F.lit(1.0) - F.countDistinct("fp").cast("double") / F.count(F.lit(1)), 6
            ),
        ),
        row(
            "pct_lang_en",
            F.round(
                F.count(F.when(F.col("lang") == "en", 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ),
        ),
        row("n_sources", F.countDistinct("source").cast("double")),
    ]
    tok_rows = [
        toks.agg(
            F.lit("total_tokens").alias("metric"), F.count(F.lit(1)).cast("double").alias("value")
        ),
        toks.agg(
            F.lit("vocab_size").alias("metric"), F.countDistinct("t").cast("double").alias("value")
        ),
    ]
    out = doc_rows[0]
    for r in doc_rows[1:] + tok_rows:
        out = out.unionByName(r)
    return out
