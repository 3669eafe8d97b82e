"""Text-analysis operators over the ``documents`` table: quality
scoring, token counting, language-ID heuristic, fingerprinting.

These are the per-document (embarrassingly parallel) stages of a
training-data pipeline: pure projections, no shuffle, fully inside
whole-stage codegen — the shape that scales linearly to 100 TB.

The reference has no text ops (its only string handling is CSV quote
parsing, AmazonReviewProducer.java:143-151); these are the mandated
LLM-data extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table

#: tiny per-language stopword profiles for the lang-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "las", "es", "una", "y"],
}
EN_STOPWORDS = STOPWORDS["en"]


def ws_tokens(col) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(col), r"\s+")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles from a token array (JVM-side).

    sequence+transform stay in codegen; used by the MinHash dedup
    pipeline (operators/dedup.py).

    Docs with fewer than ``n`` tokens yield an empty array. The guard
    matters under Spark 4's default ANSI mode: an unguarded
    ``sequence(1, size-2)`` descends to ``[1, 0]`` for short docs and
    ``element_at(tokens, 0)`` then throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    """
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j) for j in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


@query(
    "text_quality_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             string_split_regex(lower(text), '\\s+') AS toks,
             CAST(length(text) AS BIGINT) AS n_chars2
      FROM documents
    )
    SELECT doc_id, lang,
           n_chars2 AS n_chars,
           CAST(len(toks) AS INTEGER) AS n_words,
           CAST(round(CAST(n_chars2 AS DOUBLE) / len(toks), 4) AS DOUBLE) AS avg_word_len,
           CAST(round(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x)))
                      * 1.0 / len(toks), 4) AS DOUBLE) AS stopword_ratio,
           CAST(round(CASE WHEN n_chars2 = 0 THEN 0.0
                ELSE length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     * 1.0 / n_chars2 END, 4) AS DOUBLE) AS punct_ratio,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_words,
           CAST(round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS DOUBLE) AS ttr
    FROM t
    """,
    tags=("text", "llm"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, word stats, stopword
    ratio, punctuation ratio, type-token ratio.

    Scale: narrow projection, zero shuffle; every expression is a
    codegen'd built-in. This is the filter stage of a pretraining
    pipeline (drop low-quality docs by thresholding these columns).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        F.round(n_chars.cast("double") / n_words, 4).alias("avg_word_len"),
        F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("double") / n_words, 4
        ).alias("stopword_ratio"),
        # empty doc: no chars -> no punctuation (guard the ANSI /0)
        F.round(
            F.when(n_chars == 0, F.lit(0.0)).otherwise(
                F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).cast("double")
                / n_chars
            ),
            4,
        ).alias("punct_ratio"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_words"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_words, 4).alias("ttr"),
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_len_estimate
    FROM documents
    """,
    tags=("text", "llm"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, a BPE-ish regex token count
    (letter runs / digit runs / other symbols), and the chars/4
    budget estimate used for quick corpus sizing."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("int").alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_len_estimate"),
    )


def _langid_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, x -> list_contains([{words}], x)))"


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
    h AS (SELECT doc_id,
                 {_langid_hits_sql('en')} AS en_hits,
                 {_langid_hits_sql('de')} AS de_hits,
                 {_langid_hits_sql('fr')} AS fr_hits,
                 {_langid_hits_sql('es')} AS es_hits
          FROM t)
    SELECT doc_id,
           CAST(en_hits AS INTEGER) AS en_hits,
           CAST(de_hits AS INTEGER) AS de_hits,
           CAST(fr_hits AS INTEGER) AS fr_hits,
           CAST(es_hits AS INTEGER) AS es_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
                WHEN fr_hits >= es_hits THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM h
    """,
    tags=("text", "llm"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic).

    Scores each doc against tiny per-language stopword sets and takes
    a deterministic argmax (tie order en>de>fr>es). The real-corpus
    version swaps the profiles for char-trigram tables — same plan
    shape, still shuffle-free.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    def _hits(words: list[str]):
        sw = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))

    hits = {lang: _hits(words) for lang, words in STOPWORDS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]), "en"
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), "de")
        .when(hits["fr"] >= hits["es"], "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        hits["en"].cast("int").alias("en_hits"),
        hits["de"].cast("int").alias("de_hits"),
        hits["fr"].cast("int").alias("fr_hits"),
        hits["es"].cast("int").alias("es_hits"),
        pred.alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS vocab_fingerprint,
           md5(lower(trim((SELECT text FROM documents d2 WHERE d2.doc_id = t.doc_id)))) AS exact_fingerprint,
           CAST(greatest(len(toks) - 2, 0) AS INTEGER) AS n_shingles
    FROM t
    """,
    tags=("text", "llm", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact (md5 of normalized text) and
    bag-of-words (md5 of the sorted distinct vocabulary).

    The vocab fingerprint catches word-order-shuffled duplicates that
    exact hashing misses; both are the groupBy keys for the exact
    dedup operators (operators/dedup.py).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.md5(F.array_join(F.sort_array(F.array_distinct(toks)), " ")).alias("vocab_fingerprint"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("exact_fingerprint"),
        F.greatest(F.size(toks) - 2, F.lit(0)).cast("int").alias("n_shingles"),
    )


@query(
    "pipeline_pretraining_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text,
             string_split_regex(lower(text), '\\s+') AS toks,
             length(text) AS nc
      FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, text,
             len(toks) AS n_words,
             len(list_distinct(toks)) * 1.0 / len(toks) AS ttr
      FROM scored
      WHERE nc BETWEEN 40 AND 5000 AND len(toks) >= 10
    ),
    deduped AS (
      SELECT min(doc_id) AS keeper, lang,
             md5(lower(trim(text))) AS fp,
             max(n_words) AS n_words,
             max(ttr) AS ttr
      FROM quality GROUP BY lang, md5(lower(trim(text)))
    )
    SELECT keeper AS doc_id, lang,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(round(ttr, 4) AS DOUBLE) AS ttr
    FROM deduped
    WHERE ttr >= 0.2
    """,
    tags=("text", "llm", "dedup", "pipeline"),
)
def pipeline_pretraining_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining data curation pipeline in one plan:
    length gate → quality gate (word count, type-token ratio) →
    exact dedup (keep earliest per fingerprint) → diversity gate.

    This is the composition the individual text/dedup operators exist
    for; a single declarative plan means Catalyst fuses the gates
    into the scan and the only shuffle is the dedup groupBy.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    nc = F.length("text")
    quality = (
        d.where(nc.between(40, 5000))
        .withColumn("n_words", F.size(toks))
        .where(F.col("n_words") >= 10)
        .withColumn("ttr", F.size(F.array_distinct(toks)).cast("double") / F.col("n_words"))
    )
    deduped = (
        quality.groupBy("lang", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.max("n_words").cast("int").alias("n_words"),
            F.round(F.max("ttr"), 4).alias("ttr"),
        )
    )
    return deduped.where(F.col("ttr") >= 0.2).select("doc_id", "lang", "n_words", "ttr")


@query(
    "text_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END AS bgs
      FROM t
    )
    SELECT doc_id,
           CAST(len(bgs) AS INTEGER) AS n_bigrams,
           CAST(round(CASE WHEN len(bgs) = 0 THEN 0.0
                ELSE 1.0 - len(list_distinct(bgs)) * 1.0 / len(bgs) END, 4) AS DOUBLE)
             AS dup_bigram_frac,
           CAST(round(CASE WHEN len(bgs) = 0 THEN 0.0
                ELSE list_max(list_transform(list_distinct(bgs),
                       b -> len(list_filter(bgs, x -> x = b)))) * 1.0 / len(bgs) END, 4) AS DOUBLE)
             AS top_bigram_frac
    FROM bg
    """,
    tags=("text", "llm", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / boilerplate signals per document: duplicated-bigram
    fraction and most-frequent-bigram share — the MassiveText/Gopher
    quality rules used to drop machine-generated and templated text
    before pretraining.

    Scale: per-row array math, zero shuffle. The bigram array is
    materialized ONCE per row in a projection (Spark expression trees
    are not DAGs — inlining it into the nested lambda re-evaluates the
    whole build per outer element, an accidental O(d^3): measured 42 s
    vs 0.9 s at sf0.01). The top-bigram count runs over array_sort +
    F.aggregate (longest equal-run), O(d log d) per doc, so the stage
    stays embarrassingly parallel and length-bounded at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    # CPU-heavy per-row stage: spread a small single-file scan across
    # cores (no-op on a real multi-file 100 TB scan; locally it is
    # 1 core vs 32 — measured 6.6 s -> 0.6 s at sf0.1)
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    toks = ws_tokens(F.col("text"))
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bgs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
    )
    # Materialize the bigram array so downstream expressions reference
    # the computed column instead of re-expanding the build per lambda
    # element.
    with_bgs = d.select("doc_id", bgs.alias("bgs"))
    n_bg = F.size(F.col("bgs"))
    # Longest equal-run over the sorted bigrams == max bigram frequency.
    run = F.aggregate(
        F.array_sort(F.col("bgs")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return with_bgs.select(
        "doc_id",
        n_bg.cast("int").alias("n_bigrams"),
        F.round(
            F.when(n_bg == 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.size(F.array_distinct(F.col("bgs"))).cast("double") / n_bg
            ),
            4,
        ).alias("dup_bigram_frac"),
        F.round(
            F.when(n_bg == 0, F.lit(0.0)).otherwise(run.cast("double") / n_bg), 4
        ).alias("top_bigram_frac"),
    )


@query(
    "text_pii_scrub",
    oracle="""
    WITH injected AS (
      -- deterministically plant PII so the scrub is actually exercised
      -- (the synthetic corpus contains none)
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
               '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM injected
    """,
    tags=("text", "llm", "pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction stage: count and mask email addresses and
    phone-shaped numbers. PII is deterministically injected into a
    slice of the synthetic corpus (doc_id % 7 / % 11) so the masks are
    exercised and the md5 of the scrubbed text is oracle-checked
    byte-for-byte.

    Scale: regexp_count/regexp_replace are codegen'd JVM regex over a
    narrow projection — zero shuffle, linear scan, the same shape as
    the quality gates it composes with. Patterns stick to character
    classes shared by Java regex and RE2 so engines agree.
    """
    d = load_table(spark, sf_dir, "documents")
    email = r"[a-z0-9._]+@[a-z0-9.]+[a-z]"
    phone = r"[0-9]{3}-[0-9]{4}"
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(injected, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(injected, F.lit(email)).cast("int").alias("n_emails"),
        F.regexp_count(injected, F.lit(phone)).cast("int").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / 512.0) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(round(sum(n_tokens) / 512.0, 4) AS DOUBLE) AS fill_ratio
    FROM packed
    GROUP BY source, bin_id
    """,
    tags=("text", "llm", "pipeline"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents to fixed token
    budget bins (512 tokens) by running token count within each source
    shard, then report per-bin packing stats. This is the deterministic
    streaming-pack used to batch variable-length documents into fixed
    context windows without a driver-side loop.

    Scale: ONE shuffle (window partitioned by source) + a partial-agg
    rollup on the same key — the window and the groupBy share the
    source partitioning, so AQE reuses the exchange. Bin assignment is
    order-deterministic (doc_id), so re-runs are reproducible and the
    op parallelizes per source shard at any corpus size.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(ws_tokens(F.col("text")))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = d.select("doc_id", "source", n_tokens.alias("n_tokens")).withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(512.0)),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / F.lit(512.0), 4).alias("fill_ratio"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, length(text) AS n,
             list_sort(string_split(text, '')) AS cs
      FROM documents
    ),
    runs AS (
      SELECT doc_id, n,
             CASE WHEN n = 0 THEN []
                  ELSE list_filter(list_transform(range(1, n + 1),
                       i -> CASE WHEN i = n OR cs[i] <> cs[i+1]
                                 THEN i ELSE NULL END), x -> x IS NOT NULL)
             END AS run_ends
      FROM chars
    ),
    freqs AS (
      SELECT doc_id, n,
             list_transform(range(1, len(run_ends) + 1),
               j -> run_ends[j] - CASE WHEN j = 1 THEN 0 ELSE run_ends[j-1] END)
               AS counts
      FROM runs
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           CAST(len(counts) AS INTEGER) AS n_distinct_chars,
           CAST(round(CASE WHEN n = 0 THEN 0.0
                ELSE -list_aggregate(list_transform(counts,
                       c -> (c * 1.0 / n) * ln(c * 1.0 / n) / ln(2)), 'sum')
                END, 4) AS DOUBLE) AS char_entropy_bits
    FROM freqs
    """,
    tags=("text", "llm", "quality"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — low
    entropy flags repeated-char junk and template spam; very high
    entropy flags binary-in-text garbage. A standard cheap quality
    gate next to the word-level signals.

    Scale: zero shuffle. Per-doc char frequencies come from the
    sorted-run trick (sort the char array, one aggregate pass builds
    run lengths), so the row cost is O(d log d) with NO per-distinct
    rescan — the same expression-DAG lesson as text_repetition_ratio,
    applied at character granularity.
    """
    d = load_table(spark, sf_dir, "documents")
    # same single-small-file guard as text_repetition_ratio: the
    # per-row sort/aggregate is the cost, spread it across cores
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    cs = F.array_sort(F.split(F.col("text"), ""))
    n = F.length("text")
    # one pass over sorted chars: close a run at each boundary
    run_counts = F.aggregate(
        cs,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.array().cast("array<int>").alias("done"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                (x != acc["prev"]) & (acc["run"] > 0),
                F.concat(acc["done"], F.array(acc["run"])),
            )
            .otherwise(acc["done"])
            .alias("done"),
        ),
        lambda acc: F.when(
            acc["run"] > 0, F.concat(acc["done"], F.array(acc["run"]))
        ).otherwise(acc["done"]),
    )
    with_counts = d.select("doc_id", n.alias("n"), run_counts.alias("counts"))
    p = lambda c: c.cast("double") / F.col("n")  # noqa: E731
    entropy = -F.aggregate(
        F.transform(
            F.col("counts"), lambda c: p(c) * F.log(p(c)) / F.lit(float(__import__("math").log(2)))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return with_counts.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        # split("", "") is [""] in Spark (one bogus run) but [] in
        # DuckDB/Python — pin the empty doc to 0 distinct chars
        F.when(F.col("n") == 0, F.lit(0))
        .otherwise(F.size("counts"))
        .cast("int")
        .alias("n_distinct_chars"),
        F.round(F.when(F.col("n") == 0, F.lit(0.0)).otherwise(entropy), 4).alias(
            "char_entropy_bits"
        ),
    )
