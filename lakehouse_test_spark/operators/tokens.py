"""Token-level corpus operators: vocabulary statistics, tf-idf,
benchmark-contamination detection, and deterministic mixture sampling.

These are the corpus-global stages of a pretraining-data pipeline —
unlike the per-document projections in ``operators/text.py`` they
genuinely shuffle (on the token / term key), so the design notes on
each op spell out the shuffle budget and why it holds at 100 TB.

The reference has no token ops (it is a Pulsar/Kafka ingestion
harness); these are part of the mandated LLM-data extension
(BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table
from lakehouse_test_spark.operators.text import ws_tokens


@query(
    "vocab_topk_terms",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS term_count
    FROM toks
    WHERE term <> ''
    GROUP BY term
    ORDER BY term_count DESC, term
    LIMIT 50
    """,
    tags=("tokens", "llm", "vocab"),
)
def vocab_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 vocabulary terms by frequency — the first step of
    building a tokenizer vocab or a stopword list from the corpus.

    Scale: explode is map-side; the groupBy(term) aggregates partially
    before the shuffle (two-level HashAggregate), so shuffle volume is
    bounded by |vocab| per partition, not corpus tokens. The final
    top-50 is a TakeOrdered (no global sort). Ties broken by term so
    the result is deterministic across engines and partitionings.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(ws_tokens(F.col("text"))).alias("term")).where(
        F.col("term") != ""
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .orderBy(F.col("term_count").desc(), F.col("term"))
        .limit(50)
    )


@query(
    "tfidf_top_term_per_doc",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs * 1.0 / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term AS top_term,
           CAST(round(score, 6) AS DOUBLE) AS tfidf
    FROM ranked WHERE rn = 1
    """,
    tags=("tokens", "llm", "tfidf"),
)
def tfidf_top_term_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most characteristic term per document by tf-idf — the classic
    keyword-extraction / topic-signal stage.

    Scale: three shuffles, all on bounded keys — tf groups on
    (doc_id, term) with map-side partial agg; df groups on term
    (|vocab|-bounded); the tf⋈df join shuffles on term. The per-doc
    argmax is a WindowGroupLimit (rank-pushdown keeps only the top row
    per doc before the final filter). n_docs is a scalar broadcast.
    Deterministic tie-break on term.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            F.round("score", 6).alias("tfidf"),
        )
    )


@query(
    "contamination_ngram_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [] END AS shingles
      FROM toks
    ),
    eval_set AS (
      SELECT list_distinct(flatten(list(shingles))) AS eval_shingles
      FROM sh WHERE doc_id % 97 = 0
    ),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT train.doc_id,
           CAST(len(shingles) AS INTEGER) AS n_shingles,
           CAST(len(list_intersect(shingles, eval_set.eval_shingles)) AS INTEGER)
             AS n_overlap,
           CAST(round(CASE WHEN len(shingles) = 0 THEN 0.0
                ELSE len(list_intersect(shingles, eval_set.eval_shingles)) * 1.0
                     / len(shingles) END, 4) AS DOUBLE) AS overlap_frac,
           len(shingles) > 0
             AND len(list_intersect(shingles, eval_set.eval_shingles)) * 1.0
                 / len(shingles) >= 0.5 AS contaminated
    FROM train CROSS JOIN eval_set
    """,
    tags=("tokens", "llm", "contamination"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: fraction of each training doc's
    3-gram shingles that also appear in a held-out eval slice (here the
    deterministic doc_id % 97 == 0 sample standing in for a benchmark
    set). Docs with >= 50% shingle overlap are flagged — the standard
    n-gram decontamination rule (GPT-3 appendix C / PaLM style).

    Scale: two strategies, auto-selected on eval-set size. Small eval
    (the common case — benchmarks are thousands of docs vs the 100 TB
    train side): the shingle set becomes an in-plan array literal and
    the train scan is shuffle-free codegen array_intersect. Large
    eval (> ``_EVAL_LITERAL_MAX`` shingles, where a plan literal
    would bloat every task binary): exploded shingles broadcast-
    hash-join the eval table and re-aggregate per doc — one
    partial-agg shuffle of (doc_id, counts), plan size flat. Both
    paths are result-identical (pinned by
    tests/test_wave12.py::test_contamination_strategies_agree).
    """
    return _contamination_overlap(spark, sf_dir, strategy="auto")


#: above this many eval shingles the in-plan literal strategy flips
#: to the broadcast-join strategy (plan/task-binary size guard)
_EVAL_LITERAL_MAX = 50_000


def _contamination_overlap(
    spark: SparkSession, sf_dir: str, strategy: str = "auto"
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    idx = F.when(
        F.size(toks) >= 3, F.sequence(F.lit(1), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles"))
    eval_df = (
        sh.where(F.col("doc_id") % 97 == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train = sh.where(F.col("doc_id") % 97 != 0)

    if strategy == "auto":
        strategy = "join" if eval_df.count() > _EVAL_LITERAL_MAX else "literal"

    if strategy == "literal":
        eval_set = sorted(r["s"] for r in eval_df.collect())
        overlap = F.size(F.array_intersect(F.col("shingles"), F.lit(eval_set)))
        scored = train.select("doc_id", F.size("shingles").alias("n_sh"), overlap.alias("ov"))
    else:
        exploded = train.select("doc_id", F.size("shingles").alias("n_sh"), F.explode_outer("shingles").alias("s"))
        hit = F.broadcast(eval_df.withColumn("hit", F.lit(1)))
        scored = (
            exploded.join(hit, "s", "left")
            .groupBy("doc_id")
            .agg(
                F.max("n_sh").alias("n_sh"),
                F.count(F.col("hit")).cast("int").alias("ov"),
            )
        )
    n_sh = F.col("n_sh")
    overlap = F.col("ov")
    frac = F.when(n_sh == 0, F.lit(0.0)).otherwise(overlap.cast("double") / n_sh)
    return scored.select(
        "doc_id",
        n_sh.cast("int").alias("n_shingles"),
        overlap.cast("int").alias("n_overlap"),
        F.round(frac, 4).alias("overlap_frac"),
        ((n_sh > 0) & (frac >= 0.5)).alias("contaminated"),
    )


@query(
    "corpus_mixture_sample",
    oracle="""
    WITH rates AS (
      SELECT * FROM (VALUES ('src0', '40000000'), ('src1', '80000000'),
                            ('src2', 'c0000000'), ('src3', 'ffffffff'))
             AS t(source, keep_hex)
    ),
    keyed AS (
      SELECT d.doc_id, d.source, d.n_chars,
             substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS h,
             r.keep_hex
      FROM documents d JOIN rates r USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS kept_ids_md5
    FROM keyed
    WHERE h < keep_hex
    GROUP BY source
    """,
    tags=("tokens", "llm", "sampling"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: each source gets a target
    keep-rate (src0 25%, src1 50%, src2 75%, src3 100%) applied by
    comparing the first 8 hex chars of md5(doc_id) against the rate's
    hex threshold — the reproducible, engine-portable way to downsample
    domains to a target mixture for pretraining. Returns per-source
    kept-count, kept-chars, and an md5 over the kept id list so the
    exact sample membership is oracle-checked.

    Scale: the rate table is 4 rows (broadcast); the filter is a pure
    projection (md5 + string compare in codegen, no shuffle); only the
    final per-source rollup shuffles, on a handful of keys with
    map-side partial agg. Sample membership depends only on doc_id, so
    re-runs, retries, and different partitionings all keep the same
    rows — the property that makes the sample auditable at 100 TB.
    """
    rates = spark.createDataFrame(
        [
            ("src0", "40000000"),
            ("src1", "80000000"),
            ("src2", "c0000000"),
            ("src3", "ffffffff"),
        ],
        ["source", "keep_hex"],
    )
    d = load_table(spark, sf_dir, "documents")
    keyed = d.join(F.broadcast(rates), "source").where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < F.col("keep_hex")
    )
    return keyed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("kept_ids_md5"),
    )


@query(
    "dedup_keep_best",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             md5(array_to_string(string_split_regex(lower(text), '\\s+')[:5], ' '))
               AS fingerprint,
             len(string_split_regex(lower(text), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_dups,
           arg_min(doc_id, CAST(-n_tokens AS BIGINT) * 1000000 + doc_id)
             AS kept_doc_id,
           CAST(max(n_tokens) AS BIGINT) AS kept_tokens
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
    tags=("tokens", "llm", "dedup"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection for duplicate groups: documents are
    blocked by a prefix fingerprint (md5 of the first 5 tokens — the
    standard cheap blocking key for boilerplate/templated dups); within
    each group keep the longest document (ties broken by lowest doc_id)
    — the 'keep best, drop rest' step that follows any dedup pass.
    Returns only groups with actual duplicates.

    Scale: ONE shuffle on the 16-byte fingerprint (never the text);
    min_by over an encoded (-n_tokens, doc_id) key does the argmax
    without a window or second pass. HAVING prunes singleton groups
    map-side-partially like any agg filter.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n_tokens = F.size(toks)
    fp = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 5))).alias("fingerprint"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min_by(
                "doc_id", (-F.col("n_tokens")) * F.lit(1000000) + F.col("doc_id")
            ).alias("kept_doc_id"),
            F.max("n_tokens").cast("bigint").alias("kept_tokens"),
        )
        .where(F.col("n_dups") > 1)
    )


@query(
    "lm_perplexity_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
    freq AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
    total AS (SELECT sum(cnt) AS n FROM freq),
    scored AS (
      SELECT tf.doc_id,
             sum(tf.tf) AS n_tokens,
             sum(tf.tf * ln(freq.cnt * 1.0 / total.n)) AS logprob
      FROM tf JOIN freq USING (term) CROSS JOIN total
      GROUP BY tf.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(round(-logprob / n_tokens, 4) AS DOUBLE) AS nll_per_token,
           -logprob / n_tokens
             < (SELECT quantile_cont(-logprob / n_tokens, 0.9) FROM scored)
             AS keep
    FROM scored
    """,
    tags=("tokens", "llm", "quality", "lm"),
)
def lm_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality filter (the CCNet/KenLM shape): train unigram
    frequencies on the corpus itself, score every document by its
    per-token negative log-likelihood, and keep docs below the 90th
    percentile — high-NLL docs are gibberish/OOV-heavy and get cut
    before pretraining.

    Scale: term frequencies are a |vocab|-bounded aggregate (map-side
    partials); scoring joins per-doc tf rows against the frequency
    table on term — at 100 TB the freq table is a few GB and
    broadcast-joins; corpus total and the NLL cutoff are scalar aggs.
    No iteration, no Python: a real LM filter swaps the scoring
    expression, not the plan.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    freq = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    # empty/whitespace-only corpus: no tf rows; keep the literals finite
    n_total = freq.agg(F.sum("cnt")).first()[0] or 1
    scored = (
        tf.join(freq, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.log(F.col("cnt") / F.lit(float(n_total)))).alias(
                "logprob"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            (-F.col("logprob") / F.col("n_tokens")).alias("nll_raw"),
        )
    )
    cutoff = scored.agg(F.expr("percentile(nll_raw, 0.9)")).first()[0]
    if cutoff is None:  # empty corpus -> empty result, keep literal finite
        cutoff = 0.0
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("nll_raw", 4).alias("nll_per_token"),
        (F.col("nll_raw") < F.lit(float(cutoff))).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training
# ---------------------------------------------------------------------------


def _merge_pair_in_syms(syms: Column, left: Column, right: Column) -> Column:
    """Replace every non-overlapping adjacent (left, right) occurrence
    in a symbol array with the concatenated token — one in-plan fold
    (left-to-right, greedy, the standard BPE application order)."""
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pending"),
        ),
        lambda acc, x: F.when(
            acc["pending"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("pending")),
        )
        .when(
            (acc["pending"] == left) & (x == right),
            # merge consumes both; nothing pending (non-overlapping)
            F.struct(
                F.concat(acc["out"], F.array(F.concat(left, right))).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pending"])).alias("out"),
                x.alias("pending"),
            )
        ),
        lambda acc: F.when(
            acc["pending"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pending"]))),
    )


_BPE_MAXN = 5  # n-gram depth collected per round; buys exact chain depth 3


def _select_merge_batch(
    ng0: dict[tuple[str, ...], int],
    max_batch: int,
    cutoffs: dict[int, int] | None = None,
) -> list[tuple[str, str, int]]:
    """Select a PREFIX of the exact sequential BPE merge order using only
    the round-start n-gram counts ``ng0`` (symbol tuples of length
    2.._BPE_MAXN → weighted adjacency count).

    Sequential BPE recounts pairs after every merge; this simulates those
    recounts driver-side with exact count-delta arithmetic where it is
    provably exact, and conservative upper bounds where it is not — the
    batch ends the moment an uncertain count could outrank the next exact
    argmax, so the returned sequence is ALWAYS byte-identical to what the
    one-merge-per-round loop would produce (pinned by the Spark parity
    tests and an 80-seed pure-Python stress test in tests/test_wave7.py).

    Mechanics (all driver-side, O(|collected tables|) per merge):

    - ``pc`` holds exact current pair counts.  Merging p=(a,b) destroys
      (x,a) by exactly cur(x,a,b) and (b,y) by exactly cur(a,b,y), and
      creates (x, a+b) / (a+b, y) with exactly those counts, where
      cur(seq) resolves the CURRENT adjacency count of mid-round symbols
      from round-start n-grams: every mid-round token occupies a
      contiguous run of round-start symbols, so cur(seq) equals the
      round-start count of the concatenated expansion — provided the
      expansion fits in _BPE_MAXN, every earlier merge this round either
      lies inside the expansion (an ancestor, guaranteed applied) or
      touches none of its symbols, and no earlier merge can consume the
      run's boundary symbols from outside.
    - Guards end the round where the arithmetic would break: self-pairs
      (greedy-run semantics), token-string aliasing, and a-b alternating
      chains ("abab" merges pairwise; per-n-gram deltas miss it).
    - When a delta is NOT provably exact, the affected pair moves to
      ``stale`` with an upper bound (min round-start n-gram count over
      every window of the expansion — counts never increase).  Selection
      stops when the best exact candidate could be outranked by a stale
      bound or by an uncollected entry (count ≤ cutoffs[n]).

    ``cutoffs[n]`` is the max possible count of an uncollected length-n
    entry (0 = that table was collected completely), so the same routine
    stays exact at 100 TB where only the top-M n-grams are collected.
    Tiebreaks compare Python str tuples — identical to the engine's
    ORDER BY l, r for the ASCII corpora the gate runs on.
    """
    cutoffs = cutoffs or {}
    pc = {k: v for k, v in ng0.items() if len(k) == 2}
    stale: dict[tuple[str, str], int] = {}
    expansion: dict[str, tuple[str, ...]] = {}
    prov: dict[str, frozenset] = {}
    acc_pairs: list[tuple[str, str]] = []
    symbols: set[str] = set()
    for l, r in pc:
        symbols.add(l)
        symbols.add(r)

    def exp(s: str) -> tuple[str, ...]:
        return expansion.get(s, (s,))

    def provset(s: str) -> frozenset:
        return prov.get(s, frozenset())

    def lookup(w: tuple[str, ...]) -> int | None:
        if len(w) > _BPE_MAXN:
            return None
        v = ng0.get(w)
        if v is None:
            return None if cutoffs.get(len(w)) else 0
        return v

    def lookup_ub(w: tuple[str, ...]) -> int:
        v = ng0.get(w)
        return v if v is not None else cutoffs.get(len(w), 0)

    def ub_any(seq: tuple[str, ...]) -> int:
        full = sum((exp(s) for s in seq), ())
        ub = None
        n_hi = min(_BPE_MAXN, len(full))
        for n in range(2, n_hi + 1):
            for i in range(len(full) - n + 1):
                u = lookup_ub(full[i : i + n])
                ub = u if ub is None else min(ub, u)
                if ub == 0:
                    return 0
        return ub if ub is not None else 0

    def cur(seq: tuple[str, ...], upto: int) -> int | None:
        """Exact current adjacency count of ``seq`` after acc_pairs[:upto],
        or None when not provably resolvable from round-start n-grams."""
        full = sum((exp(s) for s in seq), ())
        if len(full) > _BPE_MAXN:
            return None
        v = lookup(full)
        if v is None:
            return None
        anc = frozenset().union(*[provset(s) for s in seq])
        for m in acc_pairs[:upto]:
            if m in anc:
                continue
            if m[0] in full or m[1] in full:
                return None  # non-ancestor merge rewrites the interior
        for l, r in acc_pairs[:upto]:
            if r == full[0] or l == full[-1]:
                return None  # a boundary symbol could be eaten from outside
        return v

    accepted: list[tuple[str, str, int]] = []
    while len(accepted) < max_batch:
        best = None
        for (l, r), c in pc.items():
            if c < 2:
                continue
            k = (-c, l, r)
            if best is None or k < best[0]:
                best = (k, (l, r), c)
        if best is None:
            break
        _, (a, b), c = best
        if c <= cutoffs.get(2, 0):
            break  # an uncollected pair could outrank — need a wider collect
        if any(ub > c or (ub == c and sp < (a, b)) for sp, ub in stale.items()):
            break
        accepted.append((a, b, c))
        tok = a + b
        if a == b or tok in symbols:
            break  # greedy-run / alias arithmetic is not per-n-gram — end round
        if ub_any((a, b, a)) > 0 and ub_any((b, a, b)) > 0:
            break  # possible abab chain — double-decrement territory
        upto = len(acc_pairs)  # resolve cur() against the state BEFORE this merge
        pc.pop((a, b), None)
        stale.pop((a, b), None)
        left_syms = {x for (x, y) in pc if y == a} | {
            x for (x, y) in stale if y == a
        }
        right_syms = {z for (y, z) in pc if y == b} | {
            z for (y, z) in stale if y == b
        }
        for x in left_syms:
            d = cur((x, a, b), upto)
            if d is not None:
                if d:
                    if (x, a) in pc:
                        pc[(x, a)] -= d
                    elif (x, a) in stale:
                        stale[(x, a)] = max(0, stale[(x, a)] - d)
                    pc[(x, tok)] = pc.get((x, tok), 0) + d
            else:
                ubt = ub_any((x, a, b))
                if ubt:
                    if (x, a) in pc:
                        stale[(x, a)] = pc.pop((x, a))
                    stale[(x, tok)] = min(ubt, c)
        for z in right_syms:
            d = cur((a, b, z), upto)
            if d is not None:
                if d:
                    if (b, z) in pc:
                        pc[(b, z)] -= d
                    elif (b, z) in stale:
                        stale[(b, z)] = max(0, stale[(b, z)] - d)
                    pc[(tok, z)] = pc.get((tok, z), 0) + d
            else:
                ubt = ub_any((a, b, z))
                if ubt:
                    if (b, z) in pc:
                        stale[(b, z)] = pc.pop((b, z))
                    stale[(tok, z)] = min(ubt, c)
        symbols.add(tok)
        expansion[tok] = exp(a) + exp(b)
        prov[tok] = provset(a) | provset(b) | {(a, b)}
        acc_pairs.append((a, b))
    return accepted


def bpe_train_driver(
    seq_freqs: list[tuple[list[str], int]], num_merges: int
) -> list[tuple[int, str, str, int]]:
    """Exact sequential BPE over a (symbol-sequence, freq) table,
    driver-side, with the incremental pair-index + lazy max-heap the
    real trainers (HuggingFace tokenizers, SentencePiece) use: each
    merge updates only the adjacencies it touches, so total work is
    O(total symbols + merge occurrences), not O(merges × corpus).

    This is stage 2 of the production BPE architecture: stage 1 (the
    ONLY corpus-scale step) aggregates the corpus to the frequency
    table distributed; the training state is vocabulary-sized by
    construction and fits one machine at any corpus size. Merge order
    (including the (-count, pair) lexicographic tiebreak) is identical
    to the naive sequential reference — pinned by tests against the
    same oracle as the distributed batched loop.
    """
    import heapq

    # flatten into one linked list; SEP breaks adjacency between rows
    sym: list[str | None] = []
    w: list[int] = []
    for syms, f in seq_freqs:
        for s in syms:
            sym.append(s)
            w.append(int(f))
        sym.append(None)  # separator
        w.append(0)
    n = len(sym)
    nxt = list(range(1, n + 1))
    prv = list(range(-1, n - 1))
    alive = [s is not None for s in sym]

    from collections import defaultdict

    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    pair_pos: dict[tuple[str, str], set[int]] = defaultdict(set)
    heap: list[tuple[int, str, str]] = []

    def _add(p: int) -> None:
        q = nxt[p]
        if q >= n or not alive[p] or not alive[q]:
            return
        key = (sym[p], sym[q])
        pair_count[key] += w[p]
        pair_pos[key].add(p)
        heapq.heappush(heap, (-pair_count[key], key[0], key[1]))

    def _remove(p: int) -> None:
        q = nxt[p]
        if q >= n or sym[p] is None or sym[q] is None:
            return
        key = (sym[p], sym[q])
        pair_count[key] -= w[p]
        pair_pos[key].discard(p)
        if pair_count[key] <= 0:
            pair_count.pop(key, None)
            pair_pos.pop(key, None)
        else:
            # lazy heap: every count CHANGE needs a fresh entry, or the
            # pair's current count is unreachable after a decrement
            heapq.heappush(heap, (-pair_count[key], key[0], key[1]))

    for i in range(n):
        if alive[i] and nxt[i] < n and alive[nxt[i]]:
            key = (sym[i], sym[nxt[i]])
            pair_count[key] += w[i]
            pair_pos[key].add(i)
    for key, c in pair_count.items():
        heapq.heappush(heap, (-c, key[0], key[1]))

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges and heap:
        negc, l, r = heapq.heappop(heap)
        cur = pair_count.get((l, r))
        if cur is None or -negc != cur:
            continue  # stale heap entry (lazy invalidation)
        if cur < 2:
            break
        new_sym = l + r
        count_before = cur
        # leftmost-first greedy over this pair's positions; a position
        # consumed earlier in the same merge is detected by re-checking
        # the symbols (reference semantics: scan original symbols,
        # never re-match the merged symbol within the pass)
        for p in sorted(pair_pos.get((l, r), ())):
            q = nxt[p]
            if not (alive[p] and q < n and alive[q]):
                continue
            if sym[p] != l or sym[q] != r:
                continue
            p0 = prv[p]
            n2 = nxt[q]
            # retire the three adjacencies this merge touches
            if p0 >= 0 and alive[p0]:
                _remove(p0)
            _remove(p)
            _remove(q)
            # splice out q, rewrite p
            sym[p] = new_sym
            alive[q] = False
            nxt[p] = n2
            if n2 < n:
                prv[n2] = p
            # new adjacencies
            if p0 >= 0 and alive[p0]:
                _add(p0)
            _add(p)
        merges.append((len(merges), l, r, count_before))
    return merges


def bpe_train(
    docs: DataFrame,
    num_merges: int = 16,
    text_col: str = "text",
    max_collect: int = 65536,
    stats: dict | None = None,
    pretokenize: bool = True,
    driver_threshold: int = 0,
) -> list[tuple[int, str, str, int]]:
    """Train byte-pair-encoding merges on a corpus, distributed.

    The classic Sennrich et al. 2016 algorithm in DataFrame form,
    with BATCHED rounds (one Spark round-trip yields several merges):

    1. ONE shuffle builds the word-frequency vocabulary (word counts
       absorb the corpus — every later round works on |vocab| rows,
       not corpus rows; this is what makes BPE trainable on 100 TB:
       the iteration state is the vocabulary, which grows with
       unique words, not with data volume).
    2. Per round, ONE job aggregates adjacent symbol PAIRS and
       TRIGRAMS (tagged union, single collect of the top-M of each).
       ``_select_merge_batch`` then extends the exact sequential merge
       order as far as driver-side count-delta arithmetic stays
       provably exact — typically 3-6 merges per round-trip, cutting
       scheduler round-trips ~4× versus one-merge-per-round (a 32k-merge
       vocabulary stops costing 32k sequential Spark jobs).
    3. The accepted merges are applied in order as chained in-plan
       folds — no shuffle, no Python in the loop body — and the round's
       vocab is eagerly localCheckpoint-ed (previous unpersisted) so
       the plan stays one round deep (the connected-components
       discipline, operators/cluster.py).

    Returns the merge table [(step, left, right, pair_count)] —
    byte-identical to the unbatched loop (tests pin parity against a
    pure-Python sequential reference, tiebreaks included). ``stats``
    (optional dict) receives {"rounds": N} for round-count assertions.

    ``driver_threshold`` > 0 enables the PRODUCTION fast path: when
    the frequency table has at most that many rows, training finishes
    driver-side via :func:`bpe_train_driver` (stage-1 aggregation is
    the only corpus-scale work — exactly the HuggingFace/SentencePiece
    architecture). Merge output is identical either way; the
    distributed rounds remain for vocabularies too large for one
    machine. ``stats["driver"]`` records which path ran.
    """
    from lakehouse_test_spark.operators.text import ws_tokens

    if pretokenize:
        seqs = docs.select(F.explode(ws_tokens(F.col(text_col))).alias("w"))
    else:
        # SentencePiece-style training: the WHOLE text is one symbol
        # sequence (spaces are ordinary symbols), so merges cross word
        # boundaries and the learnable vocabulary is bounded by the
        # corpus's character diversity, not its whitespace-word count.
        # Sequence rows = distinct texts (real SentencePiece samples
        # sentences for the same reason: the training state must be
        # corpus-bounded).
        seqs = docs.select(F.col(text_col).alias("w"))
    vocab = (
        seqs.where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split(F.col("w"), "").alias("syms"), "freq")
    ).persist()
    n_vocab = vocab.count()

    if driver_threshold and n_vocab <= driver_threshold:
        seq_freqs = [(list(r["syms"]), int(r["freq"])) for r in vocab.collect()]
        vocab.unpersist()
        if stats is not None:
            stats["rounds"] = 1  # the stage-1 aggregation
            stats["driver"] = True
        return bpe_train_driver(seq_freqs, num_merges)
    if stats is not None:
        stats["driver"] = False

    from pyspark.sql import Window

    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        # ONE pass per round: every n-gram length (2.._BPE_MAXN) is
        # generated in a single explode and aggregated in a single
        # shuffle — at corpus scale each extra per-n pass would be
        # another full read+shuffle, so this is 4 passes folded into 1.
        # The per-n top-(max_collect+1) is then a bounded second
        # shuffle over the (already aggregated) distinct grams.
        def _gram_slicer(n: int):
            # single-param lambda: a 2-param one would receive the
            # ARRAY INDEX as its second argument (transform's API)
            return lambda i: F.slice(F.col("syms"), i, n)

        gram_arrays = F.array(
            *[
                F.when(
                    F.size("syms") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - (n - 1)),
                        _gram_slicer(n),
                    ),
                ).otherwise(F.array().cast("array<array<string>>"))
                for n in range(2, _BPE_MAXN + 1)
            ]
        )
        top = (
            vocab.select(F.explode(F.flatten(gram_arrays)).alias("gram"), "freq")
            .groupBy("gram")
            .agg(F.sum("freq").alias("c"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy(F.size("gram")).orderBy(
                        F.desc("c"), F.asc(F.col("gram").cast("string"))
                    )
                ),
            )
            .where(F.col("rk") <= max_collect + 1)
            .drop("rk")
        )
        rows = top.collect()  # ONE action per round
        ng0: dict[tuple[str, ...], int] = {}
        sizes: dict[int, int] = {}
        mins: dict[int, int] = {}
        for r in rows:
            k = tuple(r["gram"])
            c = int(r["c"])
            ng0[k] = c
            n = len(k)
            sizes[n] = sizes.get(n, 0) + 1
            mins[n] = min(mins.get(n, c), c)
        pair_max = max((v for k, v in ng0.items() if len(k) == 2), default=0)
        if pair_max < 2:
            break
        cutoffs = {
            n: (mins[n] if sizes.get(n, 0) > max_collect else 0) for n in sizes
        }
        batch = _select_merge_batch(ng0, num_merges - len(merges), cutoffs)
        if not batch:
            if cutoffs.get(2):
                max_collect *= 2  # top pair hid below the collect horizon
                continue
            break
        rounds += 1
        merged_syms = F.col("syms")
        for left, right, _ in batch:
            merged_syms = _merge_pair_in_syms(merged_syms, F.lit(left), F.lit(right))
        for left, right, count in batch:
            merges.append((len(merges), left, right, count))
        new_vocab = vocab.select(merged_syms.alias("syms"), "freq").localCheckpoint(
            eager=True
        )  # per-round: plan depth, not data, is what OOMs small drivers
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


@query("tokenizer_bpe_merges", oracle=None, tags=("text", "llm", "tokenizer", "iterative"))
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 16 BPE merges learned from the documents corpus —
    tokenizer training as a first-class pipeline op. Rows-only gate
    (iterative, no SQL twin); tests/test_wave7.py proves the merge
    sequence equals a pure-Python reference BPE on a controlled
    corpus, including the deterministic tiebreak.
    """
    from lakehouse_test_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    merges = bpe_train(d, num_merges=16)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count long"
    )


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply trained BPE merges and report per-document token stats
    (token count, chars/token compression) — the ENCODE half of the
    tokenizer, scaled the only way that works at 100 TB: merges are
    applied to the DISTINCT words (vocabulary-sized work, one chained
    projection per merge, zero Python), then token counts join back
    to the corpus on the word.

    Encoding cost is |vocab| × |merges| regardless of corpus size;
    the corpus-side work is one explode + one join + one aggregate.
    """
    from lakehouse_test_spark.operators.text import ws_tokens

    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("w")
    ).where(F.length("w") > 0)
    vocab = words.select("w").distinct().withColumn("syms", F.split(F.col("w"), ""))
    for _, left, right, _ in merges:
        vocab = vocab.select(
            "w", _merge_pair_in_syms(F.col("syms"), F.lit(left), F.lit(right)).alias("syms")
        )
    encoded = vocab.select("w", F.size("syms").alias("word_tokens"))
    return (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.sum("word_tokens").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .join(
            docs.select(id_col, F.length(text_col).cast("bigint").alias("n_chars")),
            id_col,
        )
        .select(
            id_col,
            "n_chars",
            "n_words",
            "n_tokens",
            F.round(F.col("n_chars") / F.col("n_tokens"), 4).alias("chars_per_token"),
        )
    )


@query("tokenizer_bpe_encode", oracle=None, tags=("text", "llm", "tokenizer"))
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 16 BPE merges on the corpus, then encode the corpus with
    them — per-document token counts and the chars/token compression
    ratio (the number a tokenizer is judged by). Rows-only gate;
    tests prove the token counts equal a pure-Python encode with the
    same merge table.
    """
    from lakehouse_test_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    merges = bpe_train(d, num_merges=16)
    return bpe_encode_stats(d, merges)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style), trained by EM
# ---------------------------------------------------------------------------


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_size: int = 2000,
    iters: int = 2,
    stats: dict | None = None,
) -> list[tuple[str, int, float]]:
    """Train a Unigram-LM tokenizer (Kudo 2018 / SentencePiece), the
    other mainstream subword algorithm next to BPE, distributed:

    1. ONE shuffle builds the word-frequency vocabulary (corpus-sized
       work happens exactly once; everything after is vocab-sized).
    2. Seed inventory: every substring up to ``max_piece_len`` of every
       word, weighted by word frequency — one aggregate, top
       ``seed_size`` pieces collected, plus ALL single characters (so
       every word stays segmentable). The piece table is index-like
       state: driver-sized and broadcast, same as IVF centroids.
    3. EM rounds: the E-step Viterbi-segments each DISTINCT word under
       the current piece log-probs (mapInPandas over the vocab with
       the piece table broadcast — vocab-sized, zero shuffle); the
       M-step re-estimates piece probabilities from one groupBy over
       emitted (piece, count) rows (at most |vocab|×pieces-per-word
       rows, keys bounded by the inventory). Multi-char pieces that
       win zero mass are pruned; single chars persist with a count
       floor of 1.

    Determinism: Viterbi prefers the LONGEST piece on exact ties
    (pieces are scanned longest-first and only a strictly better score
    displaces); piece ordering is (count desc, piece asc). No RNG
    anywhere. tests/test_tokens_unigram.py pins exact parity against a
    pure-Python reference implementation.

    Returns [(piece, final_count, prob)] sorted by (count desc, piece).
    """
    import math

    from lakehouse_test_spark.operators.text import ws_tokens

    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).persist()
    vocab.count()

    subs = vocab.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), "
                f"i -> transform(sequence(1, least({max_piece_len}, length(w) - i + 1)), "
                f"k -> substring(w, i, k))))"
            )
        ).alias("piece"),
        "freq",
    )
    seed_rows = (
        subs.groupBy("piece")
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    )
    char_rows = (
        subs.where(F.length("piece") == 1)
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
        .collect()
    )
    counts: dict[str, int] = {r["piece"]: int(r["c"]) for r in seed_rows}
    for r in char_rows:
        counts.setdefault(r["piece"], int(r["c"]))
    chars = {r["piece"] for r in char_rows}

    out_schema = "piece string, c long"
    for _ in range(iters):
        total = float(sum(counts.values()))
        logp = {p: math.log(c / total) for p, c in counts.items()}
        bc = spark.sparkContext.broadcast(logp)

        def e_step(batches, _maxlen=max_piece_len):
            from collections import Counter as _Counter

            import pandas as pd

            lp = bc.value
            neg_inf = float("-inf")
            for pdf in batches:
                cnt: dict[str, int] = _Counter()
                for w, f in zip(pdf["w"], pdf["freq"]):
                    n = len(w)
                    best = [neg_inf] * (n + 1)
                    best[0] = 0.0
                    back = [0] * (n + 1)
                    for i in range(1, n + 1):
                        # longest-first: strict > keeps the longest on ties
                        for k in range(min(_maxlen, i), 0, -1):
                            piece = w[i - k : i]
                            v = lp.get(piece)
                            if v is None:
                                continue
                            s = best[i - k] + v
                            if s > best[i]:
                                best[i] = s
                                back[i] = k
                    if best[n] == neg_inf:
                        continue  # unsegmentable (never: chars are seeded)
                    i = n
                    while i > 0:
                        k = back[i]
                        cnt[w[i - k : i]] += int(f)
                        i -= k
                if cnt:
                    yield pd.DataFrame(
                        {"piece": list(cnt.keys()), "c": list(cnt.values())}
                    )

        agg = (
            vocab.mapInPandas(e_step, out_schema)
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        new_counts = {r["piece"]: int(r["c"]) for r in agg}
        for ch in chars:  # coverage floor: alphabet never dies
            new_counts.setdefault(ch, 1)
        counts = new_counts
        bc.unpersist()
    vocab.unpersist()
    if stats is not None:
        stats["n_pieces"] = len(counts)
    total = float(sum(counts.values()))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(p, c, c / total) for p, c in ranked]


@query("tokenizer_unigram_em", oracle=None, tags=("text", "llm", "tokenizer", "iterative"))
def tokenizer_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 multi-character pieces of a Unigram-LM tokenizer after 2
    EM rounds on the documents corpus — SentencePiece-style training
    as a pipeline op, complementing the BPE pair (`tokenizer_bpe_*`).
    Rows-only gate (iterative EM has no SQL twin); exact parity with a
    pure-Python reference is pinned in tests/test_tokens_unigram.py.
    """
    d = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    pieces = unigram_train(d)
    rows = [
        (p, c, round(prob, 6)) for p, c, prob in pieces if len(p) > 1
    ][:30]
    return spark.createDataFrame(rows, "piece string, piece_count long, prob double")


# ---------------------------------------------------------------------------
# WordPiece-style greedy MaxMatch encoder (third tokenizer family)
# ---------------------------------------------------------------------------


def wordpiece_vocab(docs: DataFrame, top_multi: int = 200, max_len: int = 6) -> DataFrame:
    """Frequency-selected subword vocabulary: the ``top_multi`` most
    frequent substrings of length 2..``max_len`` across word
    occurrences (ties broken lexicographically), plus every single
    character (so greedy matching never emits UNK). One explode +
    one hash aggregate + one TakeOrdered — vocabulary selection is
    corpus-scale work but shuffles only (piece, partial-count) pairs.
    """
    from lakehouse_test_spark.operators.text import ws_tokens

    words = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    subs = (
        words.select("w", "freq", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"))
        .select("w", "freq", "i", F.explode(F.sequence(F.lit(2), F.lit(max_len))).alias("l"))
        .where(F.col("i") + F.col("l") - 1 <= F.length("w"))
        .select(F.expr("substring(w, i, l)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("sfreq"))
    )
    multi = subs.orderBy(F.desc("sfreq"), "piece").limit(top_multi).select("piece")
    chars = (
        words.select(F.explode(F.split(F.col("w"), "")).alias("piece"))
        .where(F.col("piece") != "")
        .distinct()
    )
    return multi.unionByName(chars).distinct()


def wordpiece_encode(targets: DataFrame, vocab: list[str], word_col: str = "cw") -> DataFrame:
    """Greedy longest-match-first (MaxMatch) segmentation of each
    target word against the vocabulary — WordPiece inference (without
    the ## continuation mark; single-char coverage makes UNK
    impossible). The scan is inherently sequential pointer-chasing,
    so it runs as an Arrow-batched mapInPandas kernel over the
    DISTINCT target words — vocabulary-sized Python, never
    corpus-sized — with the vocab broadcast as a closure set.
    """
    import pandas as pd

    vset = frozenset(vocab)
    maxlen = max((len(p) for p in vset), default=1)
    schema = f"{word_col} string, pieces string, n_pieces int"

    def kernel(batches):
        for pdf in batches:
            out = []
            for w in pdf[word_col]:
                pos, pieces = 0, []
                while pos < len(w):
                    for l in range(min(maxlen, len(w) - pos), 0, -1):
                        cand = w[pos : pos + l]
                        if cand in vset:
                            pieces.append(cand)
                            pos += l
                            break
                    else:  # pragma: no cover — single chars are in vocab
                        pieces.append(w[pos])
                        pos += 1
                out.append((w, "|".join(pieces), len(pieces)))
            yield pd.DataFrame(out, columns=[word_col, "pieces", "n_pieces"])

    return targets.select(word_col).distinct().mapInPandas(kernel, schema)


@query(
    "tokenizer_wordpiece_encode",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
    ), words AS (
      SELECT t AS w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(w) AS t FROM toks) WHERE t <> '' GROUP BY t
    ), subs AS (
      SELECT substr(w, i, l) AS piece, CAST(sum(freq) AS BIGINT) AS sfreq
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) a,
           LATERAL (SELECT unnest(generate_series(2, 6)) AS l) b
      WHERE i + l - 1 <= len(w) GROUP BY piece
    ), multi AS (SELECT piece FROM subs ORDER BY sfreq DESC, piece LIMIT 200),
    chars AS (
      SELECT DISTINCT substr(w, i, 1) AS piece
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) a
    ), vocab AS (SELECT piece FROM multi UNION SELECT piece FROM chars),
    compounds AS (
      SELECT w[i] || w[i+1] AS cw, CAST(count(*) AS BIGINT) AS freq
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
      WHERE w[i] <> '' AND w[i+1] <> ''
      GROUP BY cw
    ), seg AS (
      SELECT cw, 1 AS pos, CAST('' AS VARCHAR) AS pieces, 0 AS n_pieces FROM compounds
      UNION ALL
      SELECT s.cw, s.pos + len(v.piece),
             CASE WHEN s.pieces = '' THEN v.piece
                  ELSE s.pieces || '|' || v.piece END,
             s.n_pieces + 1
      FROM seg s JOIN vocab v ON substr(s.cw, s.pos, len(v.piece)) = v.piece
      WHERE s.pos <= len(s.cw)
        AND NOT EXISTS (SELECT 1 FROM vocab v2
          WHERE len(v2.piece) > len(v.piece)
            AND substr(s.cw, s.pos, len(v2.piece)) = v2.piece)
    )
    SELECT c.cw AS compound, c.freq, d.n_pieces, d.pieces
    FROM compounds c
    JOIN (SELECT cw, pieces, n_pieces FROM seg WHERE pos = len(cw) + 1) d USING (cw)
    ORDER BY c.freq DESC, c.cw LIMIT 50
    """,
    tags=("text", "llm", "tokenizer"),
)
def tokenizer_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style greedy MaxMatch, HASH-CHECKED end to end: a
    frequency-selected subword vocabulary (top-200 substrings + all
    chars) segments out-of-vocabulary COMPOUNDS (adjacent word pairs
    concatenated — the OOV case subword tokenizers exist for), and
    the full segmentation of the top-50 compounds matches a
    recursive-CTE MaxMatch oracle piece for piece. Completes the
    tokenizer trio (BPE ``tokenizer_bpe_*``, Unigram-LM
    ``tokenizer_unigram_em``) — and unlike those rows-only trainers,
    the encode here is oracle-exact.

    Scale: vocab selection shuffles (piece, count) partials once;
    encoding touches only DISTINCT targets (vocabulary-sized) in an
    Arrow-batched kernel and joins counts back by key — the same
    decouple-from-corpus-size posture as bpe_encode_stats.
    """
    d = load_table(spark, sf_dir, "documents")
    from lakehouse_test_spark.operators.text import ws_tokens

    vocab = [r["piece"] for r in wordpiece_vocab(d).collect()]
    toks = d.select(ws_tokens(F.col("text")).alias("w"))
    compounds = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(w) - 1, 0)),"
                    " i -> struct(element_at(w, i) AS t1, element_at(w, i + 1) AS t2))"
                )
            ).alias("b")
        )
        .where((F.col("b.t1") != "") & (F.col("b.t2") != ""))
        .select(F.concat("b.t1", "b.t2").alias("cw"))
        .groupBy("cw")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    seg = wordpiece_encode(compounds, vocab, "cw")
    return (
        compounds.join(seg, "cw")
        .select(F.col("cw").alias("compound"), "freq", "n_pieces", "pieces")
        .orderBy(F.desc("freq"), "compound")
        .limit(50)
    )
