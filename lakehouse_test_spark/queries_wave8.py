"""Round-3 wave F: distributed classical-ML text/embedding operators —
multinomial Naive Bayes language classification, embedding dimension
correlation screening, matryoshka (truncated-dimension) retrieval
quality, and a Unigram-LM (SentencePiece-style) tokenizer trained by
EM — plus their corpus-observability outputs.

These extend the LLM-pipeline battery along the "model-adjacent data
ops" axis: a pretraining pipeline trains cheap classifiers (quality /
language gates), audits embedding spaces before ANN serving, and
trains tokenizers; each op here is expressed so the heavy state stays
either map-side or vocabulary-sized (the discipline from
operators/tokens.py: iteration state must scale with the VOCAB, not
the corpus).

The reference has none of this (it is a Pulsar/Kafka harness,
SURVEY.md §0); all of it belongs to the mandated LLM-data extension
(BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.text import ws_tokens
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "text_naive_bayes_lang",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    toks2 AS (SELECT * FROM toks WHERE tok <> ''),
    class_tok AS (
      SELECT lang, tok, count(*) AS c FROM toks2 GROUP BY lang, tok
    ),
    class_tot AS (
      SELECT lang, sum(c) AS tot FROM class_tok GROUP BY lang
    ),
    vocab AS (SELECT count(DISTINCT tok) AS v FROM toks2),
    prior AS (
      SELECT lang, ln(count(*) * 1.0 / (SELECT count(*) FROM documents)) AS lp
      FROM documents GROUP BY lang
    ),
    doc_tok AS (
      SELECT doc_id, tok, count(*) AS n FROM toks2 GROUP BY doc_id, tok
    ),
    scores AS (
      SELECT dt.doc_id, ct.lang,
             round(p.lp + sum(dt.n * ln((COALESCE(ctk.c, 0) + 1.0)
                                        / (ct.tot + (SELECT v FROM vocab)))), 6)
               AS score
      FROM doc_tok dt
      CROSS JOIN class_tot ct
      LEFT JOIN class_tok ctk ON ctk.lang = ct.lang AND ctk.tok = dt.tok
      JOIN prior p ON p.lang = ct.lang
      GROUP BY dt.doc_id, ct.lang, p.lp, ct.tot
    ),
    best AS (
      SELECT doc_id, lang AS predicted,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
      FROM scores
    )
    SELECT d.lang, b.predicted,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM best b JOIN documents d USING (doc_id)
    WHERE b.rk = 1
    GROUP BY d.lang, b.predicted
    """,
    tags=("text", "llm", "ml", "classifier"),
)
def text_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND scored
    in one job graph: per-(lang, token) counts with add-one smoothing
    → per-doc log-likelihood + log-prior → argmax — the cheap
    classifier gate every pretraining pipeline runs, as pure
    DataFrame algebra. Output is the confusion matrix (true lang ×
    predicted), the artifact a data-quality dashboard actually shows.

    Parity discipline: scores are rounded to 6dp BEFORE the argmax in
    both engines, so cross-engine double-summation drift (different
    reduction orders) cannot flip near-ties; remaining exact ties
    break by lang ascending.

    Scale: class-conditional counts are one (lang, token) aggregate —
    vocabulary-sized state, map-side partials; scoring joins each
    doc's distinct tokens against the per-class table (broadcast when
    |vocab|×|classes| is small, shuffle otherwise) and needs no
    per-row Python. The NB model here IS a DataFrame — persisting it
    as a table gives online scoring for free.
    """
    d = T(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = (
        d.select("doc_id", "lang", F.explode(ws_tokens(F.col("text"))).alias("tok"))
        .where(F.length("tok") > 0)
    )
    class_tok = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    class_tot = class_tok.groupBy("lang").agg(F.sum("c").alias("tot"))
    v = class_tok.select("tok").distinct().count()
    prior = d.groupBy("lang").agg(
        F.log(F.count(F.lit(1)) / F.lit(float(n_docs))).alias("lp")
    )
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    # score every doc against every class: doc_tok × classes, left join
    # the class-conditional counts (absent -> smoothed floor)
    classes = class_tot.join(prior, "lang")
    scored = (
        doc_tok.crossJoin(F.broadcast(classes.select("lang", "tot", "lp")))
        .join(
            class_tok.select(
                F.col("lang").alias("lang2"), F.col("tok").alias("tok2"), "c"
            ),
            (F.col("lang") == F.col("lang2")) & (F.col("tok") == F.col("tok2")),
            "left",
        )
        .groupBy("doc_id", "lang", "tot", "lp")
        .agg(
            F.round(
                F.first("lp")
                + F.sum(
                    F.col("n")
                    * F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                        / (F.col("tot") + F.lit(float(v)))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    best = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("lang").alias("predicted"))
    )
    return (
        best.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "embedding_dim_correlations",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             {cols}
      FROM embeddings
    ),
    pairs AS (
      {unions}
    )
    SELECT i, j, corr_ij
    FROM pairs
    ORDER BY abs(corr_ij) DESC, i, j
    LIMIT 10
    """.format(
        cols=", ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) AS d{i}" for i in range(16)
        ),
        unions="\n      UNION ALL\n      ".join(
            f"SELECT {i} AS i, {j} AS j, CAST(round(corr(d{i}, d{j}), 6) AS DOUBLE) AS corr_ij FROM x"
            for i in range(16)
            for j in range(i + 1, 16)
        ),
    ),
    tags=("embeddings", "llm", "ml", "agg"),
)
def embedding_dim_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space audit: Pearson correlation for every pair of
    the first 16 dimensions (120 pairs), top-10 by |corr| — the
    screening step before whitening / PCA / dimension dropping in an
    embedding pipeline (correlated dims waste index bits).

    Scale: NO explode and NO shuffle growth — each pair is one
    ``corr`` aggregate over projected array elements, all 120 computed
    map-side in a single pass with partial aggregation; output is 120
    rows regardless of corpus size. (The full 64×64 matrix is the same
    plan with 2016 aggregates, or a Pandas-UDF Gram-matrix kernel if
    the optimizer balks; 16 keeps the oracle tractable.)
    """
    e = T(spark, sf_dir, "embeddings")
    base = e.select(
        *[F.col("embedding")[i].cast("double").alias(f"d{i}") for i in range(16)]
    )
    aggs = [
        F.round(F.corr(f"d{i}", f"d{j}"), 6).alias(f"c_{i}_{j}")
        for i in range(16)
        for j in range(i + 1, 16)
    ]
    row = base.agg(*aggs)
    pairs = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.lit(j).alias("j"),
                        F.col(f"c_{i}_{j}").alias("corr_ij"),
                    )
                    for i in range(16)
                    for j in range(i + 1, 16)
                ]
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.corr_ij")
    return pairs.orderBy(F.abs(F.col("corr_ij")).desc(), "i", "j").limit(10)


@query(
    "embedding_matryoshka_recall",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    full_sim AS (
      SELECT e.vec_id,
             list_aggregate(list_transform(range(1, 65),
               i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) * q.qe[CAST(i AS INTEGER)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) ^ 2), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> CAST(q.qe[CAST(i AS INTEGER)] AS DOUBLE) ^ 2), 'sum'))) AS s
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    trunc_sim AS (
      SELECT e.vec_id,
             list_aggregate(list_transform(range(1, 17),
               i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) * q.qe[CAST(i AS INTEGER)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 17),
                  i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) ^ 2), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 17),
                  i -> CAST(q.qe[CAST(i AS INTEGER)] AS DOUBLE) ^ 2), 'sum'))) AS s
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    topf AS (SELECT vec_id FROM full_sim ORDER BY round(s, 6) DESC, vec_id LIMIT 20),
    topt AS (SELECT vec_id FROM trunc_sim ORDER BY round(s, 6) DESC, vec_id LIMIT 20)
    SELECT CAST(16 AS INTEGER) AS trunc_dim,
           CAST((SELECT count(*) FROM topf JOIN topt USING (vec_id)) AS BIGINT)
             AS overlap_at_20,
           CAST(round((SELECT count(*) FROM topf JOIN topt USING (vec_id)) / 20.0, 4)
                AS DOUBLE) AS recall_at_20
    """,
    tags=("embeddings", "llm", "similarity"),
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka audit: how much retrieval quality survives truncating
    embeddings to their first 16 of 64 dimensions — top-20 overlap
    between full-dim and truncated-dim cosine rankings for the probe
    vector. This is the measurement that justifies (or vetoes) serving
    a 4× cheaper index; MRL-trained embedding models are deployed
    exactly this way.

    Parity: both engines rank on round(sim, 6) with vec_id tiebreak.
    Scale: two TakeOrdered scans (no global sort), one-row output.
    """
    from lakehouse_test_spark.operators.dedup import cosine

    e = T(spark, sf_dir, "embeddings")
    qrow = e.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    rest = e.where(F.col("vec_id") != 0)

    def topk(vec_expr, qlit, k=20):
        return (
            rest.select(
                "vec_id", F.round(cosine(vec_expr, F.lit(qlit)), 6).alias("s")
            )
            .orderBy(F.desc("s"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id")
        )

    full = topk(F.col("embedding"), qvec)
    trunc = topk(F.slice(F.col("embedding"), 1, 16), qvec[:16])
    overlap = full.join(trunc, "vec_id").count()
    return spark.createDataFrame(
        [(16, overlap, round(overlap / 20.0, 4))],
        "trunc_dim int, overlap_at_20 bigint, recall_at_20 double",
    )


@query(
    "lm_kneser_ney_bigram",
    oracle="""
    WITH lists AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ts
      FROM documents
    ),
    bi AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM lists, unnest(range(1, len(ts))) AS r(i)
    ),
    big_c AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    uni_c AS (SELECT w1, sum(c) AS cw1, count(*) AS n1_fwd FROM big_c GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n1_bwd FROM big_c GROUP BY w2),
    tot AS (SELECT count(*) AS n_types FROM big_c),
    scored AS (
      SELECT bi.doc_id,
             ln(greatest(bc.c - 0.75, 0) / uc.cw1
                + 0.75 * uc.n1_fwd / uc.cw1 * (ct.n1_bwd * 1.0 / tot.n_types))
               AS lp
      FROM bi
      JOIN big_c bc ON bc.w1 = bi.w1 AND bc.w2 = bi.w2
      JOIN uni_c uc ON uc.w1 = bi.w1
      JOIN cont ct ON ct.w2 = bi.w2
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(exp(-avg(lp)), 4) AS DOUBLE) AS ppl
    FROM scored
    GROUP BY doc_id
    """,
    tags=("text", "llm", "ml", "lm"),
)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram
    LM trained on the corpus itself (absolute discount D=0.75) — the
    REAL statistical LM behind classic perplexity-based quality
    filtering (CCNet-style), upgrading the heuristic proxy in
    ``lm_perplexity_proxy``:

        P(w2|w1) = max(c(w1,w2)-D, 0)/c(w1)
                 + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)

    Scale: the model is three aggregates over the bigram table
    (|bigram types|-bounded — Zipf keeps this millions of rows at
    100 TB, not corpus-sized); scoring joins each doc's bigrams to the
    model on the bigram key (shuffle bounded by corpus bigrams, with
    map-side partial aggregation on the final per-doc average). No
    Python anywhere; the train→score loop is one job graph, and
    persisting ``big_c``/``uni_c``/``cont`` as tables gives an online
    scorer. Parity: ln/exp on doubles, 4dp rounding absorbs summation-
    order drift.
    """
    d = T(spark, sf_dir, "documents")
    # bigrams in-plan from the filtered token array (arrays_zip of the
    # array with its own tail) — no positional self-join needed
    ts = F.filter(ws_tokens(F.col("text")), lambda x: x != "")
    bi = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(ts, 1, F.size(ts) - 1).alias("w1"),
                F.slice(ts, 2, F.size(ts) - 1).alias("w2"),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    big_c = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uni_c = big_c.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n1_fwd")
    )
    cont = big_c.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    n_types = big_c.count()
    D = 0.75
    lp = F.log(
        F.greatest(F.col("c") - D, F.lit(0.0)) / F.col("cw1")
        + D * F.col("n1_fwd") / F.col("cw1") * (F.col("n1_bwd") / F.lit(float(n_types)))
    )
    scored = (
        bi.join(big_c, ["w1", "w2"])
        .join(uni_c, "w1")
        .join(cont, "w2")
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
    )


@query(
    "sketch_count_min_terms",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    toks2 AS (SELECT tok FROM toks WHERE tok <> ''),
    hashed AS (
      SELECT tok, s,
             CAST(concat('0x', substr(md5(s || tok), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM toks2, range(0, 4) r(s)
    ),
    sketch AS (
      SELECT s, bucket, count(*) AS c FROM hashed GROUP BY s, bucket
    ),
    exact AS (
      SELECT tok, count(*) AS exact_count
      FROM toks2 GROUP BY tok
      ORDER BY exact_count DESC, tok LIMIT 20
    ),
    est AS (
      SELECT e.tok, e.exact_count, min(sk.c) AS cms_count
      FROM exact e, range(0, 4) r(s)
      JOIN sketch sk
        ON sk.s = r.s
       AND sk.bucket = CAST(concat('0x', substr(md5(r.s || e.tok), 1, 8)) AS BIGINT) % 1024
      GROUP BY e.tok, e.exact_count
    )
    SELECT tok AS term,
           CAST(exact_count AS BIGINT) AS exact_count,
           CAST(cms_count AS BIGINT) AS cms_count
    FROM est
    """,
    tags=("tokens", "llm", "sketch", "agg"),
)
def sketch_count_min_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream (d=4 rows × w=1024
    counters, md5-derived bucket hashes that BOTH engines reproduce
    bit-identically), then the top-20 exact terms estimated back from
    the sketch — the mergeable fixed-memory frequency structure used
    for heavy-hitter monitoring on unbounded streams. The oracle
    rebuilds the identical sketch, so the hash check proves every
    counter, not just the estimates; CMS guarantees estimate >= exact,
    seen directly in the output columns.

    Scale: the sketch is d×w = 4096 counters regardless of corpus
    size — one groupBy on (seed, bucket) with map-side partials, the
    exact shape a 100 TB stream aggregates into; per-partition
    sketches merge by cell-wise sum, which is what the partial
    aggregate already does.
    """
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.explode(ws_tokens(F.col("text"))).alias("tok")).where(
        F.length("tok") > 0
    )
    W, D = 1024, 4

    def bucket(seed_col, tok_col):
        return (
            F.conv(F.substring(F.md5(F.concat(seed_col.cast("string"), tok_col)), 1, 8), 16, 10)
            .cast("bigint")
            % W
        )

    hashed = toks.select(
        "tok", F.explode(F.array(*[F.lit(s) for s in range(D)])).alias("s")
    ).select("s", "tok", bucket(F.col("s"), F.col("tok")).alias("bucket"))
    sketch = hashed.groupBy("s", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(20)
    )
    est = (
        exact.select(
            "tok", "exact_count", F.explode(F.array(*[F.lit(s) for s in range(D)])).alias("s")
        )
        .withColumn("bucket", bucket(F.col("s"), F.col("tok")))
        .join(sketch, ["s", "bucket"])
        .groupBy("tok", "exact_count")
        .agg(F.min("c").alias("cms_count"))
    )
    return est.select(
        F.col("tok").alias("term"),
        F.col("exact_count").cast("bigint"),
        F.col("cms_count").cast("bigint"),
    )


@query(
    "timeseries_cusum_changepoints",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value) AS x
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT avg(x) AS mu, stddev_samp(x) AS sigma FROM daily
    ),
    ordered AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    walk(rn, day, x, cpos, cneg) AS (
      SELECT o.rn, o.day, o.x,
             greatest(0, (o.x - s.mu) / s.sigma - 0.5),
             greatest(0, -((o.x - s.mu) / s.sigma) - 0.5)
      FROM ordered o, stats s WHERE o.rn = 1
      UNION ALL
      SELECT o.rn, o.day, o.x,
             greatest(0, w.cpos + (o.x - s.mu) / s.sigma - 0.5),
             greatest(0, w.cneg - (o.x - s.mu) / s.sigma - 0.5)
      FROM walk w JOIN ordered o ON o.rn = w.rn + 1, stats s
    )
    SELECT day,
           CAST(round(x, 2) AS DOUBLE) AS daily_value,
           CAST(round(cpos, 4) AS DOUBLE) AS cusum_pos,
           CAST(round(cneg, 4) AS DOUBLE) AS cusum_neg,
           (cpos > 4.0 OR cneg > 4.0) AS changepoint
    FROM walk
    """,
    tags=("timeseries", "events", "window", "anomaly"),
)
def timeseries_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection over the daily event-value series: the
    standardized cumulative-sum pair (positive/negative drift, slack
    k=0.5σ) with changepoints flagged past h=4σ — the classic
    sequential changepoint detector, which no plain window function
    can express (each step depends on the CLAMPED previous value).

    Implementation: the day series aggregates to ONE bounded array
    (calendar days, not corpus rows — ~365/year at any data scale),
    and the recursion runs as an in-plan ``aggregate`` fold over the
    sorted array — zero Python, zero extra shuffle past the daily
    rollup. The DuckDB oracle walks the identical recursion with a
    recursive CTE; identical fold order makes doubles reproducible.
    """
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day")).agg(
        F.sum("value").alias("x")
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s"),
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sigma"),
    )
    step = lambda acc, e: F.struct(  # noqa: E731
        F.concat(
            acc["rows"],
            F.array(
                F.struct(
                    e["day"].alias("day"),
                    e["x"].alias("x"),
                    F.greatest(
                        F.lit(0.0),
                        acc["cpos"] + (e["x"] - F.col("mu")) / F.col("sigma") - 0.5,
                    ).alias("cpos"),
                    F.greatest(
                        F.lit(0.0),
                        acc["cneg"] - (e["x"] - F.col("mu")) / F.col("sigma") - 0.5,
                    ).alias("cneg"),
                )
            ),
        ).alias("rows"),
        F.greatest(
            F.lit(0.0), acc["cpos"] + (e["x"] - F.col("mu")) / F.col("sigma") - 0.5
        ).alias("cpos"),
        F.greatest(
            F.lit(0.0), acc["cneg"] - (e["x"] - F.col("mu")) / F.col("sigma") - 0.5
        ).alias("cneg"),
    )
    zero = F.struct(
        F.array().cast(
            "array<struct<day:date,x:double,cpos:double,cneg:double>>"
        ).alias("rows"),
        F.lit(0.0).alias("cpos"),
        F.lit(0.0).alias("cneg"),
    )
    walked = series.select(
        F.aggregate(F.col("s"), zero, step, lambda acc: acc["rows"]).alias("rows")
    )
    return walked.select(F.explode("rows").alias("r")).select(
        F.col("r.day").alias("day"),
        F.round("r.x", 2).alias("daily_value"),
        F.round("r.cpos", 4).alias("cusum_pos"),
        F.round("r.cneg", 4).alias("cusum_neg"),
        ((F.col("r.cpos") > 4.0) | (F.col("r.cneg") > 4.0)).alias("changepoint"),
    )


@query(
    "corpus_train_val_test_split",
    oracle="""
    WITH assigned AS (
      SELECT source,
             CASE
               WHEN CAST(concat('0x', substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
                    % 100 < 80 THEN 'train'
               WHEN CAST(concat('0x', substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
                    % 100 < 90 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY source, split
    """,
    tags=("tokens", "llm", "sampling"),
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by salted
    content hash (md5 — reproduced bit-identically by the oracle),
    reported per source. The split is a pure projection: stable under
    re-runs, re-partitioning, and incremental arrivals (a new doc's
    split never depends on other docs), which is the property that
    makes splits reproducible across a 100 TB pipeline's daily runs —
    no shuffle, no sampling state, no seed files.
    """
    d = T(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def logreg_train_gd(
    xy: DataFrame, n_features: int, iters: int = 10, lr: float = 1.0
) -> list[float]:
    """Distributed batch-gradient-descent logistic regression.

    The whole training loop is aggregates: each iteration computes
    grad_k = mean((sigmoid(x·w) − y) · x_k) as ONE job of K+1 sums
    with map-side partials — model state is K+1 floats on the driver,
    data never moves. Gradient terms are cast to DECIMAL(28,18)
    before summing (fpsafe discipline), making the sums associative →
    bit-identical weights at ANY partitioning/parallelism, which is
    what lets a 100 TB training run reproduce.

    ``xy`` needs columns x0..x{K-1} (x0 = bias 1.0) and label y∈{0,1}.
    """
    w = [0.0] * n_features
    n = xy.count()
    for _ in range(iters):
        z = sum(F.col(f"x{k}") * float(w[k]) for k in range(n_features))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        aggs = [
            F.sum(((p - F.col("y")) * F.col(f"x{k}")).cast("decimal(28,18)")).alias(
                f"g{k}"
            )
            for k in range(n_features)
        ]
        row = xy.agg(*aggs).head()
        w = [w[k] - lr * float(row[f"g{k}"]) / n for k in range(n_features)]
    return w


@query("text_quality_logreg", oracle=None, tags=("text", "llm", "ml", "classifier", "iterative"))
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression text classifier trained end-to-end IN the
    engine (10 GD epochs, decimal-exact gradient aggregates): simple
    shape features (log length, token count, mean token length,
    distinct-token ratio) standardized corpus-wide, predicting
    lang='en' — the trainable-quality-gate shape (fastText-style
    linear classifier) that pipelines retrain per corpus snapshot.
    Output: standardized feature weights (4dp) plus the training
    accuracy row. Rows-only gate (iterative); exact parity with a
    numpy reference is pinned in tests/test_wave8_ml.py.
    """
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    raw = d.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        F.log(F.lit(1.0) + F.col("n_chars")).alias("f1"),
        F.size(toks).cast("double").alias("f2"),
        (F.col("n_chars") / F.greatest(F.size(toks), F.lit(1))).alias("f3"),
        (
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))
        ).alias("f4"),
    )
    stats = raw.agg(
        *[F.avg(f"f{i}").alias(f"m{i}") for i in range(1, 5)],
        *[F.stddev_samp(f"f{i}").alias(f"s{i}") for i in range(1, 5)],
    ).head()
    xy = raw.select(
        "y",
        F.lit(1.0).alias("x0"),
        *[
            (
                (F.col(f"f{i}") - float(stats[f"m{i}"]))
                / (float(stats[f"s{i}"]) or 1.0)
            ).alias(f"x{i}")
            for i in range(1, 5)
        ],
    ).localCheckpoint()  # freeze features: GD re-reads them 10x
    w = logreg_train_gd(xy, 5)
    z = sum(F.col(f"x{k}") * float(w[k]) for k in range(5))
    acc = (
        xy.select(((z > 0).cast("double") == F.col("y")).cast("double").alias("ok"))
        .agg(F.avg("ok"))
        .head()[0]
    )
    names = ["bias", "log_chars", "n_tokens", "chars_per_token", "distinct_ratio"]
    rows = [(n, round(wk, 4)) for n, wk in zip(names, w)]
    rows.append(("__train_accuracy__", round(float(acc), 4)))
    return spark.createDataFrame(rows, "feature string, weight double")


@query(
    "classifier_auc_rank",
    oracle="""
    WITH scored AS (
      SELECT (lang = 'en') AS is_pos,
             round(CAST(length(text) AS DOUBLE)
                   / (1.0 + len(list_filter(string_split_regex(lower(text), '\\s+'),
                                            x -> x <> ''))), 6) AS score,
             doc_id
      FROM documents
    ),
    ranked AS (
      SELECT is_pos,
             row_number() OVER (ORDER BY score, doc_id) AS rk
      FROM scored
    ),
    agg AS (
      SELECT sum(CASE WHEN is_pos THEN rk ELSE 0 END) AS pos_rank_sum,
             sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS n_pos,
             sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS n_neg
      FROM ranked
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(round((pos_rank_sum - n_pos * (n_pos + 1) / 2.0)
                      / (n_pos * n_neg), 6) AS DOUBLE) AS auc
    FROM agg
    """,
    tags=("text", "llm", "ml", "evaluation", "window"),
)
def classifier_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of a score against a label, computed distributed by the
    Mann-Whitney rank identity: AUC = (Σ ranks of positives −
    n⁺(n⁺+1)/2) / (n⁺n⁻) — the evaluation every trained gate
    (text_quality_logreg, text_naive_bayes_lang) needs, with no
    threshold sweep and no per-threshold passes. Here the scored
    signal is chars-per-token against lang='en'.

    Parity: scores rounded to 6dp before ranking; remaining ties
    break by doc_id in both engines, making ranks identical (the
    rank-sum identity is tie-sensitive, so the tiebreak IS the
    contract). Scale: ranks come from the HIERARCHICAL
    global_row_number (range shuffle + per-partition offsets — no
    Exchange SinglePartition under a window), bit-identical to
    ``row_number() OVER (ORDER BY score, doc_id)``; corpus-grain
    input stays distributed end-to-end.
    """
    from lakehouse_test_spark.operators.ordering import global_row_number

    d = T(spark, sf_dir, "documents")
    toks = F.filter(ws_tokens(F.col("text")), lambda x: x != "")
    scored = d.select(
        (F.col("lang") == "en").alias("is_pos"),
        F.round(
            F.length("text").cast("double") / (F.lit(1.0) + F.size(toks)), 6
        ).alias("score"),
        "doc_id",
    )
    ranked = global_row_number(scored, ["score", "doc_id"], "rk")
    agg = ranked.agg(
        F.sum(F.when(F.col("is_pos"), F.col("rk")).otherwise(0)).alias("pos_rank_sum"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("n_neg"),
    )
    return agg.select(
        F.col("n_pos").cast("bigint"),
        F.col("n_neg").cast("bigint"),
        F.round(
            (F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


def _hw_oracle() -> str:
    """Generate the Holt-Winters recursive-CTE oracle (m=7 seasonal
    state as scalar columns; the new-level expression inlined where
    the recursion needs it)."""
    a, b, g, m = 0.3, 0.1, 0.2, 7
    s_old = "CASE (o.rn - 1) % 7 " + " ".join(
        f"WHEN {k} THEN w.s{k}" for k in range(m)
    ) + " END"
    l_new = f"({a} * (o.x - {s_old}) + {1 - a} * (w.level + w.trend))"
    seas_updates = ", ".join(
        f"CASE WHEN (o.rn - 1) % 7 = {k} "
        f"THEN {g} * (o.x - {l_new}) + {1 - g} * w.s{k} ELSE w.s{k} END"
        for k in range(m)
    )
    s_init = ", ".join(
        f"(SELECT x FROM ordered WHERE rn = {k + 1}) - i.L" for k in range(m)
    )
    return f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(value) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    ordered AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    init AS (
      SELECT (SELECT avg(x) FROM ordered WHERE rn BETWEEN 1 AND 7) AS L,
             ((SELECT avg(x) FROM ordered WHERE rn BETWEEN 8 AND 14)
              - (SELECT avg(x) FROM ordered WHERE rn BETWEEN 1 AND 7)) / 7.0 AS B
    ),
    walk(rn, level, trend, {", ".join(f"s{k}" for k in range(m))}, day, x, fitted) AS (
      SELECT 7, CAST(i.L AS DOUBLE), CAST(i.B AS DOUBLE), {s_init},
             CAST(NULL AS DATE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      FROM init i
      UNION ALL
      SELECT o.rn,
             {l_new},
             {b} * ({l_new} - w.level) + {1 - b} * w.trend,
             {seas_updates},
             o.day, o.x,
             w.level + w.trend + {s_old}
      FROM walk w JOIN ordered o ON o.rn = w.rn + 1
    )
    SELECT day,
           CAST(round(x, 2) AS DOUBLE) AS daily_value,
           CAST(round(fitted, 4) AS DOUBLE) AS fitted,
           CAST(round(x - fitted, 4) AS DOUBLE) AS resid
    FROM walk WHERE rn >= 8
    """


@query(
    "timeseries_holt_winters",
    oracle=_hw_oracle(),
    tags=("timeseries", "events", "anomaly", "forecast"),
)
def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing over the
    daily event-value series (α=0.3, β=0.1, γ=0.2, weekly season):
    per-day one-step-ahead fitted values and residuals — the
    workhorse forecaster/anomaly-baseline, and another operator whose
    level/trend/seasonal state makes every step depend on the full
    transformed past (inexpressible with window functions).

    Implementation mirrors timeseries_cusum_changepoints: the bounded
    calendar-day series folds in-plan with a (level, trend,
    seasonal-array) struct accumulator — the seasonal slot updates via
    an indexed transform — zero Python, zero shuffle past the daily
    rollup. The DuckDB oracle walks the identical recursion with the
    seven seasonal slots as scalar recursive-CTE columns; identical
    operation order keeps doubles bit-equal before the 4dp rounding.
    """
    ALPHA, BETA, GAMMA, M = 0.3, 0.1, 0.2, 7
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day")).agg(
        F.sum("value").cast("double").alias("x")
    )
    series = daily.agg(F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s"))
    xs = F.transform(F.col("s"), lambda e_: e_["x"])
    mean7 = lambda arr: (  # noqa: E731
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v) / 7.0
    )
    prepared = series.select(
        "s",
        mean7(F.slice(xs, 1, 7)).alias("L0"),
        ((mean7(F.slice(xs, 8, 7)) - mean7(F.slice(xs, 1, 7))) / 7.0).alias("B0"),
        F.size("s").alias("n"),
    ).select(
        "s",
        "L0",
        "B0",
        "n",
        F.transform(F.slice(xs, 1, 7), lambda v: v - F.col("L0")).alias("seas0"),
    )

    def step(acc, i):
        e_ = F.element_at(F.col("s"), i)
        x = e_["x"]
        pos0 = (i - 1) % M  # 0-based seasonal slot
        s_old = F.element_at(acc["seas"], pos0 + 1)
        fitted = acc["level"] + acc["trend"] + s_old
        l_new = ALPHA * (x - s_old) + (1 - ALPHA) * (acc["level"] + acc["trend"])
        b_new = BETA * (l_new - acc["level"]) + (1 - BETA) * acc["trend"]
        seas_new = F.transform(
            acc["seas"],
            lambda v, j: F.when(
                j == pos0, GAMMA * (x - l_new) + (1 - GAMMA) * v
            ).otherwise(v),
        )
        row = F.struct(
            e_["day"].alias("day"),
            x.alias("x"),
            fitted.alias("fitted"),
        )
        return F.struct(
            l_new.alias("level"),
            b_new.alias("trend"),
            seas_new.alias("seas"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    zero = F.struct(
        F.col("L0").alias("level"),
        F.col("B0").alias("trend"),
        F.col("seas0").alias("seas"),
        F.array()
        .cast("array<struct<day:date,x:double,fitted:double>>")
        .alias("out"),
    )
    walked = prepared.where(F.col("n") >= 14).select(
        F.aggregate(
            F.sequence(F.lit(8), F.col("n")), zero, step, lambda acc: acc["out"]
        ).alias("rows")
    )
    return walked.select(F.explode("rows").alias("r")).select(
        F.col("r.day").alias("day"),
        F.round("r.x", 2).alias("daily_value"),
        F.round("r.fitted", 4).alias("fitted"),
        F.round(F.col("r.x") - F.col("r.fitted"), 4).alias("resid"),
    )
