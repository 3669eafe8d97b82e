"""Round-2 wave E: bitmap-exact distinct counting, EWMA smoothing,
market-basket co-occurrence, Pareto (skyline) frontier, pipeline gate
attrition, corpus-divergence diagnostics, sentence stats, rolling
z-score anomalies, lag-1 autocorrelation, A/B z-stat, GROUP BY ALL /
FILTER-clause dialect parity, centered regr_* trend aggregates,
higher-order map functions, chi-square independence, and per-dimension
embedding statistics.

These extend SURVEY.md §2b (aggregation/window/join groups) and the
LLM-pipeline battery with the remaining "operations a large-scale
training-data pipeline would need": corpus observability (per-gate
attrition, per-source distribution drift) and exact distinct counting
at 100 TB via fixed-width bitmaps instead of shuffling raw IDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround
from lakehouse_test_spark.operators.text import ws_tokens
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_distinct_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "bitmap", "events"),
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per event type via Spark 3.5 bitmap
    aggregates — the scale path for exact COUNT(DISTINCT id) over
    integer keys.

    Plan shape: level 1 groups by (event_type, bucket =
    id / 32768) and ORs per-bucket bitmaps (map-side combinable, each
    partial is a <=4 KB fixed-width bitmap regardless of row count);
    level 2 sums bitmap_count per event_type. The shuffle carries
    one bitmap per (type, bucket) instead of every distinct raw id —
    at 100 TB that is the difference between a bounded metadata
    shuffle and re-shuffling the entire key column. The count is
    exact, unlike approx_count_distinct (agg_approx_sketches).

    n_events rides along in level 1 and sums in level 2, so both
    metrics come from ONE scan and one two-level aggregate.
    """
    e = T(spark, sf_dir, "events")
    buckets = (
        e.groupBy("event_type", F.bitmap_bucket_number(F.col("user_id")).alias("bucket"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return buckets.groupBy("event_type").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_distinct_users"),
        F.sum("n").alias("n_events"),
    )


@query(
    "timeseries_ewma_user",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(round(list_reduce(vals, (acc, x) -> acc * 0.8 + x * 0.2), 6) AS DOUBLE)
             AS ewma_value
    FROM ordered
    """,
    tags=("timeseries", "events", "agg"),
)
def timeseries_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.2) of each
    user's value series — the classic smoothing recursion
    y_t = alpha*x_t + (1-alpha)*y_{t-1}, which no built-in window
    frame expresses (every prior row contributes, geometrically
    decayed).

    Implemented as ONE hash aggregate (collect ordered series per
    user) plus an in-plan higher-order fold: array_sort on a
    (ts, event_id, value) struct makes the order total and engine-
    independent, then F.aggregate folds left-to-right seeded with the
    first element — exactly DuckDB's list_reduce semantics, so both
    engines execute the identical IEEE op sequence and the result is
    bit-reproducible (no rounding-boundary flake).

    Scale: state per user is the series itself, bounded by per-user
    event counts (panel data, not unbounded); for truly unbounded
    series the same fold runs incrementally via
    applyInPandasWithState (udf_stateful_session_counter shows that
    harness). A single shuffle on user_id, map-side partial lists.
    """
    e = T(spark, sf_dir, "events")
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    return (
        e.groupBy("user_id")
        .agg(pairs.alias("pairs"))
        .select(
            "user_id",
            F.size("pairs").cast("bigint").alias("n_events"),
            F.round(
                F.aggregate(
                    F.slice(
                        F.transform(F.col("pairs"), lambda p: p["value"]),
                        2,
                        F.greatest(F.size("pairs") - 1, F.lit(0)),
                    ),
                    F.element_at(F.transform(F.col("pairs"), lambda p: p["value"]), 1),
                    lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
                ),
                6,
            ).alias("ewma_value"),
        )
    )


@query(
    "basket_copurchase_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("join", "basket", "lineitem"),
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs bought together
    in the same order — the candidate-generation step of frequent-
    itemset mining (A-priori's k=2 pass) as one equi-self-join.

    Scale: the join is an EQUI-join on l_orderkey, so it shuffles both
    sides by order key and expands pairs only within an order —
    output is sum over orders of C(basket,2), bounded by basket size
    (<=13 in this corpus; real carts are similarly capped), never
    all-pairs across orders. The final top-20 is TakeOrdered, no
    global sort. Skewed mega-baskets would salt the same way as
    join_salted_skew.
    """
    items = (
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(F.desc("n_orders"), "part_a", "part_b").limit(20)


@query(
    "pareto_frontier_parts",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_type = p.p_type
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("join", "skyline", "part"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) per part type: parts where no same-
    type part is both cheaper-or-equal and larger-or-equal (with one
    strict) — the multi-objective "best tradeoff" query.

    Scale: dominance is checked WITHIN p_type, so the anti-join is an
    equi-join on p_type with a theta residual — Spark shuffles by
    type and compares only intra-group, never the full cross product.
    For a single giant group the standard refinement is pre-filtering
    with the per-group sort-by-price running-max-of-size pass (a
    window) which shrinks candidates to the frontier superset; group
    sizes here (<=400) don't need it. Output order is irrelevant
    (hash-compared); no LIMIT, no driver loop.
    """
    p = T(spark, sf_dir, "part").select("p_type", "p_partkey", "p_retailprice", "p_size")
    q = p.select(
        F.col("p_type").alias("q_type"),
        F.col("p_retailprice").alias("q_price"),
        F.col("p_size").alias("q_size"),
    )
    dominated = (
        (F.col("q_type") == F.col("p_type"))
        & (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    return p.join(q, dominated, "left_anti")


@query(
    "pipeline_gate_attrition",
    oracle="""
    WITH scored AS (
      SELECT source,
             length(text) AS nc,
             len(string_split_regex(lower(text), '\\s+')) AS nw,
             len(list_distinct(string_split_regex(lower(text), '\\s+'))) * 1.0
               / len(string_split_regex(lower(text), '\\s+')) AS ttr
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           sum(CASE WHEN nc BETWEEN 40 AND 5000 THEN 1 ELSE 0 END) AS pass_len,
           sum(CASE WHEN nc BETWEEN 40 AND 5000 AND nw >= 10 THEN 1 ELSE 0 END)
             AS pass_words,
           sum(CASE WHEN nc BETWEEN 40 AND 5000 AND nw >= 10 AND ttr >= 0.2
                    THEN 1 ELSE 0 END) AS pass_ttr,
           CAST(round(sum(CASE WHEN nc BETWEEN 40 AND 5000 AND nw >= 10 AND ttr >= 0.2
                    THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS DOUBLE) AS survival_rate
    FROM scored
    GROUP BY source
    """,
    tags=("text", "llm", "pipeline", "observability"),
)
def pipeline_gate_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source attrition through the pretraining filter cascade
    (pipeline_pretraining_filter's gates): how many docs survive the
    length gate, then the word-count gate, then the diversity gate —
    the observability table a data-curation run reports so corpus
    drops are explainable per stage and per source.

    Scale: ONE scan, one hash aggregate on source; every gate is a
    conditional sum fused into the same codegen stage — adding a gate
    costs one column, not one pass. This is how 100 TB curation runs
    stay auditable without re-reading the corpus per gate.
    """
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    nc = F.length("text")
    nw = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / nw
    g1 = nc.between(40, 5000)
    g2 = g1 & (nw >= 10)
    g3 = g2 & (ttr >= 0.2)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        d.select("source", g1.alias("g1"), g2.alias("g2"), g3.alias("g3"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt(F.col("g1")).alias("pass_len"),
            cnt(F.col("g2")).alias("pass_words"),
            cnt(F.col("g3")).alias("pass_ttr"),
            F.round(
                F.sum(F.when(F.col("g3"), 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("survival_rate"),
        )
    )


@query(
    "corpus_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    per AS (
      SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok
    ),
    src AS (
      SELECT source, sum(c) AS st FROM per GROUP BY source
    ),
    gcnt AS (
      SELECT tok, sum(c) AS g FROM per GROUP BY tok
    ),
    gt AS (
      SELECT sum(g) AS gt FROM gcnt
    )
    SELECT per.source,
           CAST(sum(per.c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct_tokens,
           CAST(round(sum(CAST((per.c * 1.0 / src.st)
                     * ln((per.c * 1.0 / src.st) / (gcnt.g * 1.0 / gt.gt))
                     AS DECIMAL(18,6))), 4) AS DOUBLE) AS kl_vs_corpus
    FROM per
    JOIN src ON per.source = src.source
    JOIN gcnt ON per.tok = gcnt.tok
    CROSS JOIN gt
    GROUP BY per.source
    """,
    tags=("text", "llm", "observability"),
)
def corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(source unigram dist ‖ whole-
    corpus unigram dist) — the mixture-diagnostics number a corpus
    report shows per shard (high KL = the shard's vocabulary diverges
    from the blend, worth inspecting before training).

    KL is well-defined here because every source token is in the
    global distribution (q > 0 wherever p > 0). Per-term products are
    decimal-cast before the final sum (fpsafe) so accumulation order
    can't move the rounded result across engines.

    Scale: token explode → ONE (source, token) count aggregate; the
    source totals and global token counts derive from it (Catalyst
    reuses the exchange); the global total broadcasts as a scalar.
    The wide shuffle carries (source, token, count) — the same volume
    as any vocabulary build (vocab_topk_terms) — and everything after
    is bounded by vocabulary size, not corpus size.
    """
    d = T(spark, sf_dir, "documents")
    # heavy per-row tokenize stage: spread a small single-file scan
    # across cores (no-op on a real multi-file 100 TB scan)
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    tok = d.select("source", F.explode(ws_tokens(F.col("text"))).alias("tok"))
    per = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    src = per.groupBy("source").agg(F.sum("c").alias("st"))
    glob = per.groupBy("tok").agg(F.sum("c").alias("g"))
    gt = glob.agg(F.sum("g").alias("gt"))
    p = F.col("c") * F.lit(1.0) / F.col("st")
    q = F.col("g") * F.lit(1.0) / F.col("gt")
    term = (p * F.log(p / q)).cast("decimal(18,6)")
    return (
        per.join(src, "source")
        .join(glob, "tok")
        .crossJoin(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            dround(F.sum(term), 4).alias("kl_vs_corpus"),
        )
    )


@query(
    "text_sentence_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                        x -> trim(x)),
                         x -> length(x) > 0) AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS INTEGER) AS n_sentences,
           CAST(round(CASE WHEN len(sents) = 0 THEN 0.0
                ELSE list_aggregate(list_transform(sents,
                       x -> len(string_split_regex(x, '\\s+'))), 'sum')
                     * 1.0 / len(sents) END, 4) AS DOUBLE) AS avg_sentence_words,
           CAST(CASE WHEN len(sents) = 0 THEN 0
                ELSE list_max(list_transform(sents, x -> length(x))) END
                AS INTEGER) AS max_sentence_chars
    FROM s
    """,
    tags=("text", "llm", "quality"),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats per document: sentence count, mean
    words per sentence, longest sentence — the readability signals
    next to the word-level gates (wall-of-text and run-on detection).

    Scale: per-row split/transform in codegen, zero shuffle — same
    embarrassing parallelism as every text gate. The splitter is the
    simple [.!?]+ rule shared verbatim by both regex engines.
    """
    d = T(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    with_s = d.select("doc_id", sents.alias("sents"))
    n = F.size(F.col("sents"))
    total_words = F.aggregate(
        F.transform(F.col("sents"), lambda x: F.size(F.split(x, r"\s+"))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return with_s.select(
        "doc_id",
        n.cast("int").alias("n_sentences"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(total_words.cast("double") / n), 4
        ).alias("avg_sentence_words"),
        F.when(n == 0, F.lit(0))
        .otherwise(F.array_max(F.transform(F.col("sents"), lambda x: F.length(x))))
        .cast("int")
        .alias("max_sentence_chars"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH w AS (
      SELECT event_type, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sd,
             count(*) OVER win AS n_prior
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           count(*) AS n_scored,
           sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS n_anomalies
    FROM w
    WHERE n_prior >= 5 AND sd > 0
    GROUP BY event_type
    """,
    tags=("timeseries", "window", "events", "observability"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    the mean/stddev of its user's previous <=20 events (strictly
    preceding frame — no self-leak), flagged when |z| > 3; rolled up
    per event type. The online-monitoring shape for metric streams.

    Scale: one window shuffle on user_id (panel-bounded partitions),
    frame is ROWS-bounded so state per row is O(20); the rollup
    reuses nothing heavier than a hash aggregate. The n_prior >= 5
    guard keeps cold-start rows out (and stddev of a single value is
    NULL anyway — sd > 0 also drops constant-history windows where z
    is undefined).
    """
    e = T(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = e.select(
        "event_type",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("n_prior"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        w.where((F.col("n_prior") >= 5) & (F.col("sd") > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.when(F.abs(z) > 3, 1).otherwise(0)).alias("n_anomalies"),
        )
    )


@query(
    "timeseries_autocorr_lag1",
    oracle="""
    WITH lagged AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT event_type,
           count(*) AS n_pairs,
           CAST(round(corr(value, prev), 4) AS DOUBLE) AS autocorr_lag1
    FROM lagged
    WHERE prev IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "window", "events"),
)
def timeseries_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series, rolled up
    per event type — the stationarity probe run before forecasting
    (near-zero = noise; high = momentum worth modeling).

    Scale: one window shuffle on user_id for the lag, one hash
    aggregate for corr (Pearson over running co-moments — partial-
    aggregatable, no value collection).
    """
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "event_type", "value", F.lag("value").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("value", "prev"), 4).alias("autocorr_lag1"),
    )


@query(
    "events_ab_test_zstat",
    oracle="""
    WITH arms AS (
      SELECT event_type, user_id % 2 AS arm, value FROM events
    ),
    stats AS (
      SELECT event_type, arm,
             count(*) AS n,
             avg(value) AS mu,
             var_samp(value) AS v
      FROM arms GROUP BY event_type, arm
    )
    SELECT a.event_type,
           a.n AS n_control, b.n AS n_treat,
           CAST(round(a.mu, 4) AS DOUBLE) AS mean_control,
           CAST(round(b.mu, 4) AS DOUBLE) AS mean_treat,
           CAST(round((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n), 4) AS DOUBLE)
             AS z_stat
    FROM stats a JOIN stats b
      ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1
    """,
    tags=("agg", "stats", "events"),
)
def events_ab_test_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z statistic per event type: users hash-split into
    control/treatment arms (user_id parity — deterministic), compare
    mean values via Welch's z — the experimentation-platform readout
    computed wholly in aggregates.

    Scale: ONE scan + one hash aggregate on (event_type, arm) — n,
    mean, and variance are all partial-aggregatable co-moments; the
    arm self-join runs over the tiny aggregate output, not events.
    """
    e = T(spark, sf_dir, "events")
    stats = (
        e.select("event_type", (F.col("user_id") % 2).alias("arm"), "value")
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mu"),
            F.var_samp("value").alias("v"),
        )
    )
    a = stats.where(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_control"),
        F.col("mu").alias("mu0"),
        F.col("v").alias("v0"),
    )
    b = stats.where(F.col("arm") == 1).select(
        F.col("event_type").alias("et_b"),
        F.col("n").alias("n_treat"),
        F.col("mu").alias("mu1"),
        F.col("v").alias("v1"),
    )
    j = a.join(b, a.event_type == b.et_b)
    z = (F.col("mu1") - F.col("mu0")) / F.sqrt(
        F.col("v0") / F.col("n_control") + F.col("v1") / F.col("n_treat")
    )
    return j.select(
        "event_type",
        "n_control",
        "n_treat",
        F.round("mu0", 4).alias("mean_control"),
        F.round("mu1", 4).alias("mean_treat"),
        F.round(z, 4).alias("z_stat"),
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ALL
    """,
    tags=("sql", "agg", "events"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB shared sugar): every
    non-aggregate select item becomes a grouping key — the
    exploratory-SQL spelling both engines parse identically.

    Scale: desugars to a plain two-level hash aggregate; nothing new
    at runtime, this query pins the dialect-parity surface.
    """
    register = T(spark, sf_dir, "events")
    register.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        FROM events
        GROUP BY ALL
        """
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                        FILTER (WHERE l_quantity >= 25), 2) AS DOUBLE)
             AS bulk_revenue,
           CAST(round(avg(l_discount) FILTER (WHERE l_tax > 0.04), 6) AS DOUBLE)
             AS avg_disc_taxed
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "sql", "lineitem"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard FILTER (WHERE ...) aggregate modifiers — the
    declarative spelling of conditional aggregation that both engines
    parse natively (the CASE-WHEN-inside-agg idiom, made explicit).

    Scale: identical plan to the CASE form — one scan, one two-level
    hash aggregate; N filtered aggregates still cost one pass.
    """
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_rows,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                            FILTER (WHERE l_quantity >= 25), 2) AS DOUBLE)
                 AS bulk_revenue,
               CAST(round(avg(l_discount) FILTER (WHERE l_tax > 0.04), 6) AS DOUBLE)
                 AS avg_disc_taxed
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_linear_regression",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(round(regr_slope(value, epoch(ts) - 1700000000), 8) AS DOUBLE) AS slope,
           CAST(round(regr_intercept(value, epoch(ts) - 1700000000), 4) AS DOUBLE)
             AS intercept,
           CAST(round(regr_r2(value, epoch(ts) - 1700000000), 6) AS DOUBLE) AS r2
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "stats", "events"),
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend via SQL-standard regr_*
    aggregates (slope, intercept, R²) — drift detection for metric
    streams without leaving the aggregate layer.

    Scale: regr_* are co-moment aggregates (sums of x, y, xy, x²) —
    partial-aggregatable map-side, one shuffle of 4 doubles per
    group; the full OLS normal-equation path for k features is the
    same shape with a k×k Gram matrix per group.
    """
    e = T(spark, sf_dir, "events")
    # center x on a fixed epoch: regr over raw epoch-seconds (~1.7e9)
    # is ill-conditioned — intercept = mean(y) - slope*mean(x)
    # amplifies 1-ulp slope noise by 1e9 and engines disagree in the
    # 4th decimal. Centering is the standard fix and changes only the
    # intercept's reference point (documented: value at 2023-11-14).
    x = (F.unix_timestamp("ts") - F.lit(1_700_000_000)).cast("double")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(F.col("value"), x), 8).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
    )


@query(
    "map_higher_order_funcs",
    oracle="""
    WITH built AS (
      SELECT l_orderkey, l_linenumber,
             [CASE WHEN l_quantity * 2 >= 1.0
                   THEN 'qty=' || CAST(CAST(round(l_quantity * 2, 2) AS DECIMAL(18,2)) AS VARCHAR) END,
              CASE WHEN l_extendedprice * 2 >= 1.0
                   THEN 'price=' || CAST(CAST(round(l_extendedprice * 2, 2) AS DECIMAL(18,2)) AS VARCHAR) END,
              CASE WHEN l_discount * 2 >= 1.0
                   THEN 'disc=' || CAST(CAST(round(l_discount * 2, 2) AS DECIMAL(18,2)) AS VARCHAR) END
             ] AS raw
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(len(list_filter(raw, x -> x IS NOT NULL)) AS INTEGER) AS n_kept,
           array_to_string(list_sort(list_filter(raw, x -> x IS NOT NULL)), ',')
             AS kept_entries
    FROM built
    """,
    tags=("scalar", "map", "lineitem"),
)
def map_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions end to end: build a metric map per
    row, double every value with ``transform_values``, drop small
    values with ``map_filter``, and serialize with ``map_entries`` →
    sorted `k=v` strings. The oracle reconstructs the result from
    first principles (no map type needed), so a hash match proves
    each HOF's semantics, not just executability. Values format
    through DECIMAL(18,2) — both engines print fixed two decimals,
    dodging double-to-string divergence.

    Scale: all map ops are per-row codegen expressions — zero
    shuffle, same embarrassing parallelism as any scalar battery.
    """
    li = T(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("disc"), F.col("l_discount"),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= 1.0)
    entries = F.array_sort(
        F.transform(
            F.map_entries(kept),
            lambda e: F.concat(
                e["key"], F.lit("="),
                F.round(e["value"], 2).cast("decimal(18,2)").cast("string"),
            ),
        )
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(entries).cast("int").alias("n_kept"),
        F.array_join(entries, ",").alias("kept_entries"),
    )


@query(
    "events_chisq_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, user_id % 4 AS segment, count(*) AS o
      FROM events GROUP BY event_type, user_id % 4
    ),
    tot AS (
      SELECT cells.*,
             sum(o) OVER (PARTITION BY event_type) AS row_t,
             sum(o) OVER (PARTITION BY segment) AS col_t,
             sum(o) OVER () AS grand
      FROM cells
    )
    SELECT count(*) AS n_cells,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT segment) - 1)
                AS BIGINT) AS dof,
           CAST(round(sum(CAST(pow(o - row_t * col_t / grand, 2)
                               / (row_t * col_t / grand) AS DECIMAL(18,6))), 4)
                AS DOUBLE) AS chi2
    FROM tot
    """,
    tags=("agg", "stats", "events"),
)
def events_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a user
    segment (hash-split user_id % 4): observed vs expected counts over
    the contingency table — the categorical-drift check run before
    trusting a segmentation.

    Scale: ONE scan + one hash aggregate build the contingency table
    (|types| × |segments| cells); marginals are window sums over that
    tiny table, and the statistic folds with a decimal-cast sum
    (fpsafe) so accumulation order can't flip the rounding.
    """
    e = T(spark, sf_dir, "events")
    cells = (
        e.select("event_type", (F.col("user_id") % 4).alias("segment"))
        .groupBy("event_type", "segment")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("segment")
    w_all = Window.partitionBy()
    tot = cells.select(
        "event_type",
        "segment",
        "o",
        F.sum("o").over(w_row).alias("row_t"),
        F.sum("o").over(w_col).alias("col_t"),
        F.sum("o").over(w_all).alias("grand"),
    )
    exp = F.col("row_t") * F.col("col_t") / F.col("grand")
    term = (F.pow(F.col("o") - exp, 2) / exp).cast("decimal(18,6)")
    return tot.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("segment") - 1)
        ).cast("bigint").alias("dof"),
        dround(F.sum(term), 4).alias("chi2"),
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH dims AS (
      SELECT unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {'dim': i - 1,
                          'v': CAST(embedding[i] AS DOUBLE)})) AS d
      FROM embeddings
    )
    SELECT CAST(d.dim AS INTEGER) AS dim,
           count(*) AS n,
           CAST(round(CAST(sum(CAST(d.v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
             AS DOUBLE) AS dim_mean,
           CAST(round(stddev_samp(d.v), 6) AS DOUBLE) AS dim_std,
           CAST(round(min(d.v), 6) AS DOUBLE) AS dim_min,
           CAST(round(max(d.v), 6) AS DOUBLE) AS dim_max
    FROM dims
    GROUP BY d.dim
    """,
    tags=("embedding", "llm", "agg"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column —
    the normalization/whitening pre-pass (mean/std per dim) and the
    degenerate-dimension detector (std ≈ 0) run before indexing or
    quantizing a vector corpus.

    Scale: posexplode → ONE hash aggregate on dim (fixed cardinality
    = vector width), partial-aggregated map-side, so the shuffle
    carries dims × partitions co-moments regardless of corpus size.
    Mean folds through decimal (fpsafe — float values cast to double
    first, which is exact), then the SUM is cast to double BEFORE the
    division so both engines divide bit-identical inputs (decimal
    division scale rules differ between engines and flip 1-ulp at
    rounding boundaries); stddev rounds at 6 dp.
    """
    e = T(spark, sf_dir, "embeddings")
    d = e.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    return d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("dim_mean"),
        F.round(F.stddev_samp("v"), 6).alias("dim_std"),
        F.round(F.min("v"), 6).alias("dim_min"),
        F.round(F.max("v"), 6).alias("dim_max"),
    )


@query(
    "corpus_rebalance_plan",
    oracle="""
    WITH shares AS (
      SELECT source,
             count(*) AS n_docs,
             sum(length(text)) AS n_chars,
             sum(sum(length(text))) OVER () AS total_chars
      FROM documents GROUP BY source
    )
    SELECT source, n_docs,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(round(n_chars * 1.0 / total_chars, 6) AS DOUBLE) AS actual_share,
           CAST(round(least(1.0, (1.0 / count(*) OVER ())
                                 / (n_chars * 1.0 / total_chars)), 6) AS DOUBLE)
             AS keep_rate,
           CAST(round(n_chars * least(1.0, (1.0 / count(*) OVER ())
                                           / (n_chars * 1.0 / total_chars)), 0) AS BIGINT)
             AS planned_chars
    FROM shares
    """,
    tags=("text", "llm", "pipeline", "observability"),
)
def corpus_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing plan: given a uniform target share per
    source, compute each source's actual char share and the
    downsampling keep-rate that achieves the target (capped at 1 —
    upsampling is a separate epoch-repeat decision). The planning
    step that precedes corpus_mixture_sample's deterministic
    hash-sampling execution.

    Scale: one aggregate over the corpus + window math over the
    |sources|-row result — the plan costs one scan regardless of
    corpus size, and the keep-rates feed the md5-threshold sampler
    unchanged at any scale.
    """
    d = T(spark, sf_dir, "documents")
    shares = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    w = Window.partitionBy()
    actual = (F.col("n_chars") * 1.0 / F.sum("n_chars").over(w))
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    keep = F.least(F.lit(1.0), target / actual)
    return shares.select(
        "source",
        "n_docs",
        "n_chars",
        F.round(actual, 6).alias("actual_share"),
        F.round(keep, 6).alias("keep_rate"),
        F.round(F.col("n_chars") * keep, 0).cast("bigint").alias("planned_chars"),
    )


@query(
    "timeseries_seasonality_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             month(o_orderdate) AS m,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders
      GROUP BY 1, 2
    ),
    by_month AS (
      SELECT m,
             count(*) AS n_years,
             -- exact decimal sum, then ONE double division: the avg
             -- of per-year doubles is accumulation-order-sensitive
             -- at the ulp (observed flaking a .145 half-cent
             -- boundary); sum-then-divide is order-free
             CAST(sum(rev) AS DOUBLE) / count(*) AS avg_rev
      FROM monthly GROUP BY m
    )
    SELECT CAST(m AS INTEGER) AS m,
           n_years,
           CAST(round(avg_rev, 2) AS DOUBLE) AS avg_month_revenue,
           CAST(round(avg_rev /
                (CAST(sum(CAST(avg_rev AS DECIMAL(18,6))) OVER () AS DOUBLE)
                 / count(*) OVER ()), 4) AS DOUBLE)
             AS seasonality_index
    FROM by_month
    """,
    tags=("timeseries", "orders", "agg"),
)
def timeseries_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index over order revenue: each
    calendar month's average (across years) divided by the grand
    monthly average — index > 1 marks high season. The
    ratio-to-average step of classical seasonal decomposition,
    computed entirely in aggregates.

    Scale: one scan → (month_start) rollup (decimal-cast revenue,
    fpsafe) → 12-row month-of-year aggregate; the window math runs
    over 12 rows. Revenue folds exactly; ratios divide identical
    doubles in both engines.
    """
    o = T(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"))
    # sum exactly in decimal, divide ONCE as double: avg() over
    # per-year doubles re-orders under partial aggregation and can
    # flip a half-cent rounding boundary (observed: 4324912.145)
    by_month = monthly.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_years"),
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("avg_rev"),
    )
    w = Window.partitionBy()
    grand = F.sum(F.col("avg_rev").cast("decimal(18,6)")).over(w).cast(
        "double"
    ) / F.count(F.lit(1)).over(w)
    return by_month.select(
        F.col("m").cast("int").alias("m"),
        "n_years",
        F.round("avg_rev", 2).alias("avg_month_revenue"),
        F.round(F.col("avg_rev") / grand, 4).alias("seasonality_index"),
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency,
             CAST(round(CAST(monetary AS DOUBLE), 2) AS DOUBLE) AS monetary,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
             -- order by the ROUNDED value (like the engine side):
             -- rounding is monotone, but ties after rounding must
             -- break on custkey identically in both engines
             ntile(4) OVER (ORDER BY round(CAST(monetary AS DOUBLE), 2), o_custkey)
               AS m_score
      FROM rfm
    )
    SELECT CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           count(*) AS n_customers,
           CAST(round(sum(CAST(monetary AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS segment_revenue
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("agg", "window", "orders", "analytics"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency / frequency / monetary
    quartiles (ntile with deterministic custkey tiebreaks) rolled up
    into the 4×4×4 segment grid with customer counts and revenue —
    the marketing-analytics workhorse.

    Scale: one aggregate to customer grain, then three HIERARCHICAL
    ntiles — each quartile is `ntile_from_rank(global_row_number(…))`
    (range shuffle + per-partition offsets + a closed-form bucket
    formula), bit-identical to `ntile(4) OVER (ORDER BY …)` with no
    Exchange SinglePartition anywhere. The customer grain GROWS with
    the data (1.5 M rows at sf10), so the global-window form this
    replaces was the textbook 100 TB scale-killer; the 64-cell
    rollup is free either way.
    """
    from lakehouse_test_spark.operators.ordering import (
        global_row_number,
        ntile_from_rank,
    )

    o = T(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("monetary"),
    )
    # monetary is pre-rounded HERE so the m-dimension ranks by the
    # exact value the oracle sorts on (round(monetary, 2)); checkpoint
    # because the grain is re-ranked three times + counted once.
    cust = rfm.select(
        "o_custkey",
        "last_order",
        "frequency",
        F.round(F.col("monetary").cast("double"), 2).alias("monetary"),
    ).localCheckpoint()
    total = F.lit(cust.count())
    d = global_row_number(cust, ["last_order", "o_custkey"], "__r_rk")
    d = global_row_number(d, ["frequency", "o_custkey"], "__f_rk")
    d = global_row_number(d, ["monetary", "o_custkey"], "__m_rk")
    scored = d.select(
        "o_custkey",
        "frequency",
        "monetary",
        ntile_from_rank(F.col("__r_rk"), total, 4).cast("int").alias("r_score"),
        ntile_from_rank(F.col("__f_rk"), total, 4).cast("int").alias("f_score"),
        ntile_from_rank(F.col("__m_rk"), total, 4).cast("int").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(F.col("monetary").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("segment_revenue"),
    )


@query(
    "discount_quantity_response",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_lines,
           CAST(round(regr_slope(l.l_quantity, l.l_discount), 4) AS DOUBLE)
             AS qty_per_discount,
           CAST(round(regr_r2(l.l_quantity, l.l_discount), 6) AS DOUBLE) AS r2
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("agg", "stats", "join", "lineitem"),
)
def discount_quantity_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand response per brand: the least-squares slope of quantity
    against discount (does discounting move volume?) with its R² —
    price-elasticity screening as one join + co-moment aggregates.

    Scale: fact ⋈ part shuffles on partkey (or broadcasts when the
    dim qualifies at runtime — no forced hint, AQE decides); the
    regr_* co-moments partial-aggregate map-side so the second
    shuffle carries 4 doubles per brand. Discounts are already
    0-centered-ish magnitudes, so no conditioning fix is needed
    (cf. agg_linear_regression's epoch centering).
    """
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.regr_slope(F.col("l_quantity"), F.col("l_discount")), 4).alias(
                "qty_per_discount"
            ),
            F.round(F.regr_r2(F.col("l_quantity"), F.col("l_discount")), 6).alias("r2"),
        )
    )


@query(
    "dedup_provenance_stats",
    oracle="""
    WITH groups AS (
      SELECT md5(lower(trim(text))) AS fp, source, count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    per_fp AS (
      SELECT fp,
             sum(n) AS total,
             sum(n * (n - 1) / 2) AS same_source_pairs
      FROM groups GROUP BY fp
    )
    SELECT count(*) FILTER (WHERE total > 1) AS dup_groups,
           CAST(sum(total * (total - 1) / 2) AS BIGINT) AS total_pairs,
           CAST(sum(same_source_pairs) AS BIGINT) AS same_source_pairs,
           CAST(sum(total * (total - 1) / 2 - same_source_pairs) AS BIGINT)
             AS cross_source_pairs
    FROM per_fp
    """,
    tags=("dedup", "llm", "observability"),
)
def dedup_provenance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate provenance: of all exact-duplicate pairs, how many
    are within one source vs across sources — the diagnostic that
    tells a curation run whether duplication is crawler overlap
    (cross-source) or boilerplate within a source (same-source),
    which decide very different fixes.

    Scale: pair counts come from group-size ARITHMETIC (C(n,2) on
    (fingerprint, source) counts), never from materializing pairs —
    two hash aggregates on a 16-byte key and the answer is exact at
    any duplication rate.
    """
    d = T(spark, sf_dir, "documents")
    groups = d.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"), F.col("source")
    ).agg(F.count(F.lit(1)).alias("n"))
    per_fp = groups.groupBy("fp").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("same_source_pairs"),
    )
    pairs = F.col("total") * (F.col("total") - 1) / 2
    return per_fp.agg(
        F.sum(F.when(F.col("total") > 1, 1).otherwise(0)).alias("dup_groups"),
        F.sum(pairs).cast("bigint").alias("total_pairs"),
        F.sum("same_source_pairs").cast("bigint").alias("same_source_pairs"),
        F.sum(pairs - F.col("same_source_pairs")).cast("bigint").alias("cross_source_pairs"),
    )
