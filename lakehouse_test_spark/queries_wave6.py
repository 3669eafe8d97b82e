"""Round-3 wave D: recursive-CTE gapfill, LISTAGG, Gopher-style
quality gating, URL parsing, activity streaks (gaps-and-islands),
sliding-window chunking, and distributed embedding centroids.

These extend the mandated surface (SURVEY.md §2b scalar/agg/SQL
groups) and the LLM-pipeline battery: Gopher rules and overlapping
chunking are the two most common pretraining-corpus transforms not
yet covered, and the per-label centroid query is the distributed
E-step that backs IVF coarse quantizers (operators/similarity.py
computes the same thing driver-side for small nlist; this is the
shape that survives when nlist × dim no longer fits the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum, sql_dsum
from lakehouse_test_spark.operators.text import ws_tokens
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "sql_recursive_month_gapfill",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT CAST(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS DATE)
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < CAST(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS DATE)
    )
    SELECT months.m AS month_start,
           count(o.o_orderkey) AS n_orders,
           CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0), 2) AS DOUBLE)
             AS month_revenue
    FROM months LEFT JOIN orders o
      ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
    GROUP BY months.m
    """,
    tags=("sql", "recursive", "orders"),
)
def sql_recursive_month_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) generating the full
    month series between min and max order date, left-joined to
    monthly order rollups — the calendar-gapfill idiom that keeps
    zero-order months in the report.

    Scale: the recursion materializes one row per month (bounded by
    date span, not data size) on the driver side of the plan; the
    monthly rollup is a single hash aggregate of orders, and the
    join broadcasts the tiny month series. The revenue sum is
    decimal-cast before aggregation (fpsafe) so partial-agg order
    cannot move the rounded result.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT CAST(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS DATE)
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
          WHERE m < CAST(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS DATE)
        )
        SELECT months.m AS month_start,
               count(o.o_orderkey) AS n_orders,
               CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0), 2) AS DOUBLE)
                 AS month_revenue
        FROM months LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
        GROUP BY months.m
        """
    )


@query(
    "agg_listagg_nations",
    oracle="""
    SELECT r.r_name AS region,
           count(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("agg", "string"),
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4) — ordered string
    concatenation per group, the SQL-standard spelling of DuckDB's
    string_agg(... ORDER BY).

    Scale: group count is bounded by region cardinality (5); the
    ordered concat sorts only within each group's collected set.
    For unbounded groups the same plan degrades gracefully to a
    sort-based aggregate — no driver collection anywhere.
    """
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("nations"),
        )
    )


#: Gopher-rule stopwords (Rae et al. 2021 §A1.1: a doc must contain
#: at least 2 of these to pass the "contains common English words"
#: rule; public-paper heuristic, tuned thresholds below).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@query(
    "text_gopher_filters",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ), sig AS (
      SELECT doc_id, lang,
             len(toks) AS n_words,
             round(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
                   / len(toks), 4) AS mean_word_len,
             round(CAST(length(text) - length(replace(text, '#', ''))
                   + (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE)
                   / len(toks), 4) AS symbol_word_ratio,
             round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                   / len(toks), 4) AS alpha_word_ratio,
             CAST(len(list_intersect(toks, ['the','be','to','of','and','that','have','with']))
                  AS INTEGER) AS stopword_hits
      FROM t
    )
    SELECT *,
           (n_words BETWEEN 20 AND 100000
            AND mean_word_len BETWEEN 3 AND 10
            AND symbol_word_ratio < 0.1
            AND alpha_word_ratio > 0.8
            AND stopword_hits >= 2) AS keep
    FROM sig
    """,
    tags=("text", "llm"),
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style pretraining quality rules (Rae et al. 2021):
    word-count bounds, mean word length 3–10, symbol-to-word ratio,
    alphabetic-word ratio, and required common-English stopwords —
    emitted as named signals plus the final ``keep`` verdict.

    Complements text_quality_scores (which emits raw signals): this
    is the decision layer a corpus-curation pipeline actually gates
    on, with each rule visible for debugging why a doc was dropped.

    Scale: pure codegen projection, zero shuffle — identical shape
    to the other text batteries, so it inherits their 100 TB
    argument (map-only over the scan).
    """
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n_words = F.size(toks)
    ellipsis_count = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / F.lit(3)
    hash_count = F.length("text") - F.length(F.regexp_replace("text", r"#", ""))
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    sig = d.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / n_words,
            4,
        ).alias("mean_word_len"),
        F.round((hash_count + ellipsis_count).cast("double") / n_words, 4).alias(
            "symbol_word_ratio"
        ),
        F.round(
            F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double") / n_words, 4
        ).alias("alpha_word_ratio"),
        F.size(F.array_intersect(toks, sw)).cast("int").alias("stopword_hits"),
    )
    return sig.withColumn(
        "keep",
        F.col("n_words").between(20, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("alpha_word_ratio") > 0.8)
        & (F.col("stopword_hits") >= 2),
    )


@query(
    "scalar_url_parse",
    oracle="""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
             || '?lang=' || lang AS url,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang AS query_string,
           lang AS lang_param,
           'https' AS protocol
    FROM documents
    """,
    tags=("scalar", "string"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url battery: HOST / PATH / QUERY / per-key QUERY
    extraction / PROTOCOL over URLs synthesized from document
    metadata (the fixtures carry no raw URL column, so the query
    constructs one deterministically and the oracle checks the
    parser against the known construction).

    Scale: parse_url is a JVM built-in — codegen'd projection,
    zero shuffle.
    """
    d = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS g
      FROM days
    ), streaks AS (
      SELECT user_id, g, count(*) AS len FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           count(*) AS n_streaks,
           max(len) AS max_streak,
           sum(len) AS active_days
    FROM streaks GROUP BY user_id
    """,
    tags=("events", "window"),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days
    (the "login streak" idiom) via the date-minus-row_number trick —
    consecutive dates share a constant anchor, so a plain groupBy
    recovers each island without any iterative logic.

    Scale: one shuffle for the distinct (user, day), one window
    partitioned the same way (no second shuffle — the partitioning
    is reused), then two hash aggregates that both stay on the
    user_id key. No self-join, no iteration: islands of any length
    cost the same as islands of length one.
    """
    e = T(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    grp = days.select("user_id", "d", F.date_sub(F.col("d"), rn).alias("g"))
    streaks = grp.groupBy("user_id", "g").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("max_streak"),
        F.sum("len").alias("active_days"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@query(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(greatest(len(toks) - {CHUNK_TOKENS}, 0)
                                       / {CHUNK_STRIDE}.0) AS BIGINT) + 1)) AS i
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           i AS chunk_idx,
           CAST(len(list_slice(toks, i * {CHUNK_STRIDE} + 1,
                               i * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS INTEGER) AS chunk_len,
           md5(array_to_string(list_slice(toks, i * {CHUNK_STRIDE} + 1,
                                          i * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')) AS chunk_md5
    FROM s
    """,
    tags=("text", "llm"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (32-token windows, stride
    24) — the context-window segmentation step of a pretraining /
    RAG-indexing pipeline. Each chunk carries its md5 fingerprint so
    downstream chunk-level dedup can run without re-reading text.

    Scale: chunk starts come from sequence+transform inside one
    projection and explode multiplies rows ~len/stride× — all
    map-side, zero shuffle, no Python. The md5 is computed on the
    reassembled chunk text JVM-side. Short docs emit one (short)
    chunk; empty token arrays emit none (plain explode drops them).
    """
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    # one chunk when the doc fits; otherwise stride until the window
    # reaches the end (no trailing window fully covered by the last)
    n_chunks = (
        F.ceil(F.greatest(F.size(toks) - CHUNK_TOKENS, F.lit(0)) / F.lit(float(CHUNK_STRIDE)))
        + 1
    )
    starts = F.when(
        F.size(toks) > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * CHUNK_STRIDE),
    ).otherwise(F.array().cast("array<bigint>"))
    chunked = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(starts).alias("start0"),
    )
    chunk = F.slice(F.col("toks"), F.col("start0") + 1, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        (F.col("start0") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@query(
    "embedding_label_centroids",
    oracle=f"""
    WITH flat AS (
      SELECT label, i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS val
      FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) i
    ), cent AS (
      SELECT label, pos,
             CAST({sql_dsum('val')} AS DOUBLE) / count(*) AS c
      FROM flat GROUP BY label, pos
    ), centv AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
    ), scored AS (
      SELECT e.label,
             sqrt(list_aggregate(list_transform(range(1, len(c.centroid) + 1),
                  i -> c.centroid[i] * c.centroid[i]), 'sum')) AS cnorm,
             list_aggregate(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, len(c.centroid) + 1),
                  i -> c.centroid[i] * c.centroid[i]), 'sum'))) AS cos
      FROM embeddings e JOIN centv c USING (label)
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(round(max(cnorm), 6) AS DOUBLE) AS centroid_norm,
           CAST(round(CAST({sql_dsum('cos')} AS DOUBLE) / count(*), 6) AS DOUBLE) AS avg_cos
    FROM scored GROUP BY label
    """,
    tags=("embedding", "llm", "similarity"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-label centroid + member cohesion — the E-step
    of IVF/k-means expressed as DataFrame ops (posexplode → per-dim
    decimal-sum → ordered re-assembly → broadcast join back).

    operators/similarity.py's IVF computes centroids driver-side
    (fine for nlist=64×dim=64); this is the shape that scales when
    nlist × dim × replicas no longer fits one machine: the per-dim
    aggregate shuffles (label, pos) pairs — ~nlist × dim rows — and
    the member join broadcasts the centroid table.

    Determinism: per-dim means use decimal-cast sums (fpsafe), so
    both engines assemble bit-identical centroids; cosine then folds
    in array order (sequential in both), making round-6 hashing safe.
    """
    e = T(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    # float→decimal casts round differently across engines (the float
    # noise ~1e-7 relative straddles the 1e-6 grid for ~0.4% of
    # values); float→double is exact, and double→decimal agrees to
    # ~1e-17 relative — so widen BEFORE the fpsafe decimal cast.
    cent = flat.groupBy("label", "pos").agg(
        (dsum(F.col("val").cast("double")).cast("double") / F.count("*")).alias("c")
    )
    centv = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = e.join(F.broadcast(centv), "label").select(
        "label",
        F.sqrt(dot(F.col("centroid"), F.col("centroid"))).alias("cnorm"),
        (
            dot(F.col("embedding"), F.col("centroid"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("centroid"), F.col("centroid")))
            )
        ).alias("cos"),
    )
    return scored.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        dround(F.max("cnorm"), 6).alias("centroid_norm"),
        dround(dsum(F.col("cos")).cast("double") / F.count("*"), 6).alias("avg_cos"),
    )


@query(
    "sql_lateral_topk_per_key",
    oracle="""
    SELECT r.r_name AS region, t.n_name AS nation, t.n_nationkey AS nationkey
    FROM region r, LATERAL (
      SELECT n_name, n_nationkey FROM nation n
      WHERE n.n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2
    ) t
    """,
    tags=("sql", "join"),
)
def sql_lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the
    "top-k related rows per outer row" idiom, complementing the
    window-based window_topk_per_group (same semantics, different
    surface: this is the SQL-standard correlated form).

    Scale: Catalyst decorrelates the lateral into a join +
    per-key limit; the outer side here is tiny (region), and for
    large outer relations the same shape becomes a shuffled join
    with a WindowGroupLimit — no per-row re-execution.
    """
    T(spark, sf_dir, "region").createOrReplaceTempView("region")
    T(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT r.r_name AS region, t.n_name AS nation, t.n_nationkey AS nationkey
        FROM region r, LATERAL (
          SELECT n_name, n_nationkey FROM nation n
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY n_name LIMIT 2
        ) t
        """
    )


@query(
    "scalar_interval_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS plus_30_days,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic battery: INTERVAL addition, day
    offsets, datediff, last_day, quarter truncation, Y/M/D parts —
    the remaining date surface not covered by scalar_date_funcs.

    Scale: pure codegen projection, zero shuffle.
    """
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_day"),
        F.add_months(d, 3).alias("plus_3_months"),
        F.date_add(d, 30).alias("plus_30_days"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("quarter_start"),
        F.year(d).cast("int").alias("y"),
        F.month(d).cast("int").alias("m"),
        F.dayofmonth(d).cast("int").alias("d"),
    )


def _semantic_edges(spark: SparkSession, sf_dir: str, threshold: float = 0.3) -> DataFrame:
    """Same-label embedding pairs above a cosine threshold — a
    deterministic similarity graph (identical IEEE expression trees
    in Spark and DuckDB make the >= comparison engine-stable)."""
    from lakehouse_test_spark.operators.dedup import cosine

    e = T(spark, sf_dir, "embeddings")
    a = e.select("label", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .where(cosine(F.col("emb_a"), F.col("emb_b")) >= threshold)
        .select("vec_a", "vec_b")
    )


def _semantic_clusters_oracle() -> str:
    from lakehouse_test_spark.operators.dedup import DUCKDB_COSINE

    cos = DUCKDB_COSINE.format(a="a.embedding", b="b.embedding")
    return f"""
    WITH RECURSIVE edges AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {cos} >= 0.3
    ), und AS (
      SELECT va AS a, vb AS b FROM edges UNION ALL SELECT vb AS a, va AS b FROM edges
    ), nodes AS (
      SELECT DISTINCT a AS n FROM und
    ), reach(src, dst) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
    ), comp AS (
      SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src
    )
    SELECT c.vec_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN (
      SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
    ) s USING (cluster_id)
    """


@query(
    "embedding_semantic_clusters",
    oracle=_semantic_clusters_oracle(),
    tags=("embedding", "llm", "graph", "dedup"),
)
def embedding_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup clusters: connected components over the
    cosine-threshold similarity graph, with the component's minimum
    vec_id as the canonical cluster id.

    This puts the iterative connected-components operator itself
    under the hash-checked oracle gate (dedup_clusters stays
    rows-only because its LSH edge set is xxhash64-dependent): the
    DuckDB twin computes the same components by recursive transitive
    closure — O(Σ|component|²) rows, fine for an oracle, unusable at
    scale — while the Spark side runs the O(diameter)-round
    min-label propagation from operators/cluster.py with its
    persist/localCheckpoint lineage hygiene.

    Scale: edge generation is label-blocked (IVF-style); components
    shuffle (node, label) pairs per round — state O(nodes), rounds
    O(diameter), lineage truncated every 5 rounds.
    """
    from lakehouse_test_spark.operators.cluster import dedup_clusters_from_pairs

    pairs = _semantic_edges(spark, sf_dir)
    return dedup_clusters_from_pairs(pairs, "vec_a", "vec_b").select(
        F.col("doc_id").alias("vec_id"),
        F.col("keeper_doc_id").alias("cluster_id"),
        "cluster_size",
    )
