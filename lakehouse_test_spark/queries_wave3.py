"""Round-3 query wave: time-series toolkit (gap-fill/LOCF, OHLC
downsample), BM25 ranked retrieval, fuzzy record linkage, exact
set-similarity join with prefix filtering, triangle counting, and
HLL sketch aggregation.

These extend the engine's SURVEY.md §2b surface with the analytics a
lakehouse user layers on the reference's offloaded event/document
tables (reference census has no query engine at all — SURVEY.md §0;
the implied surface is "query the offloaded topic data with Spark").

Scale notes are per-query; the common themes:
- time-series ops shuffle once on (series-key, bucket) and never
  collect the grid to the driver — the grid is `sequence`+`explode`
  inside the plan;
- the set-similarity join is the inverted-index + prefix-filter
  algorithm (PPJoin family) — candidates come from an equi-join on
  rare prefix tokens, never an all-pairs product;
- triangle counting is two hash joins on oriented edges (a<b<c),
  the standard distributed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Time-series toolkit
# ---------------------------------------------------------------------------

@query(
    "timeseries_gapfill_locf",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS hour_value,
             count(*) AS n_events
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM agg GROUP BY event_type
    ),
    grid AS (
      SELECT b.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds b
    )
    SELECT g.event_type, g.hour,
           last_value(a.hour_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           coalesce(a.n_events, 0) AS n_events,
           (a.hour_value IS NULL) AS gap_filled
    FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.hour = a.hour
    """,
    tags=("timeseries", "events", "window"),
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to an hourly grid per series and gap-fill
    missing buckets with last-observation-carried-forward.

    The grid is generated *inside the plan* (`sequence` over each
    series' [min,max] hour, exploded) — no driver-side date loop, so
    a 10-year × 1M-series grid still parallelizes. One shuffle for
    the bucket aggregate, one broadcast-able join of grid←agg (grid
    rows ≫ agg rows only when data is sparse), and the LOCF is a
    running `last(ignorenulls)` window per series — Spark's frame is
    bounded-state, O(1) memory per row.

    Matches the hypertable/rollup+gap-fill surface of timeseries
    stores; the reference's events land exactly like this after
    offload (SURVEY.md §1.1).
    """
    e = T(spark, sf_dir, "events")
    agg = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            dround(dsum(F.col("value")), 2).alias("hour_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    joined = grid.join(agg, ["event_type", "hour"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour",
        F.last("hour_value", ignorenulls=True).over(w).alias("value_locf"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("hour_value").isNull().alias("gap_filled"),
    )


@query(
    "timeseries_ohlc_hourly",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(round(arg_min(value, CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id), 4) AS DOUBLE) AS open,
           CAST(round(max(value), 4) AS DOUBLE) AS high,
           CAST(round(min(value), 4) AS DOUBLE) AS low,
           CAST(round(arg_max(value, CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id), 4) AS DOUBLE) AS close,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume,
           count(*) AS n_events
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    tags=("timeseries", "events", "agg"),
)
def timeseries_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per series per hour, the first/last (by
    event time) and min/max values plus volume — the canonical
    financial/metrics rollup.

    open/close use `min_by`/`max_by` on a composite (second,
    event_id) key — a single hash aggregate, no sort and no window,
    so it map-side combines and scales like any groupBy. The
    composite key makes intra-second ordering deterministic across
    engines (event time is compared at whole-second precision; the
    fixture's ns timestamps differ between Spark (µs) and DuckDB (ns)
    below that).
    """
    e = T(spark, sf_dir, "events")
    ordkey = (F.col("ts").cast("long") * F.lit(1_000_000) + F.col("event_id")).alias("ok")
    return (
        e.select("event_type", "ts", "event_id", "value", ordkey)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.round(F.min_by("value", F.col("ok")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("ok")), 4).alias("close"),
            dround(dsum(F.col("value")), 2).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "text_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                        x -> x <> '')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl * 1.0) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('spark', 'merge', 'vector')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * ({_BM25_K1} + 1.0)
                  / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
                  AS DECIMAL(18,6)) AS term_score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, CAST(round(sum(term_score), 4) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 15
    """,
    tags=("text", "llm", "search"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed term query — the classic
    lexical search scorer (Robertson/Sparck Jones; k1=1.2, b=0.75).

    Scale: tokenization + doc-length are one pass; the tf aggregate
    only keeps query terms (filter *before* the shuffle, so the
    shuffled volume is |matching postings|, not the corpus); df and
    corpus stats are tiny aggregates broadcast back. Top-k is
    TakeOrdered. This is the inverted-index scoring shape — postings
    for the query terms only — not a corpus-wide score-everything.

    Per-term scores are decimal-cast before the final sum so the
    3-term addition is order-insensitive (fpsafe rationale), and
    ranked on the rounded score with doc_id tiebreak.
    """
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl") * 1.0).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,6)")
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Fuzzy record linkage
# ---------------------------------------------------------------------------

@query(
    "linkage_fuzzy_nearest",
    oracle="""
    WITH pairs AS (
      SELECT a.doc_id,
             b.doc_id AS match_id,
             levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist
      FROM documents a
      JOIN documents b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
    ),
    ranked AS (
      SELECT doc_id, match_id, dist,
             row_number() OVER (PARTITION BY doc_id ORDER BY dist, match_id) AS rn
      FROM pairs
    )
    SELECT doc_id, match_id, dist FROM ranked WHERE rn = 1 AND dist <= 25
    """,
    tags=("linkage", "join", "text"),
)
def linkage_fuzzy_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: for every document, its nearest
    neighbor (edit distance on a 40-char prefix) within the same
    (lang, source) block, kept when dist <= 25.

    The classic dedup/linkage shape (Fellegi-Sunter blocking):
    candidate pairs come from an equi-join on the blocking key —
    never a global cross join — so cost is sum(block²), controlled by
    blocking-key cardinality. `levenshtein` runs JVM-side in codegen.
    The per-record argmin is a WindowGroupLimit (rank pushdown keeps
    the top row per doc before the filter). At 100 TB you'd add a
    second cheap blocking pass (sorted-neighborhood on a fingerprint)
    — the join/argmin spine is unchanged.
    """
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.substring("text", 1, 40).alias("prefix")
    )
    a = docs.select(
        F.col("doc_id"), "lang", "source", F.col("prefix").alias("pa")
    )
    b = docs.select(
        F.col("doc_id").alias("match_id"), "lang", "source", F.col("prefix").alias("pb")
    )
    pairs = (
        a.join(b, ["lang", "source"])
        .where(F.col("doc_id") != F.col("match_id"))
        .select(
            "doc_id",
            "match_id",
            F.levenshtein("pa", "pb").alias("dist"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("match_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("dist") <= 25))
        .select("doc_id", "match_id", "dist")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join with prefix filtering (PPJoin family)
# ---------------------------------------------------------------------------

_JACC_T = 0.95


@query(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS ts
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(round(len(list_intersect(a.ts, b.ts)) * 1.0
                 / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) AS DOUBLE) AS jaccard
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ts, b.ts)) * 1.0
          / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= {_JACC_T}
    """,
    tags=("dedup", "llm", "similarity", "join"),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-set Jaccard join (j >= 0.95) via inverted-index +
    prefix filtering — the scalable way to get *exact* (not MinHash-
    approximate) high-similarity pairs.

    Prefix-filter principle (PPJoin/AllPairs): order each doc's
    distinct tokens by ascending global frequency; two sets with
    Jaccard >= t MUST share a token within each one's first
    |T| - ceil(t*|T|) + 1 rarest tokens. So candidates come from an
    equi-join on *prefix tokens only* — the inverted index is built
    over prefixes, the long tail of frequent tokens never joins.
    Exact verification then runs only on candidates via
    `array_intersect` on the (deduped, bounded) token arrays.

    Scale: the token-frequency table is a groupBy on term
    (vocab-bounded) broadcast back; prefix explode shuffles
    O(prefix_len × docs) rows; the candidate join is an equi-join on
    (token) with AQE skew handling; verification is linear in
    candidates. The filter is lossless, so the result equals the
    all-pairs oracle exactly. (This fixture's vocabulary is tiny, so
    prefixes are less selective than a Zipfian corpus — the
    *algorithm* is what scales.)
    """
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
            )
        ).alias("ts"),
    ).withColumn("n", F.size("ts"))

    # Global token document-frequency → rank rare-first. Vocab-bounded.
    freq = (
        toks.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w_rank = Window.orderBy(F.asc("df"), F.asc("term"))
    ranked = freq.select("term", F.row_number().over(w_rank).alias("rank"))

    # Per-doc prefix: the (n - ceil(t*n) + 1) rarest tokens.
    prefix_len = (F.col("n") - F.ceil(F.col("n") * F.lit(_JACC_T)) + 1).cast("int")
    exploded = toks.select("doc_id", "n", F.explode("ts").alias("term"))
    with_rank = exploded.join(F.broadcast(ranked), "term")
    w_doc = Window.partitionBy("doc_id").orderBy(F.asc("rank"))
    prefixes = (
        with_rank.withColumn("pos", F.row_number().over(w_doc))
        .where(F.col("pos") <= prefix_len)
        .select("doc_id", "term")
    )

    # Candidate pairs share >=1 prefix token; verify exactly.
    cand = (
        prefixes.alias("pa")
        .join(prefixes.alias("pb"), "term")
        .where(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"), F.col("n").alias("n_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"), F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = inter * 1.0 / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(jac >= F.lit(_JACC_T))
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Triangle counting over the similarity graph
# ---------------------------------------------------------------------------

@query(
    "graph_triangle_count",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS ts
      FROM documents
    ),
    edges AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ts, b.ts)) * 1.0
            / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= {_JACC_T}
    )
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(DISTINCT v) FROM (SELECT a AS v FROM edges UNION SELECT b FROM edges)) AS n_nodes,
           (SELECT count(*)
            FROM edges e1 JOIN edges e2 ON e1.b = e2.a
                          JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
    tags=("graph", "similarity", "join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the exact-Jaccard similarity graph —
    the standard cluster-density / transitivity measure for a dedup
    pair graph (high triangle density ⇒ near-dup clusters are cliques
    and a greedy keeper-per-cluster is safe).

    Distributed formulation: orient every edge low→high (a<b), then
    triangles = edges ⋈ edges on the middle vertex ⋈ edges closing
    (a,c) — two hash joins, each on a single vertex key, counting
    each triangle exactly once. No vertex collects its whole
    neighborhood into memory. Skew (hub vertices) is the known risk;
    AQE skew-join splits hot keys, and at 100 TB you'd pre-bin by
    degree (Cohen's partitioning) on the same join spine.
    """
    edges = dedup_jaccard_prefix_filter(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    edges = edges.persist()
    e1 = edges.select(F.col("a"), F.col("b").alias("m"))
    e2 = edges.select(F.col("a").alias("m"), F.col("b").alias("c"))
    wedges = e1.join(e2, "m").select("a", "c")
    tri = wedges.join(
        edges.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    nodes = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .agg(F.countDistinct("v").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(nodes).crossJoin(tri)


# ---------------------------------------------------------------------------
# HLL sketch aggregation (rows-only: sketch estimates are not SQL-exact)
# ---------------------------------------------------------------------------

@query("agg_hll_union", oracle=None, tags=("agg", "sketch", "approx"))
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-event-type HyperLogLog
    sketches of the user audience, unioned into a total-audience
    estimate — the re-aggregatable cardinality pattern (store the
    sketch per partition/day, union across any slice later without
    rescanning).

    Spark's `hll_sketch_agg` (Apache DataSketches) builds the binary
    sketch JVM-side in one pass with map-side partial merge;
    `hll_union_agg` merges sketches — bytes, not rows, move in the
    second aggregation. Accuracy is bounded (~1.6% at lgK=12);
    tests/test_wave3.py pins estimates within 5% of exact. rows-only
    for the driver gate (DuckDB cannot replay DataSketches binaries).
    """
    e = T(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_type = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
        F.lit("per_type").alias("grain"),
    )
    total = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
            F.lit(None).cast("long").alias("exact_users"),
            F.lit("union").alias("grain"),
        )
    )
    return per_type.unionByName(total)


# ---------------------------------------------------------------------------
# Source/sink format parity: JSON-lines and ORC roundtrips
# ---------------------------------------------------------------------------

_FMT_ORACLE = """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
"""


def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=f"lakehouse_fmt_{fmt}_")
    shutil.rmtree(path, ignore_errors=True)
    orders = T(spark, sf_dir, "orders")
    # Dates must survive the format: JSON has no timestamp type, so
    # write ISO-8601 strings and re-apply the schema on read.
    out = orders.withColumn(
        "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    )
    out.write.format(fmt).mode("overwrite").save(path)
    back = (
        spark.read.format(fmt)
        .schema(out.schema)
        .load(path)
        .withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
    )


@query("format_json_roundtrip", oracle=_FMT_ORACLE, tags=("sources", "sinks", "formats"))
def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → source roundtrip: write orders as newline-
    delimited JSON, read back with an explicit schema, aggregate —
    oracle checks against the original parquet, so any loss in the
    format hop (type coercion, date handling, nulls) fails the gate.

    Schema-on-read is the scalable pattern: an explicit StructType
    skips Spark's whole-file schema inference pass (which reads the
    data twice) — mandatory at 100 TB. JSON writes shard per
    partition like any sink; reads split by line boundaries.
    """
    return _format_roundtrip(spark, sf_dir, "json")


@query("format_orc_roundtrip", oracle=_FMT_ORACLE, tags=("sources", "sinks", "formats"))
def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source roundtrip (the other columnar format the
    lakehouse world reads): same oracle as the JSON hop, so parquet →
    ORC → aggregate must be value-identical. ORC carries real
    timestamp/decimal types and per-stripe statistics, so predicate
    pushdown works like parquet's row-group pruning."""
    return _format_roundtrip(spark, sf_dir, "orc")
