"""Round-3 wave K: market-basket association rules, robust means,
candidate-key DQ, curriculum data ordering, and per-label embedding
top-k. All oracle hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dsum, sql_dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "basket_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS nb FROM baskets
    ), freq AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS f FROM baskets GROUP BY 1
    ), co AS (
      SELECT a.l_partkey AS i, b.l_partkey AS j, CAST(count(*) AS BIGINT) AS c
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT i AS antecedent, j AS consequent, c AS pair_count,
           round(c / nb, 6) AS support,
           round(CAST(c AS DOUBLE) / fi.f, 6) AS confidence,
           round(c * nb / (fi.f * fj.f), 6) AS lift
    FROM co JOIN freq fi ON fi.l_partkey = co.i
            JOIN freq fj ON fj.l_partkey = co.j
    CROSS JOIN n
    ORDER BY round(c * nb / (fi.f * fj.f), 6) DESC, i, j LIMIT 40
    """,
    tags=("recsys", "basket", "agg"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules i→j with the full Apriori
    metric set — support c_ij/N, confidence c_ij/c_i, lift
    N·c_ij/(c_i·c_j) — min-support 5, top-40 by lift. Directional
    (both (i,j) and (j,i) score), unlike the symmetric cosine of
    recsys_item_item_cosine: confidence is what drives "customers who
    bought X also bought Y".

    Scale: pair generation shuffles on orderkey (bounded by basket
    size², never catalog size); item frequencies broadcast back; the
    min-support HAVING prunes the pair table before the metric joins;
    final ranking is a TakeOrdered.
    """
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    nb = li.agg(F.countDistinct("l_orderkey").cast("double").alias("nb"))
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("i"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("j"))
    co = (
        a.join(b, "ok")
        .where(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .where(F.col("c") >= 5)
    )
    fi = freq.select(F.col("l_partkey").alias("i"), F.col("f").alias("fi"))
    fj = freq.select(F.col("l_partkey").alias("j"), F.col("f").alias("fj"))
    lift = F.col("c") * F.col("nb") / (F.col("fi") * F.col("fj"))
    scored = (
        co.join(F.broadcast(fi), "i")
        .join(F.broadcast(fj), "j")
        .join(F.broadcast(nb))
        .select(
            F.col("i").alias("antecedent"),
            F.col("j").alias("consequent"),
            F.col("c").alias("pair_count"),
            F.round(F.col("c") / F.col("nb"), 6).alias("support"),
            F.round(F.col("c").cast("double") / F.col("fi"), 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "antecedent", "consequent").limit(40)


@query(
    "agg_trimmed_winsorized_mean",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice AS price,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), bounds AS (
      SELECT l_returnflag,
             CAST(floor(n * 0.1) AS BIGINT) AS k
      FROM ranked GROUP BY l_returnflag, n
    ), lims AS (
      SELECT r.l_returnflag,
             min(CASE WHEN rn = k + 1 THEN price END) AS lo,
             min(CASE WHEN rn = n - k THEN price END) AS hi
      FROM ranked r JOIN bounds b USING (l_returnflag)
      GROUP BY r.l_returnflag
    )
    SELECT r.l_returnflag,
           CAST(round(CAST({DSUM_TRIM} AS DOUBLE)
                 / sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END), 2)
             AS DOUBLE) AS trimmed_mean,
           CAST(round(CAST({DSUM_WINS} AS DOUBLE) / count(*), 2) AS DOUBLE)
             AS winsorized_mean,
           CAST(max(n) AS BIGINT) AS n_rows
    FROM ranked r JOIN bounds b USING (l_returnflag) JOIN lims USING (l_returnflag)
    GROUP BY r.l_returnflag
    """.replace(
        "{DSUM_TRIM}",
        sql_dsum("CASE WHEN rn > k AND rn <= n - k THEN price ELSE 0 END"),
    ).replace(
        "{DSUM_WINS}",
        sql_dsum("CASE WHEN price < lo THEN lo WHEN price > hi THEN hi ELSE price END"),
    ),
    tags=("agg", "stats", "robust"),
)
def agg_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimators per group: the 10% trimmed mean
    (drop ⌊0.1n⌋ rows from each tail) and the 10% winsorized mean
    (clamp tails to the cut values) of extended price — what
    financial/metric pipelines use when plain averages are
    outlier-hostile. Exact rank-based construction: one window pass
    assigns ranks, the cut values come from rank lookups, means use
    decimal-cast sums (tie order inside equal prices cannot change
    either statistic — the kept/clamped multiset is rank-count
    determined).

    Scale: one shuffle + windowed sort per group (the exact-percentile
    cost); at extreme cardinality approximate with quantile sketches.
    """
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("price"), "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy("price", "l_orderkey", "l_linenumber")
    wp = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).withColumn("k", F.floor(F.col("n") * 0.1).cast("bigint"))
    lims = ranked.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == F.col("k") + 1, F.col("price"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("price"))).alias("hi"),
    )
    j = ranked.join(F.broadcast(lims), "l_returnflag")
    kept = F.when((F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")), F.col("price")).otherwise(F.lit(0.0))
    wins = (
        F.when(F.col("price") < F.col("lo"), F.col("lo"))
        .when(F.col("price") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("price"))
    )
    return j.groupBy("l_returnflag").agg(
        F.round(
            dsum(kept).cast("double")
            / F.sum(
                F.when(
                    (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")), 1
                ).otherwise(0)
            ),
            2,
        )
        .cast("double")
        .alias("trimmed_mean"),
        F.round(dsum(wins).cast("double") / F.count(F.lit(1)), 2)
        .cast("double")
        .alias("winsorized_mean"),
        F.max("n").cast("bigint").alias("n_rows"),
    )


@query(
    "dq_uniqueness_keys",
    oracle="""
    WITH checks AS (
      SELECT 'orders' AS table_name, 'o_orderkey' AS key_cols,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'orders', 'o_custkey,o_orderdate',
             CAST(count(*) AS BIGINT),
             CAST((SELECT count(*) FROM
                   (SELECT DISTINCT o_custkey, o_orderdate FROM orders)) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'l_orderkey,l_linenumber',
             CAST(count(*) AS BIGINT),
             CAST((SELECT count(*) FROM
                   (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'events', 'event_id',
             CAST(count(*) AS BIGINT),
             CAST(count(DISTINCT event_id) AS BIGINT)
      FROM events
    )
    SELECT table_name, key_cols, n_rows, n_distinct,
           n_rows - n_distinct AS n_dup_rows,
           n_rows = n_distinct AS is_unique
    FROM checks
    """,
    tags=("dq", "profile"),
)
def dq_uniqueness_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit: for each declared key (primary keys and a
    deliberately weak composite), row count vs distinct count and the
    duplicate excess — the uniqueness expectation every warehouse
    contract starts with (dq_expectations' key-shaped sibling).

    Scale: one count-distinct aggregate per declared key — each a
    single shuffle of partial sketch/state; run them per table in one
    pass at real scale by combining into a single agg.
    """
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    e = T(spark, sf_dir, "events")

    def check(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
        return df.agg(
            F.lit(table).alias("table_name"),
            F.lit(",".join(cols)).alias("key_cols"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(*cols).cast("bigint").alias("n_distinct"),
        )

    out = (
        check(o, "orders", ["o_orderkey"])
        .unionByName(check(o, "orders", ["o_custkey", "o_orderdate"]))
        .unionByName(check(li, "lineitem", ["l_orderkey", "l_linenumber"]))
        .unionByName(check(e, "events", ["event_id"]))
    )
    return out.select(
        "table_name",
        "key_cols",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
        (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
    )


@query(
    "pipeline_curriculum_order",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             ntile(4) OVER (ORDER BY n_chars, doc_id) AS difficulty_bucket,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key
      FROM documents
    )
    SELECT row_number() OVER (ORDER BY difficulty_bucket, shuffle_key, doc_id)
             AS position,
           difficulty_bucket, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM scored
    ORDER BY position LIMIT 100
    """,
    tags=("llm", "pipeline", "curriculum"),
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering for training: documents bucketed by
    difficulty (length quartiles — swap in a quality/perplexity score
    at will), DETERMINISTICALLY shuffled within each bucket by a hash
    key, and assigned global positions easy→hard. Reproducible
    epoch ordering — same corpus, same curriculum, any cluster — the
    operational requirement behind "data ordering matters" papers.

    Scale: positions are assigned HIERARCHICALLY (range shuffle +
    within-partition row numbers + bucket offsets from a tiny
    per-partition count aggregate — ``operators/ordering.py``), and
    the ntile quartile comes from the same exact rank in closed form.
    No single-partition window anywhere in the plan (pinned in
    tests/test_plans.py); positions are bit-identical to the global
    ``row_number``/``ntile`` formulation the oracle runs.
    """
    from lakehouse_test_spark.operators.ordering import (
        global_row_number,
        ntile_from_rank,
    )

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("shuffle_key"),
    )
    ranked = global_row_number(d, ["n_chars", "doc_id"], "__rank")
    total = F.broadcast(d.agg(F.count(F.lit(1)).alias("__total")))
    scored = ranked.crossJoin(total).select(
        "doc_id",
        "n_chars",
        "shuffle_key",
        ntile_from_rank(F.col("__rank"), F.col("__total"), 4)
        .cast("int")
        .alias("difficulty_bucket"),
    )
    positioned = global_row_number(
        scored, ["difficulty_bucket", "shuffle_key", "doc_id"], "position"
    )
    return (
        positioned.select(
            F.col("position").cast("int").alias("position"),
            "difficulty_bucket",
            "doc_id",
            "n_chars",
        )
        .orderBy("position")
        .limit(100)
    )


@query(
    "embedding_topk_per_label",
    oracle=f"""
    WITH flat AS (
      SELECT label, i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS val
      FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) i
    ), cent AS (
      SELECT label, pos, CAST({sql_dsum('val')} AS DOUBLE) / count(*) AS c
      FROM flat GROUP BY label, pos
    ), centv AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
    ), scored AS (
      SELECT e.vec_id, e.label,
             round(
               list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                    'sum'))
                  * sqrt(list_aggregate(list_transform(range(1, len(c.centroid) + 1),
                    i -> c.centroid[i] * c.centroid[i]), 'sum'))), 6) AS cos
      FROM embeddings e JOIN centv c USING (label)
    )
    SELECT label, vec_id, cos AS cos_to_centroid,
           CAST(rk AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY cos DESC, vec_id) AS rk
          FROM scored)
    WHERE rk <= 5
    """,
    tags=("embedding", "llm", "similarity"),
)
def embedding_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label exemplar mining: the 5 vectors closest (cosine) to
    their label's centroid — the "most representative examples per
    class" query behind centroid-based few-shot selection and cluster
    naming. Rounded-then-tiebroken ranking per the determinism
    policy.

    Scale: centroids via the (label, pos) decimal-sum aggregate
    (embedding_label_centroids' shape), broadcast back; scoring is a
    map-side fold per vector; per-label top-k is a window with
    WindowGroupLimit pushdown, not a global sort.
    """
    e = T(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent = flat.groupBy("label", "pos").agg(
        (dsum(F.col("val").cast("double")).cast("double") / F.count(F.lit(1))).alias("c")
    )
    centv = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    j = e.join(F.broadcast(centv), "label")
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("centroid"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(F.col("centroid"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = j.select(
        "label", "vec_id", F.round(dot / (n1 * n2), 6).alias("cos_to_centroid")
    )
    wrk = Window.partitionBy("label").orderBy(F.desc("cos_to_centroid"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(wrk))
        .where(F.col("rank") <= 5)
        .select("label", "vec_id", "cos_to_centroid", F.col("rank").cast("int").alias("rank"))
    )
