"""Round-3 wave O: oracle-checked greedy LM generation and graph
link prediction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "lm_greedy_generation",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
    ), bi AS (
      SELECT w[i] AS cur, w[i+1] AS nxt, CAST(count(*) AS BIGINT) AS c
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
      WHERE w[i] <> '' AND w[i+1] <> ''
      GROUP BY 1, 2
    ), start AS (
      SELECT cur FROM (SELECT cur, sum(c) AS tot FROM bi GROUP BY cur
                       ORDER BY tot DESC, cur LIMIT 1)
    ), chain AS (
      SELECT 0 AS step, (SELECT cur FROM start) AS tok,
             CAST((SELECT cur FROM start) AS VARCHAR) AS sentence
      UNION ALL
      SELECT ch.step + 1, b.nxt, ch.sentence || ' ' || b.nxt
      FROM chain ch JOIN bi b ON b.cur = ch.tok
      WHERE ch.step < 19
        AND NOT EXISTS (
          SELECT 1 FROM bi b2
          WHERE b2.cur = ch.tok AND (b2.c > b.c OR (b2.c = b.c AND b2.nxt < b.nxt))
        )
    )
    SELECT CAST(step AS INTEGER) AS step, tok, sentence FROM chain
    """,
    tags=("text", "llm", "lm", "iterative"),
)
def lm_greedy_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy (argmax) text generation from the corpus bigram model,
    HASH-CHECKED step by step against a recursive-CTE oracle: start
    at the highest-frequency token, repeatedly take the most likely
    successor (count desc, lexicographic tiebreak) for 20 steps —
    inference over the same counts lm_kneser_ney_bigram smooths. The
    emitted chain cycling into a loop is exactly what greedy decoding
    does on a small model, and both engines must agree on every step
    and the accumulated sentence.

    Engine shape: the argmax successor table is ONE window over the
    bigram counts (rank per cur, keep rank 1 — a |vocab|-sized
    broadcastable map); the 20-step chain walks it driver-side over
    collected rows (vocabulary-sized state, like the BPE trainer's
    vocab loop — never corpus-sized).
    """
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower(F.col("text")), r"\s+").alias("w"))
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(w) - 1, 0)),"
                    " i -> struct(element_at(w, i) AS cur, element_at(w, i + 1) AS nxt))"
                )
            ).alias("b")
        )
        .where((F.col("b.cur") != "") & (F.col("b.nxt") != ""))
        .groupBy("b.cur", "b.nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    from pyspark.sql import Window

    wbest = Window.partitionBy("cur").orderBy(F.desc("c"), "nxt")
    best = (
        bi.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select("cur", "nxt")
    )
    start = (
        bi.groupBy("cur")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), "cur")
        .limit(1)
        .collect()[0]["cur"]
    )
    succ = {r["cur"]: r["nxt"] for r in best.collect()}  # vocab-sized
    rows = []
    tok, sentence = start, start
    for step in range(20):
        rows.append((step, tok, sentence))
        tok = succ.get(tok)
        if tok is None:
            break
        sentence = sentence + " " + tok
    return spark.createDataFrame(rows, "step int, tok string, sentence string")


@query(
    "graph_link_prediction_jaccard",
    oracle="""
    WITH half AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v, u FROM half
    ), deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), common AS (
      SELECT e1.u AS a, e2.u AS b, CAST(count(*) AS BIGINT) AS cn
      FROM edges e1 JOIN edges e2 ON e1.v = e2.v AND e1.u < e2.u
      GROUP BY 1, 2
    ), nonedge AS (
      SELECT c.a, c.b, c.cn, da.d AS dega, db.d AS degb
      FROM common c
      JOIN deg da ON da.u = c.a JOIN deg db ON db.u = c.b
      WHERE NOT EXISTS (SELECT 1 FROM half h WHERE h.u = c.a AND h.v = c.b)
    )
    SELECT a, b, cn AS common_neighbors,
           round(CAST(cn AS DOUBLE) / (dega + degb - cn), 6) AS jaccard
    FROM nonedge
    ORDER BY round(CAST(cn AS DOUBLE) / (dega + degb - cn), 6) DESC, a, b
    LIMIT 20
    """,
    tags=("graph", "ml", "similarity"),
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: the 20 NON-adjacent
    part pairs with the highest neighbor-set Jaccard similarity
    (common/(deg_a+deg_b-common)) — the classic unsupervised
    "you may also like" / graph-completion scorer, hash-checked.

    Scale: common-neighbor counting is one self-join of the edge list
    through the shared endpoint (the triangle-counting shuffle shape)
    + a map-combinable pair rollup; the non-edge filter is an
    anti-join against the edge list; degrees broadcast back. Hub skew
    → the usual AQE split / degree-capped sampling at extreme scale.
    """
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    half = a.join(b, "ok").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    edges = half.unionByName(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("w"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("w"))
    common = (
        e1.join(e2, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    nonedge = common.join(
        half.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("dega"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("degb"))
    jac = F.col("cn") / (F.col("dega") + F.col("degb") - F.col("cn"))
    scored = (
        nonedge.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            F.col("cn").alias("common_neighbors"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("jaccard"), "a", "b").limit(20)
