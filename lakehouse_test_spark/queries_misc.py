"""Final coverage batch (SURVEY.md §2b): null-safe equality joins,
bitwise operations, binary/base64 encoding, printf-style formatting,
map entry explosion, and zipped arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL
                                      ELSE c_nationkey END AS nk FROM customer),
         s AS (SELECT s_suppkey, CASE WHEN s_acctbal < 0 THEN NULL
                                      ELSE s_nationkey END AS nk FROM supplier)
    SELECT c.c_custkey, s.s_suppkey
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    """,
    tags=("join", "null"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — still a hash join (the
    null bucket is just another key), unlike `=` which drops them."""
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_nationkey")).alias("nk"),
    )
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, None).otherwise(F.col("s_nationkey")).alias("nk_s"),
    )
    return c.join(s, c.nk.eqNullSafe(s.nk_s)).select("c_custkey", "s_suppkey")


@query(
    "scalar_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)        AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT)       AS with_flag,
           CAST(xor(o_orderkey, 1023) AS BIGINT)   AS xored,
           CAST(o_orderkey << 2 AS BIGINT)         AS shifted_left,
           CAST(o_orderkey >> 3 AS BIGINT)         AS shifted_right,
           CAST(bit_count(o_orderkey) AS INTEGER)  AS popcount
    FROM orders
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: AND/OR/XOR/shifts/popcount (codegen'd; the
    primitives under the SimHash/LSH operators)."""
    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.lit(1023)).cast("bigint").alias("xored"),
        F.shiftleft(k, 2).cast("bigint").alias("shifted_left"),
        F.shiftright(k, 3).cast("bigint").alias("shifted_right"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


@query(
    "scalar_binary_base64",
    oracle="""
    SELECT doc_id,
           base64(encode(substr(text, 1, 24)))                    AS head_b64,
           CAST(octet_length(encode(text)) AS BIGINT)             AS n_bytes,
           format('doc {} [{}]', doc_id, lang)                    AS label
    FROM documents
    """,
    tags=("scalar", "binary", "string"),
)
def scalar_binary_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode → base64, byte lengths, printf-style formatting."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("head_b64"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.format_string("doc %s [%s]", F.col("doc_id"), F.col("lang")).alias("label"),
    )


@query(
    "map_entries_explode",
    oracle="""
    SELECT o_orderkey, k AS metric, v AS metric_value FROM (
      SELECT o_orderkey, 'price' AS k, CAST(round(o_totalprice, 2) AS DOUBLE) AS v FROM orders
      UNION ALL
      SELECT o_orderkey, 'year' AS k, CAST(year(o_orderdate) AS DOUBLE) AS v FROM orders
    )
    """,
    tags=("scalar", "map", "explode"),
)
def map_entries_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction → entry explosion (wide→long unpivot through
    a map column; oracle mirrors with a UNION ALL)."""
    o = T(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("price"), F.round("o_totalprice", 2),
        F.lit("year"), F.year("o_orderdate").cast("double"),
    )
    return o.select("o_orderkey", F.explode(m).alias("metric", "metric_value"))


@query(
    "arrays_zip_pairs",
    oracle="""
    SELECT vec_id,
           CAST(round(CAST(embedding[i] AS DOUBLE) * CAST(embedding[65 - i] AS DOUBLE), 6) AS DOUBLE)
             AS sym_product,
           CAST(i AS INTEGER) AS pos
    FROM embeddings, range(1, 33) t(i)
    """,
    tags=("scalar", "array", "embeddings"),
)
def arrays_zip_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with over an array and its reverse (pairwise symmetric
    products, first 32 dims) then positional explode."""
    e = T(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sym = F.slice(F.zip_with(emb_d, F.reverse(emb_d), lambda a, b: F.round(a * b, 6)), 1, 32)
    return (
        e.select("vec_id", F.posexplode(sym).alias("pos0", "sym_product"))
        .select("vec_id", "sym_product", (F.col("pos0") + 1).cast("int").alias("pos"))
    )


@query(
    "filter_rlike_regex",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^(small|red).*t$')
    """,
    tags=("filter", "regex"),
)
def filter_rlike_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate filter (rlike ≡ regexp_matches)."""
    p = T(spark, sf_dir, "part")
    return p.where(F.col("p_name").rlike("^(small|red).*t$")).select("p_partkey", "p_name")


@query(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup", "grouping"),
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns on a rollup — distinguishes 'NULL
    because subtotal' from 'NULL because data' (essential when group
    keys are nullable)."""
    o = T(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n")


@query(
    "scalar_regexp_backrefs",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '([a-z]+) ([a-z]+)', '\\2 \\1') AS name_swapped,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    """,
    tags=("scalar", "regex"),
)
def scalar_regexp_backrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture groups: backreference substitution (Spark `$n` ≡
    DuckDB `\\n`) and anchored group extraction."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", r"([a-z]+) ([a-z]+)", r"$2 $1").alias("name_swapped"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "explode_outer_null_preserving",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN []
                  ELSE string_split(lang, ',') END AS tags
      FROM documents
    )
    SELECT doc_id, u.x AS tag
    FROM t LEFT JOIN LATERAL (SELECT unnest(t.tags) AS x) u ON true
    """,
    tags=("scalar", "explode"),
)
def explode_outer_null_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with NULL (plain
    explode drops them — a silent data-loss bug in pipelines)."""
    d = T(spark, sf_dir, "documents")
    tags = F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>")).otherwise(
        F.split("lang", ",")
    )
    return d.select("doc_id", F.explode_outer(tags).alias("tag"))


@query(
    "set_intersect_except_all",
    oracle="""
    SELECT nationkey, 'intersect_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'except_all' FROM (
      SELECT s_nationkey AS nationkey FROM supplier
      EXCEPT ALL
      SELECT c_nationkey FROM customer
    )
    """,
    tags=("setop",),
)
def set_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): duplicates
    survive with multiplicity min/difference — distinct from the
    dedup variants in the first set-op battery."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = c.intersectAll(s).withColumn("op", F.lit("intersect_all"))
    ea = s.exceptAll(c).withColumn("op", F.lit("except_all"))
    return ia.unionByName(ea)


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT c_custkey, band FROM (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL
                  ELSE CAST(floor(c_acctbal / 1000) AS BIGINT) END AS band
      FROM customer
    )
    ORDER BY band DESC NULLS LAST, c_custkey
    LIMIT 100
    """,
    tags=("sort", "null"),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering on a nullable sort key (engines
    disagree on default null placement — being explicit is the only
    portable semantics), deterministic via key tiebreak."""
    c = T(spark, sf_dir, "customer")
    band = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    return (
        c.select("c_custkey", band.alias("band"))
        .orderBy(F.col("band").desc_nulls_last(), F.col("c_custkey").asc())
        .limit(100)
    )


@query(
    "window_last_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CASE WHEN event_type = 'purchase' THEN round(value, 4) END AS purchase_value
      FROM events
    )
    SELECT event_id, user_id,
           CAST(last_value(purchase_value IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS last_purchase_value
    FROM e
    """,
    tags=("window", "null", "events"),
)
def window_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value IGNORE NULLS running frame — the forward-fill
    primitive (and the kernel inside the as-of join operator)."""
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        F.when(F.col("event_type") == "purchase", F.round("value", 4)).alias("purchase_value"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last("purchase_value", ignorenulls=True).over(w).alias("last_purchase_value"),
    )
