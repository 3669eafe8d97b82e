"""Third expression wave (SURVEY.md §2b): string functions II
(pad/translate/levenshtein/split_part), structured types (struct,
map, from_json), array functions II (slice/flatten/zip_with/
exists/filter), batch sessionization, and pivot-by-type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           concat(upper(substr(p_type, 1, 1)), lower(substr(p_type, 2))) AS type_title,
           lpad(CAST(p_size AS VARCHAR), 4, '0')        AS size_padded,
           rpad(p_brand, 12, '.')                        AS brand_padded,
           translate(p_name, 'aeiou', '#####')           AS name_novowels,
           repeat('*', p_size % 5)                       AS stars,
           reverse(p_brand)                              AS brand_rev,
           CAST(strpos(p_name, 'a') AS INTEGER)          AS first_a_pos,
           split_part(p_name, ' ', 1)                    AS name_head,
           CAST(levenshtein(p_brand, 'Brand#1') AS INTEGER) AS brand_editdist
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery II: initcap/pads/translate/repeat/reverse/
    instr/split_part/levenshtein (all codegen'd built-ins)."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_type").alias("type_title"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_name", "aeiou", "#####").alias("name_novowels"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "a").cast("int").alias("first_a_pos"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("name_head"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("int").alias("brand_editdist"),
    )


@query(
    "struct_and_map_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_from_struct,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS price_from_map,
           to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS packed_json
    FROM orders
    """,
    tags=("scalar", "struct", "map"),
)
def struct_and_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction/field access, map build + element_at, and
    struct→JSON serialization (schema-on-write for nested types)."""
    o = T(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s"))
    m = F.create_map(F.lit("price"), F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        s.getField("s").alias("status_from_struct"),
        F.round(F.element_at(m, "price"), 2).alias("price_from_map"),
        F.to_json(s).alias("packed_json"),
    )


@query(
    "json_schema_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END AS missing_is_null
    FROM events
    """,
    tags=("scalar", "json", "events"),
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-applied JSON parse (from_json with a declared schema →
    typed struct), including absent-field null semantics."""
    e = T(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT, missing STRING")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.when(parsed.getField("missing").isNull(), 1).otherwise(0).alias("missing_is_null"),
    )


@query(
    "array_funcs2",
    oracle="""
    SELECT vec_id,
           CAST(round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 4) AS DOUBLE)
             AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           CAST(list_position(embedding, list_aggregate(embedding, 'max')) AS INTEGER) AS argmax_pos,
           CASE WHEN len(list_filter(embedding, x -> abs(x) > 3)) > 0 THEN 1 ELSE 0 END AS has_outlier
    FROM embeddings
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery II: slice / filter / position-of-max / exists —
    the vector-manipulation toolkit under the similarity ops."""
    e = T(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head = F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(F.aggregate(head, F.lit(0.0), lambda a, x: a + x), 4).alias("head_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.array_position(emb, F.array_max(emb)).cast("int").alias("argmax_pos"),
        F.when(F.exists(emb, lambda x: F.abs(x) > 3), 1).otherwise(0).alias("has_outlier"),
    )


@query(
    "events_sessionize_batch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, t,
             CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800
                  OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    )
    SELECT user_id,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq,
           event_id
    FROM flagged
    """,
    tags=("window", "session", "events"),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): 30-min-gap session
    sequence number per user — the batch twin of session_window,
    built from lag + running sum (one shuffle on user_id)."""
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("t") - F.lag("t").over(w) > 1800) | F.lag("t").over(w).isNull(), 1
        ).otherwise(0),
    )
    return flagged.select(
        "user_id", F.sum("new_session").over(run).alias("session_seq"), "event_id"
    )


@query(
    "events_pivot_by_type",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
    tags=("agg", "pivot", "events"),
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide activity matrix: pivot event types to columns per user
    (single-pass pivot with an explicit value list — no second scan
    for value discovery, which matters at 100 TB)."""
    e = T(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    p = e.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    for t in types:
        p = p.withColumn(f"n_{t}", F.coalesce(F.col(t), F.lit(0))).drop(t)
    return p
