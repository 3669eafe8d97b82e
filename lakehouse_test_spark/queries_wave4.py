"""Round-3 wave B: Spark 4 semi-structured surface (VARIANT, XML,
CSV scalar codecs) and linear-interpolation resampling.

VARIANT is Spark 4's shredded semi-structured type (binary-encoded
JSON with typed path access — the Snowflake/Databricks VARIANT
model); `from_xml`/`from_csv` are the scalar record codecs for
embedded payload columns (a Kafka value carrying CSV/XML instead of
Avro — the reference's payload-decode step, SURVEY.md §2a op 17/20,
generalized to other wire formats).

Roundtrip oracle pattern: the query *constructs* the encoded payload
from fixture columns inside the plan, decodes it with the scalar
codec under test, and aggregates the decoded values; the DuckDB
oracle aggregates the original columns directly. Any loss or type
drift in encode→decode fails the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "variant_shred_orders",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
           max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("variant", "json", "scalar"),
)
def variant_shred_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT path access: serialize each order to JSON, parse to a
    VARIANT, extract typed paths (`$.key`, `$.nested.price`,
    `$.nested.status`), aggregate the extracted values — the
    semi-structured ingestion pattern (store once as VARIANT, shred
    lazily with typed `variant_get` instead of a rigid schema).

    Scale: parse_json/variant_get are JVM intrinsics inside
    whole-stage codegen — no UDF, no Python. VARIANT's binary
    encoding skips re-tokenizing JSON per path access (vs
    get_json_object re-parsing the string each call).
    """
    o = T(spark, sf_dir, "orders")
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.col("o_totalprice").alias("price"),
                F.col("o_orderstatus").alias("status"),
            ).alias("nested"),
        )
    )
    v = F.parse_json(payload)
    return (
        o.select(
            F.variant_get(v, "$.nested.status", "string").alias("status"),
            F.variant_get(v, "$.key", "bigint").alias("key"),
            F.variant_get(v, "$.nested.price", "double").alias("price"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(dsum(F.col("price")), 2).alias("total_price"),
            F.max("key").alias("max_key"),
        )
    )


@query(
    "variant_props_typed",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT) * 1.0), 4) AS DOUBLE) AS avg_k
    FROM events GROUP BY event_type
    """,
    tags=("variant", "json", "events"),
)
def variant_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed VARIANT access over the events `props` JSON column —
    `try_variant_get` returns NULL (never throws) on path/type
    misses, the ANSI-safe posture for messy telemetry payloads."""
    e = T(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg(F.col("k") * 1.0), 4).alias("avg_k"),
        )
    )


_CSV_SCHEMA = StructType(
    [
        StructField("okey", LongType()),
        StructField("price", DoubleType()),
        StructField("prio", StringType()),
    ]
)


@query(
    "scalar_csv_codec_roundtrip",
    oracle="""
    SELECT o_orderpriority AS prio,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
           max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("scalar", "csv", "codec"),
)
def scalar_csv_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar CSV codec: `to_csv` packs typed columns into a CSV line
    per row, `from_csv` re-applies the schema — the embedded-payload
    decode for CSV-valued message columns (reference op 17's
    positional projection as a *column* transform, not a file scan).
    Quoting matters: o_orderpriority contains no commas in the
    fixture, but the codec round-trips quoted fields regardless."""
    o = T(spark, sf_dir, "orders")
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    parsed = F.from_csv(line, _CSV_SCHEMA.simpleString())
    return (
        o.select(parsed.alias("r"))
        .select("r.okey", "r.price", "r.prio")
        .groupBy(F.col("prio"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(dsum(F.col("price")), 2).alias("total_price"),
            F.max("okey").alias("max_key"),
        )
    )


@query(
    "scalar_xml_codec_roundtrip",
    oracle="""
    SELECT n_nation AS nation_key,
           count(*) AS n_suppliers,
           CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
    FROM (
      SELECT s.s_nationkey AS n_nation, s.s_acctbal
      FROM supplier s
    ) GROUP BY n_nation
    """,
    tags=("scalar", "xml", "codec"),
)
def scalar_xml_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar XML codec: `to_xml` renders each supplier as an XML
    record, `from_xml` parses it back with an explicit schema — the
    XML flavor of the embedded-payload decode (Spark 4's built-in
    spark-xml). Namespace-free element-per-field mapping."""
    s = T(spark, sf_dir, "supplier")
    xml = F.to_xml(
        F.struct(
            F.col("s_nationkey").alias("nk"),
            F.col("s_acctbal").alias("bal"),
        )
    )
    schema = StructType(
        [StructField("nk", LongType()), StructField("bal", DoubleType())]
    )
    parsed = F.from_xml(xml, schema.simpleString())
    return (
        s.select(parsed.alias("r"))
        .select(F.col("r.nk").alias("nation_key"), F.col("r.bal").alias("bal"))
        .groupBy("nation_key")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dround(dsum(F.col("bal")), 2).alias("total_bal"),
        )
    )


@query(
    "timeseries_interpolate_linear",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM agg GROUP BY event_type
    ),
    grid AS (
      SELECT b.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds b
    ),
    joined AS (
      SELECT g.event_type, g.hour, a.v,
             CAST(floor(epoch(g.hour)) AS BIGINT) / 3600 AS hn
      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.hour = a.hour
    ),
    ctx AS (
      SELECT event_type, hour, v, hn,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS) OVER w_prev AS ph,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS) OVER w_next AS nh
      FROM joined
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour,
           CAST(round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (hn - ph) / (nh - ph)
             ELSE coalesce(pv, nv) END + 0.000000001, 4) AS DOUBLE) AS v_interp,
           (v IS NULL) AS interpolated
    FROM ctx
    """,
    tags=("timeseries", "events", "window"),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the resampled hourly grid: missing
    buckets of the hourly-total series get the line between their
    nearest observed neighbors
    (LOCF at the edges) — the numeric gap-fill for sensor/metric
    series where carry-forward biases trends.

    Two mirror-image running windows per series (prev = last
    ignorenulls looking back, next = first ignorenulls looking
    forward) — both O(1)-state frames, no self-join against observed
    points. Observed values pass through unchanged; the rounded
    anchor values make the interpolation arithmetic identical across
    engines.
    """
    e = T(spark, sf_dir, "events")
    agg = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        dround(dsum(F.col("value")), 2).alias("v")
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(agg, ["event_type", "hour"], "left").withColumn(
        "hn", (F.col("hour").cast("long") / 3600).cast("long")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    hn_obs = F.when(F.col("v").isNotNull(), F.col("hn"))
    ctx = joined.select(
        "event_type",
        "hour",
        "v",
        "hn",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(hn_obs, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(hn_obs, ignorenulls=True).over(w_next).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hn") - F.col("ph"))
            / (F.col("nh") - F.col("ph")),
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    # +1e-9 before rounding on BOTH engines: midpoint interpolation
    # between 2-dp anchors lands exactly on 4-dp rounding boundaries,
    # where Spark (BigDecimal half-up on the binary expansion) and
    # DuckDB (scaled nearbyint) can disagree by one final digit. The
    # nudge moves every representable result off the boundary; double
    # noise (~1e-13) is far smaller than the shift.
    return ctx.select(
        "event_type",
        "hour",
        F.round(interp + F.lit(1e-9), 4).alias("v_interp"),
        F.col("v").isNull().alias("interpolated"),
    )
