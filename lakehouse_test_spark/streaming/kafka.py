"""Kafka connectivity surface: option builders for Spark's
``format("kafka")`` source/sink plus the token-auth SASL config the
reference's cloud clients use (UrsaKafkaProducerOnCloud.java:30-44,
UrsaKafkaConsumerOnCloud.java, PerformanceConsumer.java:132-141).

No broker exists in this environment, so end-to-end reads are gated
behind these builders + ``read_stream``/``write_stream`` wrappers; the
builders themselves are pure and unit-tested. The value wire format
for registry-framed Avro (KafkaAvroSerializer) lives in
``sources.avro_codec``: ``to_avro_confluent``/``from_avro_confluent``
produce/consume the 5-byte magic+schema-id envelope.

Scale notes: ``maxOffsetsPerTrigger`` is the consume-side rate limit
(reference op 22); ``minPartitions`` fans a hot topic-partition out to
more Spark tasks than Kafka partitions (reference op 7's partition
expansion, done by the source instead of the broker admin).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def sasl_token_jaas(token: str, username: str = "user") -> str:
    """PLAIN-mechanism JAAS line for bearer-token auth: the username
    is ignored by the service, the token rides in the password slot
    (reference UrsaKafkaProducerOnCloud.java:33-37)."""
    tok = f"token:{token}"
    return (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        f'username="{username}" password="{tok}";'
    )


def _auth_options(auth_token: str | None) -> dict[str, str]:
    if auth_token is None:
        return {}
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": sasl_token_jaas(auth_token),
    }


def kafka_source_options(
    bootstrap_servers: str,
    topics: list[str] | str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
    auth_token: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")``.

    ``starting_offsets`` accepts ``earliest``/``latest`` (reference
    op 8 is earliest-start) or a per-partition JSON string.
    """
    if isinstance(topics, str):
        topics = [topics]
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    opts.update(_auth_options(auth_token))
    opts.update(extra or {})
    return opts


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    *,
    checkpoint_location: str | None = None,
    auth_token: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for ``df.writeStream.format("kafka")`` (or batch
    ``df.write.format("kafka")``). The df must carry ``value`` (and
    optionally ``key``/``topic``/``partition``) columns — multi-topic
    fan-out (reference op 12) is a per-row ``topic`` column instead
    of N producers."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if checkpoint_location is not None:
        opts["checkpointLocation"] = checkpoint_location
    opts.update(_auth_options(auth_token))
    opts.update(extra or {})
    return opts


def starting_offsets_json(assignments: dict[str, dict[int, int]]) -> str:
    """Per-partition starting offsets: {topic: {partition: offset}} →
    the JSON string ``startingOffsets`` accepts (-2 = earliest,
    -1 = latest)."""
    return json.dumps(
        {t: {str(p): o for p, o in parts.items()} for t, parts in assignments.items()}
    )


def frame_records(
    df: DataFrame,
    avro_schema: dict,
    schema_id: int,
    key_col: str | None = None,
) -> DataFrame:
    """Project a typed DataFrame into the Kafka sink's (key, value)
    shape with ``value`` = registry-framed Avro: the Confluent 5-byte
    magic+schema-id envelope prepended to the Avro body — exactly what
    KafkaAvroSerializer puts on the wire
    (reference UrsaKafkaProducerOnCloud.java:39-44).

    The envelope is a constant folded into the plan (JVM-side concat);
    only body encoding hits the Arrow-batched codec."""
    from lakehouse_test_spark.sources.avro_codec import (
        _schema_field_types,
        to_avro_confluent,
    )

    names, _ = _schema_field_types(avro_schema)
    cols = []
    if key_col is not None:
        cols.append(F.col(key_col).cast("string").cast("binary").alias("key"))
    cols.append(
        to_avro_confluent(F.struct(*names), avro_schema, schema_id).alias("value")
    )
    return df.select(*cols)


def unframe_records(
    df: DataFrame,
    avro_schema: dict,
    spark_schema: StructType,
    expected_schema_id: int | None = None,
) -> DataFrame:
    """Decode a Kafka source DataFrame (binary ``value`` column) whose
    values carry the Confluent envelope: envelope split is JVM-side
    (substring + hex→int schema id), body decode is the Arrow codec.

    Rows whose magic byte is wrong surface with ``schema_id`` NULL; if
    ``expected_schema_id`` is given, other ids are filtered out (the
    single-literal-schema stand-in for a registry fetch, as documented
    in SURVEY.md §2a op 6)."""
    from lakehouse_test_spark.sources.avro_codec import (
        confluent_schema_id,
        from_avro_confluent,
    )

    out = df.withColumn("schema_id", confluent_schema_id(F.col("value")))
    if expected_schema_id is not None:
        out = out.where(F.col("schema_id") == expected_schema_id)
    rec = from_avro_confluent(F.col("value"), avro_schema, spark_schema)
    passthrough = [c for c in ("key", "topic", "partition", "offset") if c in df.columns]
    return out.select(*passthrough, "schema_id", rec.alias("r")).select(
        *passthrough, "schema_id", "r.*"
    )


def read_stream(
    spark: SparkSession,
    options: dict[str, str],
    *,
    avro_schema: dict | None = None,
    spark_schema: StructType | None = None,
    expected_schema_id: int | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` with the built options. When
    ``avro_schema``/``spark_schema`` are given the registry-framed
    value column is decoded inline (``unframe_records``), so the
    returned stream carries typed columns, not wire bytes. Requires a
    reachable broker and the spark-sql-kafka package on the classpath —
    neither exists in this sandbox, so the ``.load()`` line is the thin
    untestable edge; the framing/decoding path is unit-tested through
    batch DataFrames of identical shape."""
    df = spark.readStream.format("kafka").options(**options).load()
    if avro_schema is not None:
        if spark_schema is None:
            raise ValueError("spark_schema is required to decode framed values")
        df = unframe_records(df, avro_schema, spark_schema, expected_schema_id)
    return df


def write_stream(
    df: DataFrame,
    options: dict[str, str],
    *,
    avro_schema: dict | None = None,
    schema_id: int | None = None,
    key_col: str | None = None,
):
    """``writeStream.format("kafka")`` with the built options; returns
    the DataStreamWriter (caller picks trigger/outputMode). When
    ``avro_schema``/``schema_id`` are given the stream is projected to
    registry-framed (key, value) first (``frame_records``), so what
    lands on the wire interops with Confluent consumers out of the
    box."""
    if avro_schema is not None:
        if schema_id is None:
            raise ValueError("schema_id is required for Confluent framing")
        df = frame_records(df, avro_schema, schema_id, key_col=key_col)
    return df.writeStream.format("kafka").options(**options)
