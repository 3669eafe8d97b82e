"""Kafka option-builder and Confluent wire-framing tests (no broker
needed: builders are pure; framing is tested byte- and column-level)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_test_spark.sources.avro_codec import (
    CONFLUENT_MAGIC,
    confluent_schema_id,
    encode_record,
    from_avro_confluent,
    to_avro_confluent,
    unwrap_confluent,
    wrap_confluent,
)
from lakehouse_test_spark.streaming.kafka import (
    kafka_sink_options,
    kafka_source_options,
    sasl_token_jaas,
    starting_offsets_json,
)


def test_source_options_full_surface():
    opts = kafka_source_options(
        "broker1:9093,broker2:9093",
        ["topic-a", "topic-b"],
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        min_partitions=128,
        auth_token="JWT123",
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9093,broker2:9093"
    assert opts["subscribe"] == "topic-a,topic-b"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["minPartitions"] == "128"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    # token rides in the password slot with the token: prefix
    assert 'password="token:JWT123"' in opts["kafka.sasl.jaas.config"]
    assert "PlainLoginModule required" in opts["kafka.sasl.jaas.config"]


def test_source_options_minimal_and_validation():
    opts = kafka_source_options("b:9092", "t")
    assert opts["subscribe"] == "t"
    assert "kafka.security.protocol" not in opts  # no auth → no SASL keys
    assert "maxOffsetsPerTrigger" not in opts
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "t", max_offsets_per_trigger=0)


def test_sink_options_and_jaas():
    opts = kafka_sink_options(
        "b:9093", "out-topic", checkpoint_location="/tmp/ckpt", auth_token="tok"
    )
    assert opts["topic"] == "out-topic"
    assert opts["checkpointLocation"] == "/tmp/ckpt"
    assert opts["kafka.sasl.jaas.config"] == sasl_token_jaas("tok")


def test_starting_offsets_json():
    s = starting_offsets_json({"t1": {0: 100, 1: -2}})
    assert s == '{"t1": {"0": 100, "1": -2}}'


def test_confluent_envelope_bytes():
    body = encode_record(("bob", 7), ["string", "long"])
    frame = wrap_confluent(body, schema_id=1234)
    assert frame[0] == CONFLUENT_MAGIC and len(frame) == 5 + len(body)
    sid, out = unwrap_confluent(frame)
    assert sid == 1234 and out == body
    with pytest.raises(ValueError, match="magic"):
        unwrap_confluent(b"\x01" + frame[1:])
    with pytest.raises(ValueError, match="short"):
        unwrap_confluent(b"\x00\x00")
    with pytest.raises(ValueError, match="range"):
        wrap_confluent(body, schema_id=-1)


def test_confluent_column_roundtrip(spark):
    """Frame + unframe as Spark columns: encode with the envelope,
    read the schema id JVM-side, decode the body back."""
    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "age", "type": "int"},
        ],
    }
    spark_schema = StructType(
        [StructField("name", StringType()), StructField("age", IntegerType())]
    )
    df = spark.createDataFrame([Row(name="ann", age=3), Row(name="bo", age=44)])
    framed = df.select(
        to_avro_confluent(F.struct("name", "age"), schema, schema_id=77).alias("value")
    )
    out = framed.select(
        confluent_schema_id(F.col("value")).alias("sid"),
        from_avro_confluent(F.col("value"), schema, spark_schema).alias("r"),
    ).select("sid", "r.*")
    rows = {r.name: (r.sid, r.age) for r in out.collect()}
    assert rows == {"ann": (77, 3), "bo": (77, 44)}
    # a non-Confluent frame yields NULL schema id
    bad = spark.createDataFrame([Row(value=bytearray(b"\x01\x00\x00\x00\x4dXX"))])
    assert bad.select(confluent_schema_id("value").alias("s")).head().s is None


def test_frame_unframe_records_stream_path(spark):
    """The stream-path wiring (verdict-r2 item 6): frame_records
    produces the (key, value) sink shape with registry-framed values,
    and unframe_records recovers typed rows + schema id from a source-
    shaped DataFrame — the exact columns Spark's Kafka source emits."""
    from lakehouse_test_spark.streaming.kafka import frame_records, unframe_records

    schema = {
        "type": "record",
        "name": "Student",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "age", "type": "int"},
            {"name": "number", "type": "long"},
        ],
    }
    spark_schema = StructType(
        [
            StructField("name", StringType()),
            StructField("age", IntegerType()),
            StructField("number", LongType()),
        ]
    )
    df = spark.createDataFrame(
        [Row(name=f"name{i}", age=20 + i, number=i * 10) for i in range(5)]
    )
    wire = frame_records(df, schema, schema_id=42, key_col="name")
    assert wire.columns == ["key", "value"]
    # every value starts with the 5-byte envelope: magic 0x0 + id 42,
    # and the key column is the raw utf-8 key bytes
    keys = set()
    for r in wire.collect():
        assert bytes(r.value[:5]) == b"\x00\x00\x00\x00\x2a"
        keys.add(bytes(r.key).decode())
    assert keys == {f"name{i}" for i in range(5)}
    # simulate the Kafka SOURCE shape (key/value binary + topic/offset)
    source_shaped = wire.withColumn("topic", F.lit("t")).withColumn(
        "offset", F.monotonically_increasing_id()
    )
    back = unframe_records(source_shaped, schema, spark_schema, expected_schema_id=42)
    rows = {r.name: (r.schema_id, r.age, r.number) for r in back.collect()}
    assert rows == {f"name{i}": (42, 20 + i, i * 10) for i in range(5)}
    # a frame with a different schema id is filtered out when expected_id is pinned
    other = frame_records(df.limit(1), schema, schema_id=7)
    mixed = wire.select("value").unionByName(other)
    kept = unframe_records(mixed, schema, spark_schema, expected_schema_id=42)
    assert kept.count() == 5


def test_write_stream_applies_framing(spark):
    """write_stream(avro_schema=...) must project the stream through
    frame_records before handing it to the Kafka sink (no broker here,
    so assert on the writer's analyzed plan columns)."""
    from lakehouse_test_spark.streaming.kafka import kafka_sink_options, write_stream

    schema = {
        "type": "record",
        "name": "P",
        "fields": [{"name": "name", "type": "string"}],
    }
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(F.concat(F.lit("n"), F.col("value")).alias("name"))
    )
    writer = write_stream(
        stream,
        kafka_sink_options("host:9092", "t"),
        avro_schema=schema,
        schema_id=5,
        key_col="name",
    )
    cols = writer._df.columns
    assert cols == ["key", "value"]
