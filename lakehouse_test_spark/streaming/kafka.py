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


def read_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """``readStream.format("kafka")`` with the built options. Requires
    a reachable broker and the spark-sql-kafka package on the
    classpath — neither exists in this sandbox, so this is the thin
    untestable edge; everything up to it is unit-tested."""
    return spark.readStream.format("kafka").options(**options).load()


def write_stream(df: DataFrame, options: dict[str, str]):
    """``writeStream.format("kafka")`` with the built options; returns
    the DataStreamWriter (caller picks trigger/outputMode)."""
    return df.writeStream.format("kafka").options(**options)
