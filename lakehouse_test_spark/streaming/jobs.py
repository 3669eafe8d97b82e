"""Structured Streaming jobs over the events table (SURVEY.md §2b
streaming surface; reference ops 5-8, 21-28 re-expressed).

Each query reads events as a *stream* (readStream over the parquet
fixture), applies event-time semantics, and drains with
``Trigger.AvailableNow`` (the reference's bounded-run semantics,
ops 23-24) into a memory sink, returning the result as a DataFrame.
Determinism for the driver gate:

- event time is truncated to whole seconds *before* any window (the
  fixture's ns timestamps vs Spark's µs would otherwise shift
  boundaries);
- tumbling/sliding/session aggregations run in *complete* mode, so
  results are independent of batch slicing;
- the dedup query emits keys only (first-arrival row identity is
  scheduling-dependent by nature).

Rate limiting (op 22) ≙ ``maxFilesPerTrigger`` on file sources /
``maxOffsetsPerTrigger`` on Kafka; backpressure (op 25) is inherent.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import ddiv, dround, dsum
from lakehouse_test_spark.registry import query


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a bounded stream with second-precision event time.

    File streaming source (op 5 analog): partition files → tasks,
    earliest-start (op 8) is implicit for a static directory.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file streaming sources take a *directory*; glob-filter to events
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts arrives as bigint epoch-nanos (nanosAsLong); truncate to seconds
    return stream.withColumn("ts", F.timestamp_seconds(F.expr("ts div 1000000000")))


def _drain_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded stream (AvailableNow, ops 23-24) into a memory
    sink and return the materialized result."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "events"),
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows with a watermark, drained
    bounded (AvailableNow) — the streaming twin of events_daily_rollup,
    and it matches the same batch oracle exactly (complete mode)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
    )
    out = _drain_to_memory(agg, "complete")
    return out.select(
        F.to_date(F.col("w.start")).alias("day"), "event_type", "n_events", "total_value"
    )


@query(
    "streaming_sliding_window",
    oracle="""
    SELECT CAST(date_trunc('day', ts) - i * INTERVAL 1 DAY AS DATE) AS window_start,
           count(*) AS n_events
    FROM events, range(0, 2) t(i)
    GROUP BY 1
    """,
    tags=("streaming", "window", "events"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-day length, 1-day slide): every event lands
    in two windows; oracle mirrors via a 2-row range join."""
    s = events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "2 days", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _drain_to_memory(agg, "complete")
    return out.select(F.to_date(F.col("w.start")).alias("window_start"), "n_events")


@query(
    "streaming_session_window",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
                  OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, min(t) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming", "session", "events"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via ``session_window`` —
    the stateful merge operator batch SQL needs gaps-and-islands to
    emulate (that emulation IS the oracle)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _drain_to_memory(agg, "complete")
    return out.select(
        "user_id", F.unix_timestamp(F.col("w.start")).alias("session_start"), "n_events"
    )


@query(
    "streaming_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup", "events"),
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type) with a
    watermark — at-most-once key emission across micro-batches."""
    s = events_stream(spark, sf_dir)
    dedup = s.withWatermark("ts", "1 hour").dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return _drain_to_memory(dedup, "append")


@query(
    "streaming_foreachbatch_totals",
    oracle="""
    SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
    """,
    tags=("streaming", "foreachbatch", "events"),
)
def streaming_foreachbatch_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch custom-sink path (op 12's multi-sink fan-out
    analog): per-batch counts accumulated driver-side, summed across
    batches — batch-slicing-independent totals."""
    s = events_stream(spark, sf_dir)
    acc: dict[str, int] = {}

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect():
            acc[row.event_type] = acc.get(row.event_type, 0) + row.n

    q = s.writeStream.foreachBatch(handle_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    rows = [(k, v) for k, v in acc.items()]
    return spark.createDataFrame(rows, "event_type string, n_events bigint")


def bounded_rate_limited_drain(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> tuple[DataFrame, int]:
    """Rate-limited bounded consume (ops 21-24): maxFilesPerTrigger
    paces the stream (≙ maxOffsetsPerTrigger on Kafka), AvailableNow
    bounds the run. Returns (result, n_batches>=1). Used by tests and
    the CLI consume verb."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    s = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    counted = s.groupBy().agg(F.count(F.lit(1)).alias("n"))
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    return spark.table(name), n_batches
