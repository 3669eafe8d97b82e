"""Structured Streaming jobs over the events table (SURVEY.md §2b
streaming surface; reference ops 5-8, 21-28 re-expressed).

Each query reads events as a *stream* (readStream over the parquet
fixture), applies event-time semantics, and drains with
``Trigger.AvailableNow`` (the reference's bounded-run semantics,
ops 23-24), returning the result as a DataFrame. The headline window
aggregations (tumbling, sliding) drain through the PRODUCTION sink —
foreachBatch upserting a committed lakehouse table, read back via its
snapshot (``_drain_to_lakehouse``); the remaining gates use complete-
mode memory sinks. Determinism for the driver gate either way:

- event time is truncated to whole seconds *before* any window (the
  fixture's ns timestamps vs Spark's µs would otherwise shift
  boundaries);
- aggregations run in *complete* mode or as keyed MERGE upserts, so
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

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a bounded stream with second-precision event time.

    File streaming source (op 5 analog): partition files → tasks,
    earliest-start (op 8) is implicit for a static directory.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")  # µs fixture
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file streaming sources take a *directory*; glob-filter to events
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # normalize either fixture vintage (epoch-ns bigint, or µs
    # timestamp) to second-precision TimestampType event time
    if dict(stream.dtypes).get("ts") == "bigint":
        return stream.withColumn("ts", F.timestamp_seconds(F.expr("ts div 1000000000")))
    return stream.withColumn("ts", F.date_trunc("second", F.col("ts").cast("timestamp")))


def _ckpt() -> str:
    """Fresh checkpoint dir for a bounded gate run, on tmpfs when the
    host has one. Streaming checkpoints are many tiny fsync'd files
    (offsets/commits/state per partition per batch) — on local ext4
    they add ~15% to every bounded run (measured 1.65 s → 1.43 s at
    sf0.1). Durability is irrelevant for a run-once AvailableNow
    gate; PRODUCTION jobs point checkpointLocation at HDFS/S3 —
    that knob, not this default, is the deployment contract.

    Every dir handed out is registered for atexit cleanup, so gates
    that don't (or can't, on an exception path) rmtree their
    checkpoint never leak it into /dev/shm across runs."""
    import os
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="ckpt_", dir=base)
    _register_cleanup(d)
    return d


def _register_cleanup(path: str) -> None:
    """Sweep ``path`` at process exit (run-scoped scratch dirs)."""
    if not _CKPT_DIRS:
        import atexit
        import shutil

        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _CKPT_DIRS]
        )
    _CKPT_DIRS.append(path)


_CKPT_DIRS: list[str] = []


def _drain_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded stream (AvailableNow, ops 23-24) into a memory
    sink and return the materialized result."""
    import shutil

    name = f"mem_{uuid.uuid4().hex[:12]}"
    ck = _ckpt()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ck, ignore_errors=True)
    spark = stream_df.sparkSession
    return spark.table(name)


def _drain_to_lakehouse(
    stream_df: DataFrame, key_cols: list[str], state_partitions: int = 1
) -> DataFrame:
    """PRODUCTION-sink drain: foreachBatch upserts each micro-batch
    into a committed :class:`LakehouseTable` (append, then MERGE keyed
    on ``key_cols`` — Delta's MERGE-per-microbatch pattern) and the
    result is read back from the table's SNAPSHOT, so the gate
    exercises the same path a deployed job uses: committed ==
    readable, atomic per batch, time-travelable. Update mode + keyed
    MERGE makes the final state the complete aggregation regardless
    of micro-batch slicing — same determinism the memory sink gave,
    without the memory sink.

    ``state_partitions`` sizes the state store to the AGGREGATE's
    cardinality, not the core count: stateful operators pay one state
    checkpoint commit per partition per batch, so a day×type rollup
    (hundreds of groups) under the session's 32 shuffle partitions
    spends 3× longer committing empty state files than aggregating
    (measured: 3.4s at 32 → 1.4s at 4 → ~1.1s at 1, sf0.1; r11).
    The gates here aggregate to at most a few hundred groups — one
    state partition holds that at any SF, since the aggregate's
    cardinality is bounded by days×types, not by input rows. Real
    deployments tune exactly this knob; state volume, not
    parallelism, drives it."""
    import os
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    spark = stream_df.sparkSession
    # the gate sink is a run-scoped throwaway (committed, read back
    # once, discarded) — same tmpfs placement rationale as _ckpt();
    # production jobs pass their own durable table path.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    gate_dir = tempfile.mkdtemp(prefix="lh_stream_gate_", dir=base)
    # run-scoped: swept by the same atexit hook as the checkpoints
    # (a long session runs hundreds of gate drains; the snapshot must
    # stay readable until process exit because the returned frame is
    # consumed lazily by the caller)
    _register_cleanup(gate_dir)
    table = LakehouseTable(spark, gate_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # one file per batch (coalesce(1)): the upserted aggregate is
        # small by construction (state bounded by the watermark/window
        # grain), and per-batch file spray is the small-files
        # anti-pattern.
        if table.latest_version() < 0:
            # first batch: append directly — ONE execution of the
            # micro-batch plan (r12; the r11 shape persisted + counted
            # first, materializing the plan once for the emptiness
            # guard and once more for the write — measured ~0.2 s of
            # the bounded drain). An empty first batch commits an
            # empty file: same final aggregate, and it only occurs for
            # an empty source, where the old early-return left the
            # gate table with no readable version at all.
            table.append(batch_df.coalesce(1), operation="stream-append")
            return
        # later batches MERGE; the emptiness guard matters here
        # (AvailableNow can emit a trailing watermark-commit batch
        # that is EMPTY — merging it would be a full-table no-op
        # rewrite). persist + count materializes the batch exactly
        # once; the guard and the write both read the cache.
        batch_df.persist()
        try:
            if batch_df.count() == 0:
                return
            table.merge(batch_df.coalesce(1), key_cols=key_cols)
        finally:
            batch_df.unpersist()

    import shutil

    ck = _ckpt()
    # StreamExecution clones the session (and its SQLConf) when the
    # query is CONSTRUCTED, so the shuffle-partition override only
    # needs to be set across .start() — it is restored before
    # awaitTermination, shrinking the window in which a concurrently
    # planned query in the same session could observe the override
    # from the whole stream run to stream construction only.
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    prior_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    # no-data micro-batches exist to finalize watermark-driven output
    # (append-mode emission, state eviction). This drain is UPDATE
    # mode into a keyed MERGE: every group is already emitted by the
    # data batches, the end state is batch-slicing-independent, and
    # the bounded gate discards its checkpoint — so the trailing
    # empty batch is pure bookkeeping (one extra state commit + batch
    # plan per run; ~0.5 s at sf0.1, verified result-hash-identical).
    # Memory-sink gates (append-mode windows DO need watermark
    # finalization) keep the default.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            stream_df.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prior_nodata
        )
    try:
        q.awaitTermination()
    finally:
        # bounded gate run: the checkpoint has no replay value and
        # would otherwise leak into /dev/shm on every invocation
        shutil.rmtree(ck, ignore_errors=True)
    # The gate table is a run-scoped throwaway. Detach the returned
    # frame from its files — localCheckpoint(eager) cuts the lineage
    # and holds the (group-cardinality-bounded) aggregate as
    # MEMORY_AND_DISK blocks — then sweep the gate dir NOW instead of
    # at process exit: a long session running hundreds of drains was
    # pinning hundreds of committed parquet snapshots in /dev/shm
    # until exit (r12; the atexit sweep stays as the exception-path
    # backstop).
    out = table.snapshot().localCheckpoint(eager=True)
    shutil.rmtree(gate_dir, ignore_errors=True)
    return out


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
    bounded (AvailableNow) through the PRODUCTION sink — foreachBatch
    upserts into a lakehouse table, the gate reads the committed
    snapshot. The streaming twin of events_daily_rollup; matches the
    same batch oracle exactly (keyed MERGE ≙ complete mode)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _drain_to_lakehouse(agg, key_cols=["day", "event_type"])


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
    in two windows; oracle mirrors via a 2-row range join. Drained
    through the PRODUCTION sink (foreachBatch → lakehouse MERGE keyed
    on the window), read back from the committed snapshot."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.to_date(F.col("w.start")).alias("window_start"), "n_events")
    )
    return _drain_to_lakehouse(agg, key_cols=["window_start"])


@query(
    "streaming_session_window",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch(ts) AS tx, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    flagged AS (
      SELECT user_id, t,
             -- gap compare at FULL precision (tx), not truncated
             -- seconds: session_window merges an event exactly gap
             -- seconds after the previous one (closed boundary,
             -- pinned by test_session_window_gap_is_closed) and
             -- splits strictly-greater gaps; comparing floor()ed
             -- seconds would misclassify any fractional gap that
             -- truncates to exactly 1800
             CASE WHEN tx - lag(tx) OVER (PARTITION BY user_id ORDER BY t) > 1800
                  OR lag(tx) OVER (PARTITION BY user_id ORDER BY t) IS NULL
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

    q = (
        s.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(k, v) for k, v in acc.items()]
    return spark.createDataFrame(rows, "event_type string, n_events bigint")


def stream_aggregate_to_lakehouse(
    spark: SparkSession, sf_dir: str, table_path: str
):
    """Production sink path: watermarked window aggregation upserted
    into a :class:`LakehouseTable` via foreachBatch — the canonical
    streaming-agg → lakehouse pattern (Delta's MERGE-per-microbatch).

    Update mode emits each window's refreshed aggregate as batches
    arrive; the per-batch MERGE keyed on (day, event_type) makes the
    final table state the complete aggregation regardless of batch
    slicing — deterministic, unlike raw append-mode file sinks that
    only flush watermark-finalized windows (and flush nothing on a
    single-batch AvailableNow drain).

    Scale: the aggregation state is bounded by the watermark; each
    batch merges only the windows it touched (a real Delta MERGE
    prunes untouched files via stats — plans/lakehouse.py documents
    the contract equivalence). Returns the table.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    table = LakehouseTable(spark, table_path)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.latest_version() < 0:
            table.append(batch_df, operation="append")
        else:
            table.merge(batch_df, key_cols=["day", "event_type"])

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


@query(
    "streaming_sink_lakehouse",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "sink", "lakehouse", "events"),
)
def streaming_sink_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end stream → lakehouse table: the tumbling-count
    aggregation upserted into a committed, time-travelable table, then
    read back via its snapshot (committed == readable, ops 29-33).
    Oracle-checkable because the upsert's final state equals the batch
    aggregation regardless of micro-batch slicing."""
    import tempfile

    path = tempfile.mkdtemp(prefix="lakehouse_stream_sink_")
    table = stream_aggregate_to_lakehouse(spark, sf_dir, path)
    return table.snapshot().select("day", "event_type", "n_events", "total_value")


def bounded_rate_limited_drain(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> tuple[DataFrame, int]:
    """Rate-limited bounded consume (ops 21-24): maxFilesPerTrigger
    paces the stream (≙ maxOffsetsPerTrigger on Kafka), AvailableNow
    bounds the run. Returns (result, n_batches>=1). Used by tests and
    the CLI consume verb."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # ns fixture
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")  # µs fixture
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
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    return spark.table(name), n_batches


@query(
    "streaming_static_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_purchases,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    """,
    tags=("streaming", "join", "events"),
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the purchase stream enriched against the
    static customer dimension, aggregated per segment (complete mode).

    Scale: the static side is broadcast per micro-batch — the
    canonical streaming-enrichment pattern; dimension updates are
    picked up on re-read without restarting the query.
    """
    from lakehouse_test_spark.session import load_table

    s = events_stream(spark, sf_dir).where(F.col("event_type") == "purchase")
    c = load_table(spark, sf_dir, "customer")
    agg = (
        s.join(F.broadcast(c), s.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
    )
    return _drain_to_memory(agg, "complete")


@query(
    "streaming_stream_stream_join",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ct
               FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS pt
               FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, p.purchase_id, c.user_id
    FROM c JOIN p ON c.user_id = p.user_id
       AND p.pt >= c.ct AND p.pt <= c.ct + 3600
    """,
    tags=("streaming", "join", "events"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range bounds and
    watermarks: purchases within 1 h after a click by the same user.

    Scale: both sides keep watermark-bounded state (clicks expire 2 h
    after their event time); the time-range conjunct is what lets
    Spark garbage-collect state — an unbounded stream-stream join
    never frees anything. Inner-join emission is deterministic given
    all data, so the batch oracle matches exactly.
    """
    s = events_stream(spark, sf_dir)
    clicks = (
        s.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        s.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id", "user_id")
    return _drain_to_memory(joined, "append")


@query(
    "streaming_stream_stream_left_outer",
    oracle="""
    WITH bounds AS (
      SELECT least(
        (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) FROM events WHERE event_type = 'click'),
        (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) FROM events WHERE event_type = 'purchase')
      ) AS maxts
    ),
    c AS (SELECT event_id AS click_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ct
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS pt
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, p.purchase_id, c.user_id
    FROM c
    LEFT JOIN p ON c.user_id = p.user_id
       AND p.pt >= c.ct AND p.pt <= c.ct + 3600
    CROSS JOIN bounds
    WHERE c.ct <= bounds.maxts - 10810
    """,
    tags=("streaming", "join", "events"),
)
def streaming_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: clicks with no purchase within
    1 h emit a NULL-extended row — but only once the watermark proves
    no match can still arrive (state expiry is the only sound
    null-emission point in a stream).

    Outer emission timing is the subtlety: a click's null row appears
    when the global watermark (max event time − 2 h) passes the end
    of its match window (click_ts + 1 h). Clicks too close to the
    stream's end are still in limbo at drain time, so BOTH engines
    restrict to clicks ≥ 3 h + margin before the SLOWER side's max(ts) (the global watermark is the min of both sides' watermarks) — making the
    bounded drain equal the batch left join exactly (margin kills
    boundary-equality flakes at whole-second precision).
    """
    s = events_stream(spark, sf_dir)
    clicks = (
        s.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        s.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("click_id", "purchase_id", "user_id", "click_ts")
    out = _drain_to_memory(joined, "append")
    spark2 = out.sparkSession
    batch = load_table(spark2, sf_dir, "events")
    side_max = (
        batch.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(F.unix_timestamp("ts")).cast("long").alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    maxts = side_max
    return (
        out.where(F.col("click_ts").cast("long") <= F.lit(maxts - 10810))
        .select("click_id", "purchase_id", "user_id")
    )


@query(
    "streaming_stream_stream_full_outer",
    oracle="""
    WITH bounds AS (
      SELECT least(
        (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) FROM events WHERE event_type = 'click'),
        (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) FROM events WHERE event_type = 'purchase')
      ) - 10810 AS bound
    ),
    c AS (SELECT event_id AS click_id, user_id AS c_user,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ct
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id AS p_user,
                 CAST(floor(epoch(ts)) AS BIGINT) AS pt
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, p.purchase_id,
           coalesce(c.c_user, p.p_user) AS user_id
    FROM c
    FULL JOIN p ON c.c_user = p.p_user
       AND p.pt >= c.ct AND p.pt <= c.ct + 3600
    CROSS JOIN bounds
    WHERE (c.ct IS NULL OR c.ct <= bounds.bound)
      AND (p.pt IS NULL OR p.pt <= bounds.bound)
    """,
    tags=("streaming", "join", "events"),
)
def streaming_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — the join matrix's last cell:
    clicks with no purchase AND purchases with no click each emit a
    NULL-extended row once the watermark proves no match can arrive.
    Same determinism device as the left-outer gate, applied to BOTH
    sides: rows within 3 h + margin of the slower side's max event
    time are still in state-expiry limbo at drain and are excluded in
    both engines, making the bounded drain equal the batch FULL JOIN
    exactly."""
    s = events_stream(spark, sf_dir)
    clicks = (
        s.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        s.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    ).select("click_id", "purchase_id", "c_user", "p_user", "click_ts", "purchase_ts")
    out = _drain_to_memory(joined, "append")
    batch = load_table(out.sparkSession, sf_dir, "events")
    bound = (
        batch.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(F.unix_timestamp("ts")).cast("long").alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    ) - 10810
    return (
        out.where(
            (F.col("click_ts").isNull() | (F.col("click_ts").cast("long") <= bound))
            & (
                F.col("purchase_ts").isNull()
                | (F.col("purchase_ts").cast("long") <= bound)
            )
        )
        .select(
            "click_id",
            "purchase_id",
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        )
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file stream over the documents fixture (same shape as
    events_stream: schema from the batch reader, AvailableNow runs)."""
    batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


@query(
    "streaming_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT lang,
             length(text) AS nc,
             len(string_split_regex(lower(text), '\\s+')) AS n_words
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN nc BETWEEN 40 AND 5000 AND n_words >= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN nc BETWEEN 40 AND 5000 AND n_words >= 10
                         THEN n_words ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM scored
    GROUP BY lang
    """,
    tags=("streaming", "text", "llm", "pipeline"),
)
def streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time quality gating: the stateless per-doc
    gates (length band, min word count) applied ON the stream, with a
    per-language kept/total accounting aggregate — the shape of a
    quality filter running inside the ingestion pipeline rather than
    as a batch pass after landing.

    Oracle-checkable: stateless row filters commute with micro-batch
    slicing, so the final complete-mode state equals the batch
    aggregate exactly.

    Scale: gates are codegen projections on the stream (no state);
    only the per-lang counters hold state — O(|langs|) rows. At real
    scale the same job writes gated rows to a lakehouse sink and the
    counters to metrics; the gate math is identical.
    """
    from lakehouse_test_spark.operators.text import ws_tokens

    s = documents_stream(spark, sf_dir)
    scored = s.select(
        "lang",
        F.length("text").alias("nc"),
        F.size(ws_tokens(F.col("text"))).alias("n_words"),
    )
    keep = F.col("nc").between(40, 5000) & (F.col("n_words") >= 10)
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(keep, F.col("n_words")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )
    return _drain_to_memory(agg, "complete")


@query(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique_users
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "dedup", "events"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    keeps a (user_id, event_type) key only until the watermark passes
    its event time, unlike plain dropDuplicates whose state grows
    forever. The per-type unique-user rollup equals the batch DISTINCT
    because the fixture's duplicates all fall inside the 1-hour
    horizon.

    Scale: THE production dedup shape for infinite streams — state is
    O(keys per watermark window), not O(keys ever seen); the reference
    consumer's at-least-once redelivery dedup maps exactly onto it.
    """
    s = events_stream(spark, sf_dir)
    dedup = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    # append-mode drain of the deduped rows, exact rollup on the sink
    # (a windowed agg over the deduped stream would need its own
    # watermark bookkeeping that adds nothing to this op)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        dedup.select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_unique_users"))
    )


@query(
    "streaming_cdf_source",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           'insert' AS _change_type,
           CAST(o_orderkey % 2 AS INTEGER) AS _commit_version
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           'delete' AS _change_type,
           CAST(2 AS INTEGER) AS _commit_version
    FROM orders WHERE o_totalprice < 50000
    """,
    tags=("streaming", "lakehouse", "cdf", "datasource"),
)
def streaming_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming over the lakehouse change feed via the
    Spark 4 Python DataSource (sources/cdf_datasource.py): offsets are
    commit versions, partitions are files, deletion-vector commits
    stream the deleted rows back out of the base files.

    Built so the oracle can replay it exactly: even orders commit at
    v0, odd orders at v1, then a DV delete of the cheap orders at v2
    — the feed drained with AvailableNow must hash-match the
    reconstruction from raw parquet, proving the source's offset
    accounting, per-file partitioning, and DV row recovery end to
    end.

    Scale: the stream replays each commit as a parallel scan of its
    files; a continuous job tails the log with one microbatch per
    commit range — the Kafka-consume shape (§2a op 5) over table
    storage.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfsrc_"))
    t.append(o.where(F.col("o_orderkey") % 2 == 0).repartition(2))
    t.append(o.where(F.col("o_orderkey") % 2 == 1).repartition(2))
    t.delete_where_dv("o_totalprice < 50000")
    stream = (
        spark.readStream.format("lakehouse_cdf")
        .option("path", str(t.path))
        .load()
        # wall-clock column: non-deterministic for the oracle (its
        # value gate is cdf_commit_timestamp_feed)
        .drop("_commit_timestamp")
    )
    return _drain_to_memory(stream, "append")


@query(
    "streaming_topk_per_window",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT c.*, row_number() OVER (PARTITION BY day
                                     ORDER BY n_events DESC, event_type) AS rk
      FROM c
    )
    SELECT day, event_type, n_events, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= 2
    """,
    tags=("streaming", "window", "topk", "events"),
)
def streaming_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 event types per tumbling day window: the stateful
    windowed count runs in the stream (watermark + complete-mode
    drain); the rank-and-keep step runs batch-side on the drained
    aggregate — the standard split, since rank-over-aggregate is not
    an incremental operator (a late row can reorder the board, so
    production jobs publish the leaderboard per trigger from the
    aggregate state, exactly as here).

    Scale: streaming state is |windows × types| counters (bounded by
    the watermark); the batch rank runs over that tiny aggregate, so
    the leaderboard costs nothing regardless of event volume.
    """
    from pyspark.sql import Window as W

    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _drain_to_memory(agg, "complete")
    ranked = out.select(
        F.to_date(F.col("w.start")).alias("day"), "event_type", "n_events"
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("day").orderBy(F.desc("n_events"), "event_type")
        ).cast("int"),
    )
    return ranked.where(F.col("rk") <= 2)


@query(
    "streaming_session_dynamic_gap",
    oracle="""
    WITH e AS (
      -- floor to whole seconds: the stream's event time is truncated
      -- before session assignment, and the gaps are integral, so
      -- integer arithmetic reproduces session_window's half-open
      -- merge EXACTLY (no full-precision boundary ambiguity)
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CASE WHEN event_type = 'click' THEN 600 ELSE 1800 END AS gap
      FROM events
    ),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN max(t + gap) OVER (PARTITION BY user_id ORDER BY t
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) IS NULL
                  OR t >= max(t + gap) OVER (PARTITION BY user_id ORDER BY t
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(t) AS session_start,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    tags=("streaming", "session", "events"),
)
def streaming_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (Spark's dynamic
    session_window expression): clicks close after 10 minutes, every
    other event keeps the session alive for 30 — the engagement-aware
    sessionization that fixed-gap windows can't express.

    The oracle is the varying-gap islands construction: a session
    breaks where t >= running-max of previous (t + gap) — exactly
    session_window's half-open [t, t+gap) merge semantics (the
    running max, not lag, because a long-gap event can bridge over a
    short-gap successor).

    Scale: same stateful operator as fixed-gap sessions — state per
    open session, watermark-evicted; the gap expression evaluates
    per row, costing nothing extra.
    """
    s = events_stream(spark, sf_dir)
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _drain_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        "n_events",
    )


def stream_scd2_dimension(
    spark: SparkSession, source_dir: str, table_path: str, schema=None
):
    """CDC → dimension maintenance: a bounded stream of keyed
    attribute observations folds into a LakehouseTable as type-2 SCD
    history via ``foreachBatch`` → ``scd2_apply`` — the production
    pattern for 'upstream system emits entity snapshots, warehouse
    keeps versioned history'. One restate commit per micro-batch;
    history stays time-travelable batch by batch.

    Contract: source rows carry (k, seg, eff) — key, tracked
    attribute, effective timestamp; generalize by editing the column
    lists at the call site.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    t = LakehouseTable(spark, table_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )

    def sink(batch_df, _epoch):
        if batch_df.take(1):
            t.scd2_apply(batch_df, ["k"], ["seg"], "eff")

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{table_path}/_scd2_checkpoint")
        .start()
    )
    q.awaitTermination()
    return t


@query(
    "streaming_kmv_distinct",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                  AS DOUBLE) / 4294967296.0 AS u
      FROM events
    ), kmin AS (SELECT u FROM hashed ORDER BY u LIMIT 64)
    SELECT CAST(count(*) AS BIGINT) AS k_used,
           CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE round((64 - 1) / max(u), 4) END AS est_distinct,
           CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS true_distinct
    FROM kmin
    """,
    tags=("streaming", "sketch", "foreachbatch"),
)
def streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch maintained OVER A STREAM: each micro-batch
    computes its local k-minimum hash values (one tiny TakeOrdered per
    batch — at most k=64 values leave the executors), and foreachBatch
    merges them into the running sketch. Because k-min sets are
    mergeable, the final estimate is EXACTLY the batch KMV of the
    whole stream — independent of batch slicing — so the streaming
    path is hash-checked against the same DuckDB oracle as
    sketch_kmv_distinct. The live-dashboard distinct-count pattern:
    O(k) state, no dropDuplicates state store growth.

    Scale: sketch state is 64 doubles regardless of stream volume;
    per-batch cost is one map-side TakeOrdered. The same merge works
    across days/shards (store the sketch in a lakehouse table and
    MERGE instead of the driver accumulator used for this bounded
    drain).
    """
    s = events_stream(spark, sf_dir)
    k = 64
    kmin: list[float] = []

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        u = (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("double")
            / F.lit(4294967296.0)
        ).alias("u")
        batch_k = [r["u"] for r in batch_df.select(u).distinct().orderBy("u").limit(k).collect()]
        merged = sorted(set(kmin) | set(batch_k))[:k]
        kmin[:] = merged

    q = (
        s.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    k_used = len(kmin)
    est = float(k_used) if k_used < k else round((k - 1) / kmin[-1], 4)
    true_distinct = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    return spark.createDataFrame(
        [(k_used, est, true_distinct)],
        "k_used bigint, est_distinct double, true_distinct bigint",
    )


@query(
    "streaming_join_ivm",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS custkey, o_orderkey,
             CAST(round(o_totalprice, 2) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 20 = 0 AND o_totalprice >= 50000
    ), b AS (
      SELECT c_custkey AS custkey, c_mktsegment
      FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT a.custkey, a.o_orderkey, a.price, b.c_mktsegment,
           CAST(1 AS BIGINT) AS m
    FROM a JOIN b USING (custkey)
    """,
    tags=("streaming", "lakehouse", "ivm", "join"),
)
def streaming_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING materialized-join maintenance: the left table's
    change feed streams through the Python CDF DataSource (offsets =
    commit versions, DV deletes stream the deleted rows), and each
    micro-batch folds its signed delta-join against the static dim
    into the multiplicity-grain target — plans.lakehouse.maintain_join
    re-expressed as a foreachBatch consumer. Three commits (two
    inserts + a deletion-vector delete) drain with AvailableNow, and
    the final view hash-matches the oracle's one-shot SQL join of the
    surviving rows: batch-slicing-independent, delete-correct IVM.

    Scale: per batch the work is |Δ| ⋈ broadcast(dim) plus a keyed
    MERGE on the |view|-sized target — the streaming-upsert pattern
    that keeps a 100 TB materialized join fresh without re-running
    the join.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.round("o_totalprice", 2).cast("double").alias("price"),
    ).where(F.col("o_orderkey") % 20 == 0)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    ).where(F.col("custkey") % 2 == 0)

    a = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_sivm_a_"))
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_sivm_t_"))
    a.append(o.where(F.col("custkey") % 3 != 0).repartition(2))
    a.append(o.where(F.col("custkey") % 3 == 0).repartition(2))
    a.delete_where_dv("price < 50000")

    stream = spark.readStream.format("lakehouse_cdf").option("path", str(a.path)).load()

    def fold(batch_df: DataFrame, _epoch: int) -> None:
        signed = batch_df.withColumn(
            "_sign",
            F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(F.lit(1)),
        ).drop("_change_type", "_commit_version", "_commit_timestamp")
        inc = (
            signed.join(F.broadcast(dim), "custkey")
            .groupBy("custkey", "o_orderkey", "price", "c_mktsegment")
            .agg(F.sum("_sign").alias("m"))
            .where(F.col("m") != 0)
        )
        if inc.isEmpty():
            return
        if t.latest_version() < 0:
            t.append(inc.where(F.col("m") > 0), operation="stream-ivm-bootstrap")
            return
        cols = ["custkey", "o_orderkey", "price", "c_mktsegment"]
        merged = (
            t.snapshot().select(*cols, "m").unionByName(inc)
            .groupBy(*cols)
            .agg(F.sum("m").alias("m"))
            .where(F.col("m") != 0)
        )
        t.merge(merged, key_cols=cols, sync_delete_unmatched=True)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("maxFilesPerTrigger", "1")
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return t.snapshot().select("custkey", "o_orderkey", "price", "c_mktsegment", "m")


@query(
    "streaming_cdc_apply",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice + CASE WHEN o_orderkey % 3 = 0
                                                   THEN 100.0 ELSE 0.0 END
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 5 <> 0
    GROUP BY o_orderstatus
    """,
    tags=("streaming", "cdc", "merge", "lakehouse", "orders"),
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC consumption into the lakehouse — the Debezium →
    Kafka → MERGE pipeline, end to end, under the hash gate:

    a changelog (INSERT seq 1 for every order, UPDATE +100 seq 2 for
    keys %3==0, DELETE seq 3 for keys %5==0) arrives as a file stream
    in three micro-batches, in per-key seq order (the ordering a
    keyed Kafka topic guarantees per partition).  Each batch is
    compacted latest-wins WITHIN the batch (one key-shuffle), then
    applied atomically: upserts as a WHEN MATCHED UPDATE merge,
    deletes as a WHEN MATCHED DELETE merge — so a day of changelog
    costs O(batches) keyed join passes, never a per-event replay.
    The final committed snapshot must equal the SQL net effect.

    The batch twin (same oracle) is ``pipeline_cdc_apply``; this
    proves the path through Structured Streaming + foreachBatch +
    the atomic commit protocol.
    """
    import os
    import tempfile
    from pathlib import Path

    from pyspark.sql import Window

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    log_dir = tempfile.mkdtemp(prefix="cdc_log_")
    slices = [
        o.withColumn("op", F.lit("I")).withColumn("seq", F.lit(1)),
        o.where(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2)),
        o.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(3)),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{log_dir}/b{i}")
        # file-source discovery order is (mtime, path): pin mtimes so
        # the three slices arrive as three ordered micro-batches
        for p in Path(f"{log_dir}/b{i}").rglob("*.parquet"):
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = slices[0].schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(log_dir + "/*")
    )
    table = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdc_stream_"))
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )
        latest.persist()
        try:
            ups = latest.where(F.col("op") != "D").drop("op")
            dels = latest.where(F.col("op") == "D").drop("op")
            if latest.count() == 0:
                return
            if table.latest_version() < 0:
                table.append(ups, operation="stream-cdc-bootstrap")
            elif ups.count() > 0:
                table.merge(ups, key_cols=["o_orderkey"])
            if table.latest_version() >= 0 and dels.count() > 0:
                table.merge(
                    dels,
                    key_cols=["o_orderkey"],
                    when_matched="delete",
                    insert_new=False,
                )
        finally:
            latest.unpersist()

    import shutil

    ck = _ckpt()
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # StreamExecution clones the SQLConf at construction — restore
        # before awaitTermination (see _drain_to_lakehouse)
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return (
        table.snapshot()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
        .localCheckpoint()
    )


@query(
    "streaming_cdc_schema_drift",
    oracle="""
    WITH cur AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 3 = 0 THEN 'web' END AS channel
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT o_orderstatus,
           coalesce(channel, 'none') AS channel,
           count(*) AS n_orders,
           CAST(round(sum(CAST(price AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM cur GROUP BY o_orderstatus, coalesce(channel, 'none')
    """,
    tags=("streaming", "cdc", "merge", "schema-evolution", "lakehouse"),
)
def streaming_cdc_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC WITH SCHEMA DRIFT — the Debezium schema-change reality:
    a changelog adds a column mid-pipeline and the target table must
    evolve ATOMICALLY while the stream keeps applying.

    Run 1 streams the initial inserts under the original schema
    (bootstrap append). The upstream schema then gains a ``channel``
    column; as in real Debezium deployments the consumer RESTARTS
    with the evolved schema (a Structured Streaming source pins its
    schema at start — the restart IS the drift protocol). Run 2
    applies updates carrying the new column through
    ``merge(schema_evolution=True)`` — Delta autoMerge: the target
    gains ``channel`` in the same atomic commit that applies the
    batch, pre-drift rows read NULL — then a delete batch under the
    evolved schema. The committed snapshot must equal the SQL net
    effect; a TYPE-conflicting drift raises loudly instead (pinned in
    tests, batch + streaming).
    """
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import Window

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdc_drift_"))
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "seq")
        )
        latest.persist()
        try:
            ups = latest.where(F.col("op") != "D").drop("op")
            dels = latest.where(F.col("op") == "D").drop("op")
            if latest.count() == 0:
                return
            if table.latest_version() < 0:
                table.append(ups, operation="stream-cdc-bootstrap")
            elif ups.count() > 0:
                # autoMerge: the batch that first carries `channel`
                # evolves the target in ITS commit
                table.merge(
                    ups, key_cols=["o_orderkey"], schema_evolution=True
                )
            if table.latest_version() >= 0 and dels.count() > 0:
                table.merge(
                    dels.select("o_orderkey"),
                    key_cols=["o_orderkey"],
                    when_matched="delete",
                    insert_new=False,
                )
        finally:
            latest.unpersist()

    def run_stream(log_dir: str, schema) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(log_dir + "/*")
        )
        ck = _ckpt()
        try:
            q = (
                stream.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    # run 1: original schema — inserts only
    log1 = tempfile.mkdtemp(prefix="cdc_drift_a_")
    b0 = o.withColumn("op", F.lit("I")).withColumn("seq", F.lit(1))
    b0.coalesce(1).write.parquet(f"{log1}/b0")
    run_stream(log1, b0.schema)

    # upstream schema evolves: restart with the widened schema
    log2 = tempfile.mkdtemp(prefix="cdc_drift_b_")
    b1 = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn("channel", F.lit("web"))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    b2 = (
        o.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("channel", F.lit(None).cast("string"))
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(3))
    )
    for i, s in enumerate((b1, b2)):
        s.coalesce(1).write.parquet(f"{log2}/b{i}")
        for p in Path(f"{log2}/b{i}").rglob("*.parquet"):
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    run_stream(log2, b1.schema)

    return (
        table.snapshot()
        .groupBy(
            "o_orderstatus",
            F.coalesce(F.col("channel"), F.lit("none")).alias("channel"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
        .localCheckpoint()
    )


@query(
    "streaming_append_mode_windows",
    oracle="""
    WITH e AS (
      SELECT date_trunc('second', ts) AS ts, value FROM events
    ), wm AS (
      SELECT max(ts) - INTERVAL 1 HOUR AS w FROM e
    )
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_sec,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM e, wm
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
    GROUP BY 1
    """,
    tags=("streaming", "window", "watermark", "events"),
)
def streaming_append_mode_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation — the third output-mode
    semantics (complete and update are covered elsewhere): a window
    row is emitted EXACTLY ONCE, only after the event-time watermark
    passes its end, and is immutable afterwards — the contract
    downstream exactly-once consumers (and the lakehouse append sink)
    rely on. Bounded AvailableNow run: the final watermark advances
    to ``max(ts) − 1 h``, so precisely the windows with
    ``end ≤ watermark`` appear; the oracle reconstructs that set
    relationally, pinning the emit-on-close boundary itself.

    Scale: append mode is what makes infinite streams storable —
    state holds ONLY open windows (bounded by delay × window grain),
    closed windows leave state forever; complete mode's state grows
    with history and update mode re-emits dirty keys.
    """
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias(
                "window_start_sec"
            ),
            "n_events",
            "total_value",
        )
    )
    return _drain_to_memory(agg, "append")
