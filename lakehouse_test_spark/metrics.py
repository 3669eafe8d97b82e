"""Metrics/observability — the reference's counter surface
(SURVEY.md §2a ops 35-36) on Spark's observation machinery.

- sent/failed counters (AtomicLong, AmazonReviewProducer.java:94-95)
  → ``df.observe()`` named metrics, collected with the action;
- progress logging every N records (PerformanceProducer.java:154-157)
  → ``StreamingQueryListener.onQueryProgress`` per micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class CountersResult:
    rows: int
    null_keys: int


def observed_write(df: DataFrame, write_fn, key_col: str | None = None) -> CountersResult:
    """Run a write action with sent/failed-style counters attached.

    ``rows`` ≙ totalSent; ``null_keys`` ≙ failedSent (a record whose
    key failed to derive — the closest batch analog of a failed
    send; Spark retries task-level failures itself).
    """
    obs = Observation("write_counters")
    key = F.col(key_col) if key_col else F.lit(None)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(key.isNull() if key_col else F.lit(False), 1).otherwise(0)).alias("null_keys"),
    )
    write_fn(instrumented)
    got = obs.get
    return CountersResult(rows=got["rows"], null_keys=got["null_keys"] or 0)


@dataclass
class ProgressLog:
    """Collects per-batch progress like the reference's every-N logs."""

    batches: list[dict] = field(default_factory=list)

    def attach(self, spark: SparkSession):
        from pyspark.sql.streaming import StreamingQueryListener

        log = self.batches

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                log.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "sink": p.sink.description,
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _Listener()
        spark.streams.addListener(listener)
        return listener


@dataclass
class RecordLog:
    """Per-record receive logging (§2a op parity with
    ``PerformanceConsumer.java:252``, which logs every received
    record's messageId + value).

    Logging every row is fine at the reference's ≤5k msg/s but an
    anti-pattern at 100 TB, so the Spark-idiomatic analog is bounded:
    a ``foreachBatch`` hook that logs up to ``sample_per_batch``
    records per micro-batch, each with its message-id analog
    ``(batch_id, row_index)`` plus the row itself. The sample is
    taken with ``limit`` (no full collect); the batch continues to
    the wrapped sink untouched.
    """

    sample_per_batch: int = 10
    records: list[dict] = field(default_factory=list)

    def wrap(self, inner=None):
        """Return a foreachBatch callable; chain ``inner`` after
        logging if given."""

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            for i, row in enumerate(batch_df.limit(self.sample_per_batch).collect()):
                self.records.append(
                    {"message_id": (batch_id, i), "data": row.asDict(recursive=True)}
                )
            if inner is not None:
                inner(batch_df, batch_id)

        return handle


def assert_roundtrip(written: int, read: int) -> None:
    """The reference's eyeball invariant (§5) as a hard assert:
    rows_written == rows_read, zero lost, zero duplicated."""
    if written != read:
        raise AssertionError(f"roundtrip mismatch: wrote {written}, read {read}")
