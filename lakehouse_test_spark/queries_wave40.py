"""Round-10 wave AN: CDF timestamp parity, fresh-start admission,
operational CDC end-state, native log retention.

- ``cdf_commit_timestamp_feed`` — per-row ``_commit_timestamp``
  (Delta readChangeFeed's third meta column, added this round) is
  hash-checked to the microsecond over a batch CDF window whose
  fixture pins deterministic commit timestamps.
- ``streaming_cdf_fresh_capped_drain`` — the round-10 admission
  closure: a FRESH ``startingVersion=earliest`` stream self-computes
  its floor, so ``maxVersionsPerTrigger`` caps batch 0 itself; the
  offset-log shape is pinned into the hashed output.
- ``cdc_pipe_apply_end_state`` — the CLI ``pipe`` verb (now fully
  distributed, applying per key in ``_commit_version`` order) drained
  over a script with a delete→re-insert of the same key inside one
  window: the sink's net state is hash-checked.
- ``lakehouse_log_retention`` — ``clean_log`` pins the _log
  population while head reads and guards stay correct, all pinned
  into the hashed output.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


BASE_TS = 1_700_000_000  # epoch seconds; fixture commit v → BASE + 3600v


def _pin_commit_ts(t) -> None:
    """Rewrite the fixture's commit timestamps to BASE_TS + 3600*v —
    deterministic for the oracle (commit ts is wall-clock otherwise);
    legitimate because the log format is ours."""
    for p in sorted(t.log_dir.glob("*.json")):
        d = json.loads(p.read_text())
        d["ts"] = float(BASE_TS + 3600 * d["version"])
        p.write_text(json.dumps(d))


@query(
    "cdf_commit_timestamp_feed",
    oracle="""
    WITH feed AS (
      SELECT n_nationkey + 100 AS k, 'insert' AS _change_type,
             1 AS v FROM nation WHERE n_nationkey < 5
      UNION ALL
      SELECT n_nationkey AS k, 'delete' AS _change_type, 2 AS v
      FROM nation WHERE n_nationkey % 10 = 3
      UNION ALL
      SELECT n_nationkey + 103 AS k, 'delete' AS _change_type, 2 AS v
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n_nationkey + 200 AS k, 'insert' AS _change_type, 3 AS v
      FROM nation WHERE n_nationkey < 3
    )
    SELECT CAST(k AS BIGINT) AS k, _change_type,
           CAST(v AS INTEGER) AS _commit_version,
           CAST((1700000000 + 3600 * v) AS BIGINT) * 1000000 AS commit_ts_us
    FROM feed
    """,
    tags=("lakehouse", "cdf", "timestamp", "datasource"),
)
def cdf_commit_timestamp_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_commit_timestamp`` value parity (Delta readChangeFeed's
    third meta column): a 4-commit table with pinned deterministic
    commit timestamps, read as a batch CDF window — every row's
    timestamp must equal its OWNING commit's recorded time to the
    microsecond (projected via ``unix_micros`` for the hash), for
    inserts AND for DV-recovered delete rows. The stream and native
    surfaces share this code path (planning and decode are one
    implementation; pinned byte-equal in
    tests/test_cdf_commit_timestamp.py).

    Scale: the timestamp is a per-PARTITION constant stamped into
    each Arrow batch (one int64 column append per file) — zero extra
    I/O, zero shuffle; time-windowed CDC consumers filter on it with
    ordinary predicate pushdown instead of resolving versions
    out-of-band."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfts_"))
    t.append(n.coalesce(1))  # v0
    t.append(
        n.where(F.col("k") < 5).select((F.col("k") + 100).alias("k")).coalesce(1)
    )  # v1
    t.delete_where_dv("k % 10 = 3")  # v2 (hits both vintages)
    t.append(
        n.where(F.col("k") < 3).select((F.col("k") + 200).alias("k")).coalesce(1)
    )  # v3
    _pin_commit_ts(t)
    return (
        spark.read.format("lakehouse_cdf")
        .option("path", str(t.path))
        .option("startingVersion", "1")
        .option("endingVersion", "3")
        .load()
        .select(
            F.col("k").cast("long").alias("k"),
            "_change_type",
            F.col("_commit_version").cast("int").alias("_commit_version"),
            F.unix_micros("_commit_timestamp").alias("commit_ts_us"),
        )
    )


def _end_offsets(ck: str) -> list[dict]:
    out = []
    for f in sorted(
        Path(ck, "offsets").glob("[0-9]*"), key=lambda p: int(p.name)
    ):
        try:
            off = json.loads(f.read_text().splitlines()[-1])
        except (json.JSONDecodeError, IndexError):
            continue
        if isinstance(off, str):
            off = json.loads(off)
        if isinstance(off, dict) and isinstance(off.get("version"), int):
            out.append(off)
    return out


@query(
    "streaming_cdf_fresh_capped_drain",
    oracle="""
    WITH feed AS (
      SELECT n.n_nationkey + 100 * g.i AS k, CAST(g.i AS INTEGER) AS v
      FROM nation n, (SELECT UNNEST(range(12)) AS i) g
      WHERE n.n_nationkey < 4
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(sum(v) AS BIGINT) AS v_sum,
           TRUE AS batch0_capped,
           TRUE AS all_capped
    FROM feed
    """,
    tags=("streaming", "lakehouse", "cdf", "admission", "datasource"),
)
def streaming_cdf_fresh_capped_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 admission closure (r9 'missing #2'), engine-driven: a
    FRESH ``startingVersion=earliest`` stream over a 12-commit backlog
    with ``maxVersionsPerTrigger=3`` must cap from BATCH 0 — the
    reader self-computes its floor at construction, so even the
    engine's blind first ``latestOffset`` obeys the cap
    (``batch0_capped``: first end offset ≤ 2; ``all_capped``: every
    advance ≤ 3) — and the drained feed is exactly-once vs the SQL
    reconstruction (count + key/version sums).

    Scale: this is Delta's maxFilesPerTrigger-bounds-the-initial-load
    semantic in the version domain — a consumer pointed at a table's
    birth replays history as bounded transactions from the first
    trigger, with no snapshot-seed prerequisite."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    small = n.where(F.col("k") < 4).coalesce(1)
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdffresh_"))
    for i in range(12):
        t.append(small.select((F.col("k") + 100 * i).alias("k")))
    head = t.latest_version()
    work = tempfile.mkdtemp(prefix="lh_cdffresh_ck_")
    ck, out = f"{work}/ck", f"{work}/out"

    def run_once():
        q = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", str(t.path))
            .option("startingVersion", "earliest")
            .option("maxVersionsPerTrigger", "3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    runs = 0
    while (
        not _end_offsets(ck) or _end_offsets(ck)[-1]["version"] < head
    ) and runs < 10:
        run_once()
        runs += 1
    vs = [o["version"] for o in _end_offsets(ck)]
    deltas = [b - a for a, b in zip(vs, vs[1:])]
    batch0_capped = bool(vs) and vs[0] <= 2
    all_capped = not deltas or max(deltas) <= 3
    return spark.read.parquet(out).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("k_sum"),
        F.sum("_commit_version").cast("long").alias("v_sum"),
        F.lit(batch0_capped).alias("batch0_capped"),
        F.lit(all_capped).alias("all_capped"),
    )


@query(
    "cdc_pipe_apply_end_state",
    oracle="""
    WITH seed AS (
      SELECT s_suppkey AS k, CAST(round(s_acctbal, 2) AS DOUBLE) AS bal
      FROM supplier
    ),
    after_delete AS (
      SELECT k, bal FROM seed WHERE k % 10 <> 3
    ),
    reinserted AS (
      SELECT k, CAST(k * 2.0 AS DOUBLE) AS bal
      FROM seed WHERE k % 10 = 3 AND k % 20 = 3
    ),
    fresh AS (
      SELECT s_suppkey + 100000 AS k, CAST(1.5 AS DOUBLE) AS bal
      FROM supplier WHERE s_suppkey <= 5
    )
    SELECT k, bal FROM after_delete
    UNION ALL SELECT k, bal FROM reinserted
    UNION ALL SELECT k, bal FROM fresh
    """,
    tags=("cdc", "cli", "pipe", "lakehouse", "streaming"),
)
def cdc_pipe_apply_end_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational CDC entry point end-to-end, post-r10: ``cli
    pipe`` drains a source whose tail carries a DV delete AND a
    re-insert of half the deleted keys (delete v1, re-insert v2 —
    one drain window), plus fresh inserts — the sink's net state is
    hash-checked against the SQL reconstruction. Passing requires the
    per-key ``_commit_version``-ordered apply (the r9 all-inserts-
    then-all-deletes shape would delete the re-inserted keys: silent
    data loss, the r9 ADVICE repro).

    Scale: the apply is fully distributed — inserts MERGE as
    DataFrames, deletes flow through delete_keys_dv's semi-join; no
    micro-batch ever materializes driver-side (pinned by the
    collect-guard CLI test), so the snapshot-seed first batch is
    bounded by cluster memory, not driver memory."""
    from lakehouse_test_spark.cli import main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.round("s_acctbal", 2).cast("double").alias("bal"),
    )
    src = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_pipe_src_"))
    src.append(s.repartition(3))  # v0: multi-file seed
    work = tempfile.mkdtemp(prefix="lh_pipe_work_")
    sink, ck = f"{work}/sink", f"{work}/ck"
    argv = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
    ]
    main(argv, spark=spark)  # seed the sink
    # tail, all inside the next drain window: DV delete, partial
    # re-insert of the deleted keys, fresh inserts
    src.delete_where_dv("k % 10 = 3")  # v1
    src.append(
        s.where((F.col("k") % 10 == 3) & (F.col("k") % 20 == 3))
        .select("k", (F.col("k") * 2.0).cast("double").alias("bal"))
        .coalesce(1)
    )  # v2: re-insert half the deleted keys with new values
    src.append(
        s.where(F.col("k") <= 5)
        .select((F.col("k") + 100000).alias("k"), F.lit(1.5).cast("double").alias("bal"))
        .coalesce(1)
    )  # v3: fresh keys
    for _ in range(4):
        main(argv, spark=spark)
    return LakehouseTable(spark, sink).snapshot().select("k", "bal")


@query(
    "lakehouse_log_retention",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_nationkey) AS BIGINT) AS k_sum,
           CAST(3 AS BIGINT) AS jsons_kept,
           TRUE AS time_travel_raises,
           TRUE AS lagging_cursor_raises,
           (SELECT CAST(count(*) AS BIGINT) FROM nation
            WHERE n_nationkey % 12 IN (9, 10, 11)) AS tail_rows
    FROM nation
    """,
    tags=("lakehouse", "retention", "maintenance"),
)
def lakehouse_log_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native commit-log retention (r9 'missing #3'): a 12-commit
    table checkpoints and runs ``clean_log(keep_versions=3)`` — the
    _log population pins to exactly 3 JSONs (hashed as
    ``jsons_kept``), the head snapshot still equals the full data
    (count/sum), and BOTH truncation guards fire loudly: time travel
    below the cutoff and an incremental cursor whose window predates
    the earliest surviving JSON (``…_raises`` flags). The surviving
    tail window still replays (``tail_rows``).

    Scale: the log was the last unbounded metadata population — every
    streaming trigger lists it (measured 86 ms/trigger at 10⁵
    commits, 0.8 ms after retention; tools/admission_probe.py
    --synthetic). Retention + checkpoint replay makes long-lived CDC
    tables O(keep + tail) forever."""
    from lakehouse_test_spark.plans.lakehouse import (
        LakehouseTable,
        LogRetentionError,
    )

    n = T(spark, sf_dir, "nation").select("n_nationkey")
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_logret_"))
    for i in range(12):
        t.append(n.where(F.col("n_nationkey") % 12 == i).coalesce(1))
    t.checkpoint()
    t.clean_log(keep_versions=3)
    jsons_kept = sum(1 for p in t.log_dir.glob("*.json"))
    time_travel_raises = False
    try:
        t.snapshot(version=2).count()
    except LogRetentionError:
        time_travel_raises = True
    lagging_cursor_raises = False
    try:
        t.read_changes_cdf(1).count()
    except LogRetentionError:
        lagging_cursor_raises = True
    tail = t.read_changes_cdf(8)  # window inside the surviving range
    return t.snapshot().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("n_nationkey").cast("long").alias("k_sum"),
        F.lit(jsons_kept).cast("long").alias("jsons_kept"),
        F.lit(time_travel_raises).alias("time_travel_raises"),
        F.lit(lagging_cursor_raises).alias("lagging_cursor_raises"),
        F.lit(tail.count()).cast("long").alias("tail_rows"),
    )


@query(
    "streaming_cdf_starting_timestamp",
    oracle="""
    WITH feed AS (
      SELECT n.n_nationkey + 100 * g.i AS k, CAST(g.i AS INTEGER) AS v
      FROM nation n, (SELECT UNNEST(range(8)) AS i) g
      WHERE n.n_nationkey < 4 AND g.i >= 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(min(v) AS INTEGER) AS min_v,
           CAST(max(v) AS INTEGER) AS max_v,
           TRUE AS batch0_capped
    FROM feed
    """,
    tags=("streaming", "lakehouse", "cdf", "timestamp", "datasource"),
)
def streaming_cdf_starting_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``startingTimestamp`` (Delta stream parity): an
    8-commit table with pinned deterministic timestamps, streamed from
    v2's timestamp — the feed must contain exactly the commits at/
    after the bound (min_v/max_v pinned into the hash), resolved by
    the SAME shared function as the batch reader, and because the
    resolved start seeds the self-computed admission floor,
    ``maxVersionsPerTrigger=2`` caps the catch-up from batch 0
    (``batch0_capped``: first end offset ≤ 3).

    Scale: timestamp resolution is a bounded newest-first scan
    (O(commits after the bound) JSON parses, never a full log parse),
    then the drain is the ordinary capped tail — a consumer pointed at
    "yesterday" on a years-old table pays for yesterday, not for the
    years."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    small = n.where(F.col("k") < 4).coalesce(1)
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfstts_"))
    for i in range(8):
        t.append(small.select((F.col("k") + 100 * i).alias("k")))
    _pin_commit_ts(t)
    head = t.latest_version()
    work = tempfile.mkdtemp(prefix="lh_cdfstts_ck_")
    ck, out = f"{work}/ck", f"{work}/out"

    def run_once():
        q = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", str(t.path))
            .option("startingTimestamp", repr(float(BASE_TS + 3600 * 2)))
            .option("maxVersionsPerTrigger", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    runs = 0
    while (
        not _end_offsets(ck) or _end_offsets(ck)[-1]["version"] < head
    ) and runs < 8:
        run_once()
        runs += 1
    vs = [o["version"] for o in _end_offsets(ck)]
    batch0_capped = bool(vs) and vs[0] <= 3  # floor 1 + cap 2
    return spark.read.parquet(out).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("_commit_version").cast("int").alias("min_v"),
        F.max("_commit_version").cast("int").alias("max_v"),
        F.lit(batch0_capped).alias("batch0_capped"),
    )
