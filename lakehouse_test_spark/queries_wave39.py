"""Round-9 wave AM: streaming tail admission control.

- ``streaming_cdf_capped_drain`` — a ``lakehouse_cdf`` stream that
  fell 12 commits behind drains them under
  ``maxVersionsPerTrigger=3`` as a SEQUENCE of capped micro-batches
  (each advancing ≤3 commit versions — the per-batch end offsets are
  read back from the checkpoint and the cap is pinned INTO the hashed
  output), exactly-once against a pure-SQL reconstruction. This is
  the reference's consume-side rate limiting (``PerformanceConsumer``
  poll loop bounded per iteration) re-expressed in the version
  domain: a 100 TB consumer that was down for a day replays the
  backlog as bounded micro-batches, never as one giant transaction.
  The admission design (floor fast-forwarded by the engine's
  re-planned checkpointed batch BEFORE the first capped
  ``latestOffset``) is derived from the TRACED engine call order —
  see ``tools/probe_call_order.py`` and
  ``tests/test_stream_engine_contract.py``.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _end_versions(ck: str) -> list[int]:
    """Per-batch end-offset versions from a stream checkpoint (line 1
    'v1', line 2 metadata, last line the source-0 offset JSON)."""
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
            out.append(off["version"])
    return out


@query(
    "streaming_cdf_capped_drain",
    oracle="""
    WITH seed AS (
      SELECT n_nationkey AS k, 0 AS v FROM nation
    ),
    tail AS (
      SELECT n.n_nationkey + 100 * (g.i + 1) AS k,
             CAST(g.i + 1 AS INTEGER) AS v
      FROM nation n, (SELECT UNNEST(range(12)) AS i) g
      WHERE n.n_nationkey < 5
    ),
    feed AS (
      SELECT * FROM seed UNION ALL SELECT * FROM tail
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(sum(v) AS BIGINT) AS v_sum,
           TRUE AS capped,
           TRUE AS multi_batch
    FROM feed
    """,
    tags=("streaming", "lakehouse", "cdf", "admission", "datasource"),
)
def streaming_cdf_capped_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail admission control, engine-driven: seed a checkpoint at v0
    (snapshot mode), land 12 commits while the stream is DOWN, then
    drain with ``maxVersionsPerTrigger=3`` — the checkpoint's offset
    log must show every advance ≤3 versions (``capped``) across ≥4
    batches (``multi_batch``), both pinned into the hashed output,
    and the drained feed must be exactly-once (count/sum of keys AND
    of provenance versions match the SQL reconstruction — a replayed
    or skipped batch breaks the sums).

    Scale: the cap bounds a micro-batch by COMMIT COUNT, the
    snapshot seed bounds the first batch by LIVE SIZE — together a
    consumer can bound every transaction it replays regardless of
    how far behind it fell. Restart safety is engine-order-derived:
    Spark re-plans the checkpointed batch before the first capped
    ``latestOffset`` (floor fast-forward), so the cap can never
    regress below a committed offset.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfcap_"))
    t.append(n.coalesce(1))  # v0: the seed
    work = tempfile.mkdtemp(prefix="lh_cdfcap_ck_")
    ck, out = f"{work}/ck", f"{work}/out"

    def run_once():
        q = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", str(t.path))
            .option("startingMode", "snapshot")
            .option("maxVersionsPerTrigger", "3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # establish the checkpoint at v0 (seed batch)
    small = n.where(F.col("k") < 5).coalesce(1)
    for i in range(12):  # fall behind by 12 commits
        t.append(small.select((F.col("k") + 100 * (i + 1)).alias("k")))
    head = t.latest_version()
    runs = 0
    while (_end_versions(ck) or [-1])[-1] < head and runs < 10:
        run_once()
        runs += 1
    vs = _end_versions(ck)
    deltas = [b - a for a, b in zip(vs, vs[1:])]
    capped = bool(deltas) and max(deltas) <= 3
    multi_batch = len([d for d in deltas if d > 0]) >= 4
    return spark.read.parquet(out).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("k_sum"),
        F.sum("_commit_version").cast("long").alias("v_sum"),
        F.lit(capped).alias("capped"),
        F.lit(multi_batch).alias("multi_batch"),
    )


@query(
    "iceberg_export_expire_snapshots",
    oracle="""
    WITH src AS (
      SELECT s_suppkey AS k,
             CAST(FLOOR(s_acctbal) AS DECIMAL(12,2)) AS bal
      FROM supplier
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(round(sum(bal), 2) AS DOUBLE) AS bal_sum,
           CAST(3 AS BIGINT) AS snapshots_kept,
           TRUE AS expired_raises,
           TRUE AS tag_survives
    FROM src
    """,
    tags=("lakehouse", "iceberg", "interop", "retention"),
)
def iceberg_export_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg export retention (expireSnapshots analog): 6 commits +
    a tag on v0, exported with ``expire_keep_last=2`` — the metadata
    keeps exactly {newest 2} ∪ {tag target} = 3 snapshots (pinned as
    ``snapshots_kept``), the head read through the Iceberg replay path
    still equals the full table (count/sum/bal hashed vs DuckDB), a
    time travel to an EXPIRED snapshot raises the documented error
    (``expired_raises``), and the tag-protected snapshot still
    time-travels (``tag_survives``).

    Scale: without retention a per-micro-batch export loop grows
    metadata.json and the manifest population O(total commits); with
    ``expire_keep_last`` both are pinned (probe:
    ``tools/iceberg_export_probe.py`` retention phase) while the
    incremental per-call cost stays flat. Ref-reachable snapshots
    never expire — Iceberg's own expireSnapshots contract.
    """
    import tempfile

    from lakehouse_test_spark.plans.iceberg_export import (
        _snapshot_id,
        export_iceberg_metadata,
        read_iceberg,
    )
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("k"),
        F.floor(F.col("s_acctbal")).cast("decimal(12,2)").alias("bal"),
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_iceexp_"))
    for i in range(6):
        t.append(s.where(F.col("k") % 6 == i).coalesce(1))
    t.tag("baseline", version=0)
    export_iceberg_metadata(spark, t, expire_keep_last=2)
    import json as _json

    md = _json.loads((t.path / "metadata" / "v1.metadata.json").read_text())
    expired_raises = False
    try:
        read_iceberg(spark, str(t.path), _snapshot_id(2)).count()
    except ValueError as e:
        expired_raises = "expired" in str(e)
    tag_survives = (
        read_iceberg(spark, str(t.path), _snapshot_id(0)).count()
        == t.snapshot(version=0).count()
    )
    return read_iceberg(spark, str(t.path)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("k_sum"),
        F.round(F.sum("bal"), 2).cast("double").alias("bal_sum"),
        F.lit(len(md["snapshots"])).cast("long").alias("snapshots_kept"),
        F.lit(expired_raises).alias("expired_raises"),
        F.lit(tag_survives).alias("tag_survives"),
    )


@query(
    "cdf_batch_read_window",
    oracle="""
    WITH base AS (
      SELECT n_nationkey AS k, 0 AS v FROM nation
      UNION ALL
      SELECT n_nationkey + 100 AS k, 1 AS v FROM nation WHERE n_nationkey < 5
    ),
    deletes AS (
      SELECT k, 'delete' AS _change_type, 2 AS _commit_version
      FROM base WHERE k % 10 = 3
    ),
    inserts AS (
      SELECT n_nationkey + 200 AS k, 'insert' AS _change_type,
             3 AS _commit_version
      FROM nation WHERE n_nationkey < 3
    )
    SELECT CAST(k AS BIGINT) AS k, _change_type,
           CAST(_commit_version AS INTEGER) AS _commit_version
    FROM (SELECT * FROM deletes UNION ALL SELECT * FROM inserts)
    """,
    tags=("lakehouse", "cdf", "batch", "datasource"),
)
def cdf_batch_read_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-addressable BATCH change-feed window (Delta's
    readChangeFeed batch form): ``spark.read.format("lakehouse_cdf")``
    with ``startingVersion=3`` / ``endingVersion=4`` over a table with
    appends (v0, v1), a deletion-vector commit (v2) and a tail append
    (v3) — the window replays the DV's delete rows (recovered from the
    base files with provenance version 2) and v3's inserts, row-hashed
    against a pure-SQL reconstruction. Planning and decode are the
    STREAM reader's own methods, so batch and stream surfaces cannot
    diverge.

    Scale: a bounded window plans O(commits in the window) — one
    partition per data file / per (DV, base file) pair — never a log
    replay; the driver holds only planning-sized state.
    """
    import tempfile

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdfbatch_"))
    t.append(n.coalesce(1))  # v0
    t.append(
        n.where(F.col("k") < 5).select((F.col("k") + 100).alias("k")).coalesce(1)
    )  # v1
    t.delete_where_dv("k % 10 = 3")  # v2
    t.append(
        n.where(F.col("k") < 3).select((F.col("k") + 200).alias("k")).coalesce(1)
    )  # v3
    return (
        spark.read.format("lakehouse_cdf")
        .option("path", str(t.path))
        .option("startingVersion", "2")
        .option("endingVersion", "3")
        .load()
        .select(
            F.col("k").cast("long").alias("k"),
            "_change_type",
            F.col("_commit_version").cast("int").alias("_commit_version"),
        )
    )
