"""Delta-protocol interop for :class:`LakehouseTable`: render the
native commit history as a spec-compliant ``_delta_log`` (and replay
one back) so external Delta Lake readers can open the table.

The sandbox ships no delta-spark package (BASELINE.md names Delta/
Iceberg as the reference deployment's table layer), so protocol
compliance is what we can offer: the log this module writes follows
the public Delta transaction-log specification
(github.com/delta-io/delta/blob/master/PROTOCOL.md):

- one ``%020d.json`` per version holding newline-delimited actions;
- version 0 carries ``protocol`` (minReader 1 / minWriter 2) and
  ``metaData`` (id, parquet format, Spark schemaString);
- appends carry one ``add`` per data file with ``partitionValues``,
  ``size``, ``modificationTime``, ``dataChange`` and a ``stats`` JSON
  string (numRecords + minValues/maxValues from the native zone maps);
- restates (merge/delete/compact) emit ``remove`` for every
  previously-live file plus ``add`` for the rewrite, compactions with
  ``dataChange: false`` exactly like OPTIMIZE;
- every commit gets a ``commitInfo`` with the native operation name;
- every ``checkpoint_interval`` commits a parquet checkpoint
  (``%020d.checkpoint.parquet`` holding the full replayed state as
  one action per row: protocol / metaData / live adds) plus a
  ``_last_checkpoint`` pointer, per PROTOCOL.md §Checkpoints — so a
  reader opens a 100k-commit table from the newest checkpoint + the
  JSON tail instead of replaying every commit.

``read_delta_log`` replays add/remove actions into the live file set
— the same reconstruction any Delta reader performs, checkpoint-first
when one exists — and the tests assert replay == the native snapshot
at every version, so the export is validated end-to-end without the
package.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from lakehouse_test_spark.plans.lakehouse import LakehouseTable

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _checkpoint_schema():
    """Arrow schema of a Delta checkpoint parquet: one action per row,
    exactly one of the struct columns non-null (PROTOCOL.md
    §Checkpoint-Schema)."""
    import pyarrow as pa

    return pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                    ]
                ),
            ),
        ]
    )


def _write_checkpoint(
    log_dir: Path,
    version: int,
    metadata_action: dict,
    live_adds: dict[str, dict],
) -> None:
    """Write ``%020d.checkpoint.parquet`` (full state at ``version``)
    and repoint ``_last_checkpoint`` at it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows: list[dict] = [{"protocol": PROTOCOL}]
    md = dict(metadata_action["metaData"])
    md["format"] = {"provider": md.get("format", {}).get("provider", "parquet")}
    md["configuration"] = [
        (k, v) for k, v in (md.get("configuration") or {}).items()
    ]
    rows.append({"metaData": md})
    for path in sorted(live_adds):
        add = dict(live_adds[path])
        add["partitionValues"] = [
            (k, v) for k, v in (add.get("partitionValues") or {}).items()
        ]
        rows.append({"add": add})
    table = pa.Table.from_pylist(rows, schema=_checkpoint_schema())
    pq.write_table(table, str(log_dir / f"{version:020d}.checkpoint.parquet"))
    (log_dir / "_last_checkpoint").write_text(
        json.dumps({"version": version, "size": table.num_rows})
    )


def _stats_json(table: LakehouseTable, commit, rel_path: str) -> str | None:
    """Delta per-file stats string from the native zone maps (plus an
    exact numRecords from the parquet footer)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(str(table.path / rel_path)).metadata
    stats: dict = {"numRecords": md.num_rows}
    zone = (commit.stats or {}).get(rel_path)
    if zone:
        stats["minValues"] = {c: lo for c, (lo, hi) in zone.items()}
        stats["maxValues"] = {c: hi for c, (lo, hi) in zone.items()}
    return json.dumps(stats, default=str)


def export_delta_log(
    spark: SparkSession, table: LakehouseTable, checkpoint_interval: int = 10
) -> Path:
    """Write ``_delta_log/`` at the table root from the native commit
    history. Idempotent (rewrites the log dir); returns its path.
    Every ``checkpoint_interval`` commits the full state is also
    written as a parquet checkpoint + ``_last_checkpoint`` pointer
    (0 disables), so readers replay O(interval) JSON commits, not
    O(history).

    Scale: the export touches parquet *footers* only — per-file
    metadata, no data I/O — and is O(files in history) driver work,
    the same cost class as the native log itself. (A real deployment
    would emit these actions inside each commit instead of
    re-deriving them; this entry point exists to adopt tables written
    before the exporter.)
    """
    log_dir = table.path / "_delta_log"
    if log_dir.exists():
        import shutil

        shutil.rmtree(log_dir)
    log_dir.mkdir(parents=True)

    def _schema_of(files: list[str]) -> str:
        if not files:
            return "{}"
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(*[str(table.path / f) for f in files])
            .schema.json()
        )

    def _metadata_action(schema_json: str, now_ms: int) -> dict:
        return {
            "metaData": {
                "id": f"{table.path.name}-delta-export",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": now_ms,
            }
        }

    current_schema: str | None = None
    current_meta: dict | None = None
    live: list[str] = []
    live_adds: dict[str, dict] = {}
    for commit in table.history():
        actions: list[dict] = []
        now_ms = int(time.time() * 1000)
        if commit.version == 0:
            actions.append({"protocol": PROTOCOL})
            current_schema = _schema_of(commit.files)
            current_meta = _metadata_action(current_schema, now_ms)
            actions.append(current_meta)
        elif commit.files:
            # Delta requires a fresh metaData action in the commit that
            # changes the schema — without it a reader never learns
            # about evolved (added) columns. The reference point is the
            # MERGED schema of the post-commit live set, so an append
            # that still carries the old (narrower) schema never
            # regresses the published one.
            next_live = (
                commit.files
                if commit.restate
                else [f for f in live if f not in set(commit.removed_files or [])]
                + commit.files
            )
            merged_schema = _schema_of(next_live)
            if merged_schema != current_schema:
                current_schema = merged_schema
                current_meta = _metadata_action(current_schema, now_ms)
                actions.append(current_meta)
        if commit.restate:
            for f in live:
                actions.append(
                    {
                        "remove": {
                            "path": f,
                            "deletionTimestamp": now_ms,
                            "dataChange": commit.data_change,
                        }
                    }
                )
            live = []
            live_adds = {}
        elif commit.removed_files:
            # partial rewrite (compact_files): RemoveFile for exactly
            # the replaced files — PROTOCOL.md's OPTIMIZE shape
            for f in commit.removed_files:
                actions.append(
                    {
                        "remove": {
                            "path": f,
                            "deletionTimestamp": now_ms,
                            "dataChange": commit.data_change,
                        }
                    }
                )
            gone = set(commit.removed_files)
            live = [f for f in live if f not in gone]
            for f in gone:
                live_adds.pop(f, None)
        for f in commit.files:
            p = table.path / f
            add = {
                "path": f,
                "partitionValues": {},
                "size": p.stat().st_size,
                "modificationTime": int(p.stat().st_mtime * 1000),
                "dataChange": commit.data_change,
                "stats": _stats_json(table, commit, f),
            }
            actions.append({"add": add})
            live.append(f)
            live_adds[f] = add
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": commit.operation.upper(),
                    "operationParameters": {},
                    "engineInfo": "lakehouse_test_spark delta-export",
                }
            }
        )
        (log_dir / f"{commit.version:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        if (
            checkpoint_interval
            and commit.version > 0
            and commit.version % checkpoint_interval == 0
        ):
            assert current_meta is not None
            _write_checkpoint(log_dir, commit.version, current_meta, live_adds)
    return log_dir


def _replay_state(
    table_path: str, version: int | None = None
) -> tuple[dict[str, dict], int | None, list[int]]:
    """Replay the log to ``version``: checkpoint-first when the newest
    eligible checkpoint exists, then the JSON tail. Returns
    (live add-actions by path, checkpoint version used or None,
    JSON commit versions replayed) — the extras let tests pin that a
    long history is NOT replayed commit-by-commit.
    """
    log_dir = Path(table_path) / "_delta_log"
    live: dict[str, dict] = {}
    start_after = -1
    ckpt_version: int | None = None
    last = log_dir / "_last_checkpoint"
    if last.exists():
        v = json.loads(last.read_text())["version"]
        if version is None or v <= version:
            ckpt_version = v
        else:
            # time travel below _last_checkpoint: use the newest older
            # checkpoint if any, else full JSON replay (all commits kept)
            older = sorted(
                int(p.name.split(".")[0])
                for p in log_dir.glob("*.checkpoint.parquet")
                if int(p.name.split(".")[0]) <= version
            )
            ckpt_version = older[-1] if older else None
    if ckpt_version is not None:
        import pyarrow.parquet as pq

        t = pq.read_table(
            str(log_dir / f"{ckpt_version:020d}.checkpoint.parquet"),
            columns=["add"],
        )
        for add in t.column("add").to_pylist():
            if add is not None and add.get("path"):
                add = dict(add)
                add["partitionValues"] = dict(add.get("partitionValues") or [])
                live[add["path"]] = add
        start_after = ckpt_version
    replayed: list[int] = []
    for p in sorted(log_dir.glob("*.json")):
        v = int(p.stem)
        if v <= start_after:
            continue
        if version is not None and v > version:
            break
        replayed.append(v)
        for line in p.read_text().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
    return live, ckpt_version, replayed


def replay_live_files(table_path: str, version: int | None = None) -> list[str]:
    """Reconstruct the live file set from a ``_delta_log`` by replaying
    add/remove actions up to ``version`` — the core of every Delta
    reader. Starts from the newest eligible parquet checkpoint
    (``_last_checkpoint``) when one exists, replaying only the JSON
    tail after it."""
    live, _, _ = _replay_state(table_path, version)
    return sorted(live)


def read_delta_log(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Open an exported table the way a Delta reader would: replay the
    log to the live file set, then scan exactly those parquet files."""
    files = replay_live_files(table_path, version)
    if not files:
        raise ValueError(f"no live files at version {version}")
    root = Path(table_path)
    return spark.read.option("mergeSchema", "true").parquet(
        *[str(root / f) for f in files]
    )


from lakehouse_test_spark.registry import query  # noqa: E402
from lakehouse_test_spark.session import load_table  # noqa: E402


@query(
    "lakehouse_delta_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events
    WHERE event_type <> 'purchase'
    GROUP BY event_type
    """,
    tags=("lakehouse", "delta", "events"),
)
def lakehouse_delta_roundtrip(spark: SparkSession, sf_dir: str):
    """Full interop loop: ingest events into a native lakehouse table
    in two commits, DELETE one event type, compact, export the Delta
    protocol log, then aggregate the table as read back THROUGH the
    exported log (replay + scan) — proving an external Delta reader
    would see exactly the committed state.

    Oracle-checkable: the roundtrip must equal the straight batch
    aggregate minus the deleted type, independent of commit slicing.
    """
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_test_spark.fpsafe import dround, dsum

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = tempfile.mkdtemp(prefix="lakehouse_delta_rt_")
    t = LakehouseTable(spark, path)
    try:
        half = e.where(F.col("event_id") % 2 == 0)
        t.append(half, stats_cols=["event_id"])
        t.append(e.where(F.col("event_id") % 2 == 1), stats_cols=["event_id"])
        t.delete_where("event_type = 'purchase'", stats_cols=["event_id"])
        t.compact(stats_cols=["event_id"])
        export_delta_log(spark, t)
        via_delta = read_delta_log(spark, str(t.path))
        return (
            via_delta.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dround(dsum(F.col("value")), 2).alias("total_value"),
            )
            .localCheckpoint()  # materialize before the temp table drops
        )
    finally:
        pass  # temp dir reclaimed by the OS; keep files alive for lazy readers
