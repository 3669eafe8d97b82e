"""Foreign-Delta-reader paths: partition-column reconstruction,
multi-part checkpoints, and log-only pruning — exercised on
hand-built logs with layouts our own exporter never writes."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.delta_export import (
    PROTOCOL,
    _checkpoint_schema,
    read_delta_log,
    read_delta_log_pruned,
)


def _schema_string(fields: list[tuple[str, str]]) -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _foreign_table(
    tmp: Path,
    part_col: str = "day",
    part_type: str = "date",
    values=("2024-01-01", "2024-01-02", None),
):
    """A hive-style foreign table: one file per partition value, the
    partition column ONLY in add.partitionValues (incl. a NULL
    partition), numeric stats on ``v``."""
    log = tmp / "_delta_log"
    log.mkdir(parents=True)
    adds = []
    for i, pv in enumerate(values):
        rel = f"f{i}.parquet"
        lo, hi = i * 10, i * 10 + 9
        pq.write_table(
            pa.table({"k": list(range(lo, hi + 1)), "v": [float(x) for x in range(lo, hi + 1)]}),
            str(tmp / rel),
        )
        adds.append(
            {
                "path": rel,
                "partitionValues": {part_col: pv},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": 10,
                        "minValues": {"v": float(lo)},
                        "maxValues": {"v": float(hi)},
                    }
                ),
            }
        )
    meta = {
        "id": "t",
        "format": {"provider": "parquet"},
        "schemaString": _schema_string(
            [("k", "long"), ("v", "double"), (part_col, part_type)]
        ),
        "partitionColumns": [part_col],
        "configuration": {},
        "createdTime": 0,
    }
    actions = [{"protocol": dict(PROTOCOL)}, {"metaData": meta}] + [
        {"add": a} for a in adds
    ]
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in actions))
    return adds, meta


def test_partition_column_reconstructed_with_types_and_null(spark):
    """Partition values exist only in the log; the reader must attach
    them under the declared type (date here) including the NULL
    partition — naive parquet scans lose the column entirely."""
    tmp = Path(tempfile.mkdtemp(prefix="dfi_"))
    _foreign_table(tmp)
    df = read_delta_log(spark, str(tmp))
    assert dict(df.dtypes)["day"] == "date"
    got = {r["day"] and str(r["day"]): r["n"] for r in
           df.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"2024-01-01": 10, "2024-01-02": 10, None: 10}
    # row-level alignment: every k in [0,10) maps to day 1
    assert (
        df.where(F.col("day") == F.lit("2024-01-01").cast("date"))
        .agg(F.min("k"), F.max("k"))
        .first()
    )[:2] == (0, 9)


def test_multipart_checkpoint_replay(spark):
    """State split across 2 checkpoint shards + a JSON tail commit:
    the replay must union every shard and still apply the tail."""
    tmp = Path(tempfile.mkdtemp(prefix="dfi_"))
    adds, meta = _foreign_table(tmp, values=("2024-01-01", "2024-01-02", None))
    log = tmp / "_delta_log"
    md = dict(meta)
    md["configuration"] = []
    shards = [adds[:1], adds[1:2]]  # checkpoint holds first two files
    for i, shard in enumerate(shards):
        rows = []
        if i == 0:
            rows += [{"protocol": dict(PROTOCOL)}, {"metaData": md}]
        for a in shard:
            aa = dict(a)
            aa["partitionValues"] = list(aa["partitionValues"].items())
            rows.append({"add": aa})
        pq.write_table(
            pa.Table.from_pylist(rows, schema=_checkpoint_schema()),
            str(log / f"{0:020d}.checkpoint.{i + 1:010d}.{2:010d}.parquet"),
        )
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": 0, "size": 4, "parts": 2})
    )
    # tail commit adds the third file AFTER the checkpoint
    (log / f"{1:020d}.json").write_text(json.dumps({"add": adds[2]}))
    df = read_delta_log(spark, str(tmp))
    assert df.count() == 30  # 2 shards (20 rows) + tail (10 rows)


def test_log_only_pruning_stats_and_partitions(spark):
    """Pruning must come from the log alone: stats ranges skip files,
    partition equality skips partitions, and a file with NO stats is
    kept (skipping must be safe)."""
    tmp = Path(tempfile.mkdtemp(prefix="dfi_"))
    adds, _ = _foreign_table(tmp)
    # strip stats from the last add and rewrite v0 to prove "no stats
    # → keep" (rebuild the log with one stats-less file)
    log = tmp / "_delta_log"
    lines = (log / f"{0:020d}.json").read_text().splitlines()
    actions = [json.loads(x) for x in lines]
    for a in actions:
        if "add" in a and a["add"]["path"] == "f2.parquet":
            a["add"]["stats"] = None
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in actions))

    # v-range prune: [0, 9] overlaps f0 only, but stats-less f2 must
    # survive the planner
    df, kept, total = read_delta_log_pruned(spark, str(tmp), {"v": (0.0, 9.0)})
    assert (kept, total) == (2, 3)
    assert df.count() == 10  # residual predicate removes f2's rows

    # partition prune on the reconstructed column
    df2, kept2, total2 = read_delta_log_pruned(
        spark, str(tmp), {"day": ("2024-01-02", "2024-01-02")}
    )
    assert (kept2, total2) == (2, 3)  # f1 (match) + f2 (NULL pv ≠ skip... kept: no stats)
    assert df2.count() == 10


def test_pruning_empty_result_keeps_schema(spark):
    tmp = Path(tempfile.mkdtemp(prefix="dfi_"))
    _foreign_table(tmp)
    df, kept, total = read_delta_log_pruned(spark, str(tmp), {"v": (1e9, 2e9)})
    assert kept == 0 and total == 3
    assert df.count() == 0
    assert "day" in df.columns and "v" in df.columns
