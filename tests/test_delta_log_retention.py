"""Delta export log retention (round 9) — Delta's metadata cleanup:
``export_delta_log(..., log_retention_versions=N)`` deletes commit
JSONs and checkpoints below ``min(newest checkpoint, head - N + 1)``
so a per-micro-batch export loop bounds ``_delta_log/``; readers stay
checkpoint + tail, and time travel below the cutoff raises instead of
silently replaying a truncated chain."""
from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.delta_export import (
    export_delta_log,
    read_delta_log,
    replay_txn_high,
)
from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _mk(spark, tmp_path, name, commits):
    t = LakehouseTable(spark, str(tmp_path / name))
    for i in range(commits):
        t.append(
            spark.range(i * 10, i * 10 + 2)
            .select(F.col("id").alias("k"))
            .coalesce(1)
        )
    return t


def _jsons(log_dir: Path) -> list[int]:
    return sorted(int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit())


def test_log_retention_bounds_delta_log(spark, tmp_path):
    t = _mk(spark, tmp_path, "ret", commits=25)  # head v24, ckpts at 10, 20
    log_dir = export_delta_log(
        spark, t, checkpoint_interval=10, log_retention_versions=5
    )
    # cutoff = min(20, 24-5+1=20) = 20: JSONs 0..19 gone, 20..24 kept
    assert _jsons(log_dir) == list(range(20, 25))
    ckpts = sorted(p.name for p in log_dir.glob("*.checkpoint*.parquet"))
    assert ckpts == [f"{20:020d}.checkpoint.parquet"]  # ckpt 10 purged
    # head read: checkpoint + tail, full table
    assert read_delta_log(spark, str(t.path)).count() == 50
    # time travel at/after the cutoff works; below it raises loudly
    assert read_delta_log(spark, str(t.path), version=22).count() == 46
    with pytest.raises(ValueError, match="log\\s+retention"):
        read_delta_log(spark, str(t.path), version=5).count()


def test_log_retention_noop_without_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, "nock", commits=6)
    log_dir = export_delta_log(
        spark, t, checkpoint_interval=0, log_retention_versions=2
    )
    # no checkpoint -> nothing deletable (readers need the full chain)
    assert _jsons(log_dir) == list(range(6))
    assert read_delta_log(spark, str(t.path), version=1).count() == 4
    with pytest.raises(ValueError):
        export_delta_log(spark, t, log_retention_versions=0)


def test_log_retention_composes_with_incremental_resume(spark, tmp_path):
    """Per-micro-batch loop: export with retention after every commit —
    each call resumes from the exported log (checkpoint + kept tail),
    the JSON population stays bounded, and the streaming-writer txn
    high-water survives cleanup via the checkpoint's txn rows."""
    t = _mk(spark, tmp_path, "loop", commits=12)
    # a SetTransaction-carrying commit early in the log
    t.append(
        spark.range(500, 502).select(F.col("id").alias("k")).coalesce(1),
        operation="stream-b3",
        txn=("jobA", 3),
    )
    log_dir = export_delta_log(
        spark, t, checkpoint_interval=4, log_retention_versions=4
    )
    counts = []
    for i in range(10):
        t.append(
            spark.range(900 + i, 901 + i)
            .select(F.col("id").alias("k"))
            .coalesce(1)
        )
        export_delta_log(
            spark, t, checkpoint_interval=4, log_retention_versions=4
        )
        counts.append(len(list(log_dir.iterdir())))
    # bounded sawtooth (<= retention + interval + checkpoints + hint),
    # no growth across the loop
    assert max(counts) <= 12, counts
    assert max(counts[5:]) <= max(counts[:5]), counts
    got = sorted(r["k"] for r in read_delta_log(spark, str(t.path)).collect())
    want = sorted(r["k"] for r in t.snapshot().collect())
    assert got == want
    # txn high-water folded through checkpoints, not the deleted JSON
    assert replay_txn_high(str(t.path), "jobA") == 3
