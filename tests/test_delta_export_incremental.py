"""Incremental Delta export: a second export_delta_log call generates
only the commits past the exported head (state reconstructed from the
exported log), leaving earlier action files untouched — the per-call
cost a streaming table actually needs. Fingerprint changes (ALTERs)
and identity columns fall back to the full rewrite; a DV feature
appearing after the first export rides a protocol-UPGRADE action."""
from __future__ import annotations

import json

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.delta_export import (
    export_delta_log,
    read_delta_log,
    replay_txn_high,
)
from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _t(spark, tmp_path, name="t"):
    t = LakehouseTable(spark, str(tmp_path / name))
    t.append(spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    t.append(spark.range(3, 6).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    return t


def test_incremental_export_appends_only_new_commits(spark, tmp_path):
    t = _t(spark, tmp_path)
    log_dir = export_delta_log(spark, t)
    before = {
        p.name: p.read_text() for p in log_dir.glob("*.json") if p.stem.isdigit()
    }
    assert set(before) == {f"{0:020d}.json", f"{1:020d}.json"}
    t.append(spark.range(6, 9).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    t.append(spark.range(9, 12).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    export_delta_log(spark, t)
    after = {
        p.name: p.read_text() for p in log_dir.glob("*.json") if p.stem.isdigit()
    }
    assert set(after) == {f"{v:020d}.json" for v in range(4)}
    # earlier commits byte-identical: they were NOT regenerated
    for name, text in before.items():
        assert after[name] == text, f"{name} was rewritten"
    got = read_delta_log(spark, str(t.path))
    assert got.count() == 12
    assert got.exceptAll(t.snapshot()).count() == 0
    # exporting again with no new commits is a no-op
    export_delta_log(spark, t)
    assert {p.name for p in log_dir.glob("*.json") if p.stem.isdigit()} == set(after)


def test_incremental_export_dv_appears_as_protocol_upgrade(spark, tmp_path):
    t = _t(spark, tmp_path)
    log_dir = export_delta_log(spark, t)
    v0 = (log_dir / f"{0:020d}.json").read_text()
    assert "deletionVectors" not in v0
    t.delete_where_dv("k < 2")  # first DV AFTER the export
    export_delta_log(spark, t)
    # v0 untouched; the DV commit carries the protocol upgrade
    assert (log_dir / f"{0:020d}.json").read_text() == v0
    v2 = (log_dir / f"{2:020d}.json").read_text()
    assert "deletionVectors" in v2 and '"protocol"' in v2
    got = read_delta_log(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == [2, 3, 4, 5]


def test_incremental_export_txn_and_checkpoint_state_carry(spark, tmp_path):
    """Txn high-waters reconstructed from the exported log survive an
    incremental re-export across a checkpoint boundary."""
    t = _t(spark, tmp_path)
    df = spark.range(1).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    for b in range(4):
        t.append(df, operation=f"ing-b{b}", txn=("ing", b))
    export_delta_log(spark, t, checkpoint_interval=4)
    assert replay_txn_high(str(t.path), "ing") == 3
    for b in range(4, 12):
        t.append(df, operation=f"ing-b{b}", txn=("ing", b))
    export_delta_log(spark, t, checkpoint_interval=4)
    assert replay_txn_high(str(t.path), "ing") == 11
    got = read_delta_log(spark, str(t.path))
    assert got.count() == 6 + 12


def test_alter_after_export_falls_back_to_full_rewrite(spark, tmp_path):
    t = _t(spark, tmp_path)
    log_dir = export_delta_log(spark, t)
    v0 = (log_dir / f"{0:020d}.json").read_text()
    t.rename_column("v", "v_usd")
    t.append(
        spark.range(6, 8).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v_usd")
        )
    )
    export_delta_log(spark, t)
    # fingerprint changed: v0 regenerated (columnMapping config now)
    v0b = (log_dir / f"{0:020d}.json").read_text()
    assert v0b != v0 and "columnMapping" in v0b
    got = read_delta_log(spark, str(t.path))
    assert "v_usd" in got.columns
    assert got.count() == 8


def test_resume_stamp_is_delta_inert(spark, tmp_path):
    """The lakehouseExport stamp rides in commitInfo — action replay
    (adds/removes/metaData/txn) never sees it."""
    t = _t(spark, tmp_path)
    log_dir = export_delta_log(spark, t)
    head = json.loads(
        (log_dir / f"{1:020d}.json").read_text().splitlines()[-1]
    )
    assert "lakehouseExport" in head["commitInfo"]
    assert read_delta_log(spark, str(t.path)).count() == 6


def test_resume_reconstructs_dv_state_from_checkpoint(spark, tmp_path):
    """Resume state includes cumulative DV positions recovered from
    the exported adds' inline descriptors (checkpoint + tail), so a
    SECOND DV commit after the resume exports the union, not just its
    own positions."""
    t = _t(spark, tmp_path)  # 6 rows across 2 commits
    t.delete_where_dv("k = 0")  # v2
    t.append(spark.range(6, 8).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))  # v3
    export_delta_log(spark, t, checkpoint_interval=2)  # ckpt at v2
    t.delete_where_dv("k = 1")  # v4: second DV on the SAME base file
    export_delta_log(spark, t, checkpoint_interval=2)
    got = read_delta_log(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == [2, 3, 4, 5, 6, 7]
    assert got.exceptAll(t.snapshot()).count() == 0
