"""Incremental Iceberg export: a re-export writes manifests only for
commits past the exported head (old manifest .avro files reused
byte-identical); retroactive metadata changes (rename/drop/widen)
fall back to the full rewrite; spec evolution and tags stay
incremental."""
from __future__ import annotations

import json
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.iceberg_export import (
    export_iceberg_metadata,
    read_iceberg,
    _snapshot_id,
)
from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _t(spark, tmp_path, name="t"):
    t = LakehouseTable(spark, str(tmp_path / name))
    t.append(spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    t.append(spark.range(3, 6).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    return t


def _avro_state(meta_dir: Path) -> dict[str, float]:
    return {
        p.name: p.stat().st_mtime_ns
        for p in meta_dir.glob("*.avro")
    }


def test_incremental_iceberg_export_reuses_manifests(spark, tmp_path):
    t = _t(spark, tmp_path)
    meta_dir = export_iceberg_metadata(spark, t)
    before = _avro_state(meta_dir)
    t.append(spark.range(6, 9).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    t.delete_where_dv("k = 7")
    export_iceberg_metadata(spark, t)
    after = _avro_state(meta_dir)
    # every pre-existing manifest/list file untouched
    for name, mtime in before.items():
        assert after[name] == mtime, f"{name} was rewritten"
    assert len(after) > len(before)
    got = read_iceberg(spark, str(t.path))
    assert got.exceptAll(t.snapshot()).count() == 0
    assert t.snapshot().exceptAll(got).count() == 0
    # time travel across the incremental boundary
    old = read_iceberg(spark, str(t.path), _snapshot_id(1))
    assert old.count() == 6
    # no new commits: manifests untouched, but metadata.json is still
    # refreshed — a TAG carries no commit yet must reach the refs
    t.tag("release-1")
    state = _avro_state(meta_dir)
    export_iceberg_metadata(spark, t)
    assert _avro_state(meta_dir) == state  # zero manifest work
    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert md["refs"]["release-1"]["type"] == "tag"
    assert read_iceberg(spark, str(t.path), ref="release-1").count() == 9 - 1


def test_incremental_iceberg_partial_rewrite_relists_survivors(spark, tmp_path):
    """A compact_files commit AFTER the first export re-lists the
    surviving entries from reconstructed state (RewriteManifests)."""
    t = _t(spark, tmp_path)
    export_iceberg_metadata(spark, t)
    t.append(spark.range(6, 9).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    first_files = t.history()[0].files
    t.compact_files(list(first_files))
    export_iceberg_metadata(spark, t)
    got = read_iceberg(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == list(range(9))


def test_rename_after_export_falls_back_to_full_rewrite(spark, tmp_path):
    t = _t(spark, tmp_path)
    meta_dir = export_iceberg_metadata(spark, t)
    before = _avro_state(meta_dir)
    t.rename_column("v", "v_usd")
    export_iceberg_metadata(spark, t)
    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    assert any(e["names"][0] == "v_usd" for e in nm)
    # full rewrite regenerated the manifest set
    after = _avro_state(meta_dir)
    assert not (set(before) & set(after))
    got = read_iceberg(spark, str(t.path))
    assert "v_usd" in got.columns and got.count() == 6


def test_spec_evolution_stays_incremental(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "spec"))
    rows = [(i, f"2024-{(i % 3) + 1:02d}-05", float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, d string, v double").withColumn(
        "d", F.to_date("d")
    )
    t.append(df.where("id < 6"))
    meta_dir = export_iceberg_metadata(spark, t)
    before = _avro_state(meta_dir)
    t.set_partition_spec(["month(d)"])
    t.append_partitioned(df.where("id >= 6"))
    export_iceberg_metadata(spark, t)
    after = _avro_state(meta_dir)
    for name, mtime in before.items():
        assert after[name] == mtime, f"{name} was rewritten"
    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert len(md["partition-specs"]) == 2
    got = read_iceberg(spark, str(t.path))
    assert got.count() == 12


def test_damaged_resume_state_degrades_to_full_rewrite(spark, tmp_path):
    """Resume reconstruction reads the exported manifest-list by its
    stored ABSOLUTE path; if that file is gone (table copied/moved,
    metadata dir partially damaged), export must degrade to the
    full-rewrite path — same as a fingerprint mismatch — not crash."""
    t = _t(spark, tmp_path, "damaged")
    meta_dir = export_iceberg_metadata(spark, t)
    # simulate damage: delete the head snapshot's manifest-list file
    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    head = max(md["snapshots"], key=lambda s: s["snapshot-id"])
    Path(head["manifest-list"]).unlink()
    t.append(
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
    )
    export_iceberg_metadata(spark, t)  # must not raise
    got = read_iceberg(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == list(range(9))
    # time travel over the rewritten export still works
    assert read_iceberg(spark, str(t.path), _snapshot_id(1)).count() == 6


def test_resumed_export_never_reads_full_history(spark, tmp_path):
    """O(tail) resume (round 8): a clean incremental call reads only
    commits past the exported head — table.history() (the full-log
    parse) must never run; the schema lineage resumes from the
    exported metadata + the persisted fold state."""
    from unittest import mock

    t = _t(spark, tmp_path, "otail")
    for i in range(10):  # cross the v10 auto-checkpoint: snapshot
        t.append(  # planning itself must be checkpoint-backed too
            spark.range(10 + i, 11 + i).select(
                F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
            )
        )
    meta_dir = export_iceberg_metadata(spark, t)
    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert "lakehouse.export-schema-state" in md["properties"]
    t.append(
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
    )
    before = _avro_state(meta_dir)
    with mock.patch.object(
        type(t), "history", side_effect=AssertionError("full-log parse")
    ):
        export_iceberg_metadata(spark, t)
    after = _avro_state(meta_dir)
    for name, mtime in before.items():
        assert after[name] == mtime, f"{name} was rewritten"
    got = read_iceberg(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == list(range(9)) + list(
        range(10, 20)
    )
    # the schema lineage survives the resumed fold byte-for-byte
    md2 = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert md2["schemas"] == md["schemas"]


def test_resumed_export_schema_lineage_additive_evolution(spark, tmp_path):
    """A NEW column added in the tail (additive evolution keeps the
    fingerprint, so the export resumes) mints a new schema-id in the
    resumed fold; old snapshots keep theirs; the exported lineage
    equals a from-scratch rewrite's."""
    import shutil as _sh

    t = _t(spark, tmp_path, "lineage")
    meta_dir = export_iceberg_metadata(spark, t)
    t.append(
        spark.range(6, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            (F.col("id") * 10).alias("extra"),
        )
    )
    export_iceberg_metadata(spark, t)  # resumed
    md_inc = json.loads((meta_dir / "v1.metadata.json").read_text())
    _sh.rmtree(meta_dir)
    export_iceberg_metadata(spark, t)  # from scratch
    md_full = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert md_inc["schemas"] == md_full["schemas"]
    assert md_inc["current-schema-id"] == md_full["current-schema-id"]
    assert {
        s["snapshot-id"]: s.get("schema-id") for s in md_inc["snapshots"]
    } == {
        s["snapshot-id"]: s.get("schema-id") for s in md_full["snapshots"]
    }
    got = read_iceberg(spark, str(t.path))
    assert got.count() == 8 and "extra" in got.columns


def test_degrade_rewrite_defers_destroying_prior_export(spark, tmp_path):
    """A degrade-to-full-rewrite must NOT rmtree the existing (valid!)
    export before the rewrite lands: a crash mid-rewrite — or a
    concurrent external reader — must still find a parseable
    metadata.json pointing at intact manifests. The superseded files
    are purged only AFTER the new metadata.json atomically replaces
    the old one (r8 ADVICE)."""
    from unittest import mock

    import lakehouse_test_spark.plans.iceberg_export as ice

    t = _t(spark, tmp_path, "deferred")
    meta_dir = export_iceberg_metadata(spark, t)
    old_md = (meta_dir / "v1.metadata.json").read_text()
    old_rows = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    # force the truncated-manifest degrade path on the next export
    md = json.loads(old_md)
    head = max(md["snapshots"], key=lambda s: s["snapshot-id"])
    ml = Path(head["manifest-list"])
    ml.write_bytes(ml.read_bytes()[:40])  # valid magic, truncated body
    t.append(
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
    )
    # crash the rewrite mid-commit-loop: the OCF writer dies
    with mock.patch.object(
        ice, "write_ocf", side_effect=OSError("disk gone")
    ):
        with pytest.raises(OSError, match="disk gone"):
            export_iceberg_metadata(spark, t)
    # the PRIOR export is untouched: metadata.json parses and every
    # manifest it references (except the one WE truncated) is intact
    survivor = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert survivor == json.loads(old_md)
    for s in survivor["snapshots"]:
        if s["manifest-list"] != str(ml):
            assert Path(s["manifest-list"]).exists()
    # a clean re-export completes, reads correctly, and purges the
    # superseded files (only the new export's uuid-named files remain)
    before = {p.name for p in meta_dir.iterdir()}
    export_iceberg_metadata(spark, t)
    got = read_iceberg(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == list(range(9))
    after = {p.name for p in meta_dir.iterdir()}
    stale_kept = (before & after) - {"v1.metadata.json", "version-hint.text"}
    assert not stale_kept, stale_kept
    assert old_rows == list(range(6))
