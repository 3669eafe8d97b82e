"""Iceberg export snapshot expiration (round 9).

``export_iceberg_metadata(..., expire_keep_last=N /
expire_older_than_ms=ts)`` — Iceberg's expireSnapshots re-expressed
on the export side: without it the incremental exporter appends to
``snapshots[]``/``snapshot-log`` forever, so a per-micro-batch export
loop grows its metadata O(total commits). The keep set is
{current} ∪ {ref-reachable} ∪ {newest N} ∪ {newer than ts}; files
referenced only by expired snapshots are purged from metadata/ AFTER
the new metadata.json lands. Native data files are never touched.
"""
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


def _md(t) -> dict:
    return json.loads((t.path / "metadata" / "v1.metadata.json").read_text())


def _mk(spark, tmp_path, name, commits=8):
    t = LakehouseTable(spark, str(tmp_path / name))
    for i in range(commits):
        t.append(
            spark.range(i * 10, i * 10 + 3)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
        )
    return t


def test_expire_keep_last_bounds_metadata(spark, tmp_path):
    t = _mk(spark, tmp_path, "keepn", commits=8)
    export_iceberg_metadata(spark, t, expire_keep_last=3)
    md = _md(t)
    assert len(md["snapshots"]) == 3
    assert len(md["snapshot-log"]) == 3
    assert md["current-snapshot-id"] == _snapshot_id(7)
    # head scan unaffected; time travel inside the window works
    assert read_iceberg(spark, str(t.path)).count() == 24
    assert read_iceberg(spark, str(t.path), _snapshot_id(5)).count() == 18
    # time travel to an EXPIRED snapshot fails loudly, not StopIteration
    with pytest.raises(ValueError, match="expired"):
        read_iceberg(spark, str(t.path), _snapshot_id(1)).count()


def test_expire_preserves_ref_reachable_tags(spark, tmp_path):
    """Tags are refs: their snapshots never expire silently (Iceberg's
    rule) — a tagged ancient snapshot survives keep_last=2 and still
    time-travels, both by id and through the exported ref."""
    t = _mk(spark, tmp_path, "tagged", commits=6)
    t.tag("v1.0", version=1)
    export_iceberg_metadata(spark, t, expire_keep_last=2)
    md = _md(t)
    ids = {s["snapshot-id"] for s in md["snapshots"]}
    assert _snapshot_id(1) in ids  # tag-protected
    assert len(md["snapshots"]) == 3  # newest 2 + the tagged one
    assert md["refs"]["v1.0"] == {
        "snapshot-id": _snapshot_id(1),
        "type": "tag",
    }
    assert read_iceberg(spark, str(t.path), _snapshot_id(1)).count() == 6
    with pytest.raises(ValueError, match="expired"):
        read_iceberg(spark, str(t.path), _snapshot_id(2)).count()


def test_expire_purges_exclusively_referenced_files(spark, tmp_path):
    """Expired snapshots' manifest-lists (and manifests no kept
    snapshot reuses) leave metadata/; manifests REUSED by surviving
    snapshots stay; native data files are untouched."""
    t = _mk(spark, tmp_path, "purge", commits=6)
    meta_dir = export_iceberg_metadata(spark, t)
    md_full = _md(t)
    lists_before = {
        Path(s["manifest-list"]).name for s in md_full["snapshots"]
    }
    data_before = sorted((t.path / "data").rglob("*.parquet"))
    export_iceberg_metadata(spark, t, expire_keep_last=2)
    md = _md(t)
    lists_kept = {Path(s["manifest-list"]).name for s in md["snapshots"]}
    present = {p.name for p in meta_dir.iterdir()}
    # every expired manifest-list is gone; kept ones remain
    assert not (lists_before - lists_kept) & present
    assert lists_kept <= present
    # append-only history: the head snapshot reuses EVERY old
    # manifest, so no manifest .avro may have been deleted
    assert read_iceberg(spark, str(t.path)).count() == 18
    assert sorted((t.path / "data").rglob("*.parquet")) == data_before


def test_expire_purges_dead_delete_parquets(spark, tmp_path):
    """A position-delete parquet owned only by expired snapshots (its
    delete manifest died with them — a later restate started a fresh
    manifest set) is purged; the post-restate read is unaffected."""
    t = _mk(spark, tmp_path, "dvpurge", commits=3)
    t.delete_where_dv("k = 11")  # v3: DV commit -> delete parquet
    t.delete_where("k % 10 = 2")  # v4: restate -> fresh manifest set
    t.append(spark.range(100, 103).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))  # v5
    meta_dir = export_iceberg_metadata(spark, t)
    dels_before = {p.name for p in meta_dir.glob("delete-*.parquet")}
    assert dels_before, "test needs a position-delete parquet"
    export_iceberg_metadata(spark, t, expire_keep_last=2)  # keep v4, v5
    dels_after = {p.name for p in meta_dir.glob("delete-*.parquet")}
    assert not dels_after  # exclusively pre-restate: purged
    got = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    want = sorted(r["k"] for r in t.snapshot().collect())
    assert got == want


def test_expire_composes_with_incremental_resume(spark, tmp_path):
    """Per-micro-batch loop: export(expire_keep_last=3) after every
    commit — each call RESUMES (head manifest reuse intact, no
    degrade-to-full-rewrite) and the snapshot count stays pinned at 3
    while the table grows; older_than_ms composes via union."""
    t = _mk(spark, tmp_path, "loop", commits=3)
    export_iceberg_metadata(spark, t, expire_keep_last=3)
    sizes = []
    for i in range(5):
        t.append(
            spark.range(1000 + i, 1001 + i)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
        )
        export_iceberg_metadata(spark, t, expire_keep_last=3)
        md = _md(t)
        sizes.append(len((t.path / "metadata" / "v1.metadata.json").read_bytes()))
        assert len(md["snapshots"]) == 3
        assert md["current-snapshot-id"] == _snapshot_id(t.latest_version())
    assert max(sizes) - min(sizes) < 500  # bounded, not O(commits)
    assert read_iceberg(spark, str(t.path)).count() == 14
    # older_than in the future + keep_last=1 -> keep set is the union:
    # current only (no refs) — still reads, still resumes
    export_iceberg_metadata(
        spark, t, expire_keep_last=1,
        expire_older_than_ms=2**62,
    )
    assert len(_md(t)["snapshots"]) == 1
    assert read_iceberg(spark, str(t.path)).count() == 14
    with pytest.raises(ValueError):
        export_iceberg_metadata(spark, t, expire_keep_last=0)


def test_expire_composes_with_native_log_retention(spark, tmp_path):
    """r10 verdict #6: BOTH lifecycles delete state — export-side
    expiration prunes snapshots while NATIVE clean_log reclaims commit
    JSONs. Composed per-micro-batch loop (commit → checkpoint →
    clean_log → export+expire): every export must resume O(tail) from
    the EXPORTED metadata and never emit a gap (cold read == native
    snapshot after every call). When the native log is cleaned PAST
    the export's resume cursor the exporter must degrade LOUDLY
    (LogRetentionError recipe) and leave the previously exported
    metadata intact and readable — never a silently shortened chain."""
    from lakehouse_test_spark.plans.lakehouse import LogRetentionError

    t = _mk(spark, tmp_path, "bothlife", commits=4)
    export_iceberg_metadata(spark, t, expire_keep_last=2)
    for i in range(6):
        t.append(
            spark.range(2000 + i, 2001 + i)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
        )
        t.checkpoint()
        # cutoff lands at head-1 = the resume cursor's window floor:
        # the tightest clean that keeps the resume legal
        t.clean_log(keep_versions=2)
        export_iceberg_metadata(spark, t, expire_keep_last=2)
        md = _md(t)
        assert len(md["snapshots"]) == 2
        assert md["current-snapshot-id"] == _snapshot_id(t.latest_version())
        got = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
        assert got == sorted(r["k"] for r in t.snapshot().collect())
    last_good = read_iceberg(spark, str(t.path)).count()
    # lagging resume: 5 unexported commits, then clean past the cursor
    for i in range(5):
        t.append(
            spark.range(3000 + i, 3001 + i)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
        )
    t.checkpoint()
    t.clean_log(keep_versions=1)
    with pytest.raises(LogRetentionError, match="fresh snapshot"):
        export_iceberg_metadata(spark, t, expire_keep_last=2)
    # the exported chain is untouched by the failed call: still
    # cold-readable at its last exported head
    assert read_iceberg(spark, str(t.path)).count() == last_good


def test_compact_manifests_merges_head_list(spark, tmp_path):
    """compact_manifests_above=N (rewrite_manifests analog): the head
    snapshot's data manifests merge into one per partition spec —
    entries verbatim (original snapshot_id + per-entry sequence
    numbers), head scan and DV subtraction unchanged, older snapshots
    still time-travel through their ORIGINAL manifests."""
    from lakehouse_test_spark.plans.iceberg_export import (
        CONTENT_DATA,
        read_ocf,
    )

    t = _mk(spark, tmp_path, "compact", commits=6)
    t.delete_where_dv("k = 11")
    export_iceberg_metadata(spark, t, compact_manifests_above=3)
    md = _md(t)
    head = max(md["snapshots"], key=lambda s: s["snapshot-id"])
    _, _, mlist = read_ocf(Path(head["manifest-list"]))
    data_m = [m for m in mlist if m.get("content", 0) == CONTENT_DATA]
    assert len(data_m) == 1  # one spec -> one merged manifest
    # merged manifest: EXISTING entries, original seq preserved,
    # min_sequence_number reflects the OLDEST entry
    _, _, entries = read_ocf(Path(data_m[0]["manifest_path"]))
    assert len(entries) == 6
    assert {e["status"] for e in entries} == {0}  # ST_EXISTING
    assert sorted(e["sequence_number"] for e in entries) == list(range(1, 7))
    assert data_m[0]["min_sequence_number"] == 1
    got = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    want = sorted(r["k"] for r in t.snapshot().collect())
    assert got == want and 11 not in got
    # an older snapshot still reads through its original manifests
    assert read_iceberg(spark, str(t.path), _snapshot_id(2)).count() == 9


def test_compact_plus_expire_bounds_metadata_dir(spark, tmp_path):
    """Retention + compaction together: a per-commit export loop keeps
    the WHOLE metadata/ population pinned — snapshots by keep_last,
    manifests by the compaction threshold (old manifests leave as
    their snapshots expire) — while head reads stay correct and each
    call still RESUMES incrementally."""
    t = _mk(spark, tmp_path, "bounded", commits=4)
    export_iceberg_metadata(
        spark, t, expire_keep_last=2, compact_manifests_above=4
    )
    meta_dir = t.path / "metadata"
    counts = []
    for i in range(8):
        t.append(
            spark.range(2000 + i, 2001 + i)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
        )
        export_iceberg_metadata(
            spark, t, expire_keep_last=2, compact_manifests_above=4
        )
        counts.append(len(list(meta_dir.iterdir())))
        assert len(_md(t)["snapshots"]) == 2
    # bounded sawtooth, not O(commits): manifests accumulate to the
    # threshold then merge; the dir never exceeds its steady-state
    # envelope and the second half shows no growth over the first
    assert max(counts) <= 12, counts  # keep_last=2 + threshold=4 envelope
    assert max(counts[4:]) <= max(counts[:4]), counts
    assert read_iceberg(spark, str(t.path)).count() == 20
    got = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    want = sorted(r["k"] for r in t.snapshot().collect())
    assert got == want


def test_compact_merges_delete_manifests(spark, tmp_path):
    """A CDC-heavy table accretes one delete manifest per DV commit;
    compaction merges them into ONE (entries verbatim — per-entry
    sequence numbers preserved, so delete application is unchanged)
    and the head read still subtracts every deletion."""
    from lakehouse_test_spark.plans.iceberg_export import (
        CONTENT_DELETES,
        read_ocf,
    )

    t = _mk(spark, tmp_path, "dvmerge", commits=3)
    t.delete_where_dv("k = 1")   # v3
    t.delete_where_dv("k = 10")  # v4
    t.delete_where_dv("k = 21")  # v5
    export_iceberg_metadata(spark, t, compact_manifests_above=2)
    md = _md(t)
    head = max(md["snapshots"], key=lambda s: s["snapshot-id"])
    _, _, mlist = read_ocf(Path(head["manifest-list"]))
    dels = [m for m in mlist if m.get("content") == CONTENT_DELETES]
    assert len(dels) == 1  # merged
    _, _, entries = read_ocf(Path(dels[0]["manifest_path"]))
    live = [e for e in entries if e["status"] != 2]
    assert len(live) == 3
    # per-entry sequence numbers preserved (v3..v5 -> seq 4..6)
    assert sorted(e["sequence_number"] for e in live) == [4, 5, 6]
    assert dels[0]["min_sequence_number"] == 4
    got = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    want = sorted(r["k"] for r in t.snapshot().collect())
    assert got == want
    assert {1, 10, 21}.isdisjoint(got)
    # incremental resume after the merge stays clean and correct
    t.append(spark.range(500, 502).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    export_iceberg_metadata(spark, t, compact_manifests_above=2)
    got2 = sorted(r["k"] for r in read_iceberg(spark, str(t.path)).collect())
    want2 = sorted(r["k"] for r in t.snapshot().collect())
    assert got2 == want2


def test_remove_orphans_sweeps_crash_residue(spark, tmp_path):
    """iceberg_remove_orphans (removeOrphanFiles analog): files no
    snapshot references — the residue of a crash between the atomic
    metadata replace and the deferred purge — are swept; everything
    referenced, the metadata pair, and YOUNG files (in-flight export
    protection) survive; reads are unchanged."""
    import os
    import time

    from lakehouse_test_spark.plans.iceberg_export import (
        iceberg_remove_orphans,
        read_ocf,
    )

    t = _mk(spark, tmp_path, "orphans", commits=4)
    meta_dir = export_iceberg_metadata(spark, t)
    # crash residue: stray manifest-list-like and manifest-like files
    old = meta_dir / "deadbeef-m0.avro"
    old.write_bytes(b"Obj\x01junk")
    young = meta_dir / "cafebabe-m0.avro"
    young.write_bytes(b"Obj\x01junk")
    past = time.time() - 7200
    os.utime(old, (past, past))  # old enough to sweep
    before = {p.name for p in meta_dir.iterdir()}
    deleted = iceberg_remove_orphans(str(t.path), older_than_s=3600)
    assert [Path(d).name for d in deleted] == ["deadbeef-m0.avro"]
    after = {p.name for p in meta_dir.iterdir()}
    assert before - after == {"deadbeef-m0.avro"}
    assert "cafebabe-m0.avro" in after  # young: in-flight protection
    assert read_iceberg(spark, str(t.path)).count() == 12
    # a second sweep with zero age removes the young junk too, but
    # NOTHING referenced: every manifest-list/manifest/delete parquet
    # of the live metadata survives byte-identical
    md = _md(t)
    lists = {Path(s["manifest-list"]).name for s in md["snapshots"]}
    refs = set(lists)
    for s in md["snapshots"]:
        for m in read_ocf(Path(s["manifest-list"]))[2]:
            refs.add(Path(m["manifest_path"]).name)
    iceberg_remove_orphans(str(t.path), older_than_s=0)
    after2 = {p.name for p in meta_dir.iterdir()}
    assert refs <= after2
    assert "cafebabe-m0.avro" not in after2
    assert read_iceberg(spark, str(t.path)).count() == 12


def test_expire_skips_purge_when_kept_list_unreadable(spark, tmp_path):
    """r9 ADVICE (medium): a read failure on a KEPT snapshot's
    manifest-list must disable the purge entirely — the referenced
    set is incomplete, and purging against it would unlink manifests
    shared with expired snapshots, breaking time travel to a RETAINED
    snapshot. The expiration itself (metadata replace) still lands;
    the unreclaimed files are remove_orphans' job."""
    t = _mk(spark, tmp_path, "keptcorrupt", commits=6)
    meta_dir = export_iceberg_metadata(spark, t)
    md_full = _md(t)
    # corrupt the manifest-list of a snapshot that will be KEPT but is
    # NOT the head (the head's list is re-read by the resume path,
    # which degrades to a full rewrite on damage — a separate,
    # already-tested recovery; the purge walk is what reads the
    # second-newest kept list)
    kept_list = Path(md_full["snapshots"][-2]["manifest-list"])
    kept_list.write_bytes(b"Obj\x01truncated-junk")
    before = {p.name for p in meta_dir.iterdir()}
    export_iceberg_metadata(spark, t, expire_keep_last=2)
    md = _md(t)
    assert len(md["snapshots"]) == 2  # expiration semantics intact
    after = {p.name for p in meta_dir.iterdir()}
    # purge disabled: nothing was unlinked (metadata.json rewritten,
    # but no .avro/.parquet vanished)
    gone = {n for n in before - after if n.endswith((".avro", ".parquet"))}
    assert gone == set(), gone
