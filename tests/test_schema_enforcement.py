"""Write-time schema enforcement + empty-overwrite truncate +
verify() schema-poisoning detection — the three r5-judge bugs, pinned.

A type-conflicting append must raise BEFORE any commit lands (Delta's
write-path contract); an empty-DataFrame overwrite must TRUNCATE (new
version, zero rows, time travel intact); and ``verify()`` must flag a
table whose live files carry irreconcilable schemas.
"""
from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import Commit, LakehouseTable


def _t(spark, tmp_path, name="t"):
    return LakehouseTable(spark, str(tmp_path / name))


# ---------------------------------------------------------------------------
# 1. type-conflicting append raises pre-commit, table unchanged
# ---------------------------------------------------------------------------


def test_append_type_conflict_raises_precommit(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")))
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="schema enforcement"):
        t.append(bad)
    # nothing committed, table still fully readable
    assert t.latest_version() == 0
    assert t.snapshot().count() == 5
    assert dict(t.snapshot().dtypes)["v"] == "bigint"


def test_append_additive_and_widening_still_allowed(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").alias("k"), F.col("id").cast("int").alias("v")))
    # additive new column: fine
    t.append(
        spark.range(2).select(
            F.col("id").alias("k"),
            F.col("id").cast("int").alias("v"),
            F.lit("x").alias("extra"),
        )
    )
    # WIDER incoming type (int table, bigint frame): rejected with a
    # widen_column hint (Spark's strict mergeSchema cannot merge them)
    with pytest.raises(ValueError, match="widen_column"):
        t.append(spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("v")))
    t.widen_column("v", "bigint")
    t.append(spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("v")))
    assert t.snapshot().count() == 7
    assert dict(t.snapshot().dtypes)["v"] == "bigint"
    # NARROWER incoming type upcasts at write (Delta's safe cast)
    t.append(
        spark.range(2).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("v")
        )
    )
    assert t.snapshot().count() == 9
    assert dict(t.snapshot().dtypes)["v"] == "bigint"


def test_append_partitioned_type_conflict_raises(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.set_partition_spec(["k"])
    t.append_partitioned(
        spark.range(4).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    )
    with pytest.raises(ValueError, match="schema enforcement"):
        t.append_partitioned(
            spark.range(2).select(
                (F.col("id") % 2).alias("k"),
                F.col("id").cast("string").alias("v"),
            )
        )
    assert t.latest_version() == 0


def test_branch_append_type_conflict_raises(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v")))
    t.create_branch("wap")
    with pytest.raises(ValueError, match="schema enforcement"):
        t.branch_append(
            "wap",
            spark.range(2).select(
                F.col("id").alias("k"), F.col("id").cast("string").alias("v")
            ),
        )


def test_datasource_append_type_conflict_raises_driver_side(spark, tmp_path):
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = _t(spark, tmp_path)
    t.append(spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")))
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(Exception, match="schema enforcement"):
        bad.write.format("lakehouse").option("path", str(t.path)).mode(
            "append"
        ).save()
    assert t.latest_version() == 0
    assert t.snapshot().count() == 5


def test_enforcement_respects_declared_widening(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").cast("int").alias("v")))
    t.widen_column("v", "bigint")
    t.append(spark.range(2).select(F.col("id").alias("v")))  # bigint in
    assert dict(t.snapshot().dtypes)["v"] == "bigint"
    assert t.snapshot().count() == 5


def test_widen_int_to_decimal(spark, tmp_path):
    """Delta typeWidening's integer→decimal promotion as pure
    metadata: INT32/INT64 vintages read into the decimal column at
    scan; insufficient integral headroom is rejected at declaration."""
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").cast("int").alias("v")))
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("v", "decimal(9,2)")  # p-s < 10: int range lost
    t.widen_column("v", "decimal(12,2)")
    t.append(
        spark.range(3, 5).select(F.col("id").cast("decimal(12,2)").alias("v"))
    )
    snap = t.snapshot()
    assert dict(snap.dtypes)["v"] == "decimal(12,2)"
    assert snap.count() == 5
    assert {str(r["v"]) for r in snap.collect()} == {
        "0.00", "1.00", "2.00", "3.00", "4.00",
    }
    # bigint needs p-s >= 20
    u = _t(spark, tmp_path, "u")
    u.append(spark.range(3).select(F.col("id").alias("v")))
    with pytest.raises(ValueError, match="lossless"):
        u.widen_column("v", "decimal(18,0)")
    u.widen_column("v", "decimal(22,2)")
    assert dict(u.snapshot().dtypes)["v"] == "decimal(22,2)"
    # enforcement composes: an int frame upcasts into the decimal table
    t.append(spark.range(5, 6).select(F.col("id").cast("int").alias("v")))
    assert t.snapshot().count() == 6
    assert t.verify()["ok"]


def test_enforcement_after_rename(spark, tmp_path):
    """The guard compares PHYSICAL names: a renamed column's conflict
    is still caught (incoming frame carries the logical name)."""
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").alias("a")))
    t.rename_column("a", "b")
    with pytest.raises(ValueError, match="schema enforcement"):
        t.append(spark.range(2).select(F.col("id").cast("string").alias("b")))
    t.append(spark.range(2).select(F.col("id").alias("b")))
    assert t.snapshot().count() == 5


# ---------------------------------------------------------------------------
# 2. empty-DataFrame overwrite truncates (new version, schema kept)
# ---------------------------------------------------------------------------


def test_empty_overwrite_truncates(spark, tmp_path):
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = _t(spark, tmp_path)
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.append(df)
    assert t.snapshot().count() == 10
    df.limit(0).write.format("lakehouse").option("path", str(t.path)).mode(
        "overwrite"
    ).save()
    # a NEW truncating version landed
    assert t.latest_version() == 1
    empty = t.snapshot()
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v"}
    # time travel still sees the old data
    assert t.snapshot(version=0).count() == 10
    # the datasource read path agrees
    ds = spark.read.format("lakehouse").option("path", str(t.path)).load()
    assert ds.count() == 0
    assert set(ds.columns) == {"k", "v"}
    # and appends after the truncate work
    t.append(df.limit(3))
    assert t.snapshot().count() == 3


def test_empty_append_still_noop(spark, tmp_path):
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = _t(spark, tmp_path)
    df = spark.range(4).select(F.col("id").alias("k"))
    t.append(df)
    # empty APPEND commits nothing (side-by-side with overwrite above)
    df.limit(0).write.format("lakehouse").option("path", str(t.path)).mode(
        "append"
    ).save()
    assert t.latest_version() == 0
    assert t.snapshot().count() == 4


def test_truncate_then_export_replays_empty(spark, tmp_path):
    """Interplay: a truncated table exports and replays as an EMPTY
    table (schema intact) through BOTH external-reader paths, and
    time travel to the pre-truncate version still replays the rows."""
    from lakehouse_test_spark.plans.delta_export import (
        export_delta_log,
        read_delta_log,
    )
    from lakehouse_test_spark.plans.iceberg_export import (
        _snapshot_id,
        export_iceberg_metadata,
        read_iceberg,
    )
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = _t(spark, tmp_path)
    df = spark.range(6).select(F.col("id").alias("k"))
    t.append(df)
    df.limit(0).write.format("lakehouse").option("path", str(t.path)).mode(
        "overwrite"
    ).save()
    export_delta_log(spark, t)
    head = read_delta_log(spark, str(t.path))
    assert head.count() == 0 and head.columns == ["k"]
    assert read_delta_log(spark, str(t.path), version=0).count() == 6
    export_iceberg_metadata(spark, t)
    ihead = read_iceberg(spark, str(t.path))
    assert ihead.count() == 0 and ihead.columns == ["k"]
    assert read_iceberg(spark, str(t.path), snapshot_id=_snapshot_id(0)).count() == 6


def test_datasource_publish_rebases_on_version_race(spark, tmp_path, monkeypatch):
    """A concurrent commit landing between the DataSource writer's
    version resolution and its publish must REBASE the append (Delta
    conflict matrix: appends commute), not fail the job. Driven at
    the _WriterState level (the DataSource driver-side commit path)
    with the race injected deterministically into _publish."""
    import pyarrow as pa

    from lakehouse_test_spark.sources.lakehouse_datasource import _WriterState

    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").alias("v")))
    schema = spark.range(1).select(F.col("id").alias("v")).schema
    st = _WriterState({"path": str(t.path)}, False, schema)
    msg = st.write_batches(
        iter([pa.record_batch([pa.array([10, 11], pa.int64())], names=["v"])])
    )

    orig = LakehouseTable._publish
    state = {"raced": False}

    def racing(self, commit):
        if not state["raced"]:
            state["raced"] = True
            LakehouseTable(spark, str(self.path)).append(
                spark.range(100, 102).select(F.col("id").alias("v"))
            )
        return orig(self, commit)

    monkeypatch.setattr(LakehouseTable, "_publish", racing)
    st.publish([msg], operation="append", restate=False)
    monkeypatch.setattr(LakehouseTable, "_publish", orig)
    assert state["raced"]
    vals = sorted(r["v"] for r in t.snapshot().collect())
    assert vals == [0, 1, 2, 10, 11, 100, 101]
    versions = [c.version for c in t.history()]
    assert versions == list(range(len(versions)))  # gap-free chain
    # a RESTATE racing the same way must refuse (never silently drop
    # the concurrent commit's rows)
    st2 = _WriterState({"path": str(t.path)}, True, schema)
    msg2 = st2.write_batches(
        iter([pa.record_batch([pa.array([7], pa.int64())], names=["v"])])
    )
    state["raced"] = False
    monkeypatch.setattr(LakehouseTable, "_publish", racing)
    from lakehouse_test_spark.plans.lakehouse import (
        ConcurrentModificationError,
    )

    with pytest.raises(ConcurrentModificationError):
        st2.publish([msg2], operation="overwrite", restate=True)


# ---------------------------------------------------------------------------
# 3. verify() detects schema poisoning
# ---------------------------------------------------------------------------


def test_verify_flags_poisoned_table(spark, tmp_path):
    """Forge the corruption bug #2 used to produce (a committed
    type-conflicting file) by writing the commit JSON directly —
    the write paths now refuse, but fsck must still catch tables
    poisoned by older/foreign writers."""
    t = _t(spark, tmp_path)
    t.append(spark.range(5).select(F.col("id").alias("v")))
    # forge a conflicting commit the way a buggy writer would
    bad_dir = t.path / "data" / "poison"
    spark.range(3).select(F.col("id").cast("string").alias("v")).write.parquet(
        str(bad_dir)
    )
    files = sorted(
        str(p.relative_to(t.path)) for p in bad_dir.glob("part-*.parquet")
    )
    c = Commit(version=1, files=files, row_count=3, operation="append")
    (t.log_dir / f"{1:020d}.json").write_text(json.dumps(c.__dict__))
    rep = t.verify()
    assert not rep["ok"]
    assert any("schema poisoning" in e and "v" in e for e in rep["errors"])


def test_verify_clean_on_healthy_evolved_table(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.range(3).select(F.col("id").cast("int").alias("v")))
    t.widen_column("v", "bigint")
    t.append(spark.range(2).select(F.col("id").alias("v"), F.lit("x").alias("w")))
    rep = t.verify()
    assert rep["ok"], rep["errors"]


# ---------------------------------------------------------------------------
# 4. datasource re-add of a dropped column mints a fresh physical
# ---------------------------------------------------------------------------


def test_datasource_write_readds_dropped_column(spark, tmp_path):
    """ADVICE r6: writing a previously-dropped logical column through
    the DataSource used to land it under the DROPPED physical name —
    silently invisible to every reader."""
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = _t(spark, tmp_path)
    t.append(
        spark.range(3).select(F.col("id").alias("k"), F.lit("old").alias("c"))
    )
    t.drop_column("c")
    assert set(t.snapshot().columns) == {"k"}
    spark.range(2).select(F.col("id").alias("k"), F.lit("new").alias("c")).write.format(
        "lakehouse"
    ).option("path", str(t.path)).mode("append").save()
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "c"}
    vals = {r["c"] for r in snap.collect()}
    assert vals == {"new", None}  # old vintage never resurrects
    # datasource read path agrees
    ds = spark.read.format("lakehouse").option("path", str(t.path)).load()
    assert {r["c"] for r in ds.collect()} == {"new", None}
