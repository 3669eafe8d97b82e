"""Round-7 feature interplay tortures: each new mechanism crossed
with the maintenance features that historically break silently
(restore, merge_branch, clone, retention)."""
from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def test_retention_time_travel_below_reclaimed_checkpoints(spark, tmp_path):
    """Snapshots below every reclaimed checkpoint still read (the
    full-history path never needed the checkpoint files)."""
    t = LakehouseTable(spark, str(tmp_path / "tt"))
    for i in range(31):  # checkpoints at 10/20/30; retention keeps 2
        t.append(spark.range(1).select(F.lit(i).alias("v")))
    vs = {
        int(p.name.split(".")[0])
        for p in t._ckpt_dir().iterdir()
        if p.name.split(".")[0].isdigit()
    }
    assert len(vs) == 2 and min(vs) >= 20
    assert t.snapshot(version=5).count() == 6
    assert t.snapshot(version=15).count() == 16
    assert t.snapshot().count() == 31


def test_restore_keeps_sidecar_bloom_skipping(spark, tmp_path):
    """After RESTORE, scan_point still skips via the side-car overlay
    (the restore commit copies bloom-stripped stats for checkpointed
    commits — the overlay must keep serving them)."""
    t = LakehouseTable(spark, str(tmp_path / "rb"))
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 500).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).repartition(2),
            bloom_cols=["k"],
        )
    t.checkpoint()
    t.append(spark.range(9000, 9100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")).repartition(1))
    t.restore(version=2)  # back to the three bloom'd commits
    df, scanned, total = t.scan_point("k", 1234)
    assert total == 6 and scanned < total, "restore lost bloom skipping"
    assert df.count() == 1


def test_incremental_export_after_merge_branch(spark, tmp_path):
    """Branch commits merged onto main export as ordinary tail commits
    on the incremental path."""
    from lakehouse_test_spark.plans.delta_export import (
        export_delta_log,
        read_delta_log,
    )

    t = LakehouseTable(spark, str(tmp_path / "br"))
    t.append(spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    log_dir = export_delta_log(spark, t)
    first = (log_dir / f"{0:020d}.json").read_text()
    t.create_branch("wip")
    t.branch_append(
        "wip",
        spark.range(3, 6).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")),
    )
    t.merge_branch("wip")
    export_delta_log(spark, t)
    assert (log_dir / f"{0:020d}.json").read_text() == first  # resumed
    got = read_delta_log(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4, 5]


def test_cdf_source_streams_a_shallow_clone(spark, tmp_path):
    """The CDF streaming source drains a shallow CLONE (whose commit
    references the SOURCE's files by absolute path)."""
    from lakehouse_test_spark.sources.cdf_datasource import register

    register(spark)
    src = LakehouseTable(spark, str(tmp_path / "src"))
    src.append(
        spark.range(4).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).cast("decimal(12,2)").alias("amt"),
        )
    )
    c = src.clone(str(tmp_path / "cl"))
    ck = tempfile.mkdtemp(prefix="clck_")
    try:
        q = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", str(c.path))
            .load()
            .writeStream.format("memory")
            .queryName("clone_feed")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    got = spark.sql("SELECT * FROM clone_feed")
    assert got.count() == 4
    assert dict(got.dtypes)["amt"] == "decimal(12,2)"


def test_upto_window_with_vacuumed_files_raises(spark, tmp_path):
    """A bounded window referencing vacuumed files raises the
    descriptive horizon error, exactly like the unbounded cursor."""
    import pytest

    from lakehouse_test_spark.plans.lakehouse import VacuumHorizonError

    t = LakehouseTable(spark, str(tmp_path / "vac"))
    for i in range(3):
        t.append(spark.range(2).select(F.lit(i).alias("v")))
    t.compact(target_partitions=1)  # v3 supersedes 0-2
    t.vacuum(keep_versions=1)
    with pytest.raises(VacuumHorizonError):
        t.read_changes(0, upto_version=2).count()


def test_incremental_export_after_truncate_in_tail(spark, tmp_path):
    """A truncating empty overwrite AFTER the first export replays as
    a remove-everything restate on the incremental path."""
    from lakehouse_test_spark.plans.delta_export import (
        export_delta_log,
        read_delta_log,
    )
    from lakehouse_test_spark.sources.lakehouse_datasource import register

    register(spark)
    t = LakehouseTable(spark, str(tmp_path / "tr"))
    t.append(spark.range(4).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    log_dir = export_delta_log(spark, t)
    first = (log_dir / f"{0:020d}.json").read_text()
    empty = spark.createDataFrame([], "k bigint, v double")
    empty.write.format("lakehouse").mode("overwrite").option(
        "path", str(t.path)
    ).save()
    t.append(spark.range(100, 102).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    export_delta_log(spark, t)
    assert (log_dir / f"{0:020d}.json").read_text() == first  # resumed
    got = read_delta_log(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == [100, 101]
    # time travel through the exported log still sees the old rows
    old = read_delta_log(spark, str(t.path), 0)
    assert old.count() == 4


def test_incremental_iceberg_export_dv_then_restate_tail(spark, tmp_path):
    """DV then full-restate compaction in the tail: the incremental
    path drops the reconstructed manifest set exactly like the full
    path (fresh manifests after the restate)."""
    from lakehouse_test_spark.plans.iceberg_export import (
        export_iceberg_metadata,
        read_iceberg,
    )

    t = LakehouseTable(spark, str(tmp_path / "ice"))
    t.append(spark.range(6).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    export_iceberg_metadata(spark, t)
    t.delete_where_dv("k >= 4")
    t.compact(target_partitions=1)
    t.append(spark.range(10, 12).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    export_iceberg_metadata(spark, t)
    got = read_iceberg(spark, str(t.path))
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 10, 11]
    assert got.exceptAll(t.snapshot()).count() == 0
