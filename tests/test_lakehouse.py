"""Lakehouse table tests: snapshot isolation, time travel,
incremental reads, compaction — the §2a ops 29-33 replacement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.sources.synthetic import person_stream


@pytest.fixture()
def table(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "tbl"))
    yield t
    t.drop()


def test_append_snapshot_timetravel(spark, table):
    table.append(person_stream(spark, 100))
    table.append(person_stream(spark, 50))
    assert table.latest_version() == 1
    assert table.snapshot().count() == 150
    assert table.snapshot(version=0).count() == 100  # time travel
    assert table.total_rows_committed() == 150
    assert table.total_rows_committed(version=0) == 100


def test_incremental_read_changes(spark, table):
    """Consume-loop analog: a reader holding version v sees exactly
    the rows committed after v (ops 5/31, exactly-once batches)."""
    table.append(person_stream(spark, 100))
    v0 = table.latest_version()
    table.append(person_stream(spark, 30))
    table.append(person_stream(spark, 20))
    assert table.read_changes(since_version=v0).count() == 50
    assert table.read_changes(since_version=table.latest_version()).count() == 0


def test_committed_is_readable_invariant(spark, table):
    """Op 31 dissolution: a snapshot never sees uncommitted files —
    write data without a log entry and it must stay invisible."""
    table.append(person_stream(spark, 10))
    # simulate a writer crash: data files land, no commit
    orphan = table.path / "data" / "orphan"
    person_stream(spark, 99).write.parquet(str(orphan))
    assert table.snapshot().count() == 10


def test_compact_preserves_rows(spark, table):
    for _ in range(4):
        table.append(person_stream(spark, 25).repartition(4))
    files_before = len(table._files_for())
    table.compact(target_partitions=1)
    assert table.snapshot().count() == 100
    assert len(table._files_for()) < files_before
    # time travel across the compaction boundary still works
    assert table.snapshot(version=1).count() == 50


def test_roundtrip_counter_invariant(spark, table):
    """rows_written == rows_read (reference §5 invariant, op 35)."""
    df = person_stream(spark, 500)
    commit = table.append(df)
    assert commit.row_count == 500
    assert table.snapshot().count() == table.total_rows_committed()


def test_zone_map_file_skipping(spark, table):
    """Commits with disjoint key ranges + stats_cols → a range scan
    touches only overlapping files (Delta/Iceberg data-skipping
    analog), and results equal the unpruned filter."""
    from pyspark.sql import functions as F

    for lo in (0, 1000, 2000, 3000):
        df = (
            person_stream(spark, 500)
            .withColumn("ba", F.col("ba") + lo)
            .coalesce(1)
        )
        table.append(df, stats_cols=["ba"])
    pruned, scanned, total = table.scan_pruned("ba", 1100, 1200)
    assert total == 4 and scanned == 1, f"expected 1/4 files, got {scanned}/{total}"
    expected = table.snapshot().where((F.col("ba") >= 1100) & (F.col("ba") <= 1200)).count()
    assert pruned.count() == expected == 101
    # stats-free commits must never be skipped (safety)
    table.append(person_stream(spark, 10).withColumn("ba", F.col("ba") + 1150).coalesce(1))
    pruned2, scanned2, total2 = table.scan_pruned("ba", 1100, 1200)
    assert scanned2 == 2 and total2 == 5
    assert pruned2.count() == expected + 10


def test_schema_evolution_additive(spark, table):
    """A later commit may add columns; snapshots merge schemas and
    older rows surface NULL for the new column (additive evolution)."""
    from pyspark.sql import functions as F

    table.append(person_stream(spark, 20))
    evolved = person_stream(spark, 10).withColumn("segment", F.lit("vip"))
    table.append(evolved)
    snap = table.snapshot()
    assert "segment" in snap.columns
    assert snap.count() == 30
    assert snap.where(F.col("segment").isNull()).count() == 20
    assert snap.where(F.col("segment") == "vip").count() == 10
    # pre-evolution time travel shows the old schema's data
    assert table.snapshot(version=0).count() == 20
