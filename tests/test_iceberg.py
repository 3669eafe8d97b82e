"""Iceberg-v2 export tests: Avro OCF codec roundtrip, metadata
structure, and replay == native snapshot across appends, restates,
and deletion-vector (position-delete) commits."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.iceberg_export import (
    MANIFEST_ENTRY_SCHEMA,
    export_iceberg_metadata,
    iceberg_plan_files,
    read_iceberg,
    read_ocf,
    write_ocf,
    _snapshot_id,
)
from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.sources.synthetic import person_stream


@pytest.fixture()
def table(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "icetbl"))
    yield t
    t.drop()


def test_ocf_roundtrip_manifest_entries(tmp_path):
    """The minimal Avro OCF writer/reader must roundtrip manifest
    entries exactly — nested records, null-unions, empty structs."""
    entries = [
        {
            "status": 1,
            "snapshot_id": 1000,
            "sequence_number": 1,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": "/tmp/x/part-000.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 1234,
                "file_size_in_bytes": 56789,
            },
        },
        {
            "status": 0,
            "snapshot_id": None,
            "sequence_number": None,
            "file_sequence_number": 7,
            "data_file": {
                "content": 1,
                "file_path": "/tmp/x/delete-1.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 0,
                "file_size_in_bytes": 0,
            },
        },
    ]
    p = tmp_path / "m.avro"
    write_ocf(p, MANIFEST_ENTRY_SCHEMA, entries, meta={"format-version": "2"})
    schema, md, got = read_ocf(p)
    assert got == entries
    assert md["format-version"] == "2"
    # spec field-ids ride in the embedded schema for real readers
    assert schema["fields"][0]["field-id"] == 0
    data_file_field = next(f for f in schema["fields"] if f["name"] == "data_file")
    assert data_file_field["field-id"] == 2


def test_iceberg_replay_matches_native_at_every_version(spark, table):
    """metadata → manifest list → manifests → scan must equal the
    native snapshot at every commit, including across a full restate
    and a DV commit (position deletes)."""
    table.append(person_stream(spark, 40))  # v0
    table.append(person_stream(spark, 20).withColumn("ba", F.col("ba") + 100))  # v1
    table.delete_where("age < 25")  # v2 restate
    table.append(person_stream(spark, 10).withColumn("ba", F.col("ba") + 500))  # v3
    table.delete_where_dv("ba >= 500 and ba < 505")  # v4 position deletes

    export_iceberg_metadata(spark, table)
    for v in range(5):
        got = read_iceberg(spark, str(table.path), _snapshot_id(v))
        want = table.snapshot(version=v)
        assert got.exceptAll(want).count() == 0, f"v{v}: extra rows"
        assert want.exceptAll(got).count() == 0, f"v{v}: missing rows"
    # default read = current snapshot
    cur = read_iceberg(spark, str(table.path))
    assert cur.count() == table.snapshot().count()


def test_iceberg_metadata_structure(spark, table):
    """metadata.json carries the v2 essentials: snapshots with
    sequence numbers + operations, schema with field ids, manifest
    carry-forward on append, fresh manifest set after restate."""
    table.append(person_stream(spark, 10))  # v0 append
    table.append(person_stream(spark, 10).withColumn("ba", F.col("ba") + 50))  # v1
    table.delete_where("ba < 5")  # v2 overwrite
    meta_dir = export_iceberg_metadata(spark, table)

    md = json.loads((meta_dir / "v1.metadata.json").read_text())
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == _snapshot_id(2)
    ops = [s["summary"]["operation"] for s in md["snapshots"]]
    assert ops == ["append", "append", "overwrite"]
    seqs = [s["sequence-number"] for s in md["snapshots"]]
    assert seqs == [1, 2, 3]
    assert all(f["id"] > 0 for f in md["schemas"][0]["fields"])

    # append v1's manifest list carries v0's manifest forward
    snap1 = md["snapshots"][1]
    _, _, manifests1 = read_ocf(Path(snap1["manifest-list"]))
    assert len(manifests1) == 2
    assert {m["sequence_number"] for m in manifests1} == {1, 2}
    # overwrite v2 starts a fresh manifest set
    snap2 = md["snapshots"][2]
    _, _, manifests2 = read_ocf(Path(snap2["manifest-list"]))
    assert len(manifests2) == 1
    assert manifests2[0]["sequence_number"] == 3


def test_iceberg_position_delete_files_shape(spark, table):
    """DV commits export as Iceberg v2 position-delete parquet
    (file_path, pos — sorted) referenced by a content=1 manifest."""
    import pyarrow.parquet as pq

    table.append(person_stream(spark, 30))
    n_young = table.snapshot().where("age < 30").count()
    table.delete_where_dv("age < 30")
    export_iceberg_metadata(spark, table)

    data_files, delete_files = iceberg_plan_files(str(table.path))
    assert delete_files, "DV commit must surface position-delete files"
    total = 0
    referenced: set[str] = set()
    for df in delete_files:
        t = pq.read_table(df)
        assert t.column_names == ["file_path", "pos"]
        total += t.num_rows
        rows = list(zip(t.column("file_path").to_pylist(), t.column("pos").to_pylist()))
        assert rows == sorted(rows)  # sorted within each delete file
        referenced |= set(t.column("file_path").to_pylist())
    assert total == n_young
    # the delete-file paths point at live data files
    assert referenced <= set(data_files)
