"""The streaming DataSource readers yield Arrow RecordBatches (r5
VERDICT task #6) — called directly, the way Spark's Python worker
does, so the assertion is on the actual wire format, not just on
end-to-end row values. Also pins the CDF reader's range-bounded log
parse (per-batch planning cost follows the batch, not the log size)."""
from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _table(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
    )
    t.append(
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.lit("x").alias("note"),  # additive evolution
        )
    )
    return t


def test_lakehouse_stream_reader_yields_recordbatches(spark, tmp_path):
    from lakehouse_test_spark.sources.lakehouse_datasource import (
        LakehouseStreamReader,
    )

    t = _table(spark, tmp_path)
    r = LakehouseStreamReader(
        {"path": str(t.path)},
        ["k", "v", "note"],
        {"k": "bigint", "v": "double", "note": "string"},
    )
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    rows = 0
    for p in parts:
        out = list(r.read(p))
        assert all(isinstance(b, pa.RecordBatch) for b in out)
        for b in out:
            assert b.schema.names == ["k", "v", "note"]
            rows += b.num_rows
    assert rows == 8
    # the pre-evolution file null-fills `note` with the TYPED column
    first = next(
        b for p in parts for b in r.read(p) if b.num_rows and b.column(2).null_count
    )
    assert first.column(2).type == pa.string()


def test_cdf_stream_reader_yields_recordbatches_and_range_parse(spark, tmp_path):
    from lakehouse_test_spark.sources.cdf_datasource import (
        LakehouseCDFStreamReader,
    )

    t = _table(spark, tmp_path)
    r = LakehouseCDFStreamReader(
        {"path": str(t.path)},
        ["k", "v", "note"],
        {"k": "bigint", "v": "double", "note": "string"},
    )
    # range-bounded log parse: only the requested window is read
    assert [c["version"] for c in r._commits(0, 1)] == [1]
    assert [c["version"] for c in r._commits(-1, 1)] == [0, 1]
    parts = r.partitions({"version": -1}, {"version": 1})
    rows = 0
    for p in parts:
        for b in r.read(p):
            assert isinstance(b, pa.RecordBatch)
            assert b.schema.names[-2:] == ["_change_type", "_commit_version"]
            assert set(b.column("_change_type").to_pylist()) <= {"insert"}
            rows += b.num_rows
    assert rows == 8
