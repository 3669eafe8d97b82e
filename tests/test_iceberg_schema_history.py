"""Iceberg schema-HISTORY export (r5 VERDICT task #7): the metadata
carries a ``schemas`` lineage with per-snapshot ``schema-id``, and an
external reader replaying an OLD snapshot sees the column identity the
table had THEN — pre-rename name, pre-widening type — while the head
shows today's."""
from __future__ import annotations

import json

from pyspark.sql import functions as F

from lakehouse_test_spark.plans.iceberg_export import (
    _snapshot_id,
    export_iceberg_metadata,
    read_iceberg,
)
from lakehouse_test_spark.plans.lakehouse import LakehouseTable


def _evolved_table(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    # v0: (k int, price int)
    t.append(
        spark.range(3).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).cast("int").alias("price"),
        )
    )
    # rename price -> amount, then v1 under the new name
    t.rename_column("price", "amount")
    t.append(
        spark.range(3, 5).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).cast("int").alias("amount"),
        )
    )
    # widen amount to bigint, then v2 (bigint vintage + additive col)
    t.widen_column("amount", "bigint")
    t.append(
        spark.range(5, 6).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).alias("amount"),
            F.lit("x").alias("note"),
        )
    )
    return t


def test_schema_lineage_in_metadata(spark, tmp_path):
    t = _evolved_table(spark, tmp_path)
    meta_dir = export_iceberg_metadata(spark, t)
    md = json.loads(
        sorted(meta_dir.glob("v*.metadata.json"))[-1].read_text()
    )
    schemas = {s["schema-id"]: s for s in md["schemas"]}
    assert len(schemas) >= 3
    by_ver = {
        s["snapshot-id"]: s["schema-id"] for s in md["snapshots"]
    }
    s0 = schemas[by_ver[_snapshot_id(0)]]
    s1 = schemas[by_ver[_snapshot_id(1)]]
    s2 = schemas[by_ver[_snapshot_id(2)]]
    f0 = {f["name"]: f for f in s0["fields"]}
    f1 = {f["name"]: f for f in s1["fields"]}
    f2 = {f["name"]: f for f in s2["fields"]}
    # v0: old name, old type
    assert f0["price"]["type"] == "int" and "amount" not in f0
    # v1: renamed, still int — SAME field-id (identity survives)
    assert f1["amount"]["type"] == "int"
    assert f1["amount"]["id"] == f0["price"]["id"]
    # v2: widened + additive column
    assert f2["amount"]["type"] == "long"
    assert f2["amount"]["id"] == f0["price"]["id"]
    assert "note" in f2 and "note" not in f1
    # current schema is the head schema
    assert md["current-schema-id"] == by_ver[_snapshot_id(2)]
    assert md["last-column-id"] == max(f["id"] for f in s2["fields"])


def test_old_snapshot_reads_old_identity(spark, tmp_path):
    t = _evolved_table(spark, tmp_path)
    export_iceberg_metadata(spark, t)
    p = str(t.path)
    # head: current names/types, all columns
    head = read_iceberg(spark, p)
    assert set(head.columns) == {"k", "amount", "note"}
    assert dict(head.dtypes)["amount"] == "bigint"
    assert head.count() == 6
    # v0: pre-rename name, pre-widening type, no later columns
    old = read_iceberg(spark, p, snapshot_id=_snapshot_id(0))
    assert set(old.columns) == {"k", "price"}
    assert dict(old.dtypes)["price"] == "int"
    assert sorted(r["price"] for r in old.collect()) == [0, 10, 20]
    # v1: post-rename, still pre-widening
    mid = read_iceberg(spark, p, snapshot_id=_snapshot_id(1))
    assert set(mid.columns) == {"k", "amount"}
    assert dict(mid.dtypes)["amount"] == "int"
    assert mid.count() == 5
