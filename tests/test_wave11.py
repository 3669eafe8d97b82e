"""Wave-I tests: decomposition, DBSCAN labels, depth-2 tree,
position attribution, item-item cosine, schema drift."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave11 import (
    dq_schema_drift,
    geo_dbscan_labels,
    marketing_attribution_position,
    ml_decision_tree_depth2,
    recsys_item_item_cosine,
    timeseries_classical_decompose,
)
from lakehouse_test_spark.session import load_table


def test_decompose_seasonal_indices_mean_one(spark, sf_dir):
    rows = timeseries_classical_decompose(spark, sf_dir).collect()
    assert rows
    # the 12 distinct seasonal indices average to ~1 (normalized)
    idx = {}
    for r in rows:
        idx[r["month_start"].month] = r["seasonal_index"]
    assert abs(sum(idx.values()) / len(idx) - 1.0) < 1e-3
    for r in rows:
        # multiplicative identity: x ≈ trend * seasonal * irregular
        recon = r["trend"] * r["seasonal_index"] * r["irregular"]
        assert recon == pytest.approx(r["revenue"], rel=1e-3)


def test_dbscan_label_rules(spark, sf_dir):
    rows = geo_dbscan_labels(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_total
    for r in rows:
        if r["label"] == "core":
            assert r["n_neighbors"] >= 5
        else:
            assert r["n_neighbors"] < 5


def test_dbscan_plans_as_equi_join(spark, sf_dir):
    plan = geo_dbscan_labels(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tree_depth2_children_partition_root(spark, sf_dir):
    rows = {r["node"]: r for r in ml_decision_tree_depth2(spark, sf_dir).collect()}
    assert set(rows) == {"root", "left", "right"}
    root = rows["root"]
    # each child's split operates on exactly its branch's rows
    assert rows["left"]["n_left"] + rows["left"]["n_right"] == root["n_left"]
    assert rows["right"]["n_left"] + rows["right"]["n_right"] == root["n_right"]
    # children can only improve (or tie) their side's impurity mix
    assert rows["left"]["weighted_gini"] <= 0.5 + 1e-9
    assert rows["right"]["weighted_gini"] <= 0.5 + 1e-9


def test_position_attribution_conserves_value(spark, sf_dir):
    """Every purchase with >= 1 prior touch distributes exactly 100%
    of its value across touches: total attributed == total value of
    attributable purchases."""
    rows = marketing_attribution_position(spark, sf_dir).collect()
    attributed = sum(r["attributed_value"] for r in rows)

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    t = e.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("t_ts")
    )
    attributable = (
        p.join(
            t,
            (F.col("t_user") == F.col("p_user")) & (F.col("t_ts") <= F.col("p_ts")),
            "left_semi",
        )
        .agg(F.sum("p_value"))
        .collect()[0][0]
    )
    assert attributed == pytest.approx(attributable, rel=1e-6)


def test_item_item_cosine_bounds(spark, sf_dir):
    rows = recsys_item_item_cosine(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert 0 < r["cosine"] <= 1.0 + 1e-9
        assert r["i"] < r["j"]
        assert r["co_count"] >= 1
    # sorted by cosine descending
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_schema_drift_shape(spark, sf_dir):
    rows = dq_schema_drift(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["abs_drift"] == pytest.approx(
            round(abs(r["value_a"] - r["value_b"]), 4), abs=1e-9
        )
    by_metric = {(r["column_name"], r["metric"]) for r in rows}
    assert ("doc_id", "row_count") in by_metric


def test_mp4_box_walk_on_genuine_bytes(spark):
    """The data-driven box walk must parse an MP4 built independently
    with struct.pack (different construction path than the engine's
    hex synthesis), including a non-minimal ftyp so box offsets
    actually vary."""
    import struct

    from pyspark.sql import Row

    from lakehouse_test_spark.operators.multimodal import be_u32_at, fourcc_at

    def box(fourcc: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + fourcc + payload

    def mvhd(timescale: int, duration: int) -> bytes:
        payload = (
            b"\x00\x00\x00\x00"  # version/flags
            + struct.pack(">II", 0, 0)  # ctime/mtime
            + struct.pack(">II", timescale, duration)
            + struct.pack(">I", 0x00010000)  # rate
            + b"\x01\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2)
        )
        return box(b"mvhd", payload)

    # wider ftyp (two compatible brands -> 24 bytes, not the engine's 20)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    moov = box(b"moov", mvhd(90000, 450000))
    mdat = box(b"mdat", b"\x00\x01" * 37)
    payload = ftyp + moov + mdat

    df = spark.createDataFrame([Row(asset_id=1, payload=payload)])
    p = F.col("payload")
    off0 = F.lit(0).cast("bigint")
    s1 = be_u32_at(p, off0)
    s2 = be_u32_at(p, s1)
    got = df.select(
        fourcc_at(p, off0 + 4).alias("t1"),
        fourcc_at(p, s1 + 4).alias("t2"),
        fourcc_at(p, s1 + s2 + 4).alias("t3"),
        be_u32_at(p, s1 + 28).alias("timescale"),
        be_u32_at(p, s1 + 32).alias("duration"),
    ).collect()[0]
    assert (got["t1"], got["t2"], got["t3"]) == ("ftyp", "moov", "mdat")
    assert got["timescale"] == 90000
    assert got["duration"] == 450000
