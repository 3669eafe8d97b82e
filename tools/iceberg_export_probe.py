"""Probe: incremental Iceberg export cost vs commit count (r7 VERDICT
task #2 "done" criterion — per-call export cost flat in table history).

Builds a real table commit-by-commit; at each decade (122 / 500 / 1000
commits) runs a FULL export, appends one tail commit, and times the
INCREMENTAL re-export. Flat = the incremental time does not grow with
the commit count (the r7 exporter re-folded the full history's JSON
per call — its floor grew linearly). Also asserts the resumed call
leaves every pre-existing manifest byte-identical (mtime-pinned).

Run: python tools/iceberg_export_probe.py [--decades 122 500 1000]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--decades", nargs="+", type=int, default=[122, 500, 1000]
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lakehouse_test_spark.plans.iceberg_export import (
        export_iceberg_metadata,
    )
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="ice_probe_") + "/t")
    row = spark.range(1).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    meta_dir = None
    built = 0
    results = []
    for n in sorted(args.decades):
        while built < n:
            t.append(row)
            built += 1
        t0 = time.perf_counter()
        meta_dir = export_iceberg_metadata(spark, t, incremental=False)
        full_s = time.perf_counter() - t0
        before = {
            p.name: p.stat().st_mtime_ns for p in meta_dir.glob("*.avro")
        }
        t.append(row)
        built += 1
        t0 = time.perf_counter()
        export_iceberg_metadata(spark, t)
        inc_s = time.perf_counter() - t0
        after = {
            p.name: p.stat().st_mtime_ns for p in meta_dir.glob("*.avro")
        }
        rewritten = [f for f, m in before.items() if after.get(f) != m]
        assert not rewritten, f"manifests rewritten on resume: {rewritten[:3]}"
        md = json.loads((meta_dir / "v1.metadata.json").read_text())
        assert "lakehouse.export-schema-state" in md["properties"]
        results.append(
            {
                "commits": built,
                "full_export_s": round(full_s, 3),
                "incremental_export_s": round(inc_s, 3),
                "manifests_reused": len(before),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"probe": "iceberg_export_incremental", "results": results}))

    # ---- retention phase (r9): per-micro-batch export loop with
    # expire_keep_last=5 + compact_manifests_above=8 — metadata.json
    # size AND the metadata/ file count must stay PINNED while commits
    # keep landing (snapshots bounded by retention, manifests by
    # compaction), and the per-call cost must stay in the flat band
    md_file = meta_dir / "v1.metadata.json"
    unbounded_size = md_file.stat().st_size
    unbounded_files = len(list(meta_dir.iterdir()))
    exp_results = []
    for i in range(20):
        t.append(row)
        built += 1
        t0 = time.perf_counter()
        export_iceberg_metadata(
            spark, t, expire_keep_last=5, compact_manifests_above=8
        )
        exp_s = time.perf_counter() - t0
        md = json.loads(md_file.read_text())
        exp_results.append(
            {
                "commits": built,
                "export_s": round(exp_s, 3),
                "snapshots": len(md["snapshots"]),
                "metadata_bytes": md_file.stat().st_size,
                "meta_dir_files": len(list(meta_dir.iterdir())),
            }
        )
        print(json.dumps(exp_results[-1]), flush=True)
    assert all(r["snapshots"] == 5 for r in exp_results)
    print(
        json.dumps(
            {
                "probe": "iceberg_export_expire",
                "unbounded_metadata_bytes": unbounded_size,
                "unbounded_meta_dir_files": unbounded_files,
                "results": exp_results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
