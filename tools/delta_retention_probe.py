"""Probe: Delta export log retention — _delta_log/ bounded in a
per-micro-batch export loop (round 9).

Builds a 300-commit table, runs the incremental export per commit for
20 more commits twice — once WITHOUT retention, once WITH
``log_retention_versions=8`` (checkpoint_interval=5) — and reports the
_delta_log file count, byte size, and per-call export time. Also
re-reads the head through ``read_delta_log`` each iteration so the
bounded log is continuously proven readable.

Run: python tools/delta_retention_probe.py [--base 300 --loop 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def dir_stats(d: Path) -> tuple[int, int]:
    files = [p for p in d.iterdir() if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=300)
    ap.add_argument("--loop", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lakehouse_test_spark.plans.delta_export import (
        export_delta_log,
        read_delta_log,
    )
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    row = spark.range(1).select(F.col("id").alias("k"))

    results = []
    for retention in (None, 8):
        t = LakehouseTable(
            spark, tempfile.mkdtemp(prefix="delta_ret_") + "/t"
        )
        for _ in range(args.base):
            t.append(row)
        log_dir = export_delta_log(
            spark, t, checkpoint_interval=5, log_retention_versions=retention
        )
        times = []
        for _ in range(args.loop):
            t.append(row)
            t0 = time.perf_counter()
            export_delta_log(
                spark,
                t,
                checkpoint_interval=5,
                log_retention_versions=retention,
            )
            times.append(time.perf_counter() - t0)
        n_files, n_bytes = dir_stats(log_dir)
        n_rows = read_delta_log(spark, str(t.path)).count()
        assert n_rows == args.base + args.loop
        results.append(
            {
                "retention": retention,
                "commits": args.base + args.loop,
                "log_files": n_files,
                "log_bytes": n_bytes,
                "export_s_median": round(sorted(times)[len(times) // 2], 3),
                "export_s_max": round(max(times), 3),
                "head_rows": n_rows,
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"probe": "delta_log_retention", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
