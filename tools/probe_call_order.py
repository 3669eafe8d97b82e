"""Pin the REAL engine's DataSourceStreamReader call order.

Round 9: the r8 chunked-seed bug shipped because tests hand-drove the
offset API in an ASSUMED order. This probe registers a call-recording
wrapper around LakehouseCDFStreamReader, runs REAL streams across the
matrix {fresh start, clean restart, mid-drain restart} x
{processingTime, AvailableNow}, and prints the observed call sequence
per scenario. The pinned facts feed the r9 redesign (seedChunkFiles
fate + maxVersionsPerTrigger floor fast-forwarding).

Run: python tools/probe_call_order.py
"""
from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession, functions as F

from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.sources.cdf_trace import TracedCDFDataSource


def run_stream(spark, path, trace, ck, trigger, batches_wanted=2, timeout=30):
    q = (
        spark.readStream.format("lakehouse_cdf_traced")
        .option("path", path)
        .option("startingMode", "snapshot")
        .option("traceFile", trace)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(**trigger)
        .start()
    )
    try:
        if "availableNow" in trigger:
            q.awaitTermination(timeout)
        else:
            t0 = time.time()
            while time.time() - t0 < timeout:
                if len(q.recentProgress) >= batches_wanted:
                    break
                time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(10)


def show(trace, label):
    print(f"\n=== {label} ===")
    if not Path(trace).exists():
        print("  (no calls recorded)")
        return
    lines = []
    for line in Path(trace).read_text().splitlines():
        d = json.loads(line)
        if d["call"] == "partitions":
            lines.append(
                f"  partitions(start={d['start']}, end={d['end']}) n={d['n']}"
            )
        elif d["call"] == "commit":
            lines.append(f"  commit(end={d['end']})")
        else:
            lines.append(f"  {d['call']}() -> {d['ret']}")
    out, prev, reps = [], None, 0
    for ln in lines:
        if ln == prev:
            reps += 1
            continue
        if reps:
            out.append(f"    (x{reps + 1})")
        out.append(ln)
        prev, reps = ln, 0
    if reps:
        out.append(f"    (x{reps + 1})")
    print("\n".join(out[:40]))


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe-call-order")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TracedCDFDataSource)
    work = Path(tempfile.mkdtemp(prefix="probe_order_"))
    t = LakehouseTable(spark, str(work / "t"))
    for i in range(3):
        t.append(spark.range(i * 10, i * 10 + 3).select(F.col("id").alias("k")))

    # 1. fresh start, processingTime
    tr1, ck1 = str(work / "t1.jsonl"), str(work / "ck1")
    run_stream(spark, str(t.path), tr1, ck1, {"processingTime": "0 seconds"})
    show(tr1, "fresh start, processingTime=0 seconds")

    # 2. clean restart (same checkpoint), after new commits land
    t.append(spark.range(100, 103).select(F.col("id").alias("k")))
    tr2 = str(work / "t2.jsonl")
    run_stream(spark, str(t.path), tr2, ck1, {"processingTime": "0 seconds"})
    show(tr2, "clean restart, processingTime=0 seconds (1 new commit)")

    # 3. fresh start, AvailableNow
    tr3, ck3 = str(work / "t3.jsonl"), str(work / "ck3")
    run_stream(spark, str(t.path), tr3, ck3, {"availableNow": True})
    show(tr3, "fresh start, AvailableNow")

    # 4. restart AvailableNow from same checkpoint after a commit
    t.append(spark.range(200, 202).select(F.col("id").alias("k")))
    tr4 = str(work / "t4.jsonl")
    run_stream(spark, str(t.path), tr4, ck3, {"availableNow": True})
    show(tr4, "clean restart, AvailableNow (1 new commit)")

    # 5. mid-batch restart: run until TWO batches committed (seed +
    # one tail commit), then delete the commit log's LAST entry so the
    # offset log is exactly one ahead — the real crash-mid-batch state
    ck5, tr5a, tr5b = str(work / "ck5"), str(work / "t5a.jsonl"), str(work / "t5b.jsonl")
    q = (
        spark.readStream.format("lakehouse_cdf_traced")
        .option("path", str(t.path))
        .option("startingMode", "snapshot")
        .option("traceFile", tr5a)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ck5)
        .trigger(processingTime="0 seconds")
        .start()
    )
    time.sleep(3)
    t.append(spark.range(300, 302).select(F.col("id").alias("k")))
    t0 = time.time()
    while time.time() - t0 < 30:
        if len(sorted(Path(ck5, "commits").glob("[0-9]*"))) >= 2:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(10)
    show(tr5a, "run A for mid-batch restart prep")
    commits = sorted(Path(ck5, "commits").glob("[0-9]*"), key=lambda p: int(p.name))
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    commits[-1].unlink()
    if crc.exists():
        crc.unlink()
    print(f"  (deleted commit-log entry {commits[-1].name} to force replay)")
    t.append(spark.range(400, 402).select(F.col("id").alias("k")))
    run_stream(spark, str(t.path), tr5b, ck5, {"processingTime": "0 seconds"})
    show(tr5b, "mid-batch restart, processingTime (uncommitted batch replays)")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
