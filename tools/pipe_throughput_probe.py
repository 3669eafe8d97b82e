"""Probe: end-to-end CDC `pipe` throughput at sf1 scale (round 11).

Claim under test (SCALE.md "operational CDC loop"): with the r10
distributed apply, the CLI ``pipe`` verb's cost is dominated by the
sink MERGE/DV work — the feed itself never funnels through the
driver. This probe puts numbers on the two phases a real CDC
deployment runs:

- **snapshot seed**: a ~6 M-row source (sf0.1 lineitem replicated
  10x with disjoint keys — sf1-scale row count) seeded into an empty
  sink in ONE ``pipe`` invocation; the seed batch plans one
  InputPartition per live source file (pinned in
  tests/test_cdf_snapshot_seed.py).
- **capped tail catch-up**: a 100-commit backlog (appends + DV
  deletes) drained by ONE ``pipe --until-caught-up`` invocation at
  ``maxVersionsPerTrigger=10`` — 10 capped exactly-once runs plus the
  terminating no-op.

Run: python tools/pipe_throughput_probe.py [--sf-dir /root/testdata/sf0.1]
     [--replicas 10] [--tail-commits 100] [--cap 10]
"""
from __future__ import annotations

import argparse
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--tail-commits", type=int, default=100)
    ap.add_argument("--cap", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakehouse_test_spark.cli import main as cli_main
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable
    from lakehouse_test_spark.session import get_spark, load_table

    spark = get_spark("pipe_probe")
    spark.range(1).count()

    n_li = load_table(spark, args.sf_dir, "lineitem").count()
    # sf1-scale source: replicas x the sf0.1 lineitem ROW COUNT, with
    # guaranteed-unique keys (the synthetic testdata's (orderkey,
    # linenumber) pairs collide, which would conflate key-collapse
    # with CDC loss in the end-state check) and a realistic row width
    total = n_li * args.replicas
    big = spark.range(total).select(
        F.col("id").alias("k"),
        (F.col("id") % 200000 / 7.0).alias("price"),
        F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))).alias(
            "note"
        ),
    )

    work = tempfile.mkdtemp(prefix="pipe_probe_")
    src = LakehouseTable(spark, f"{work}/src")
    t0 = time.time()
    src.append(big.repartition(32))
    build_s = time.time() - t0
    n_rows = src.history()[-1].row_count
    print(f"source built: {n_rows:,} rows in {build_s:.1f}s")

    sink, ck = f"{work}/sink", f"{work}/ck"
    base = [
        "pipe", "--source", str(src.path), "--sink", sink,
        "--checkpoint", ck, "--merge-key", "k",
        "--max-versions-per-trigger", str(args.cap),
    ]
    t0 = time.time()
    cli_main(base, spark=spark)
    seed_s = time.time() - t0
    print(f"PHASE seed: {n_rows:,} rows in {seed_s:.1f}s "
          f"({n_rows / seed_s:,.0f} rows/s)")

    # tail: appends (~2k rows each) + every 10th commit a DV delete
    rng_rows = 2000
    tail_rows = 0
    t0 = time.time()
    for i in range(args.tail_commits):
        if i % 10 == 9:
            src.delete_where_dv(f"k % 997 = {i % 500}")
        else:
            lo = (1 << 50) + i * rng_rows
            src.append(
                spark.range(lo, lo + rng_rows).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 1000).cast("double").alias("price"),
                    F.concat(
                        F.lit("payload-"), F.md5(F.col("id").cast("string"))
                    ).alias("note"),
                ).coalesce(1)
            )
            tail_rows += rng_rows
    commit_s = time.time() - t0
    print(f"tail committed: {args.tail_commits} commits in {commit_s:.1f}s")

    import contextlib
    import io

    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        cli_main(base + ["--until-caught-up"], spark=spark)
    drain_s = time.time() - t0
    m = re.search(r"over (\d+) run\(s\)", buf.getvalue())
    m2 = re.search(r"Applied (\d+) net change row", buf.getvalue())
    runs = int(m.group(1)) if m else -1
    applied = int(m2.group(1)) if m2 else -1
    print(f"PHASE tail drain: {args.tail_commits} commits "
          f"({applied:,} net change rows) in {drain_s:.1f}s over {runs} runs "
          f"({applied / drain_s:,.0f} rows/s; "
          f"{args.tail_commits / drain_s:.2f} commits/s)")

    # end-state sanity: sink net state equals source net state
    n_src = src.snapshot().count()
    n_sink = LakehouseTable(spark, sink).snapshot().count()
    print(f"end-state: source={n_src:,} sink={n_sink:,} "
          f"match={n_src == n_sink}")
    spark.stop()


if __name__ == "__main__":
    main()
