"""Second-decade proof for the join heavies (r4 verdict task #5).

q18/q5 scale ~7-8x per decade on fixed executors because their
lineitem<->orders join SHUFFLES BOTH SIDES on every run. The fix at
100 TB is a layout decision, not a query change: write both fact
tables ``bucketBy(N, orderkey)`` once (the shuffle is amortized into
the write path), and every subsequent join/aggregation on the key is
exchange-free — the sort-merge join reads co-located buckets.

This tool measures EXACTLY that at sf1 (6 M lineitem rows) and sf10
(60 M): the registered flat-parquet q18/q5 vs the same query shapes on
bucketed tables, plus the one-time bucketing cost. Results feed the
SCALE.md table; plan shape is separately pinned in tests/test_plans.py
(test_q18_bucketed_no_join_exchange).

Usage:  python tools/bucketed_join_proof.py [sf_dir ...]
        (defaults to /tmp/lakehouse_scale/sf1 /tmp/lakehouse_scale/sf10;
        synthesize them first with tools/scaling_probe.py)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lakehouse_test_spark.queries import REGISTRY  # noqa: E402
from lakehouse_test_spark.session import get_spark, load_table  # noqa: E402

BUCKETS = 32


def build_bucketed(spark: SparkSession, sf_dir: str, tag: str) -> float:
    """One-time layout cost: orders + lineitem bucketBy(orderkey),
    customer bucketBy(custkey) (q18's second join). repartition to the
    bucket count on the key first: writer hash == bucket hash, one
    sorted file per bucket."""
    import tempfile

    spark.sql("CREATE DATABASE IF NOT EXISTS bproof")
    root = tempfile.mkdtemp(prefix=f"lh_bproof_{tag}_")
    t0 = time.monotonic()
    specs = [
        (f"bproof.orders_{tag}", load_table(spark, sf_dir, "orders"), "o_orderkey"),
        (f"bproof.lineitem_{tag}", load_table(spark, sf_dir, "lineitem"), "l_orderkey"),
        (f"bproof.customer_{tag}", load_table(spark, sf_dir, "customer"), "c_custkey"),
    ]
    for name, df, key in specs:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(BUCKETS, key)
            .write.mode("overwrite")
            .bucketBy(BUCKETS, key)
            .sortBy(key)
            .option("path", f"{root}/{name.split('.')[1]}")
            .format("parquet")
            .saveAsTable(name)
        )
    return time.monotonic() - t0


def q18_bucketed(spark: SparkSession, tag: str):
    li = spark.table(f"bproof.lineitem_{tag}")
    orders = spark.table(f"bproof.orders_{tag}")
    cust = spark.table(f"bproof.customer_{tag}")
    lq = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 25)
    )
    return (
        lq.join(orders, lq.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def q5_bucketed(spark: SparkSession, sf_dir: str, tag: str):
    from lakehouse_test_spark.fpsafe import dround, dsum

    cust = spark.table(f"bproof.customer_{tag}")
    orders = spark.table(f"bproof.orders_{tag}").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = spark.table(f"bproof.lineitem_{tag}")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dround(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn().collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/tmp/lakehouse_scale/sf1",
        "/tmp/lakehouse_scale/sf10",
    ]
    spark = get_spark()
    rows = []
    for sf_dir in sf_dirs:
        tag = Path(sf_dir).name
        flat18 = timed(lambda: REGISTRY["q18_large_orders"].fn(spark, sf_dir))
        flat5 = timed(lambda: REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir))
        layout_sec = build_bucketed(spark, sf_dir, tag)
        b18 = timed(lambda: q18_bucketed(spark, tag))
        b5 = timed(lambda: q5_bucketed(spark, sf_dir, tag))
        # sanity: identical results
        a = REGISTRY["q18_large_orders"].fn(spark, sf_dir).collect()
        b = q18_bucketed(spark, tag).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "q18 parity!"
        rows.append((tag, flat18, b18, flat5, b5, layout_sec))
        print(
            f"{tag}: q18 flat {flat18:.2f}s bucketed {b18:.2f}s | "
            f"q5 flat {flat5:.2f}s bucketed {b5:.2f}s | layout {layout_sec:.1f}s",
            flush=True,
        )
    if len(rows) == 2:
        (t1, f18a, b18a, f5a, b5a, _), (t2, f18b, b18b, f5b, b5b, _) = rows
        print("\n| query | layout | sf1 | sf10 | decade ratio |")
        print("|---|---|---|---|---|")
        print(f"| q18 | flat (shuffle both sides) | {f18a:.2f}s | {f18b:.2f}s | {f18b/f18a:.1f}x |")
        print(f"| q18 | bucketBy(32, orderkey) | {b18a:.2f}s | {b18b:.2f}s | {b18b/b18a:.1f}x |")
        print(f"| q5 | flat | {f5a:.2f}s | {f5b:.2f}s | {f5b/f5a:.1f}x |")
        print(f"| q5 | bucketed | {b5a:.2f}s | {b5b:.2f}s | {b5b/b5a:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
