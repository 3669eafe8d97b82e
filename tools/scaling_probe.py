"""sf1 scaling probe: empirical evidence for the "survives 100×" claims.

Synthesizes an sf1 fixture set (10× sf0.1) by key-shifted replication
that PRESERVES the join graph and group cardinalities:

- every replica i shifts each table's keys by i × (max_key + 1), with
  foreign keys shifted consistently (lineitem.l_orderkey moves with
  orders.o_orderkey, etc.), so join fan-outs and group-by cardinalities
  scale exactly linearly;
- dimension-like enums (returnflag, mktsegment, dates) are untouched,
  so selectivities are identical at both scales;
- ``documents.text`` is vowel-rotated per replica (replica 0 keeps the
  original) so the near-dup structure replicates WITHIN each replica
  instead of every doc gaining 9 verbatim cross-replica copies — the
  latter would change the dedup problem itself, not its scale;
- nation/region stay fixed (they are constant-size in TPC-H too).

Then runs the bench.py HEADLINE set at sf0.1 and at the synthesized
sf1 and reports per-query wall-clock ratios. A plan that survives
scale-up shows time ratio ≲ data ratio (10×) — superlinear queries are
the earliest sign of a shape that breaks at 100 TB.

Usage:
    python tools/scaling_probe.py [--out /tmp/lakehouse_scale] [--skip-synth]

Writes the result table to stdout as markdown (paste into SCALE.md)
plus one JSON line for tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

# table -> (primary key col, {fk col -> parent table}) ; parents give
# the shift unit for foreign keys
KEYS = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (None, {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"}),
    "events": ("event_id", {"user_id": "customer"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
COPY_ONLY = ["region", "nation"]

VOWEL_ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]


def synthesize(out_dir: str) -> str:
    from pyspark.sql import functions as F

    from lakehouse_test_spark.session import get_spark

    spark = get_spark("scaling-probe")
    sf1 = os.path.join(out_dir, "sf1")
    os.makedirs(sf1, exist_ok=True)

    shift_unit: dict[str, int] = {}
    for t, (pk, _) in KEYS.items():
        if pk is not None:
            df = spark.read.parquet(f"{SRC}/{t}.parquet")
            shift_unit[t] = int(df.agg(F.max(pk)).head()[0]) + 1

    def write_flat(df, t: str) -> None:
        """Write as ONE flat file named {t}.parquet — the exact layout
        the driver fixtures use (the streaming source glob-filters on
        the flat file name; parquet row groups keep scans parallel)."""
        import glob
        import shutil

        tmp = os.path.join(out_dir, f"_tmp_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(sf1, f"{t}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)

    for t in COPY_ONLY:
        write_flat(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

    for t, (pk, fks) in KEYS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(REPLICAS):
            df = base
            if pk is not None and i:
                df = df.withColumn(pk, F.col(pk) + i * shift_unit[t])
            for fk, parent in fks.items():
                if i:
                    df = df.withColumn(fk, F.col(fk) + i * shift_unit[parent])
            if t == "documents" and i:
                rot = VOWEL_ROTS[i % len(VOWEL_ROTS)]
                df = df.withColumn("text", F.translate(F.col("text"), "aeiou", rot))
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        write_flat(union, t)
    spark.stop()
    return sf1


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench produced no JSON at {sf_dir}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lakehouse_scale")
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--extension", action="store_true",
                    help="time the wave H-J extension families instead of HEADLINE")
    ap.add_argument("--names", default=None,
                    help="comma-separated registry names to probe instead of a fixed list")
    ap.add_argument("--sf10", action="store_true",
                    help="probe the r3 worst scalers at sf0.1/sf1/sf10 (100x)")
    args = ap.parse_args()

    if args.sf10:
        sf1 = os.path.join(args.out, "sf1")
        sf10 = os.path.join(args.out, "sf10")
        if not os.path.exists(sf1):
            sf1 = synthesize(args.out)
        if not os.path.exists(sf10):
            sf10 = synthesize_sf10(args.out)
        run_sf10([SRC, sf1, sf10], args.names.split(",") if args.names else None)
        return

    sf1 = os.path.join(args.out, "sf1")
    if not args.skip_synth or not os.path.exists(sf1):
        sf1 = synthesize(args.out)

    if args.extension or args.names:
        run_extension([SRC, sf1], args.names.split(",") if args.names else None)
        return

    b01 = run_bench(SRC)
    b1 = run_bench(sf1)

    print("| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    ratios = {}
    for name, t01 in sorted(b01["queries"].items()):
        t1 = b1["queries"].get(name)
        if t1 is None:
            continue
        # guard tiny denominators: sub-100ms timings are scheduler noise
        ratio = round(t1 / max(t01, 0.1), 2)
        ratios[name] = ratio
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.2f}x |")
    total_ratio = round(b1["value"] / b01["value"], 2)
    print(f"| **total** | {b01['value']:.2f} | {b1['value']:.2f} | {total_ratio:.2f}x |")
    print()
    print(json.dumps({"metric": "sf1_scaling", "total_ratio": total_ratio, "ratios": ratios}))




# ---------------------------------------------------------------------------
# Extension probe: the round-3 wave H-J operator families, timed
# in-process (bench.py's HEADLINE list stays frozen for round-over-
# round comparability; these get their own scaling table).
# ---------------------------------------------------------------------------

EXTENSION_QUERIES = [
    "geo_grid_neighbor_pairs",
    "geo_dbscan_labels",
    "dedup_substring_spans",
    "ml_decision_tree_depth2",
    "text_collocations_pmi",
    "survival_kaplan_meier",
    "recsys_item_item_cosine",
    "graph_bfs_levels",
    "agg_weighted_median",
    "marketing_attribution_position",
    "embedding_hard_negatives",
    "dedup_simhash",
]
# graph_link_prediction_jaccard is deliberately NOT probed at sf1:
# key-replicated synthesis densifies the co-purchase graph ~10x, and
# common-neighbor counting is O(sum deg^2) — same data-dependent
# superlinearity as geo_dbscan_labels (see SCALE.md), magnified to
# ~100x work. Real scale-up grows the catalog with the orders
# (degree ~const); density-stress belongs to a skew benchmark, not
# the wall-clock ratio table.


# ---------------------------------------------------------------------------
# sf10 probe (100× sf0.1): the VERDICT-r3 worst scalers, chased one
# decade further. Only the TPC-H tables those queries touch are
# synthesized (lineitem ~60M rows); the same key-shifted replication
# preserves the join graph.
# ---------------------------------------------------------------------------

SF10_QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_orders",
]
SF10_TABLES = ["customer", "supplier", "orders", "lineitem"]


def synthesize_sf10(out_dir: str, replicas: int = 100) -> str:
    import glob
    import shutil

    from pyspark.sql import functions as F

    from lakehouse_test_spark.session import get_spark

    spark = get_spark("scaling-probe-sf10")
    sf10 = os.path.join(out_dir, "sf10")
    os.makedirs(sf10, exist_ok=True)

    shift_unit: dict[str, int] = {}
    for t, (pk, _) in KEYS.items():
        if pk is not None:
            df = spark.read.parquet(f"{SRC}/{t}.parquet")
            shift_unit[t] = int(df.agg(F.max(pk)).head()[0]) + 1

    def write_flat(df, t: str) -> None:
        tmp = os.path.join(out_dir, f"_tmp10_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(sf10, f"{t}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)

    for t in COPY_ONLY:
        write_flat(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

    for t in SF10_TABLES:
        pk, fks = KEYS[t]
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(replicas):
            df = base
            if pk is not None and i:
                df = df.withColumn(pk, F.col(pk) + i * shift_unit[t])
            for fk, parent in fks.items():
                if i:
                    df = df.withColumn(fk, F.col(fk) + i * shift_unit[parent])
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        write_flat(union, t)
    spark.stop()
    return sf10


def run_sf10(sf_dirs: list[str], names: list[str] | None = None) -> None:
    """Time ``names`` at each dir in-process (pinned core-aligned, same
    treatment at every scale) and print the ratio table."""
    import time

    from lakehouse_test_spark.queries import REGISTRY
    from lakehouse_test_spark.session import get_spark, pin_fixture_tables, unpin_fixture_tables

    names = names or SF10_QUERIES
    spark = get_spark("scaling-probe-sf10")
    spark.range(1).count()
    results: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        pin_fixture_tables(spark, sf_dir, tables=SF10_TABLES + COPY_ONLY)
        for name in names:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf_dir] = best
        unpin_fixture_tables()
        spark.catalog.clearCache()
    hdr = " | ".join(os.path.basename(d) for d in sf_dirs)
    print(f"| query | {hdr} (s) | ratio/decade |")
    print("|---|---|---|")
    out = {}
    for name in names:
        ts = [results[name][d] for d in sf_dirs]
        decades = [round(b / max(a, 0.1), 2) for a, b in zip(ts, ts[1:])]
        out[name] = {"sec": [round(t, 2) for t in ts], "decade_ratios": decades}
        print(f"| {name} | {' / '.join(f'{t:.2f}' for t in ts)} | {decades} |")
    print()
    print(json.dumps({"metric": "sf10_scaling", "results": out}))


def run_extension(sf_dirs: list[str], names: list[str] | None = None) -> None:
    import time

    from lakehouse_test_spark.queries import REGISTRY
    from lakehouse_test_spark.session import get_spark, pin_fixture_tables

    spark = get_spark("scaling-probe-ext")
    spark.range(1).count()
    results: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        pin_fixture_tables(spark, sf_dir)
        for name in (names or EXTENSION_QUERIES):
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results.setdefault(name, {})[sf_dir] = time.perf_counter() - t0
        spark.catalog.clearCache()
    a, b = sf_dirs
    print("| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print("|---|---|---|---|")
    ratios = {}
    tot_a = tot_b = 0.0
    for name in (names or EXTENSION_QUERIES):
        ta, tb = results[name][a], results[name][b]
        tot_a += ta
        tot_b += tb
        ratios[name] = round(tb / max(ta, 0.1), 2)
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {ratios[name]:.2f}x |")
    print(f"| **total** | {tot_a:.2f} | {tot_b:.2f} | {round(tot_b / tot_a, 2):.2f}x |")
    print()
    print(json.dumps({"metric": "sf1_scaling_ext", "total_ratio": round(tot_b / tot_a, 2), "ratios": ratios}))


if __name__ == "__main__":
    main()
