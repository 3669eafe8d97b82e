"""Split each HEADLINE query's bench time into driver-side
construction+analysis vs executed noop-write time (guide §1: decide
whether the cost is plan building or the plan itself before touching
either).

Usage: python tools/profile_headline.py [--runs 3] [--queries a,b]
Prints one JSON line per query: construct_s (q.fn + schema force),
exec_s (noop write of the pre-built frame), total best-of-N.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE

    from lakehouse_test_spark.queries import REGISTRY
    from lakehouse_test_spark.session import get_spark, pin_fixture_tables

    names = args.queries.split(",") if args.queries else HEADLINE
    spark = get_spark("profile-headline")
    spark.range(1).count()
    if not args.no_pin:
        pin_fixture_tables(spark, args.sf_dir)

    # warm pass (mirrors bench.py)
    for name in names:
        q = REGISTRY.get(name)
        if q is not None:
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            continue
        best_c = best_e = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile: {name}")
            t0 = time.time()
            df = q.fn(spark, args.sf_dir)
            df.schema  # force analysis
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
        out[name] = {
            "construct_s": round(best_c, 3),
            "exec_s": round(best_e, 3),
            "total_s": round(best_c + best_e, 3),
        }
        print(json.dumps({"query": name, **out[name]}), flush=True)
    total = round(sum(v["total_s"] for v in out.values()), 3)
    print(json.dumps({"metric": "profile_total", "value": total}))
    spark.stop()


if __name__ == "__main__":
    main()
