"""Dump ``.explain("formatted")`` for every headline query into
``plans/r11/<query>_<suffix>.txt`` — the judge-verifiable evidence for
OPTIMIZATION_r11.md's plan claims.

Usage: python tools/dump_plans.py --suffix before [--sf-dir ...]
       python tools/dump_plans.py --suffix after  [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument("--out-dir", default="plans/r11")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query names (default: the whole bench HEADLINE)",
    )
    args = ap.parse_args()

    from bench import HEADLINE

    from lakehouse_test_spark.queries import REGISTRY
    from lakehouse_test_spark.session import get_spark

    names = args.queries.split(",") if args.queries else HEADLINE
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dump-plans")
    # COLD path (no pinned tables): the production scan shape, with
    # PushedFilters/ReadSchema visible on the parquet scan nodes.
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"skip (unregistered): {name}")
            continue
        df = q.fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
