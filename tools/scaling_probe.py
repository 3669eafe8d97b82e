"""Empirical scaling probe: time a set of representative queries at
sf0.001 / 0.01 / 0.1 and report the observed scaling exponent
alpha ≈ log(t_hi/t_lo) / log(sf_hi/sf_lo) between the two largest
scale factors (the smallest SF is warmup/fixed-cost floor).

alpha ≈ 0 → fixed-cost dominated (fine); alpha ≈ 1 → linear (the
target for scans/aggs); alpha > 1.3 → superlinear, a scale smell
worth a plan audit. Run: python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_test_spark.queries import REGISTRY  # noqa: E402
from lakehouse_test_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

PROBE = [
    "q1_pricing_summary",
    "q18_large_orders",
    "join_inner",
    "agg_count_distinct",
    "window_running_sum",
    "events_daily_rollup",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "text_quality_scores",
    "text_repetition_ratio",
    "vocab_topk_terms",
    "tfidf_top_term_per_doc",
    "similarity_bruteforce_topk",
    "funnel_conversion",
    "cohort_retention",
    "pipeline_pretraining_filter",
]


def main() -> int:
    spark = get_spark("scaling-probe")
    spark.range(1).count()
    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[1]
        for name in PROBE:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results.setdefault(name, {})[sf] = round(time.time() - t0, 3)
    print(f"{'query':35s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'alpha':>6s}")
    for name, t in results.items():
        alpha = math.log(max(t['0.1'], 1e-3) / max(t['0.01'], 1e-3)) / math.log(10)
        print(f"{name:35s} {t['0.001']:8.3f} {t['0.01']:8.3f} {t['0.1']:8.3f} {alpha:6.2f}")
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
