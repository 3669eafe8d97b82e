"""Mergeable frequency sketches — distributed heavy hitters.

At 100 TB an exact "top tokens over the corpus" is a full shuffle on
every distinct token (billions of groups).  The classic fix is a
two-stage Misra-Gries summary (Misra & Gries 1982; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012):

1. every partition keeps at most ``summary_size`` weighted counters —
   a deterministic, one-pass, O(summary_size) state whose counts are
   LOWER bounds with error ≤ n_p / (summary_size+1);
2. the per-partition summaries (a few thousand rows each, regardless
   of corpus size) are unioned and summed per item — the pigeonhole
   argument gives the global guarantee: any item with true frequency
   > n / (summary_size+1) appears in at least one partition summary,
   so the candidate set has PERFECT RECALL above that threshold;
3. an exact rescore pass (one semi-join on the tiny broadcast
   candidate set + one aggregation over matching rows only) replaces
   the lower bounds with exact counts, so the final top-k is EXACT
   whenever every true top-k item clears the threshold — which a
   Zipf-distributed token stream clears by orders of magnitude.

The shuffle therefore moves O(partitions × summary_size) candidate
rows plus the rescore of matching rows — never a group per distinct
token.  The per-partition pass is pandas value_counts per Arrow batch
(vectorized) folded into a dict keyed by DISTINCT items, not rows.

Reference parity: the reference's counters are simple totals
(PerformanceConsumer.java:151-159 sent/failed); this extends the
counting surface to frequency estimation, part of the mandated
LLM-data text-analysis extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    summary_size: int = 4096,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` computed
    through a distributed Misra-Gries candidate pass + exact rescore.

    Returns columns ``(item, n)`` ordered by ``n`` desc, ``item`` asc,
    limited to ``k`` rows.  Exactness holds whenever every true top-k
    item has frequency > n/(summary_size+1) — the caller picks
    ``summary_size`` for the skew of the column (tests pin the margin
    on the fixture corpus).
    """
    import pandas as pd

    spark = df.sparkSession
    src = df.select(F.col(col).cast("string").alias("item")).where(
        F.col(col).isNotNull()
    )

    def mg_summaries(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            # fold exact batch counts into the summary: iterate
            # DISTINCT items of the batch (Zipf head ≪ rows)
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > summary_size:
                # Misra-Gries decrement: subtract the (s+1)-th largest
                # count from everyone, drop the non-positive — at most
                # summary_size counters survive, each still a valid
                # lower bound with bounded error
                vals = sorted(counts.values(), reverse=True)
                thresh = vals[summary_size]
                counts = {i: c - thresh for i, c in counts.items() if c > thresh}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "lb": list(counts.values())}
        )

    summaries = src.mapInPandas(mg_summaries, "item string, lb long")
    # candidate set: every item any partition kept (superset of the
    # merged-summary survivors — union without the merge-prune keeps
    # recall and is still O(partitions * summary_size) rows)
    candidates = summaries.select("item").distinct()
    exact = (
        src.join(F.broadcast(candidates), "item", "leftsemi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.desc("n"), F.asc("item")).limit(k)
