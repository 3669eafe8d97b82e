"""Round-3 wave Q: behavioral entropy and banded dynamic time
warping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "events_user_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, CAST(sum(n) AS DOUBLE) AS total,
             CAST(count(*) AS BIGINT) AS n_types
      FROM counts GROUP BY user_id
    )
    SELECT c.user_id,
           CAST(max(t.total) AS BIGINT) AS n_events,
           max(t.n_types) AS n_types,
           round(-sum(CAST((n / total) * log2(n / total) AS DECIMAL(18,12))), 6)
             AS entropy_bits
    FROM counts c JOIN tot t USING (user_id)
    GROUP BY c.user_id
    """,
    tags=("events", "stats", "behavior"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution —
    behavioral diversity in bits (0 = monomaniac automation, log2(5)
    ≈ 2.32 = uniform across all five types). Pairs with
    events_bot_detection: scripted traffic is low-entropy AND
    low-gap-variance. Decimal-cast entropy terms keep the per-user
    sum accumulation-order-exact.

    Scale: two map-combinable aggregates (user×type counts, then the
    per-user fold) — the shuffle carries count partials only.
    """
    e = T(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.groupBy("user_id").agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    p = F.col("n") / F.col("total")
    return (
        counts.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("total").cast("bigint").alias("n_events"),
            F.max("n_types").alias("n_types"),
            F.round(
                -F.sum((p * F.log2(p)).cast("decimal(18,12)")), 6
            ).alias("entropy_bits"),
        )
    )


@query("timeseries_dtw_segments", oracle=None, tags=("timeseries", "similarity", "iterative"))
def timeseries_dtw_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded dynamic time warping (Sakoe-Chiba radius 6) between the
    z-normalized MONTHLY revenue curves of every market-segment pair —
    which segments move together even when their seasonal peaks shift
    by a month or two, which plain correlation misses. Rows-only gate
    (2-D DP has no tractable SQL twin); exact parity with an
    independent recursive reference implementation is pinned in
    tests/test_wave18.py.

    Scale: the fact table reduces to (segment × month) FIRST — the
    only full-data shuffle; the DP runs driver-side on ~80-point
    series per pair (15 pairs × O(n·band) ≈ trivial). A million-series
    variant ships the same numpy kernel into applyInPandas over
    pair-bucketed groups; the reduce-first shape is unchanged.
    """
    import numpy as np

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("ms"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("x"))
    )
    rows = monthly.orderBy("seg", "ms").collect()
    series: dict[str, list[float]] = {}
    for r in rows:
        series.setdefault(r["seg"], []).append(r["x"])

    def znorm(v):
        a = np.asarray(v)
        return (a - a.mean()) / (a.std() or 1.0)

    def dtw_band(a, b, r=6) -> float:
        n, m = len(a), len(b)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(1, i - r), min(m, i + r) + 1):
                cost = abs(a[i - 1] - b[j - 1])
                D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
        return float(D[n, m])

    segs = sorted(series)
    out = []
    for i, s1 in enumerate(segs):
        for s2 in segs[i + 1 :]:
            a, b = znorm(series[s1]), znorm(series[s2])
            out.append((s1, s2, round(dtw_band(a, b), 4), len(a), len(b)))
    return spark.createDataFrame(
        out, "seg_a string, seg_b string, dtw_distance double, n_a int, n_b int"
    )
