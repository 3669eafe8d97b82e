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


@query(
    "orders_concurrency_curve",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS open_day,
             CAST(max(l.l_shipdate) AS DATE) AS close_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT open_day AS day, 1 AS d FROM spans
      UNION ALL
      SELECT close_day + INTERVAL 1 DAY, -1 FROM spans
    ), curve AS (
      SELECT day, CAST(sum(sum(d)) OVER (ORDER BY day) AS BIGINT) AS in_flight
      FROM deltas GROUP BY day
    )
    SELECT CAST(date_trunc('month', day) AS DATE) AS month_start,
           CAST(max(in_flight) AS BIGINT) AS peak_in_flight,
           CAST(min(in_flight) AS BIGINT) AS min_in_flight
    FROM curve GROUP BY 1
    """,
    tags=("timeseries", "intervals", "analytics"),
)
def orders_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval concurrency: how many orders are simultaneously
    in-flight (order date → last ship date) over time, rolled up to
    monthly peak/min — the +1/−1 delta-sweep construction that turns
    interval overlap counting into ONE running sum (the classic
    "maximum concurrent sessions" SQL pattern; Little's-law
    dashboards run exactly this).

    Scale: one join+aggregate to order grain, then the sweep runs on
    the DAY grain (two rows per order pre-aggregated to days — the
    running sum is over bounded rows). No interval self-join — the
    naive overlap-count is quadratic; the delta sweep is linear.
    """
    o = T(spark, sf_dir, "orders").select("o_orderkey", F.col("o_orderdate").cast("date").alias("open_day"))
    li = T(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("close_day")
    )
    spans = o.join(li, o.o_orderkey == li.l_orderkey)
    deltas = spans.select(F.col("open_day").alias("day"), F.lit(1).alias("d")).unionByName(
        spans.select(F.date_add("close_day", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(F.sum("d").alias("dd"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select("day", F.sum("dd").over(w).cast("bigint").alias("in_flight"))
    return curve.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month_start")
    ).agg(
        F.max("in_flight").cast("bigint").alias("peak_in_flight"),
        F.min("in_flight").cast("bigint").alias("min_in_flight"),
    )


@query(
    "market_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT s_nationkey, CAST(sum(r) AS DOUBLE) AS t,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY 1
    )
    SELECT r.s_nationkey AS nationkey, max(t1.n_suppliers) AS n_suppliers,
           round(sum(CAST(pow(CAST(r.r AS DOUBLE) / t1.t, 2) * 10000
                     AS DECIMAL(18,8))), 2) AS hhi,
           max(t1.n_suppliers) > 0
             AND sum(CAST(pow(CAST(r.r AS DOUBLE) / t1.t, 2) * 10000
                     AS DECIMAL(18,8))) > 2500 AS concentrated
    FROM rev r JOIN tot t1 USING (s_nationkey)
    GROUP BY r.s_nationkey
    """,
    tags=("agg", "analytics", "economics"),
)
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration per nation: the sum
    of squared supplier revenue shares on the 0-10,000 scale, with
    the DOJ "highly concentrated" 2,500 flag — the antitrust/market-
    structure statistic as a two-level aggregate (supplier rollup →
    share fold). Decimal-cast squared-share terms keep the per-nation
    sum accumulation-order-exact.

    Scale: supplier-grain rollup is the only fact shuffle; the HHI
    fold runs on |suppliers| rows with broadcast nation totals.
    """
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("r"))
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("r").cast("double").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    share_sq = F.pow(F.col("r").cast("double") / F.col("t"), F.lit(2.0)) * 10000
    hhi = F.sum(share_sq.cast("decimal(18,8)"))
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.round(hhi, 2).alias("hhi"),
            ((F.max("n_suppliers") > 0) & (hhi > 2500)).alias("concentrated"),
        )
    )
