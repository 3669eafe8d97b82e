"""Round-3 wave W: classical inference completers (ANOVA, rank tests,
randomization tests) and time-decayed feature engineering.

- ``stats_anova_oneway`` — one-way ANOVA F statistic across the five
  order-priority groups from a single decimal-exact moment pass.
- ``stats_permutation_test`` — a randomization test computed entirely
  in-engine: 64 deterministic pseudo-random relabelings (integer
  multiplicative hash of (event_id, b), so both engines draw the SAME
  "randomness"), null distribution of mean differences, exact
  achieved significance level. Resampling inference without collect()
  is how a 100 TB pipeline bootstraps uncertainty.
- ``stats_mann_whitney`` — the rank-sum U test with tie-corrected
  normal approximation, computed on the grouped value domain (average
  ranks from cumulative counts — no per-row global window).
- ``events_decay_score`` — exponentially time-decayed engagement
  scores (the recsys/feature-store primitive), decimal-cast so the
  transcendental per-row terms aggregate order-insensitively.

Reference parity: none (the reference has no statistics surface);
extends SURVEY.md §2b aggregations and the events/time-series family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_ANOVA_SQL = """
WITH g AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_g,
         CAST(sum(CAST(o_totalprice AS DECIMAL(32,8))) AS DOUBLE) AS s_g,
         CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(32,8))) AS DOUBLE) AS q_g
  FROM {orders}
  GROUP BY o_orderpriority
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         sum(n_g) AS n,
         sum(s_g) AS s,
         sum(s_g * s_g / n_g) AS sb,
         sum(q_g - s_g * s_g / n_g) AS ssw
  FROM g
)
SELECT CAST(k AS INTEGER) AS n_groups,
       CAST(n AS BIGINT) AS n_rows,
       CAST(round((sb - s * s / n) / (k - 1.0), 4) AS DOUBLE) AS ms_between,
       CAST(round(ssw / (n - k), 4) AS DOUBLE) AS ms_within,
       CAST(round(((sb - s * s / n) / (k - 1.0)) / (ssw / (n - k)), 6) AS DOUBLE)
         AS f_stat
FROM tot
"""


@query(
    "stats_anova_oneway",
    oracle=_ANOVA_SQL.format(orders="orders"),
    tags=("stats", "agg"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (order value across the five priority classes):
    per-group decimal-exact moments roll up to between/within mean
    squares and the F statistic, all in arithmetic shared verbatim
    with the oracle. The third member of the inference family next to
    Welch's t (2 groups) and the KS test (distribution-free).

    Scale: two chained hash aggregates (group moments → grand
    moments), no window, no join — O(1) state per group.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w25_orders")
    return spark.sql(_ANOVA_SQL.format(orders="v_w25_orders"))


_PERM_SQL = """
WITH ev AS (
  SELECT event_id, value, event_type FROM {events}
  WHERE event_type IN ('click', 'view')
), obs AS (
  SELECT CAST(sum(CAST(value AS DECIMAL(32,8))) FILTER (WHERE event_type = 'click')
              AS DOUBLE)
           / count(*) FILTER (WHERE event_type = 'click')
         - CAST(sum(CAST(value AS DECIMAL(32,8))) FILTER (WHERE event_type = 'view')
                AS DOUBLE)
           / count(*) FILTER (WHERE event_type = 'view') AS d_obs
  FROM ev
), perms AS (
  SELECT b,
         CAST(sum(CAST(value AS DECIMAL(32,8))) FILTER (WHERE flip = 0) AS DOUBLE)
           / count(*) FILTER (WHERE flip = 0)
         - CAST(sum(CAST(value AS DECIMAL(32,8))) FILTER (WHERE flip = 1) AS DOUBLE)
           / count(*) FILTER (WHERE flip = 1) AS d_b
  FROM (
    SELECT value, b,
           ((event_id * 2654435761 + b * 40503) % 2147483647) % 2 AS flip
    FROM {fanout}
  ) x
  GROUP BY b
)
SELECT count(*) AS n_perms,
       CAST(round((SELECT d_obs FROM obs), 4) AS DOUBLE) AS observed_diff,
       CAST(sum(CASE WHEN abs(d_b) >= abs((SELECT d_obs FROM obs))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST(round((1.0 + sum(CASE WHEN abs(d_b) >= abs((SELECT d_obs FROM obs))
                                  THEN 1 ELSE 0 END)) / (count(*) + 1.0), 4)
            AS DOUBLE) AS p_value
FROM perms
"""


@query(
    "stats_permutation_test",
    oracle=_PERM_SQL.format(
        events="events",
        fanout="ev CROSS JOIN (SELECT CAST(range AS BIGINT) AS b FROM range(0, 64)) r",
    ),
    tags=("stats", "resampling"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the click-vs-view mean value difference,
    computed entirely in-engine: 64 deterministic relabelings via an
    integer multiplicative hash of (event_id, draw) — both engines
    generate the SAME null draws, so even the permutation "noise" is
    hash-checked — then the achieved significance level
    (1 + #extreme)/(B + 1). Random relabeling (binomial split) rather
    than an exact permutation of labels: the standard large-sample
    randomization-test variant, and the only one expressible without
    a global shuffle of labels.

    Scale: one fact scan fanned out ×B inside the aggregate
    (explode of a 64-element sequence — no extra shuffle), partial
    aggregation per (b, flip); B controls cost linearly and
    independently of data size. collect()-free resampling inference.
    """
    T(spark, sf_dir, "events").createOrReplaceTempView("v_w25_events")
    return spark.sql(
        _PERM_SQL.format(
            events="v_w25_events",
            fanout="ev LATERAL VIEW explode(sequence(0, 63)) t AS b",
        )
    )


_MWU_SQL = """
WITH pts AS (
  SELECT o_totalprice AS v,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS c_f,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS c_o
  FROM {orders} WHERE o_orderstatus IN ('F', 'O')
  GROUP BY o_totalprice
), rk AS (
  SELECT c_f, c_o, c_f + c_o AS t,
         CAST(coalesce(sum(c_f + c_o) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                       PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           + (c_f + c_o + 1.0) / 2.0 AS avg_rank
  FROM pts
), agg AS (
  SELECT CAST(sum(c_f) AS DOUBLE) AS n_f,
         CAST(sum(c_o) AS DOUBLE) AS n_o,
         CAST(sum(CAST(c_f * avg_rank AS DECIMAL(32,8))) AS DOUBLE) AS r_f,
         CAST(sum(CAST(t AS DOUBLE) * t * t - t) AS DOUBLE) AS tie_sum
  FROM rk
)
SELECT CAST(n_f AS BIGINT) AS n_f,
       CAST(n_o AS BIGINT) AS n_o,
       CAST(round(r_f - n_f * (n_f + 1.0) / 2.0, 1) AS DOUBLE) AS u_stat,
       CAST(round((r_f - n_f * (n_f + 1.0) / 2.0 - n_f * n_o / 2.0)
                  / sqrt(n_f * n_o / 12.0
                         * ((n_f + n_o + 1.0)
                            - tie_sum / ((n_f + n_o) * (n_f + n_o - 1.0)))), 4)
            AS DOUBLE) AS z_stat
FROM agg
"""


@query(
    "stats_mann_whitney",
    oracle=_MWU_SQL.format(orders="orders"),
    tags=("stats", "window"),
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test between finished and open order
    values, with midrank tie handling and the tie-corrected normal
    approximation. Average ranks come from cumulative counts over the
    GROUPED value domain — (cum-before + (t+1)/2) — so rank sums are
    exact halves (no per-row global ranking), and the rank-sum
    aggregate is decimal-cast.

    Scale: the grouped domain is |distinct o_totalprice| — which GROWS
    with the data — so the cumulative count runs through the
    HIERARCHICAL :func:`global_cumsum` (one range shuffle +
    per-partition offsets, no data-bearing Exchange SinglePartition),
    exactly the stats_ks_test conversion; the inclusive cumsum minus
    the group count is the exclusive rank base, integer-exact.
    """
    from lakehouse_test_spark.operators.ordering import global_cumsum

    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus").isin("F", "O"))
    pts = (
        o.groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("c_f"),
            F.count_if(F.col("o_orderstatus") == "O").alias("c_o"),
        )
        .withColumn("t", F.col("c_f") + F.col("c_o"))
        .localCheckpoint()
    )
    rk = global_cumsum(pts, ["v"], ["t"], ["cum_t"]).withColumn(
        "avg_rank",
        (F.col("cum_t") - F.col("t")).cast("double")
        + (F.col("t") + F.lit(1.0)) / F.lit(2.0),
    )
    agg = rk.agg(
        F.sum("c_f").cast("double").alias("n_f"),
        F.sum("c_o").cast("double").alias("n_o"),
        F.sum((F.col("c_f") * F.col("avg_rank")).cast("decimal(32,8)"))
        .cast("double")
        .alias("r_f"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("double")
        .alias("tie_sum"),
    )
    n_f, n_o = F.col("n_f"), F.col("n_o")
    r_f, tie = F.col("r_f"), F.col("tie_sum")
    return agg.select(
        n_f.cast("bigint").alias("n_f"),
        n_o.cast("bigint").alias("n_o"),
        F.round(r_f - n_f * (n_f + F.lit(1.0)) / F.lit(2.0), 1)
        .cast("double")
        .alias("u_stat"),
        F.round(
            (
                r_f
                - n_f * (n_f + F.lit(1.0)) / F.lit(2.0)
                - n_f * n_o / F.lit(2.0)
            )
            / F.sqrt(
                n_f
                * n_o
                / F.lit(12.0)
                * (
                    (n_f + n_o + F.lit(1.0))
                    - tie / ((n_f + n_o) * (n_f + n_o - F.lit(1.0)))
                )
            ),
            4,
        )
        .cast("double")
        .alias("z_stat"),
    )


@query(
    "events_decay_score",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(round(sum(CAST(value * exp(-0.1 * ((1709251200000000 - epoch_us(ts))
                                                   / 86400000000.0))
                               AS DECIMAL(18,6))), 3) AS DOUBLE) AS decay_score
    FROM events
    GROUP BY user_id
    """,
    tags=("events", "feature"),
)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user
    (half-life ≈ 6.9 days, anchored at 2024-03-01 UTC): the standard
    freshness-weighted feature-store aggregate. Age is computed in
    exact integer microseconds (unix_micros ≡ epoch_us — the µs
    fixture precision survives), each decayed term is decimal-cast
    before summation, so the score is order-insensitive despite the
    per-row transcendental.

    Scale: one partial+final hash aggregate, zero shuffle beyond the
    groupBy — and because exp(-λ·age) factorizes, incremental
    maintenance is score(t₂) = score(t₁)·e^{-λΔt} + new terms: this
    exact aggregate is IVM-able on the CDF feed.
    """
    e = T(spark, sf_dir, "events")
    anchor_us = 1709251200000000  # 2024-03-01T00:00:00Z in microseconds
    age_days = (F.lit(anchor_us) - F.unix_micros("ts")) / 86400000000.0
    term = F.col("value") * F.exp(-0.1 * age_days)
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dround(dsum(term), 3).alias("decay_score"),
    )


_LEVENE_SQL = """
WITH med AS (
  SELECT o_orderpriority, {median_fn} AS med
  FROM {orders} GROUP BY o_orderpriority
), z AS (
  SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS z
  FROM {orders} o JOIN med m ON o.o_orderpriority = m.o_orderpriority
), g AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_g,
         CAST(sum(CAST(z AS DECIMAL(32,8))) AS DOUBLE) AS s_g,
         CAST(sum(CAST(z * z AS DECIMAL(32,8))) AS DOUBLE) AS q_g
  FROM z GROUP BY o_orderpriority
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, sum(n_g) AS n, sum(s_g) AS s,
         sum(s_g * s_g / n_g) AS sb, sum(q_g - s_g * s_g / n_g) AS ssw
  FROM g
)
SELECT CAST(k AS INTEGER) AS n_groups,
       CAST(n AS BIGINT) AS n_rows,
       CAST(round(((sb - s * s / n) / (k - 1.0)) / (ssw / (n - k)), 6) AS DOUBLE)
         AS levene_w
FROM tot
"""


@query(
    "stats_levene_brown_forsythe",
    oracle=_LEVENE_SQL.format(
        orders="orders", median_fn="quantile_cont(o_totalprice, 0.5)"
    ),
    tags=("stats", "agg"),
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test for equality of
    variances across the five priority groups: W is the one-way-ANOVA
    F statistic applied to |x − median_g|. Median parity rides the
    established Spark percentile ≡ DuckDB quantile_cont contract
    (agg_percentiles); the centered deviations are decimal-cast, so
    the whole statistic is order-insensitive. Completes the classical
    family: t (means), ANOVA (k means), W (k variances), U/KS
    (distributions), permutation (nonparametric).

    Scale: two aggregate passes (group medians, then moments of the
    deviations) joined through a broadcast of k rows — no window, no
    global sort; exact medians per group are the only heavy step and
    reuse the percentile machinery.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w25_orders_lev")
    return spark.sql(
        _LEVENE_SQL.format(
            orders="v_w25_orders_lev", median_fn="percentile(o_totalprice, 0.5)"
        )
    )


_SPEARMAN_SQL = """
WITH src AS (
  SELECT l_quantity AS x, l_extendedprice AS y FROM {lineitem}
), rx AS (
  SELECT x,
         CAST(coalesce(sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS DOUBLE)
           + (c + 1.0) / 2.0 AS r
  FROM (SELECT x, count(*) AS c FROM src GROUP BY x) t
), ry AS (
  SELECT y,
         CAST(coalesce(sum(c) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS DOUBLE)
           + (c + 1.0) / 2.0 AS r
  FROM (SELECT y, count(*) AS c FROM src GROUP BY y) t
), ranked AS (
  SELECT rx.r AS a, ry.r AS b
  FROM src JOIN rx ON src.x = rx.x JOIN ry ON src.y = ry.y
), m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(a AS DECIMAL(32,8))) AS DOUBLE) AS sa,
         CAST(sum(CAST(b AS DECIMAL(32,8))) AS DOUBLE) AS sb,
         CAST(sum(CAST(a * b AS DECIMAL(32,8))) AS DOUBLE) AS sab,
         CAST(sum(CAST(a * a AS DECIMAL(32,8))) AS DOUBLE) AS saa,
         CAST(sum(CAST(b * b AS DECIMAL(32,8))) AS DOUBLE) AS sbb
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(round((n * sab - sa * sb)
                  / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 6) AS DOUBLE)
         AS spearman_rho
FROM m
"""


@query(
    "stats_spearman_rho",
    oracle=_SPEARMAN_SQL.format(lineitem="lineitem"),
    tags=("stats", "window"),
)
def stats_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price
    (the nonparametric sibling of agg_corr_covar's Pearson): midranks
    per DISTINCT value from cumulative counts (the grouped-domain
    pattern shared with the Mann-Whitney/KS tests — ranks are exact
    halves, never interpolated), joined back to rows, then Pearson on
    the ranks from one decimal-exact moment pass.

    Scale: rank tables are |distinct values| (tiny for quantity — 50
    rows — and ~rows for price), so BOTH rank cumsums run through the
    HIERARCHICAL :func:`global_cumsum` (one range shuffle each, no
    data-bearing Exchange SinglePartition — the price domain grows
    with the data). The joins are equi-joins on the value,
    AQE-broadcast when small, and the moment pass is one aggregate.
    """
    from lakehouse_test_spark.operators.ordering import global_cumsum

    src = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )

    def _rank_map(col: str) -> DataFrame:
        g = (
            src.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        )
        return global_cumsum(g, [col], ["c"], ["cum"]).select(
            col,
            (
                (F.col("cum") - F.col("c")).cast("double")
                + (F.col("c") + F.lit(1.0)) / F.lit(2.0)
            ).alias(f"r_{col}"),
        )

    ranked = (
        src.join(_rank_map("x"), "x")
        .join(_rank_map("y"), "y")
        .select(F.col("r_x").alias("a"), F.col("r_y").alias("b"))
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("a").cast("decimal(32,8)")).cast("double").alias("sa"),
        F.sum(F.col("b").cast("decimal(32,8)")).cast("double").alias("sb"),
        F.sum((F.col("a") * F.col("b")).cast("decimal(32,8)"))
        .cast("double")
        .alias("sab"),
        F.sum((F.col("a") * F.col("a")).cast("decimal(32,8)"))
        .cast("double")
        .alias("saa"),
        F.sum((F.col("b") * F.col("b")).cast("decimal(32,8)"))
        .cast("double")
        .alias("sbb"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    sab, saa, sbb = F.col("sab"), F.col("saa"), F.col("sbb")
    return m.select(
        n.cast("bigint").alias("n_rows"),
        F.round(
            (n * sab - sa * sb)
            / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            6,
        )
        .cast("double")
        .alias("spearman_rho"),
    )
