"""Round-3 wave I: classical seasonal decomposition, DBSCAN density
labels over the grid join, a depth-2 distributed CART tree, position-
based multi-touch attribution, item-item cosine recommendations, and
snapshot schema-drift DQ. All six are DuckDB-oracle hash-checked —
including the depth-2 tree, whose two levels run entirely in-plan
(the root split is a broadcast 1-row DataFrame, not a collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table
from lakehouse_test_spark.queries_wave10 import _haversine_km, _sql_u01, _u01, _SQL_HAV


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# classical seasonal decomposition (trend / seasonal / irregular)
# --------------------------------------------------------------------------

@query(
    "timeseries_classical_decompose",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ms,
             month(o_orderdate) AS m,
             -- exact integer micro-units: double round() diverges
             -- across engines when a value's shortest decimal repr
             -- ends in 5 (one engine rounds the repr, the other the
             -- binary) — observed on a trend of ...2.725
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS x_micro
      FROM orders GROUP BY 1, 2
    ), win AS (
      SELECT ms, m, x_micro,
             count(*) OVER w13 AS n13,
             sum(x_micro) OVER w11 AS s11_micro,
             lag(x_micro, 6) OVER (ORDER BY ms) AS xm6_micro,
             lead(x_micro, 6) OVER (ORDER BY ms) AS xp6_micro
      FROM monthly
      WINDOW w13 AS (ORDER BY ms ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING),
             w11 AS (ORDER BY ms ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
    ), trended AS (
      SELECT ms, m, x_micro,
             xm6_micro + 2 * s11_micro + xp6_micro AS trend_micro24,
             CAST(x_micro AS DOUBLE) / 1e6 AS x,
             CAST(xm6_micro + 2 * s11_micro + xp6_micro AS DOUBLE) / 24e6 AS trend
      FROM win WHERE n13 = 13
    ), seasonal AS (
      SELECT m,
             CAST(sum(CAST(x / trend AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS s_raw
      FROM trended GROUP BY m
    ), norm AS (
      SELECT m, s_raw /
        (CAST(sum(CAST(s_raw AS DECIMAL(18,12))) OVER () AS DOUBLE)
         / count(*) OVER ()) AS s
      FROM seasonal
    )
    SELECT t.ms AS month_start,
           -- half-up rounding in exact integer arithmetic (values > 0)
           CAST((t.x_micro + 5000) // 10000 AS DOUBLE) / 100.0 AS revenue,
           CAST((t.trend_micro24 + 120000) // 240000 AS DOUBLE) / 100.0 AS trend,
           round(n.s, 6) AS seasonal_index,
           round(t.x / (t.trend * n.s), 6) AS irregular
    FROM trended t JOIN norm n USING (m)
    """,
    tags=("timeseries", "stats", "decompose"),
)
def timeseries_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal decomposition of monthly
    revenue: trend via the centered 2×12 moving average, seasonal
    indices as the month-of-year mean of the ratio-to-trend
    (normalized to mean 1), irregular as the remainder — the textbook
    X-11 ancestor, entirely in windows and aggregates.

    Determinism: every accumulation (the 11-term window sum, the
    per-month ratio mean, the 12-index normalization) is decimal-cast
    first; only single divisions of identical doubles follow (the
    fpsafe discipline — window sums re-associate ulps otherwise).

    Scale: the fact scan aggregates to month grain FIRST; everything
    after runs on ≤ months rows. At 100 TB, that first rollup is the
    only shuffle.
    """
    o = T(spark, sf_dir, "orders")
    # exact integer micro-units — see the oracle comment on
    # cross-engine double round() divergence at repr-ends-in-5 values
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("ms"),
        F.month("o_orderdate").alias("m"),
    ).agg(
        (dsum(F.col("o_totalprice")) * 1000000).cast("bigint").alias("x_micro")
    )
    w13 = Window.orderBy("ms").rowsBetween(-6, 6)
    w11 = Window.orderBy("ms").rowsBetween(-5, 5)
    wo = Window.orderBy("ms")
    win = monthly.select(
        "ms",
        "m",
        "x_micro",
        F.count(F.lit(1)).over(w13).alias("n13"),
        F.sum("x_micro").over(w11).alias("s11_micro"),
        F.lag("x_micro", 6).over(wo).alias("xm6_micro"),
        F.lead("x_micro", 6).over(wo).alias("xp6_micro"),
    )
    trend_micro24 = (
        F.col("xm6_micro") + 2 * F.col("s11_micro") + F.col("xp6_micro")
    )
    trended = win.where(F.col("n13") == 13).select(
        "ms",
        "m",
        "x_micro",
        trend_micro24.alias("trend_micro24"),
        (F.col("x_micro").cast("double") / 1e6).alias("x"),
        (trend_micro24.cast("double") / 24e6).alias("trend"),
    )
    seasonal = trended.groupBy("m").agg(
        (
            F.sum((F.col("x") / F.col("trend")).cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("s_raw")
    )
    wall = Window.partitionBy()
    norm = seasonal.select(
        "m",
        (
            F.col("s_raw")
            / (
                F.sum(F.col("s_raw").cast("decimal(18,12)")).over(wall).cast("double")
                / F.count(F.lit(1)).over(wall)
            )
        ).alias("s"),
    )
    return trended.join(norm, "m").select(
        F.col("ms").alias("month_start"),
        # half-up rounding in exact integer arithmetic (values > 0);
        # Spark `div` truncates toward zero == floor for positives
        (
            F.expr("(x_micro + 5000) div 10000").cast("double") / 100.0
        ).alias("revenue"),
        (
            F.expr("(trend_micro24 + 120000) div 240000").cast("double") / 100.0
        ).alias("trend"),
        F.round("s", 6).alias("seasonal_index"),
        F.round(F.col("x") / (F.col("trend") * F.col("s")), 6).alias("irregular"),
    )


# --------------------------------------------------------------------------
# DBSCAN density labels over the grid join
# --------------------------------------------------------------------------

@query(
    "geo_dbscan_labels",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             -60 + 120 * ({_sql_u01("'lat' || CAST(c_custkey AS VARCHAR)")}) AS lat,
             -170 + 340 * ({_sql_u01("'lon' || CAST(c_custkey AS VARCHAR)")}) AS lon
      FROM customer
    ), nbr AS (
      SELECT a.id, b.id AS nid
      FROM pts a JOIN pts b ON a.id <> b.id
      WHERE {_SQL_HAV.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")} <= 500
    ), cnt AS (
      SELECT p.id, 1 + count(n.nid) AS n_neighbors
      FROM pts p LEFT JOIN nbr n ON n.id = p.id GROUP BY p.id
    ), core AS (SELECT id FROM cnt WHERE n_neighbors >= 5)
    SELECT c.id AS c_custkey, CAST(c.n_neighbors AS BIGINT) AS n_neighbors,
           CASE WHEN c.n_neighbors >= 5 THEN 'core'
                WHEN EXISTS (SELECT 1 FROM nbr n JOIN core k ON n.nid = k.id
                             WHERE n.id = c.id)
                  THEN 'border' ELSE 'noise' END AS label
    FROM cnt c
    """,
    tags=("geo", "ml", "clustering"),
)
def geo_dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density classification (eps = 500 km, minPts = 5) of
    customer locations: core (≥ minPts within eps, counting self),
    border (non-core with a core neighbor in range), noise. The full
    per-point labeling is hash-checked against a brute-force O(n²)
    oracle — the grid join provably finds every neighbor.

    Engine shape: 9° grid cells (≥ the 500 km longitude reach at
    |lat| ≤ 60), 3×3 neighborhood explode on one side, equi-join on
    cell → directed neighbor pairs → one count per point; the border
    test is a semi-join of the same pair list against the core set.
    Full density-connected clustering = connected components over
    core-core pairs (operators.cluster), not needed for the labels.

    Scale: O(n²) becomes a shuffle on cell id; cell width is the
    selectivity knob and AQE splits hot (urban) cells. Three
    shuffles total (pairs, counts, border semi-join), all on
    bounded-width keys.
    """
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + 120 * _u01("lat", F.col("c_custkey").cast("string"))).alias("lat"),
        (F.lit(-170) + 340 * _u01("lon", F.col("c_custkey").cast("string"))).alias("lon"),
    )
    cell_y = F.floor(F.col("lat") / 9).cast("int")
    cell_x = F.floor(F.col("lon") / 9).cast("int")
    right = c.select("id", "lat", "lon", cell_y.alias("cy"), cell_x.alias("cx"))
    left = (
        c.select("id", "lat", "lon", cell_y.alias("hy"), cell_x.alias("hx"))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("id").alias("lid"),
            F.col("lat").alias("llat"),
            F.col("lon").alias("llon"),
            (F.col("hy") + F.col("dy")).alias("cy"),
            (F.col("hx") + F.col("dx")).alias("cx"),
        )
    )
    # directed pairs within eps: each (lid -> id) found exactly once
    # (the right side joins on its unique home cell)
    nbr = (
        left.join(right, ["cy", "cx"])
        .where(F.col("lid") != F.col("id"))
        .where(
            _haversine_km(F.col("llat"), F.col("llon"), F.col("lat"), F.col("lon"))
            <= 500
        )
        .select(F.col("lid").alias("id"), F.col("id").alias("nid"))
    )
    cnt = (
        c.select("id")
        .join(nbr, "id", "left")
        .groupBy("id")
        .agg((F.lit(1) + F.count("nid")).cast("bigint").alias("n_neighbors"))
    )
    core = cnt.where(F.col("n_neighbors") >= 5).select(F.col("id").alias("core_id"))
    has_core_nbr = (
        nbr.join(core, nbr.nid == core.core_id, "left_semi").select("id").distinct()
        .withColumn("near_core", F.lit(True))
    )
    return (
        cnt.join(has_core_nbr, "id", "left")
        .select(
            F.col("id").alias("c_custkey"),
            "n_neighbors",
            F.when(F.col("n_neighbors") >= 5, "core")
            .when(F.col("near_core"), "border")
            .otherwise("noise")
            .alias("label"),
        )
    )


# --------------------------------------------------------------------------
# depth-2 distributed CART tree
# --------------------------------------------------------------------------

_GINI_SQL = """
  CASE WHEN nl = 0 OR nr = 0 THEN 1e9 ELSE
    (nl * (1.0 - pow(CAST(yl AS DOUBLE)/nl, 2) - pow(1.0 - CAST(yl AS DOUBLE)/nl, 2))
   + nr * (1.0 - pow(CAST(yr AS DOUBLE)/nr, 2) - pow(1.0 - CAST(yr AS DOUBLE)/nr, 2)))
   / (nl + nr) END
"""


@query(
    "ml_decision_tree_depth2",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(l_quantity AS DOUBLE) AS f_quantity,
             CAST(l_discount AS DOUBLE) AS f_discount,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), cands AS (
      SELECT 'quantity' AS feature, f_quantity AS thr FROM pts GROUP BY 1, 2
      UNION ALL SELECT 'discount', f_discount FROM pts GROUP BY 1, 2
    ), scored AS (
      SELECT c.feature, c.thr,
             count(*) FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS nl,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS yl,
             count(*) FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS nr,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS yr
      FROM cands c CROSS JOIN pts p GROUP BY 1, 2
    ), gini AS (
      SELECT feature, thr, nl, nr, {_GINI_SQL} AS wg FROM scored
    ), root AS (
      SELECT feature, thr, nl, nr, wg FROM gini ORDER BY wg, feature, thr LIMIT 1
    ), pts2 AS (
      SELECT p.*, CASE WHEN (CASE WHEN r.feature='quantity'
                       THEN p.f_quantity ELSE p.f_discount END) <= r.thr
                       THEN 'left' ELSE 'right' END AS branch
      FROM pts p CROSS JOIN root r
    ), cands2 AS (
      SELECT branch, 'quantity' AS feature, f_quantity AS thr FROM pts2 GROUP BY 1, 2, 3
      UNION ALL SELECT branch, 'discount', f_discount FROM pts2 GROUP BY 1, 2, 3
    ), scored2 AS (
      SELECT c.branch, c.feature, c.thr,
             count(*) FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS nl,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS yl,
             count(*) FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS nr,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature='quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS yr
      FROM cands2 c JOIN pts2 p ON p.branch = c.branch GROUP BY 1, 2, 3
    ), gini2 AS (
      SELECT branch, feature, thr, nl, nr, {_GINI_SQL} AS wg,
             row_number() OVER (PARTITION BY branch
                                ORDER BY {_GINI_SQL}, feature, thr) AS rk
      FROM scored2
    )
    SELECT 'root' AS node, feature, round(thr, 2) AS threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           round(wg, 6) AS weighted_gini
    FROM root
    UNION ALL
    SELECT branch, feature, round(thr, 2), CAST(nl AS BIGINT), CAST(nr AS BIGINT),
           round(wg, 6)
    FROM gini2 WHERE rk = 1
    """,
    tags=("ml", "tree"),
)
def ml_decision_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 CART tree via the distributed histogram method: the
    root split is found exactly like ml_decision_stump (per-value
    aggregate → window cumsums → argmin), then — WITHOUT collecting
    to the driver — the 1-row root split broadcast-joins back onto
    the points to label branches, and the same histogram pass runs
    per branch with a per-branch window argmin. Three rows out:
    root, left, right. The oracle replays both levels as nested CTEs
    over a brute-force candidates × points score.

    Scale: two passes over the data (root, then both children in ONE
    shared pass — the branch column partitions the histogram), each
    shuffling only (branch, feature, value) partial counts. Depth-k
    trees repeat the pattern k times; candidate counts stay bounded
    by quantile binning (histogram_equidepth).
    """
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("f_quantity"),
        F.col("l_discount").cast("double").alias("f_discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )

    def best_splits(pts: DataFrame, by: list) -> DataFrame:
        long = pts.select(
            *by,
            F.explode(
                F.array(
                    F.struct(
                        F.lit("quantity").alias("feature"), F.col("f_quantity").alias("v")
                    ),
                    F.struct(
                        F.lit("discount").alias("feature"), F.col("f_discount").alias("v")
                    ),
                )
            ).alias("fv"),
            "y",
        ).select(*by, "fv.feature", "fv.v", "y")
        hist = long.groupBy(*by, "feature", "v").agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").alias("ys")
        )
        w = Window.partitionBy(*by, "feature").orderBy("v")
        w_all = Window.partitionBy(*by, "feature")
        cum = hist.select(
            *by,
            "feature",
            F.col("v").alias("thr"),
            F.sum("n").over(w).alias("nl"),
            F.sum("ys").over(w).alias("yl"),
            (F.sum("n").over(w_all) - F.sum("n").over(w)).alias("nr"),
            (F.sum("ys").over(w_all) - F.sum("ys").over(w)).alias("yr"),
        )
        pl = F.col("yl").cast("double") / F.col("nl")
        pr = F.col("yr").cast("double") / F.col("nr")
        wg = F.when((F.col("nl") == 0) | (F.col("nr") == 0), F.lit(1e9)).otherwise(
            (
                F.col("nl")
                * (F.lit(1.0) - F.pow(pl, F.lit(2.0)) - F.pow(F.lit(1.0) - pl, F.lit(2.0)))
                + F.col("nr")
                * (F.lit(1.0) - F.pow(pr, F.lit(2.0)) - F.pow(F.lit(1.0) - pr, F.lit(2.0)))
            )
            / (F.col("nl") + F.col("nr"))
        )
        wrk = Window.partitionBy(*(by or [F.lit(1)])).orderBy("wg", "feature", "thr")
        return (
            cum.withColumn("wg", wg)
            .withColumn("rk", F.row_number().over(wrk))
            .where(F.col("rk") == 1)
            .drop("rk")
        )

    root = best_splits(li, []).select(
        F.col("feature").alias("r_feature"), F.col("thr").alias("r_thr"),
        "nl", "nr", "wg",
    )
    pts2 = li.join(F.broadcast(root.select("r_feature", "r_thr"))).withColumn(
        "branch",
        F.when(
            F.when(F.col("r_feature") == "quantity", F.col("f_quantity"))
            .otherwise(F.col("f_discount"))
            <= F.col("r_thr"),
            "left",
        ).otherwise("right"),
    )
    children = best_splits(pts2, ["branch"])
    root_row = root.select(
        F.lit("root").alias("node"),
        F.col("r_feature").alias("feature"),
        F.round("r_thr", 2).alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.round("wg", 6).alias("weighted_gini"),
    )
    child_rows = children.select(
        F.col("branch").alias("node"),
        "feature",
        F.round("thr", 2).alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.round("wg", 6).alias("weighted_gini"),
    )
    return root_row.unionByName(child_rows)


# --------------------------------------------------------------------------
# position-based multi-touch attribution
# --------------------------------------------------------------------------

@query(
    "marketing_attribution_position",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT p.event_id, p.value, e.event_type AS touch_type,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY p.event_id) AS n
      FROM p JOIN events e
        ON e.user_id = p.user_id AND e.ts <= p.ts AND e.event_type <> 'purchase'
    ), credited AS (
      SELECT touch_type, value,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 OR rn = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS credit
      FROM touches
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(round(sum(CAST(credit * value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS attributed_value
    FROM credited GROUP BY touch_type
    """,
    tags=("events", "analytics", "attribution"),
)
def marketing_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution:
    each purchase credits every prior touch by the same user — 40% to
    first and last touch, the middle 20% split across the rest
    (degenerating to 100%/50-50 for 1–2 touches) — rolled up per
    touch channel. The industry-standard generalization of last-touch
    (marketing_attribution_last_touch).

    Scale: one shuffle on user_id for the purchase⋈touch join, then a
    per-purchase window. Credit assignment is pure arithmetic on the
    window's (rn, n). Touch history per purchase is bounded by the
    user's event count — at 100 TB cap the lookback window (ts >=
    p.ts - INTERVAL 30 DAYS) to bound the amplification; hot users
    split via AQE skew-join.
    """
    e = T(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    t = e.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    joined = p.join(t, (F.col("t_user") == F.col("p_user")) & (F.col("t_ts") <= F.col("p_ts")))
    wn = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wc = Window.partitionBy("p_id")
    touches = joined.select(
        "touch_type",
        F.col("p_value").alias("value"),
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        touches.withColumn("credit", credit)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.round(dsum(F.col("credit") * F.col("value")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --------------------------------------------------------------------------
# item-item cosine recommendations
# --------------------------------------------------------------------------

@query(
    "recsys_item_item_cosine",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS f FROM baskets GROUP BY 1
    ), co AS (
      SELECT a.l_partkey AS i, b.l_partkey AS j, CAST(count(*) AS BIGINT) AS c
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT i, j, c AS co_count,
           round(c / sqrt(fi.f * fj.f), 6) AS cosine
    FROM co JOIN freq fi ON fi.l_partkey = co.i
            JOIN freq fj ON fj.l_partkey = co.j
    ORDER BY round(c / sqrt(fi.f * fj.f), 6) DESC, i, j LIMIT 50
    """,
    tags=("recsys", "similarity"),
)
def recsys_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering on binary baskets: cosine
    similarity c_ij / sqrt(f_i f_j) from co-purchase counts, top-50
    pairs (rounded-then-tiebroken ordering, per the determinism
    policy). The neighborhood-method complement to the latent-factor
    recsys_als_topk.

    Scale: the basket self-join shuffles on orderkey (pairs only
    within an order — bounded by basket size squared, not catalog
    size); frequency joins broadcast the item-grain table; the final
    top-k is a TakeOrdered, no global sort. Mega-baskets (the
    quadratic risk) get capped or sampled upstream in real pipelines.
    """
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("i"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("j"))
    co = (
        a.join(b, "ok")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    fi = freq.select(F.col("l_partkey").alias("i"), F.col("f").alias("fi"))
    fj = freq.select(F.col("l_partkey").alias("j"), F.col("f").alias("fj"))
    scored = (
        co.join(F.broadcast(fi), "i")
        .join(F.broadcast(fj), "j")
        .select(
            "i",
            "j",
            F.col("c").alias("co_count"),
            F.round(F.col("c") / F.sqrt(F.col("fi") * F.col("fj")), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), "i", "j").limit(50)


# --------------------------------------------------------------------------
# snapshot schema-drift DQ
# --------------------------------------------------------------------------

@query(
    "dq_schema_drift",
    oracle="""
    WITH a AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         b AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    m AS (
      SELECT 'n_chars' AS column_name, 'mean' AS metric,
             round(CAST((SELECT sum(n_chars) FROM a) AS DOUBLE)
                   / (SELECT count(*) FROM a), 4) AS value_a,
             round(CAST((SELECT sum(n_chars) FROM b) AS DOUBLE)
                   / (SELECT count(*) FROM b), 4) AS value_b
      UNION ALL
      SELECT 'lang', 'distinct_count',
             CAST((SELECT count(DISTINCT lang) FROM a) AS DOUBLE),
             CAST((SELECT count(DISTINCT lang) FROM b) AS DOUBLE)
      UNION ALL
      SELECT 'source', 'distinct_count',
             CAST((SELECT count(DISTINCT source) FROM a) AS DOUBLE),
             CAST((SELECT count(DISTINCT source) FROM b) AS DOUBLE)
      UNION ALL
      SELECT 'text', 'empty_rate',
             round(CAST((SELECT count(*) FILTER (WHERE length(trim(text)) = 0) FROM a)
                   AS DOUBLE) / (SELECT count(*) FROM a), 6),
             round(CAST((SELECT count(*) FILTER (WHERE length(trim(text)) = 0) FROM b)
                   AS DOUBLE) / (SELECT count(*) FROM b), 6)
      UNION ALL
      SELECT 'doc_id', 'row_count',
             CAST((SELECT count(*) FROM a) AS DOUBLE),
             CAST((SELECT count(*) FROM b) AS DOUBLE)
    )
    SELECT column_name, metric, value_a, value_b,
           round(abs(value_a - value_b), 4) AS abs_drift
    FROM m
    """,
    tags=("dq", "profile"),
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot profile drift: compare per-column
    metrics (mean length, distinct counts, empty rate, row count)
    between two corpus snapshots (even/odd doc_id standing in for
    yesterday/today) in a tall (column, metric, a, b, drift) frame —
    the monitor that catches silent upstream schema/behavior changes
    before they poison a training mix.

    Scale: ONE pass per snapshot computes every metric (conditional
    aggregates in a single groupBy-less agg), then a 5-row literal
    reshape — no per-metric scans, no shuffle beyond the two
    aggregates.
    """
    d = T(spark, sf_dir, "documents")

    def profile(side: DataFrame) -> DataFrame:
        return side.agg(
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("n_chars_mean"),
            F.countDistinct("lang").cast("double").alias("lang_distinct"),
            F.countDistinct("source").cast("double").alias("source_distinct"),
            F.round(
                F.count(F.when(F.length(F.trim("text")) == 0, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("text_empty_rate"),
            F.count(F.lit(1)).cast("double").alias("row_count"),
        )
    a = profile(d.where(F.col("doc_id") % 2 == 0))
    b = profile(d.where(F.col("doc_id") % 2 == 1))
    wide = a.join(
        b.select(*[F.col(c).alias(f"b_{c}") for c in b.columns])
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(cn).alias("column_name"),
                F.lit(mt).alias("metric"),
                F.col(col).alias("value_a"),
                F.col(f"b_{col}").alias("value_b"),
            )
            for cn, mt, col in [
                ("n_chars", "mean", "n_chars_mean"),
                ("lang", "distinct_count", "lang_distinct"),
                ("source", "distinct_count", "source_distinct"),
                ("text", "empty_rate", "text_empty_rate"),
                ("doc_id", "row_count", "row_count"),
            ]
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.column_name", "r.metric", "r.value_a", "r.value_b")
        .withColumn("abs_drift", F.round(F.abs(F.col("value_a") - F.col("value_b")), 4))
    )
