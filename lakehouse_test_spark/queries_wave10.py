"""Round-3 wave H: geospatial joins, survival analysis, spectral and
robust trend statistics, oracle-checked BFS, Benford DQ, a
histogram-method decision stump, exact substring-span dedup, and a
KMV distinct sketch.

Every query here is DuckDB-oracle-checked (including the iterative
BFS, via a recursive CTE) except none — this wave is 100% hash-gated.
Coordinates for the geo queries are derived deterministically from
key hashes (the fixtures carry no lat/lon), with the SAME md5-based
derivation in both engines, so membership and distances agree
row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# geospatial
# --------------------------------------------------------------------------

def _u01(*cols) -> F.Column:
    """Uniform [0,1) from md5 of the concatenated columns — the
    engine-portable hash idiom (conv(hex,16,10) ↔ CAST('0x…'))."""
    return F.conv(
        F.substring(F.md5(F.concat(*[F.lit(c) if isinstance(c, str) else c for c in cols])), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(4294967295.0)


def _sql_u01(expr: str) -> str:
    return (
        "CAST(CAST('0x' || substr(md5(" + expr + "), 1, 8) AS BIGINT) AS DOUBLE)"
        " / 4294967295.0"
    )


def _haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance, mean earth radius 6371.0088 km."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))


_SQL_HAV = (
    "2 * 6371.0088 * asin(sqrt("
    " pow(sin(radians({lat2} - {lat1}) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    "   * pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
)


@query(
    "geo_nearest_supplier",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             -60 + 120 * ({_sql_u01("'lat' || CAST(c_custkey AS VARCHAR)")}) AS lat,
             -170 + 340 * ({_sql_u01("'lon' || CAST(c_custkey AS VARCHAR)")}) AS lon
      FROM customer WHERE c_custkey % 50 = 0
    ), s AS (
      SELECT s_suppkey,
             -60 + 120 * ({_sql_u01("'lats' || CAST(s_suppkey AS VARCHAR)")}) AS lat,
             -170 + 340 * ({_sql_u01("'lons' || CAST(s_suppkey AS VARCHAR)")}) AS lon
      FROM supplier
    ), pairs AS (
      SELECT c.c_custkey,
             {_SQL_HAV.format(lat1="c.lat", lon1="c.lon", lat2="s.lat", lon2="s.lon")} AS dist_km
      FROM c CROSS JOIN s
    )
    SELECT c_custkey,
           CAST(count(*) FILTER (WHERE dist_km <= 2000) AS BIGINT) AS n_within_2000km,
           round(min(dist_km), 3) AS nearest_km
    FROM pairs GROUP BY c_custkey
    """,
    tags=("geo", "join"),
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment: every (sampled) customer scores
    all suppliers by haversine distance — min distance + count within
    a 2000 km service radius.

    Scale: suppliers are a dimension (coords for 1M facilities ≈
    24 MB) — broadcast them and the customer fact NEVER moves; the
    per-row argmin is a map-side aggregate. This is the correct
    100 TB shape for fact×small-dim geo; big-big geo uses the grid
    join next door (geo_grid_neighbor_pairs).
    """
    c = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        (F.lit(-60) + 120 * _u01("lat", F.col("c_custkey").cast("string"))).alias("lat"),
        (F.lit(-170) + 340 * _u01("lon", F.col("c_custkey").cast("string"))).alias("lon"),
    )
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.lit(-60) + 120 * _u01("lats", F.col("s_suppkey").cast("string"))).alias("slat"),
        (F.lit(-170) + 340 * _u01("lons", F.col("s_suppkey").cast("string"))).alias("slon"),
    )
    pairs = c.join(F.broadcast(s)).select(
        "c_custkey",
        _haversine_km(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")).alias(
            "dist_km"
        ),
    )
    return pairs.groupBy("c_custkey").agg(
        F.count(F.when(F.col("dist_km") <= 2000, 1)).cast("bigint").alias(
            "n_within_2000km"
        ),
        F.round(F.min("dist_km"), 3).alias("nearest_km"),
    )


@query(
    "geo_grid_neighbor_pairs",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             -60 + 120 * ({_sql_u01("'lat' || CAST(c_custkey AS VARCHAR)")}) AS lat,
             -170 + 340 * ({_sql_u01("'lon' || CAST(c_custkey AS VARCHAR)")}) AS lon
      FROM customer
    ), pairs AS (
      SELECT a.c_custkey AS id1, b.c_custkey AS id2,
             {_SQL_HAV.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")} AS dist_km
      FROM c a JOIN c b ON a.c_custkey < b.c_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(CAST(dist_km AS DECIMAL(18,6))), 2) AS total_km,
           round(max(dist_km), 3) AS max_km
    FROM pairs WHERE dist_km <= 150
    """,
    tags=("geo", "join", "scale"),
)
def geo_grid_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big spatial self-join: all customer pairs within 150 km,
    found via a GRID-CELL equi-join, hash-checked against the
    oracle's brute-force cross join — the grid join provably loses
    nothing.

    Construction: cell = (floor(lat/3°), floor(lon/3°)); the left
    side explodes to its 3×3 neighborhood and equi-joins the right
    side's unique home cell, so each qualifying pair is found exactly
    once (no distinct needed). 3° ≥ the max angular reach of 150 km
    at |lat| ≤ 60 (2.7° of longitude), and the lon domain [-170,170]
    never wraps the antimeridian.

    Scale: the O(n²) cross join becomes a shuffle on cell id —
    candidate pairs only within neighboring 334 km cells. Cell width
    is the selectivity knob; skewed (urban) cells are split by AQE
    skew-join like any hot key.
    """
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + 120 * _u01("lat", F.col("c_custkey").cast("string"))).alias("lat"),
        (F.lit(-170) + 340 * _u01("lon", F.col("c_custkey").cast("string"))).alias("lon"),
    )
    cell_y = F.floor(F.col("lat") / 3).cast("int")
    cell_x = F.floor(F.col("lon") / 3).cast("int")
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
    pairs = (
        left.join(right, ["cy", "cx"])
        .where(F.col("lid") < F.col("id"))
        .select(
            _haversine_km(
                F.col("llat"), F.col("llon"), F.col("lat"), F.col("lon")
            ).alias("dist_km")
        )
        .where(F.col("dist_km") <= 150)
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(dsum(F.col("dist_km")), 2).alias("total_km"),
        F.round(F.max("dist_km"), 3).alias("max_km"),
    )


# --------------------------------------------------------------------------
# survival analysis
# --------------------------------------------------------------------------

@query(
    "survival_kaplan_meier",
    oracle="""
    WITH life AS (
      SELECT o_custkey,
             date_diff('day', min(o_orderdate), max(o_orderdate)) AS t,
             CASE WHEN date_diff('day', max(o_orderdate),
                  (SELECT max(o_orderdate) FROM orders)) < 60 THEN 0 ELSE 1 END AS observed
      FROM orders GROUP BY o_custkey
    ), risk AS (
      SELECT t, CAST(count(*) FILTER (WHERE observed = 1) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM life GROUP BY t
    ), curve AS (
      SELECT t, d,
             CAST((SELECT count(*) FROM life) AS BIGINT)
               - CAST(coalesce(sum(leaving) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_at_risk
      FROM risk
    )
    SELECT t AS lifetime_days, d AS n_events, n_at_risk,
           round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk)) OVER (ORDER BY t)), 6)
             AS survival
    FROM curve WHERE d > 0 ORDER BY t
    """,
    tags=("survival", "stats", "timeseries"),
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer lifetime (days between
    first and last order), right-censoring customers still active in
    the final 60 days. S(t) = Π_{t_i ≤ t} (1 - d_i / n_i), computed
    as exp of a running sum of logs — a single window over the
    event-time grain.

    Scale: one aggregate to customer grain, one tiny aggregate to
    distinct-lifetime grain (≤ a few thousand rows regardless of
    customer count), then an unpartitioned window over that tiny
    frame — the classic reduce-to-statistic shape.
    """
    o = T(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    life = (
        o.groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("t"),
            F.max("o_orderdate").alias("last"),
        )
        .join(F.broadcast(horizon))
        .select(
            "t",
            F.when(F.datediff(F.col("h"), F.col("last")) < 60, 0)
            .otherwise(1)
            .alias("observed"),
        )
    )
    risk = life.groupBy("t").agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    n_total = life.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t")
    curve = (
        risk.join(F.broadcast(n_total))
        .withColumn(
            "n_at_risk",
            (F.col("n_total") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)))
            .cast("bigint"),
        )
        .withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk"))
                    ).over(w_run)
                ),
                6,
            ),
        )
    )
    return curve.where(F.col("d") > 0).select(
        F.col("t").alias("lifetime_days"),
        F.col("d").alias("n_events"),
        "n_at_risk",
        "survival",
    )


# --------------------------------------------------------------------------
# spectral / robust trend statistics
# --------------------------------------------------------------------------

@query(
    "timeseries_periodogram",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', o_orderdate) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM orders GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS nn, avg(x) AS mu, min(n) AS n0 FROM daily
    ), freq AS (SELECT unnest(generate_series(1, 16)) AS k)
    SELECT CAST(k AS INT) AS k,
           round((  pow(CAST(sum(CAST((x - mu) * cos(2 * pi() * k * (n - n0) / nn)
                                 AS DECIMAL(18,6))) AS DOUBLE), 2)
                  + pow(CAST(sum(CAST((x - mu) * sin(2 * pi() * k * (n - n0) / nn)
                                 AS DECIMAL(18,6))) AS DOUBLE), 2)) / 1e9, 3)
             AS power_1e9
    FROM daily CROSS JOIN stats CROSS JOIN freq
    GROUP BY k ORDER BY k
    """,
    tags=("timeseries", "stats", "spectral"),
)
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of the daily revenue series:
    spectral power at the first 16 Fourier frequencies — the
    seasonality detector behind FFT-based period finding, computed as
    plain aggregates (the series is day-grain, so O(N·K) terms is
    tiny after the first rollup).

    Determinism: each cos/sin product term is decimal-cast before
    summation (fpsafe), so partial-aggregation order cannot move the
    spectrum; power is reported in units of 1e9 to keep rounding far
    from ulp noise.

    Scale: the raw scan aggregates to day grain FIRST (bounded rows),
    then the K-frequency expansion runs on the tiny frame — never on
    the fact table.
    """
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("n")
    ).agg(dsum(F.col("o_totalprice")).cast("double").alias("x"))
    stats = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.avg("x").alias("mu"),
        F.min("n").alias("n0"),
    )
    freq = spark.range(1, 17).select(F.col("id").cast("int").alias("k"))
    theta = (
        F.lit(2.0)
        * F.lit(3.141592653589793)
        * F.col("k")
        * (F.col("n") - F.col("n0"))
        / F.col("nn")
    )
    terms = daily.join(F.broadcast(stats)).join(F.broadcast(freq)).select(
        "k",
        ((F.col("x") - F.col("mu")) * F.cos(theta)).alias("ct"),
        ((F.col("x") - F.col("mu")) * F.sin(theta)).alias("st"),
    )
    return (
        terms.groupBy("k")
        .agg(
            F.round(
                (
                    F.pow(dsum(F.col("ct")).cast("double"), F.lit(2.0))
                    + F.pow(dsum(F.col("st")).cast("double"), F.lit(2.0))
                )
                / F.lit(1e9),
                3,
            ).alias("power_1e9")
        )
        .select(F.col("k").cast("int").alias("k"), "power_1e9")
    )


@query(
    "stats_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', o_orderdate) AS d,
             CAST(count(*) AS DOUBLE) AS c
      FROM orders GROUP BY 1
    )
    SELECT round(median((b.c - a.c) / (b.d - a.d)), 6) AS theil_sen_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM daily a JOIN daily b ON b.d > a.d
    """,
    tags=("timeseries", "stats", "robust"),
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator: the median of all pairwise
    slopes of the daily order-count series — immune to outlier days
    that wreck least-squares (agg_linear_regression is its fragile
    cousin).

    Scale: aggregate to day grain first (bounded: 10 years ≈ 3,650
    rows → ~6.7M pairs, trivially in-memory per executor); the pair
    expansion is a broadcast self-join of the TINY frame, never the
    fact table. Beyond ~100k grain points, switch to the sampled
    variant (median of slopes over hash-sampled pairs) — same code,
    a where-clause on the pair hash.
    """
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    a = daily.select(F.col("d").alias("ad"), F.col("c").alias("ac"))
    b = daily.select(F.col("d").alias("bd"), F.col("c").alias("bc"))
    pairs = a.join(F.broadcast(b), F.col("bd") > F.col("ad")).select(
        ((F.col("bc") - F.col("ac")) / (F.col("bd") - F.col("ad"))).alias("slope")
    )
    return pairs.agg(
        F.round(F.expr("median(slope)"), 6).alias("theil_sen_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# graph BFS (oracle-checked iterative operator)
# --------------------------------------------------------------------------

@query(
    "graph_bfs_levels",
    oracle="""
    WITH RECURSIVE edges_raw AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), edges AS (
      SELECT u, v FROM edges_raw UNION ALL SELECT v, u FROM edges_raw
    ), walk AS (
      SELECT (SELECT min(l_partkey) FROM lineitem) AS node, 0 AS level
      UNION ALL
      SELECT e.v AS node, w.level + 1
      FROM walk w JOIN edges e ON e.u = w.node
      WHERE w.level < 3
    )
    SELECT CAST(level AS INT) AS level, CAST(count(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, min(level) AS level FROM walk GROUP BY node)
    GROUP BY level
    """,
    tags=("graph", "iterative"),
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first search over the co-purchase graph (parts that
    share an order), from the minimum part key, 3 hops: how many
    parts are first reached at each level. The iterative frontier
    loop is hash-checked against a recursive-CTE oracle — like
    embedding_semantic_clusters, the iteration itself is verified,
    not just row counts.

    Scale: per hop, one equi-join frontier⋈edges + an anti-join
    against visited (both shuffles on node id); the frontier is
    localCheckpoint-ed per hop so plan depth stays O(1) — the same
    lineage discipline as operators.cluster.connected_components.
    Visited-set size is O(reachable nodes), never O(paths) — the
    recursive CTE enumerates paths and explodes on dense graphs; the
    frontier+anti-join formulation is the scalable one.
    """
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    half = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    edges = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()

    start = li.agg(F.min("l_partkey").alias("node")).withColumn("level", F.lit(0))
    visited = start.localCheckpoint(eager=True)
    frontier = visited
    for lvl in range(1, 4):
        nxt = (
            frontier.join(edges, frontier.node == edges.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return visited.groupBy(F.col("level").cast("int").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


# --------------------------------------------------------------------------
# data quality: Benford's law
# --------------------------------------------------------------------------

@query(
    "dq_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS INT) AS d
      FROM orders WHERE o_totalprice > 0
    ), obs AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM obs)
    SELECT d, n,
           round(n / total, 6) AS observed_p,
           round(log10(1.0 + 1.0 / d), 6) AS benford_p,
           round(pow(n / total - log10(1.0 + 1.0 / d), 2)
                 / log10(1.0 + 1.0 / d) * total, 4) AS chisq_term
    FROM obs CROSS JOIN tot
    """,
    tags=("dq", "stats"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-
    digit distribution vs log10(1+1/d), with per-digit chi-square
    contributions — the classic fabricated-data detector for DQ
    pipelines (synthetic uniform prices fail it loudly, which is
    itself the point of the audit).

    Scale: one map-side-combinable 9-group aggregate; everything
    downstream is arithmetic on 9 rows.
    """
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    obs = o.groupBy(d.alias("d")).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").cast("double").alias("total"))
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return obs.join(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("observed_p"),
        F.round(ben, 6).alias("benford_p"),
        F.round(
            F.pow(F.col("n") / F.col("total") - ben, F.lit(2.0)) / ben * F.col("total"),
            4,
        ).alias("chisq_term"),
    )


# --------------------------------------------------------------------------
# ML: histogram-method decision stump
# --------------------------------------------------------------------------

@query(
    "ml_decision_stump",
    oracle="""
    WITH pts AS (
      SELECT CAST(l_quantity AS DOUBLE) AS f_quantity,
             CAST(l_discount AS DOUBLE) AS f_discount,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), cands AS (
      SELECT 'quantity' AS feature, f_quantity AS thr FROM pts GROUP BY 1, 2
      UNION ALL
      SELECT 'discount', f_discount FROM pts GROUP BY 1, 2
    ), scored AS (
      SELECT c.feature, c.thr,
             count(*) FILTER (WHERE (CASE WHEN c.feature = 'quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS nl,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature = 'quantity'
                    THEN p.f_quantity ELSE p.f_discount END) <= c.thr) AS yl,
             count(*) FILTER (WHERE (CASE WHEN c.feature = 'quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS nr,
             sum(y)   FILTER (WHERE (CASE WHEN c.feature = 'quantity'
                    THEN p.f_quantity ELSE p.f_discount END) >  c.thr) AS yr
      FROM cands c CROSS JOIN pts p
      GROUP BY c.feature, c.thr
    ), gini AS (
      SELECT feature, thr, nl, nr,
             CASE WHEN nl = 0 OR nr = 0 THEN 1e9 ELSE
               (nl * (1.0 - pow(CAST(yl AS DOUBLE) / nl, 2)
                          - pow(1.0 - CAST(yl AS DOUBLE) / nl, 2))
              + nr * (1.0 - pow(CAST(yr AS DOUBLE) / nr, 2)
                          - pow(1.0 - CAST(yr AS DOUBLE) / nr, 2))) / (nl + nr)
             END AS wgini
      FROM scored
    )
    SELECT feature, round(thr, 2) AS threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           round(wgini, 6) AS weighted_gini
    FROM gini ORDER BY wgini, feature, thr LIMIT 1
    """,
    tags=("ml", "tree"),
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-split search for a depth-1 decision tree (CART stump) on
    lineitem features predicting returnflag='R', by weighted Gini —
    the inner loop of every tree/GBDT trainer.

    The engine uses the HISTOGRAM method (the XGBoost/LightGBM
    formulation): one pass aggregates per (feature, value) counts,
    a window cumsum turns them into left/right split statistics for
    every candidate threshold, and the argmin is a TakeOrdered(1).
    The oracle brute-forces candidates × points (O(C·N)); the engine
    is O(N + C log C) with one map-combinable shuffle — identical
    answer, hash-checked.

    Scale: the shuffle carries (feature, distinct-value) partial
    counts, not rows; continuous features bin to ≤256 quantile
    buckets first (histogram_equidepth is the binner) keeping C
    bounded. Deeper trees repeat per leaf on filtered partitions.
    """
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("f_quantity"),
        F.col("l_discount").cast("double").alias("f_discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    long = li.select(
        F.explode(
            F.array(
                F.struct(F.lit("quantity").alias("feature"), F.col("f_quantity").alias("v")),
                F.struct(F.lit("discount").alias("feature"), F.col("f_discount").alias("v")),
            )
        ).alias("fv"),
        "y",
    ).select("fv.feature", "fv.v", "y")
    hist = long.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("ys")
    )
    w = Window.partitionBy("feature").orderBy("v")
    w_all = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        F.col("v").alias("thr"),
        F.sum("n").over(w).alias("nl"),
        F.sum("ys").over(w).alias("yl"),
        (F.sum("n").over(w_all) - F.sum("n").over(w)).alias("nr"),
        (F.sum("ys").over(w_all) - F.sum("ys").over(w)).alias("yr"),
    )
    pl = F.col("yl").cast("double") / F.col("nl")
    pr = F.col("yr").cast("double") / F.col("nr")
    wgini = F.when((F.col("nl") == 0) | (F.col("nr") == 0), F.lit(1e9)).otherwise(
        (
            F.col("nl") * (F.lit(1.0) - F.pow(pl, F.lit(2.0)) - F.pow(F.lit(1.0) - pl, F.lit(2.0)))
            + F.col("nr") * (F.lit(1.0) - F.pow(pr, F.lit(2.0)) - F.pow(F.lit(1.0) - pr, F.lit(2.0)))
        )
        / (F.col("nl") + F.col("nr"))
    )
    return (
        cum.withColumn("wgini", wgini)
        .orderBy("wgini", "feature", "thr")
        .limit(1)
        .select(
            "feature",
            F.round(F.col("thr"), 2).alias("threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            F.round(F.col("wgini"), 6).alias("weighted_gini"),
        )
    )


# --------------------------------------------------------------------------
# exact substring-span dedup (Lee et al. 2022 shape)
# --------------------------------------------------------------------------

@query(
    "dedup_substring_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, i, md5(array_to_string(w[i:i+7], ' ')) AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 7)) AS i) t
    ), hits AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(sum(n_occurrences), 0) AS BIGINT) AS total_occurrences,
           CAST(coalesce(max(n_docs), 0) AS BIGINT) AS max_docs_sharing
    FROM hits
    """,
    tags=("dedup", "llm", "text"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection à la "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022):
    8-word spans appearing in more than one document. Unlike MinHash
    (whole-doc near-dup), this finds COPIED PASSAGES inside otherwise
    distinct documents — the boilerplate/licence-header/quotation
    signal.

    Engine shape: normalize → split → in-plan sliding 8-gram md5 via
    transform(sequence(...)) (zero Python, zero extra shuffle) →
    explode → one count/count-distinct aggregate on the 16-byte gram
    hash. The suffix-array construction the paper uses is
    single-machine; the n-gram-hash groupBy is its distributed
    equivalent at span granularity.

    Scale: the exploded grams are ~|tokens| rows of 16-byte keys —
    one shuffle, map-side combinable; skew only if one span repeats
    corpus-wide (a hot key AQE splits). Span length trades recall
    (shorter = more) vs cost; 50-token spans on a real corpus shrink
    the exploded volume by early HAVING-style pre-aggregation.
    """
    d = T(spark, sf_dir, "documents")
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    grams = (
        d.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(w) - 7, 0)),"
                    " i -> md5(array_join(slice(w, i, 8), ' ')))"
                )
            ).alias("g"),
        )
    )
    hits = (
        grams.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.sum("n_occurrences"), F.lit(0)).cast("bigint").alias(
            "total_occurrences"
        ),
        F.coalesce(F.max("n_docs"), F.lit(0)).cast("bigint").alias("max_docs_sharing"),
    )


# --------------------------------------------------------------------------
# KMV distinct sketch
# --------------------------------------------------------------------------

@query(
    "sketch_kmv_distinct",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                  AS DOUBLE) / 4294967296.0 AS u
      FROM events
    ), kmin AS (SELECT u FROM hashed ORDER BY u LIMIT 64)
    SELECT CAST(count(*) AS BIGINT) AS k_used,
           CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE round((64 - 1) / max(u), 4) END AS est_distinct,
           CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS true_distinct
    FROM kmin
    """,
    tags=("sketch", "agg"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al.): keep the
    k=64 smallest uniform hashes of the key; estimate NDV as
    (k-1)/u_(k). Unlike HLL (agg_approx_sketches), KMV sketches
    support set INTERSECTION estimates, and — because the hash is the
    portable md5 idiom — the estimate is hash-checked against DuckDB
    exactly, alongside the true distinct count for the error to be
    visible.

    Scale: per-partition top-k of hashes (map-side TakeOrdered —
    64 values per partition cross the wire), merged once; the sketch
    is mergeable across shards/days by construction.
    """
    e = T(spark, sf_dir, "events")
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    ).alias("u")
    kmin = e.select(u).distinct().orderBy("u").limit(64)
    est = kmin.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        # underfull sketch (NDV < k) degenerates to the exact count
        F.when(
            F.count(F.lit(1)) < 64, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.round((F.lit(64) - 1) / F.max("u"), 4))
        .alias("est_distinct"),
    )
    true = e.agg(F.countDistinct("user_id").cast("bigint").alias("true_distinct"))
    return est.join(F.broadcast(true))


# --------------------------------------------------------------------------
# scalar trig battery
# --------------------------------------------------------------------------

@query(
    "scalar_trig_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity), 6)                       AS sin_qty,
           round(cos(l_quantity), 6)                       AS cos_qty,
           round(tan(l_discount), 6)                       AS tan_disc,
           round(atan2(l_tax, l_discount + 0.01), 6)       AS atan2_rates,
           round(degrees(l_discount), 6)                   AS disc_deg,
           round(radians(l_quantity), 6)                   AS qty_rad,
           round(cbrt(l_extendedprice), 6)                 AS price_cbrt,
           round(atan(l_quantity / 10.0), 6)               AS atan_qty,
           round(exp(l_discount), 6)                       AS exp_disc
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    tags=("scalar",),
)
def scalar_trig_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/transcendental scalar battery (sin/cos/tan/atan/
    atan2/degrees/radians/cbrt/exp) — fills the last scalar-function
    family; all codegen projections, zero shuffle."""
    li = T(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 6).alias("sin_qty"),
        F.round(F.cos("l_quantity"), 6).alias("cos_qty"),
        F.round(F.tan("l_discount"), 6).alias("tan_disc"),
        F.round(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01), 6).alias(
            "atan2_rates"
        ),
        F.round(F.degrees("l_discount"), 6).alias("disc_deg"),
        F.round(F.radians("l_quantity"), 6).alias("qty_rad"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("price_cbrt"),
        F.round(F.atan(F.col("l_quantity") / 10.0), 6).alias("atan_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
    )
