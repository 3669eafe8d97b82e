"""Round-3 wave U: iterative ML under the hash gate, classical
inference statistics, inequality measures, and compaction planning.

- ``ml_kmeans_embeddings`` runs TWO full Lloyd iterations of k-means
  (k=4) over the 64-d embeddings with every distance computed as a
  decimal-exact sum of squared differences — so cluster assignments
  are provably order-insensitive and the whole iterative algorithm
  hash-matches a DuckDB oracle running the identical relational
  unrolling. Iterative ML is usually graded rows-only; making Lloyd's
  algorithm value-exact is the point of this query.
- ``stats_welch_ttest`` is Welch's unequal-variance t statistic with
  the Welch–Satterthwaite degrees of freedom, from one decimal-exact
  moment pass (the drift/AB-test primitive next to the KS test).
- ``stats_gini_by_nation`` computes the Gini coefficient of order
  value per nation via the rank formula — partitioned windows, no
  global sort.
- ``lakehouse_compaction_planner`` commits 12 deliberately-small
  slices to a real lakehouse table, reads the COMMIT LOG's per-file
  row counts back, and emits the size-descending greedy bin-packing
  plan an OPTIMIZE job would execute; the oracle reconstructs the
  manifest relationally, so the gate checks both the log metadata and
  the packing arithmetic.

Reference parity: extends SURVEY.md §2b (aggregations, lakehouse
maintenance, LLM-data clustering); the reference has no comparable
surface.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# k-means (2 unrolled Lloyd iterations), decimal-exact — shared SQL template;
# only the dims CTE differs per engine (posexplode vs range-index).
# --------------------------------------------------------------------------

_KMEANS_SQL = """
WITH dims AS ({dims}),
cent0 AS (
  SELECT vec_id AS cid, i, x AS c FROM dims WHERE vec_id < 4
), a1 AS (
  SELECT d.vec_id, c0.cid,
         sum(CAST((d.x - c0.c) * (d.x - c0.c) AS DECIMAL(28,12))) AS d2
  FROM dims d JOIN cent0 c0 ON d.i = c0.i
  GROUP BY d.vec_id, c0.cid
), pick1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM a1) t WHERE rn = 1
), cent1 AS (
  SELECT p.cid, d.i,
         CAST(sum(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
  FROM pick1 p JOIN dims d ON p.vec_id = d.vec_id
  GROUP BY p.cid, d.i
), a2 AS (
  SELECT d.vec_id, c1.cid,
         sum(CAST((d.x - c1.c) * (d.x - c1.c) AS DECIMAL(28,12))) AS d2
  FROM dims d JOIN cent1 c1 ON d.i = c1.i
  GROUP BY d.vec_id, c1.cid
), pick2 AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM a2) t WHERE rn = 1
), norms AS (
  SELECT cid,
         CAST(round(CAST(sum(CAST(c * c AS DECIMAL(28,12))) AS DOUBLE), 6)
              AS DOUBLE) AS centroid_norm2
  FROM cent1 GROUP BY cid
)
SELECT p.cid,
       count(*) AS n_vecs,
       CAST(round(CAST(sum(p.d2) AS DOUBLE) / count(*), 6) AS DOUBLE) AS avg_d2,
       max(n.centroid_norm2) AS centroid_norm2
FROM pick2 p JOIN norms n ON p.cid = n.cid
GROUP BY p.cid
"""

_KMEANS_DIMS_SPARK = """
  SELECT vec_id, pos AS i, CAST(col AS DOUBLE) AS x
  FROM v_w23_embeddings LATERAL VIEW posexplode(embedding) t AS pos, col
"""

_KMEANS_DIMS_DUCKDB = """
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
"""


@query(
    "ml_kmeans_embeddings",
    oracle=_KMEANS_SQL.format(dims=_KMEANS_DIMS_DUCKDB),
    tags=("ml", "embedding", "iterative"),
)
def ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations of k-means (k=4, deterministic init:
    the first 4 vectors), value-exact: every squared distance is a
    sum of DECIMAL(28,12)-cast per-dimension terms, so assignments
    can't flip on accumulation order, and centroid updates divide
    decimal-exact sums as doubles. argmin is a rank-1 window with a
    cid tiebreak. The oracle unrolls the identical two iterations in
    DuckDB — an iterative ML algorithm under the full hash gate.

    Scale: the relational unrolling shuffles (vector × k) rows per
    iteration — the gate-exact shape. The production path for large k
    is the mapInPandas kernel in operators/similarity.py (IVF
    training): broadcast k×d centroids, one scan per iteration,
    per-partition partial sums; same math, same determinism if the
    partials stay decimal.
    """
    T(spark, sf_dir, "embeddings").createOrReplaceTempView("v_w23_embeddings")
    return spark.sql(_KMEANS_SQL.format(dims=_KMEANS_DIMS_SPARK))


# --------------------------------------------------------------------------
# Welch's t — shared template
# --------------------------------------------------------------------------

_WELCH_SQL = """
WITH m AS (
  SELECT CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS n1,
         CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS n2,
         CAST(sum(CAST(o_totalprice AS DECIMAL(32,8)))
              FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS s1,
         CAST(sum(CAST(o_totalprice AS DECIMAL(32,8)))
              FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS s2,
         CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(32,8)))
              FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS q1,
         CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(32,8)))
              FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS q2
  FROM {orders}
), v AS (
  SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
         (q1 - s1 * s1 / n1) / (n1 - 1.0) AS v1,
         (q2 - s2 * s2 / n2) / (n2 - 1.0) AS v2
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n_urgent,
       CAST(n2 AS BIGINT) AS n_low,
       CAST(round(m1 - m2, 4) AS DOUBLE) AS mean_diff,
       CAST(round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS DOUBLE) AS t_stat,
       CAST(round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                  / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                     + (v2 / n2) * (v2 / n2) / (n2 - 1.0)), 2) AS DOUBLE)
         AS welch_df
FROM v
"""


@query(
    "stats_welch_ttest",
    oracle=_WELCH_SQL.format(orders="orders"),
    tags=("stats", "agg"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic (urgent vs low
    priority order values) with Welch–Satterthwaite degrees of
    freedom, computed from ONE moment pass: counts and decimal-cast
    Σx / Σx² per group via FILTER-clause aggregates, then pure column
    arithmetic shared verbatim with the oracle (bit-identical
    doubles).

    Scale: a single partial+final aggregate over any number of rows —
    the same map-reduce shape as ml_multiple_regression; no shuffle
    keyed on data.
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w23_orders")
    return spark.sql(_WELCH_SQL.format(orders="v_w23_orders"))


# --------------------------------------------------------------------------
# Gini per nation — rank formula, partitioned windows
# --------------------------------------------------------------------------

_GINI_SQL = """
WITH x AS (
  SELECT n_name, o_totalprice AS x, o_orderkey,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY o_totalprice, o_orderkey) AS i
  FROM {joined}
), g AS (
  SELECT n_name,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS DECIMAL(32,8))) AS DOUBLE) AS s,
         CAST(sum(CAST(i * x AS DECIMAL(32,8))) AS DOUBLE) AS si
  FROM x GROUP BY n_name
)
SELECT n_name,
       CAST(n AS BIGINT) AS n_orders,
       CAST(round(2.0 * si / (n * s) - (n + 1.0) / n, 6) AS DOUBLE) AS gini
FROM g
"""

_GINI_JOIN_DUCKDB = """
  (SELECT n.n_name, o.o_totalprice, o.o_orderkey
   FROM orders o
   JOIN customer c ON o.o_custkey = c.c_custkey
   JOIN nation n ON c.c_nationkey = n.n_nationkey)
"""


@query(
    "stats_gini_by_nation",
    oracle=_GINI_SQL.format(joined=_GINI_JOIN_DUCKDB),
    tags=("stats", "window"),
)
def stats_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per customer nation via the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted
    values (orderkey tiebreak makes ranks deterministic). Both moment
    sums are decimal-cast, so the statistic is order-insensitive.

    Scale: windows are PARTITIONED by nation (no global sort), the
    two dims broadcast, and the final pass is one partitioned window
    + one hash aggregate — survives any fact size with bounded keys.
    """
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        o.join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)),
               o.o_custkey == F.col("c_custkey"))
        .select("n_name", "o_totalprice", "o_orderkey")
    )
    joined.createOrReplaceTempView("v_w23_gini_joined")
    return joined.sparkSession.sql(_GINI_SQL.format(joined="v_w23_gini_joined"))


# --------------------------------------------------------------------------
# compaction planner from real commit-log metadata
# --------------------------------------------------------------------------


@query(
    "lakehouse_compaction_planner",
    oracle="""
    WITH slices AS (
      SELECT o_orderstatus AS st, o_orderkey % 4 AS q, count(*) AS n_rows
      FROM orders GROUP BY 1, 2
    ), manifest AS (
      SELECT row_number() OVER (ORDER BY st, q) AS version, n_rows FROM slices
    ), ranked AS (
      SELECT version, n_rows,
             sum(n_rows) OVER (ORDER BY n_rows DESC, version
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cum_before
      FROM manifest
    )
    SELECT CAST(floor(coalesce(cum_before, 0) / 5000.0) AS BIGINT) AS bin_id,
           count(*) AS n_files,
           sum(n_rows) AS bin_rows,
           count(*) > 1 AS compactable
    FROM ranked GROUP BY 1
    """,
    tags=("lakehouse", "maintenance"),
)
def lakehouse_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning from REAL commit metadata: 12
    deliberately-small slices of orders (status × orderkey%4) are
    committed one file each to a lakehouse table, the commit log's
    per-commit row counts are read back as the file manifest, and the
    planner emits the greedy size-descending packing into ~5000-row
    target bins (files sorted largest-first, chunked at the running-
    sum boundary — the same shape Delta's OPTIMIZE uses to pick file
    groups). The oracle reconstructs the manifest relationally, so
    the gate proves the log metadata matches the data AND the packing
    arithmetic is right.

    Scale: the planner runs on the MANIFEST (one row per file — at
    100 TB that's ~10⁵ rows of metadata, not data), which is exactly
    why OPTIMIZE scheduling is cheap regardless of table size; only
    the chosen bins are rewritten.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_compactplan_"))
    # one aggregate discovers the nonempty slices (vs a precheck job
    # per slice): 12 appends follow, in the oracle's (status, quarter)
    # order so commit versions line up with its row_number
    slices = sorted(
        (r["o_orderstatus"], r["q"])
        for r in o.groupBy(
            "o_orderstatus", (F.col("o_orderkey") % 4).alias("q")
        )
        .count()
        .collect()
    )
    for st, q in slices:
        part = o.where(
            (F.col("o_orderstatus") == st) & (F.col("o_orderkey") % 4 == q)
        ).repartition(1)
        t.append(part, operation="append")
    manifest = spark.createDataFrame(
        [(c.version, c.row_count) for c in t.history() if c.operation == "append"],
        "version INT, n_rows BIGINT",
    )
    w = Window.orderBy(F.col("n_rows").desc(), "version").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = manifest.select(
        "version",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        ranked.groupBy(
            F.floor(F.col("cum_before") / 5000.0).cast("bigint").alias("bin_id")
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("bin_rows"),
            (F.count("*") > 1).alias("compactable"),
        )
    )
