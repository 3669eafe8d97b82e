"""Round-4 wave AD: Hilbert clustering, mergeable heavy-hitter
sketches, and geospatial bucketing.

- ``lakehouse_hilbert_cluster`` — OPTIMIZE ... CLUSTER BY on the
  Hilbert curve (the liquid-clustering layout) + the multi-dimension
  zone-map box scan it exists to serve, under the HASH gate; the
  query also asserts files were actually skipped.
- ``text_heavy_hitter_tokens`` — distributed Misra-Gries candidate
  pass + exact rescore: top-k corpus tokens with one bounded shuffle
  instead of a group per distinct token; exact (hash gate) because
  Zipf heads clear the sketch threshold by orders of magnitude.
- ``spatial_geohash_encode`` — base-32 geohash in pure JVM codegen,
  hash-gated against a generated bit-identical DuckDB expression.
- ``spatial_radius_join`` — all point pairs within a radius via
  grid-cell bucketing + 3×3 neighbor expansion (the spatial LSH):
  candidates meet in exactly one cell pair, then the exact metric
  filters — never O(n²).

Reference parity: clustering extends §2a op 33 (offload/compaction);
the sketch extends op 35's counters to frequency estimation; spatial
bucketing mirrors op 7's partition expansion in the spatial domain.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.operators.sketches import heavy_hitters
from lakehouse_test_spark.operators.spatial import (
    geohash_col,
    geohash_sql,
    radius_join_pairs,
)
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# deterministic synthetic coordinates for the spatial queries: pure
# integer arithmetic + one exact double division, so Spark and DuckDB
# derive bit-identical values from c_custkey; the quadratic mix
# breaks the lattice structure a linear congruence would impose
# (linear multipliers left ZERO pairs within any small radius — the
# two axes' residues never aligned)
_LAT = "(((((c_custkey * c_custkey) % 18000) * 7919) % 18000) / 100.0 - 90.0)"
_LON = "(((((c_custkey * c_custkey) % 36000) * 104729) % 36000) / 100.0 - 180.0)"


def _coords(cust: DataFrame) -> DataFrame:
    k = F.col("c_custkey")
    return cust.select(
        "c_custkey",
        (((k * k % 18000) * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        (((k * k % 36000) * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )


@query(
    "lakehouse_hilbert_cluster",
    oracle="""
    SELECT count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 400
      AND o_totalprice BETWEEN 10000 AND 50000
    """,
    tags=("lakehouse", "clustering", "hilbert", "pruning"),
)
def lakehouse_hilbert_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve reclustering + the 2-D box scan it serves.

    Orders land in custkey order (totalprice zone maps are useless),
    then ``hilbert_cluster(["o_custkey", "o_totalprice"])`` rewrites
    the table along the curve and ``scan_pruned_box`` answers a
    2-predicate box query from the zone maps.  The query RAISES if
    the clustered layout fails to skip at least one file — the gate
    checks values AND that the layout property held."""
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    table = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_hilbert_"))
    table.append(
        o.repartition(8, "o_custkey"),
        stats_cols=["o_custkey", "o_totalprice"],
    )
    table.hilbert_cluster(["o_custkey", "o_totalprice"], target_partitions=8)
    df, scanned, total = table.scan_pruned_box(
        {"o_custkey": (100, 400), "o_totalprice": (10000.0, 50000.0)}
    )
    if not scanned < total:
        raise AssertionError(
            f"hilbert layout skipped nothing: {scanned}/{total} files"
        )
    return (
        df.agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    ).localCheckpoint()


@query(
    "text_heavy_hitter_tokens",
    oracle="""
    SELECT token, n FROM (
      SELECT token, count(*) AS n
      FROM (
        SELECT unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'),
                 x -> x <> '')) AS token
        FROM documents
      )
      GROUP BY token
    )
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
    tags=("text", "sketch", "heavy-hitters", "documents"),
)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens via the distributed Misra-Gries sketch +
    exact rescore (operators/sketches.py).  The oracle is the exact
    full aggregation; they match because every Zipf-head token's
    frequency is orders of magnitude above the sketch's n/(s+1)
    recall threshold (margin pinned in tests/test_wave30.py)."""
    toks = (
        T(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias(
                "token"
            )
        )
        .where(F.col("token") != "")
    )
    return heavy_hitters(toks, "token", k=20, summary_size=4096).select(
        F.col("item").alias("token"), "n"
    )


def _geohash_oracle() -> str:
    parts = geohash_sql(_LAT, _LON, precision=6)
    return f"""
    WITH q AS (
      SELECT c_custkey,
             CAST({_LAT} AS DOUBLE) AS lat,
             CAST({_LON} AS DOUBLE) AS lon,
             {parts['nlon']} AS nlon,
             {parts['nlat']} AS nlat
      FROM customer
    ),
    hh AS (SELECT c_custkey, lat, lon, ({parts['h']}) AS h FROM q)
    SELECT c_custkey, lat, lon, ({parts['chars']}) AS geohash
    FROM hh
    """


@query(
    "spatial_geohash_encode",
    oracle=_geohash_oracle(),
    tags=("spatial", "geohash", "customer"),
)
def spatial_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-6 geohash of deterministic per-customer coordinates,
    computed entirely in JVM codegen (shift/and/or + array lookup, no
    UDF).  The oracle SQL is GENERATED from the same bit layout
    (operators/spatial.py:geohash_sql), so encoder and oracle cannot
    drift apart."""
    pts = _coords(T(spark, sf_dir, "customer"))
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        geohash_col(F.col("lat"), F.col("lon"), precision=6).alias("geohash"),
    )


@query(
    "spatial_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST({_LAT} AS DOUBLE) AS lat,
             CAST({_LON} AS DOUBLE) AS lon
      FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           round(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                 + ((a.lon - b.lon) * 0.5) * ((a.lon - b.lon) * 0.5)), 3)
             AS dist
    FROM pts a, pts b
    WHERE a.c_custkey < b.c_custkey
      AND sqrt((a.lat - b.lat) * (a.lat - b.lat)
               + ((a.lon - b.lon) * 0.5) * ((a.lon - b.lon) * 0.5)) <= 1.5
    """,
    tags=("spatial", "join", "radius", "customer"),
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 1.5 degree-units (equirectangular
    metric, fixed longitude scale 0.5 — only +,-,×,√, so Spark and
    the oracle agree bit-for-bit).  The plan is grid-cell bucketing +
    3×3 neighbor expansion + one hash join — linear in matching
    pairs; the oracle is the O(n²) cross join, feasible only at
    oracle scale."""
    pts = _coords(T(spark, sf_dir, "customer"))
    return radius_join_pairs(
        pts, "c_custkey", "lat", "lon", radius=1.5, lon_scale=0.5
    )


@query(
    "pipeline_cdc_apply",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice + CASE WHEN o_orderkey % 3 = 0
                                                   THEN 100.0 ELSE 0.0 END
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 5 <> 0
    GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "cdc", "merge", "orders"),
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog (op, seq) to a committed table — the
    Debezium/DMS consumption pattern:

    1. a deterministic changelog is derived from orders: INSERT for
       every key (seq 1), UPDATE (+100 price, seq 2) for keys
       divisible by 3, DELETE (seq 3) for keys divisible by 5;
    2. LATEST-WINS COMPACTION collapses the log to one row per key —
       a single ``max_by(struct, seq)``-style shuffle (window over
       key ordered by seq desc), never a per-event replay;
    3. the survivors split into upserts and deletes and apply to the
       lakehouse table as two atomic MERGE restates (WHEN MATCHED
       UPDATE / WHEN MATCHED DELETE) — the same compact-then-merge
       shape a 100 TB CDC consumer uses to amortize a day of
       changelog into one keyed join pass.

    The final snapshot must equal computing the net effect directly
    in SQL (the oracle) — any lost update, resurrected delete, or
    misordered seq changes the aggregate.
    """
    from pyspark.sql import Window

    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    inserts = o.withColumn("op", F.lit("I")).withColumn("seq", F.lit(1))
    updates = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    deletes = (
        o.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(3))
    )
    log = inserts.unionByName(updates).unionByName(deletes)

    # latest-wins compaction: one shuffle on the key
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )

    table = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_cdc_"))
    table.append(o)  # the pre-existing table the changelog lands on
    table.merge(
        latest.where(F.col("op") != "D").drop("op"),
        key_cols=["o_orderkey"],
    )
    table.merge(
        latest.where(F.col("op") == "D").drop("op"),
        key_cols=["o_orderkey"],
        when_matched="delete",
        insert_new=False,
    )
    return (
        table.snapshot()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
        .localCheckpoint()
    )


#: CCW convex pentagon in (x=lon, y=lat) — integer vertices, exactly
#: representable, shared by the Spark expression and the oracle
_POLY = [(-50.0, -20.0), (40.0, -40.0), (60.0, 20.0), (10.0, 55.0), (-45.0, 35.0)]


def _pip_oracle() -> str:
    from lakehouse_test_spark.operators.spatial import (
        point_in_convex_polygon_sql,
    )

    test = point_in_convex_polygon_sql(
        f"CAST({_LON} AS DOUBLE)", f"CAST({_LAT} AS DOUBLE)", _POLY
    )
    return f"SELECT c_custkey, {test} AS inside FROM customer"


@query(
    "spatial_point_in_polygon",
    oracle=_pip_oracle(),
    tags=("spatial", "polygon", "customer"),
)
def spatial_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-convex-polygon over the customer coordinate cloud:
    the half-plane cross-product test (pure +,-,× — bit-identical in
    both engines), evaluated as one codegen conjunction per point,
    zero shuffle.  The oracle SQL is generated from the SAME vertex
    list (operators/spatial.py), so geometry and oracle cannot
    drift."""
    from lakehouse_test_spark.operators.spatial import point_in_convex_polygon_col

    pts = _coords(T(spark, sf_dir, "customer"))
    return pts.select(
        "c_custkey",
        point_in_convex_polygon_col(
            F.col("lon"), F.col("lat"), _POLY
        ).alias("inside"),
    )


@query(
    "agg_kmv_distinct_sketch",
    oracle="""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
      FROM h
    ),
    kept AS (
      SELECT l_returnflag, count(*) AS n_h, max(hv) AS kth
      FROM ranked WHERE rn <= 256 GROUP BY l_returnflag
    ),
    exact AS (
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT k.l_returnflag,
           CAST(CASE WHEN k.n_h < 256 THEN k.n_h
                ELSE floor(255.0 * 1152921504606846976.0 / k.kth)
                END AS BIGINT) AS kmv_estimate,
           e.exact_distinct
    FROM kept k JOIN exact e USING (l_returnflag)
    """,
    tags=("agg", "sketch", "approx", "lineitem"),
)
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch whose ESTIMATE sits under the
    HASH gate — the trick the HLL gate (`agg_approx_sketches`,
    no_oracle by design) cannot pull off: KMV over an
    engine-agnostic hash (md5 hex → 60-bit int, identical in Spark
    and DuckDB) is a deterministic function of the data, so the
    APPROXIMATION ITSELF is value-checked, not just its error band.

    Plan shape at 100 TB: one hash-distinct shuffle on (group, h)
    (map-side partial dedup), one k-bounded window per group (k=256
    rows survive per group), then arithmetic — the sketch never holds
    more than k values per group, which is the whole point of KMV:
    estimate = (k-1) / kth-smallest-normalized-hash."""
    from pyspark.sql import Window

    K = 256
    li = T(spark, sf_dir, "lineitem")
    h = (
        li.select(
            "l_returnflag",
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("bigint")
            .alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    kept = (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_h"), F.max("hv").alias("kth"))
    )
    est = kept.select(
        "l_returnflag",
        F.when(F.col("n_h") < K, F.col("n_h"))
        .otherwise(
            F.floor(
                F.lit(float(K - 1)) * F.lit(1152921504606846976.0) / F.col("kth")
            )
        )
        .cast("bigint")
        .alias("kmv_estimate"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag")
