"""Round-3 wave T: MERGE under the hash gate, distribution tests,
closed-form multiple regression, URL canonicalization dedup, timezone
conversion, and log-domain products.

- ``lakehouse_merge_upsert`` finally puts the single most-used
  lakehouse operation — keyed MERGE (WHEN MATCHED UPDATE / WHEN NOT
  MATCHED INSERT) — under the value gate: the oracle reconstructs the
  post-merge table relationally (source ∪ target-minus-matched) so a
  merge that drops, duplicates, or mis-updates rows fails on values.
- ``stats_ks_test`` is the two-sample Kolmogorov–Smirnov D statistic
  computed exactly from the pooled ECDFs — the standard drift test a
  training pipeline runs between snapshots.
- ``ml_multiple_regression`` solves 2-feature OLS in closed form from
  one aggregate pass (normal equations + Cramer's rule); the oracle
  runs the *identical* arithmetic, so the gate checks nine
  decimal-exact co-moments and the full solve.
- ``dedup_url_canonicalize`` is crawl-style URL canonicalization
  (case, www., default port, trailing slash, fragment, tracking
  params, param order) feeding exact dedup — the first gate of every
  web-scale corpus pipeline.
- ``scalar_timezone_battery`` covers from_utc_timestamp /
  to_utc_timestamp incl. DST (America/New_York) and sub-hour offsets
  (Asia/Kolkata), checked against DuckDB's ``AT TIME ZONE`` chain.
- ``agg_product_geomean`` computes products and geometric means in
  the log domain with decimal-cast sums — the only shape that is both
  order-insensitive and underflow-proof at 100 TB row counts.
- ``sql_values_inline_table`` joins an inline VALUES literal dim —
  the SQL idiom for tiny lookup tables (always broadcast).

Reference parity: the reference has no comparable surface; these
extend SURVEY.md §2b (lakehouse ops, aggregations, scalar functions,
LLM-data dedup).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# lakehouse MERGE under the value gate
# --------------------------------------------------------------------------


@query(
    "lakehouse_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ), src AS (
      SELECT o_orderkey,
             'U' AS o_orderstatus,
             o_totalprice * 1.5 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ), merged AS (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "merge"),
)
def lakehouse_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE (upsert) under the hash gate: seed a lakehouse
    table with 2/3 of orders, merge a source that UPDATES every even
    key (status → 'U', price × 1.5) and INSERTS the even keys the
    target never had, then aggregate the post-merge snapshot. The
    oracle reconstructs the merge relationally — source rows plus
    target rows whose key the source doesn't carry — so any
    dropped/duplicated/mis-updated row flips the hash.

    Scale: merge() is one key-shuffled anti-join over the snapshot
    plus the source, committed atomically (plans/lakehouse.py:250);
    a real Delta MERGE adds file pruning via stats but the relational
    contract checked here is identical.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_merge_"))
    t.append(o.where(F.col("o_orderkey") % 3 != 0))
    src = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.5)
    )
    t.merge(src, key_cols=["o_orderkey"], when_matched="update", insert_new=True)
    return (
        t.snapshot()
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov
# --------------------------------------------------------------------------


@query(
    "stats_ks_test",
    oracle="""
    WITH pts AS (
      SELECT o_totalprice AS v,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS c_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS c_o
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_totalprice
    ), cum AS (
      SELECT sum(c_f) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_f,
             sum(c_o) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_o,
             sum(c_f) OVER () AS n_f,
             sum(c_o) OVER () AS n_o
      FROM pts
    )
    SELECT CAST(max(n_f) AS BIGINT) AS n_f,
           CAST(max(n_o) AS BIGINT) AS n_o,
           CAST(round(max(abs(CAST(cum_f AS DOUBLE) / CAST(n_f AS DOUBLE)
                             - CAST(cum_o AS DOUBLE) / CAST(n_o AS DOUBLE))), 6)
                AS DOUBLE) AS ks_d
    FROM cum
    """,
    tags=("stats", "window"),
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the o_totalprice
    distributions of finished ('F') vs open ('O') orders, computed
    EXACTLY: group to distinct values (ties collapse, so the ECDF is
    well-defined), one cumulative sum per sample over the shared
    sorted domain, D = max |ECDF_F − ECDF_O|. Integer counts divided
    as doubles — bit-identical in both engines.

    Scale: the grouped domain is |distinct values| — which GROWS with
    the data — so both ECDFs run through the HIERARCHICAL
    global_cumsum (one shared range shuffle + per-partition offsets,
    no Exchange SinglePartition), bit-identical to the global window
    it replaces; the totals come from a broadcast 1-row aggregate,
    not a whole-frame window.
    """
    from lakehouse_test_spark.operators.ordering import global_cumsum

    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus").isin("F", "O"))
    pts = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("c_f"),
        F.count_if(F.col("o_orderstatus") == "O").alias("c_o"),
    ).localCheckpoint()
    tot = pts.agg(
        F.sum("c_f").alias("n_f"), F.sum("c_o").alias("n_o")
    )
    cum = global_cumsum(pts, ["v"], ["c_f", "c_o"], ["cum_f", "cum_o"]).join(
        F.broadcast(tot)
    )
    return cum.agg(
        F.max("n_f").cast("bigint").alias("n_f"),
        F.max("n_o").cast("bigint").alias("n_o"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_f").cast("double") / F.col("n_f").cast("double")
                    - F.col("cum_o").cast("double") / F.col("n_o").cast("double")
                )
            ),
            6,
        )
        .cast("double")
        .alias("ks_d"),
    )


# --------------------------------------------------------------------------
# closed-form multiple regression (shared SQL template — the Spark side and
# the DuckDB oracle run the IDENTICAL expression tree, so the doubles match
# bit-for-bit)
# --------------------------------------------------------------------------

_OLS_SQL = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(32,8))) AS DOUBLE) AS s1,
         CAST(sum(CAST(l_discount AS DECIMAL(32,8))) AS DOUBLE) AS s2,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(32,8))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(32,8))) AS DOUBLE) AS s11,
         CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(32,8))) AS DOUBLE) AS s12,
         CAST(sum(CAST(l_discount * l_discount AS DECIMAL(32,8))) AS DOUBLE) AS s22,
         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(32,8))) AS DOUBLE) AS s1y,
         CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(32,8))) AS DOUBLE) AS s2y,
         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(32,8))) AS DOUBLE) AS syy
  FROM {lineitem}
), solved AS (
  SELECT n, sy, s1y, s2y, syy,
         n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det,
         sy * (s11 * s22 - s12 * s12)
           - s1 * (s1y * s22 - s12 * s2y)
           + s2 * (s1y * s12 - s11 * s2y) AS det0,
         n * (s1y * s22 - s12 * s2y)
           - sy * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s2y - s1y * s2) AS det1,
         n * (s11 * s2y - s1y * s12)
           - s1 * (s1 * s2y - s1y * s2)
           + sy * (s1 * s12 - s11 * s2) AS det2
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(round(det0 / det, 4) AS DOUBLE) AS beta_intercept,
       CAST(round(det1 / det, 4) AS DOUBLE) AS beta_quantity,
       CAST(round(det2 / det, 4) AS DOUBLE) AS beta_discount,
       CAST(round(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                         - (det2 / det) * s2y)
                      / (syy - sy * sy / n), 6) AS DOUBLE) AS r2
FROM solved
"""


@query(
    "ml_multiple_regression",
    oracle=_OLS_SQL.format(lineitem="lineitem"),
    tags=("ml", "agg"),
)
def ml_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (extendedprice ~ quantity + discount) solved in
    closed form: ONE aggregate pass collects the nine co-moments with
    decimal-cast (order-insensitive, overflow-safe DECIMAL(32,8))
    sums, then the 3×3 normal equations are solved by Cramer's rule
    in plain column arithmetic. The Spark side and the oracle execute
    the same SQL template, so every double matches bit-for-bit and
    the gate verifies both the moments and the solve.

    Scale: this is the map-reduce shape of linear model fitting — a
    single partial+final aggregate over any number of rows, O(1)
    state, no iteration, no driver-side data. (For d features it's
    the d² co-moment matrix + a tiny driver-side solve — the same
    pattern ml_decision_stump / agg_linear_regression use.)
    """
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("v_w22_lineitem")
    return spark.sql(_OLS_SQL.format(lineitem="v_w22_lineitem"))


# --------------------------------------------------------------------------
# URL canonicalization dedup
# --------------------------------------------------------------------------


@query(
    "dedup_url_canonicalize",
    oracle="""
    WITH messy AS (
      SELECT doc_id, lang, source,
             CAST(floor(doc_id / 2.0) AS BIGINT) AS page_id,
             doc_id % 4 AS variant
      FROM documents
    ), urls AS (
      SELECT doc_id,
             CASE variant
               WHEN 0 THEN 'https://' || upper(source) || '.EXAMPLE.COM/page/'
                           || CAST(page_id AS VARCHAR) || '?utm_source=feed&lang=' || lang
               WHEN 1 THEN 'https://' || source || '.example.com:443/page/'
                           || CAST(page_id AS VARCHAR) || '/?lang=' || lang
               WHEN 2 THEN 'https://www.' || source || '.example.com/page/'
                           || CAST(page_id AS VARCHAR) || '?lang=' || lang || '&ref=tw#frag'
               ELSE 'https://' || source || '.example.com/page/'
                           || CAST(page_id AS VARCHAR) || '?lang=' || lang
             END AS url
      FROM messy
    ), canon AS (
      SELECT doc_id,
             replace(replace(regexp_replace(lower(url), '#.*$', ''),
                             ':443/', '/'),
                     '://www.', '://') AS u
      FROM urls
    ), parts AS (
      SELECT doc_id,
             regexp_replace(split_part(u, '?', 1), '/$', '') AS path,
             array_to_string(
               list_sort(list_filter(string_split(split_part(u, '?', 2), '&'),
                 p -> p <> '' AND substr(p, 1, 4) <> 'utm_'
                      AND substr(p, 1, 4) <> 'ref=')),
               '&') AS qs
      FROM canon
    )
    SELECT path || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM parts
    GROUP BY 1
    """,
    tags=("dedup", "text", "url"),
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-style URL canonicalization feeding exact dedup: four
    messy variants of each page URL (uppercase host, explicit :443,
    www. prefix, trailing slash, #fragment, utm_*/ref= tracking
    params, shuffled param order) are normalized — lowercase, strip
    fragment/default-port/www./trailing-slash, drop tracking params,
    sort the survivors — and grouped. The fixtures carry no URL
    column, so the query synthesizes the variants deterministically
    (the scalar_url_parse convention) and the oracle canonicalizes
    them independently with DuckDB's list functions.

    Scale: pure codegen string/array projection (zero shuffle before
    the final groupBy on the canonical key) — at 100 TB this IS the
    first pass of web dedup, and the canonical key becomes the
    partition key every later stage reuses.
    """
    d = T(spark, sf_dir, "documents")
    page_id = F.floor(F.col("doc_id") / 2.0).cast("bigint")
    variant = F.col("doc_id") % 4
    pid = page_id.cast("string")
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("https://"), F.upper("source"), F.lit(".EXAMPLE.COM/page/"),
                pid, F.lit("?utm_source=feed&lang="), F.col("lang"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com:443/page/"),
                pid, F.lit("/?lang="), F.col("lang"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://www."), F.col("source"), F.lit(".example.com/page/"),
                pid, F.lit("?lang="), F.col("lang"), F.lit("&ref=tw#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/page/"),
                pid, F.lit("?lang="), F.col("lang"),
            )
        )
    )
    u = F.replace(
        F.replace(
            F.regexp_replace(F.lower(url), r"#.*$", ""),
            F.lit(":443/"), F.lit("/"),
        ),
        F.lit("://www."), F.lit("://"),
    )
    path = F.regexp_replace(F.split_part(u, F.lit("?"), F.lit(1)), r"/$", "")
    qs = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.split_part(u, F.lit("?"), F.lit(2)), "&"),
                lambda p: (p != "")
                & (F.substring(p, 1, 4) != "utm_")
                & (F.substring(p, 1, 4) != "ref="),
            )
        ),
        "&",
    )
    canonical = F.concat(
        path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )
    return (
        d.select(F.col("doc_id"), canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


# --------------------------------------------------------------------------
# timezone conversion battery
# --------------------------------------------------------------------------


@query(
    "scalar_timezone_battery",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             o_orderdate + INTERVAL (o_orderkey % 86400) SECOND AS ts
      FROM orders
    ), conv AS (
      SELECT o_orderkey, ts,
             (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS tokyo,
             (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ny,
             (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata' AS kolkata
      FROM t
    )
    SELECT o_orderkey,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_utc,
           strftime(tokyo, '%Y-%m-%d %H:%M:%S') AS tokyo_local,
           strftime(ny, '%Y-%m-%d %H:%M:%S') AS ny_local,
           CAST(hour(ny) AS INTEGER) AS ny_hour,
           CAST((epoch(ny) - epoch(ts)) / 3600 AS INTEGER) AS ny_offset_h,
           CAST((epoch(kolkata) - epoch(ts)) / 60 AS INTEGER) AS kolkata_offset_min,
           ((tokyo AT TIME ZONE 'Asia/Tokyo') AT TIME ZONE 'UTC') = ts AS roundtrip_ok
    FROM conv
    """,
    tags=("scalar", "timezone"),
)
def scalar_timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_utc_timestamp / to_utc_timestamp battery over a
    full-day spread of timestamps (orderdate + key-derived seconds):
    a DST-observing zone (America/New_York — offset flips −5/−4
    across the 1992-1998 fixture range), a fixed-offset zone
    (Asia/Tokyo, exercised round-trip), and a sub-hour offset
    (Asia/Kolkata, +330 min). The oracle is DuckDB's two-step
    ``AT TIME ZONE`` chain, which matches Spark's from_utc_timestamp
    semantics exactly (verified incl. the spring-forward gap).
    Timestamps are emitted as formatted strings per the registry's
    no-raw-timestamp rule; the round trip runs through Tokyo only —
    fall-back wall times are ambiguous under DST and engines may
    legally disagree there.

    Scale: pure codegen projection, zero shuffle; timezone rules are
    evaluated JVM-side from the embedded tzdb.
    """
    o = T(spark, sf_dir, "orders")
    ts = F.expr("timestampadd(SECOND, CAST(o_orderkey % 86400 AS INT), o_orderdate)")
    base = o.select("o_orderkey", ts.alias("ts"))
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    kolkata = F.from_utc_timestamp("ts", "Asia/Kolkata")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return base.select(
        "o_orderkey",
        F.date_format("ts", fmt).alias("ts_utc"),
        F.date_format(tokyo, fmt).alias("tokyo_local"),
        F.date_format(ny, fmt).alias("ny_local"),
        F.hour(ny).cast("int").alias("ny_hour"),
        ((F.unix_timestamp(ny) - F.unix_timestamp("ts")) / 3600)
        .cast("int")
        .alias("ny_offset_h"),
        ((F.unix_timestamp(kolkata) - F.unix_timestamp("ts")) / 60)
        .cast("int")
        .alias("kolkata_offset_min"),
        (F.to_utc_timestamp(tokyo, "Asia/Tokyo") == F.col("ts")).alias("roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# log-domain products / geometric means
# --------------------------------------------------------------------------


@query(
    "agg_product_geomean",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(round(exp(CAST(sum(CAST(ln(l_quantity) AS DECIMAL(28,12)))
                               AS DOUBLE) / count(*)), 5) AS DOUBLE) AS geomean_qty,
           CAST(round(CAST(sum(CAST(log10(1.0 - l_discount) AS DECIMAL(28,12)))
                           AS DOUBLE), 4) AS DOUBLE) AS log10_disc_retention,
           CAST(round(exp(CAST(sum(CAST(ln(1.0 - l_discount) AS DECIMAL(28,12)))
                               AS DOUBLE) / count(*)), 6) AS DOUBLE) AS mean_retention
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "math"),
)
def agg_product_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Products and geometric means the scale-safe way: in the log
    domain. The product of (1 − discount) over even a few thousand
    rows underflows a double to 0.0, so the query reports
    Σ log10(1−d) (the product's exponent — exact information, no
    underflow) and exp(mean(ln·)) geometric means. Log terms are
    decimal-cast before summation (the fpsafe convention), making the
    aggregate order-insensitive; rounding absorbs the ≤1-ulp libm
    differences between the JVM's and DuckDB's ln/log10 on the small
    distinct input domains (quantity 1..50, discount 0.00..0.10).

    Scale: one partial+final hash aggregate; the log-domain identity
    is what makes "multiply a column over a 100 TB group" computable
    at all.
    """
    li = T(spark, sf_dir, "lineitem")
    dec = "decimal(28,12)"
    n = F.count("*")
    return li.groupBy("l_returnflag").agg(
        n.alias("n_rows"),
        F.round(
            F.exp(F.sum(F.log(F.col("l_quantity")).cast(dec)).cast("double") / n), 5
        )
        .cast("double")
        .alias("geomean_qty"),
        F.round(
            F.sum(F.log10(F.lit(1.0) - F.col("l_discount")).cast(dec)).cast("double"),
            4,
        )
        .cast("double")
        .alias("log10_disc_retention"),
        F.round(
            F.exp(
                F.sum(F.log(F.lit(1.0) - F.col("l_discount")).cast(dec)).cast("double")
                / n
            ),
            6,
        )
        .cast("double")
        .alias("mean_retention"),
    )


# --------------------------------------------------------------------------
# inline VALUES dim join
# --------------------------------------------------------------------------


@query(
    "sql_values_inline_table",
    oracle="""
    WITH tiers AS (
      SELECT * FROM (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                            ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                            ('5-LOW', 'cold')) AS t(priority, tier)
    )
    SELECT tier,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders JOIN tiers ON o_orderpriority = priority
    GROUP BY tier
    """,
    tags=("sql", "join"),
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES literal dim joined to a fact — the SQL idiom for
    tiny lookup/mapping tables, written in pure Spark SQL so the
    VALUES parser path itself is exercised.

    Scale: a 5-row plan-literal dim is always broadcast (Catalyst
    folds it to a LocalRelation → BroadcastHashJoin — no shuffle on
    the fact side).
    """
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w22_orders")
    return spark.sql(
        """
        WITH tiers AS (
          SELECT * FROM (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                                ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                                ('5-LOW', 'cold')) AS t(priority, tier)
        )
        SELECT tier,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_price
        FROM v_w22_orders JOIN tiers ON o_orderpriority = priority
        GROUP BY tier
        """
    )
