"""Second TPC-H-shaped wave (SURVEY.md §2b): multi-nation volume
analysis, market share, correlated/decorrelated subqueries, grouped
semi/anti patterns — the join-agg-subquery shapes the first wave
didn't cover. Adapted to the fixture schema (no partsupp/commitdate;
lineitem serves as the part↔supplier bridge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import ddiv, dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Scale: both nation joins broadcast; the symmetric filter lands
    before aggregation; the only big shuffle is lineitem⋈orders.
    """
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dround(dsum(F.col("volume")), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(round(CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                      / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional volume per year
    (conditional-sum ratio over an 8-way star join)."""
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol, "nation")
    )
    return j.groupBy("o_year").agg(
        F.round(
            ddiv(
                dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0)),
                dsum(F.col("volume")),
            ),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for a part
    subset (retailprice·qty stands in for the missing supplycost).

    The per-row amount is cast to DECIMAL before summing: decimal
    addition is exact and associative, so partial-aggregation order
    (Spark) vs sequential order (DuckDB oracle) cannot produce
    boundary-straddling rounding differences. Use this pattern for
    any high-cardinality float-sum comparison.
    """
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)").alias("amount")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"), amount)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT priority_class,
           count(*) AS n_lines,
           count(*) FILTER (WHERE CAST(l_shipdate AS DATE)
                                  > CAST(o_orderdate AS DATE) + 30) AS late_lines
    FROM (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'high' ELSE 'low' END AS priority_class,
             l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    GROUP BY priority_class
    """,
    tags=("join", "agg", "tpch"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts by priority class
    (CASE bucketing + FILTER-style conditional count)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    late = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .otherwise("low")
        .alias("priority_class"),
        (F.col("l_shipdate").cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 30)).alias(
            "is_late"
        ),
    )
    return late.groupBy("priority_class").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_lines"),
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (CTE reuse +
    scalar max subquery; ties all returned — no arbitrary pick)."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    s = T(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("mr"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", dround(F.col("total_revenue"), 2).alias("total_revenue"))
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "tpch"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part group
    (lineitem as the part↔supplier bridge; NOT-equal + IN filters)."""
    p = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS ap, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) t ON ap = p_partkey
    WHERE p_brand = 'Brand#2' AND l_quantity < half_avg
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg-quantity subquery, decorrelated into
    a pre-aggregated join (the classic rewrite Spark would also do).

    Scale: the per-part avg reduces lineitem to part cardinality
    before the join; without decorrelation this is a per-row
    subquery — the rewrite is the difference between O(n) and O(n²).
    """
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2")
    half_avg = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(half_avg, F.col("ap") == p.p_partkey)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(dsum(F.col("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > (
        SELECT 0.8 * avg(q) FROM (
          SELECT sum(l_quantity) AS q FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey))
    )
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose yearly volume exceeds 80% of
    the mean supplier volume (nested aggregate → semi join)."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q"))
    threshold = per_supp.agg((0.8 * F.avg("q")).alias("thr"))
    heavy = per_supp.crossJoin(F.broadcast(threshold)).where(F.col("q") > F.col("thr"))
    s = T(spark, sf_dir, "supplier")
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey % 10 AS cntrycode,
           count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
    tags=("anti", "agg", "subquery", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no orders by country code
    (scalar subquery + anti join + group)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dround(dsum(F.col("c_acctbal")), 2).alias("totacctbal"),
        )
    )


@query(
    "subquery_in_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice AS price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
    """,
    tags=("semi", "anti", "subquery"),
)
def subquery_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (semi/anti joins after decorrelation)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    big = T(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .join(big, o.o_orderkey == big.l_orderkey, "left_anti")
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (left
    join with a residual predicate → double aggregation; customers
    with zero qualifying orders land in the c_count=0 bucket).

    Scale: first agg shuffles on custkey (customer cardinality),
    second on c_count (tiny) — the histogram over a join is two
    cheap shuffles, never a cross-count on the driver.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(avg(l_extendedprice / l_quantity), 4) AS DOUBLE) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM costs GROUP BY l_partkey)
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           CAST(round(min_cost, 4) AS DOUBLE) AS unit_cost
    FROM part
      JOIN best  ON p_partkey = best.l_partkey
      JOIN costs ON costs.l_partkey = p_partkey AND costs.unit_cost = best.min_cost
      JOIN supplier ON s_suppkey = costs.l_suppkey
    WHERE p_size < 10
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the min-cost supplier per part (correlated min
    subquery decorrelated into agg + join-back; ties all returned).

    Scale: unit costs aggregate lineitem down to (part,supplier)
    cardinality first; the min re-join shares the partkey
    partitioning, so AQE avoids a second full shuffle.
    """
    li = T(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_cost")
    )
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = T(spark, sf_dir, "part").where(F.col("p_size") < 10)
    s = T(spark, sf_dir, "supplier")
    return (
        costs.join(best, ["l_partkey"])
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.round("min_cost", 4).alias("unit_cost"),
        )
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(round(value, 2) AS DOUBLE) AS part_value
    FROM pv
    WHERE value > (SELECT sum(value) * 0.0005 FROM pv)
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: value concentration with a global-aggregate
    scalar subquery (fixture has no partsupp, so lineitem stands in as
    the part↔supplier bridge and extendedprice*quantity as the stock
    value — same group → global-scalar → filter → sort plan).

    Scale: one shuffle to part grain, then a single-row broadcast for
    the threshold; decimal sums keep the > comparison exact across
    engines. The filter's selectivity tightens as SF grows (fixed
    fraction of a growing total), mirroring Q11's 1/SF constant.
    """
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    val = (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)")
    pv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
    )
    total = pv.agg((F.sum("value") * F.lit(0.0005)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH j AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    po AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM j GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM j JOIN po USING (l_orderkey)
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation   ON s_nationkey = n_nationkey
    WHERE late AND n_supp >= 2 AND n_late = 1 AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders. The fixture has no commit/receipt dates, so 'late' is
    shipdate > orderdate + 90 days; the classic EXISTS / NOT EXISTS
    pair is decorrelated into per-order distinct counts (n_supp ≥ 2,
    exactly one late supplier) — the rewrite Spark's optimizer would
    otherwise have to find itself.

    Scale: one shuffle to order grain for the counts, re-joined to the
    late rows on the same key (exchange reuse); supplier/nation joins
    follow AQE sizing; top-20 is a TakeOrdered.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
        )
    )
    po = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        j.where(F.col("late"))
        .join(po, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
