"""Round-3 wave V: governance writes under the value gate and the
SQL-registration API surfaces.

- ``lakehouse_constraints_generated`` exercises the Delta-style write
  contract end-to-end: a CHECK constraint that REJECTS a violating
  batch (atomically — nothing lands), plus a GENERATED ALWAYS AS
  column computed by the writer, with the post-write snapshot
  aggregated under the hash gate so the oracle proves (a) the bad
  batch left no rows and (b) the generated values match the
  expression.
- ``sql_udf_registered`` goes through ``spark.udf.register`` and calls
  the Python UDF from a SQL string — the registration path SQL users
  hit, distinct from the DataFrame-side pandas_udf battery. The UDF
  is integer arithmetic, so the oracle reproduces it exactly in SQL.
- ``sql_join_hint_broadcast`` uses the SQL hint comment syntax
  (``/*+ BROADCAST(...) */``) — semantics identical to the unhinted
  join (same oracle), with the plan pinned to BroadcastHashJoin in
  tests/test_plans.py.

Reference parity: the reference's CLI validates inputs but has no
constraint system; these extend SURVEY.md §2b lakehouse ops and the
UDF matrix.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.fpsafe import dround, dsum
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "lakehouse_constraints_generated",
    oracle="""
    WITH accepted AS (
      SELECT o_orderkey, o_totalprice,
             CAST(year(o_orderdate) AS INTEGER) AS order_year
      FROM orders WHERE o_totalprice > 0
    )
    SELECT order_year,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM accepted
    GROUP BY order_year
    """,
    tags=("lakehouse", "governance"),
)
def lakehouse_constraints_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-contract governance under the hash gate: the table
    carries CHECK (o_totalprice > 0) and GENERATED ALWAYS AS
    order_year = year(o_orderdate). The good batch lands with the
    generated column computed by the writer; a deliberately-violating
    batch (prices negated) must be rejected ATOMICALLY — the query
    then aggregates the snapshot BY THE GENERATED COLUMN, so the
    oracle (which recomputes year() relationally and keeps only
    positive prices) fails the hash if the bad batch leaked any rows
    or the generated values drifted from the expression.

    Scale: constraint validation is one codegen predicate scan over
    the incoming batch only (never the table); generated columns are
    a projection added before write — both are O(batch), not O(table),
    exactly like Delta's writer-side enforcement
    (plans/lakehouse.py:897-940).
    """
    from lakehouse_test_spark.plans.lakehouse import (
        ConstraintViolationError,
        LakehouseTable,
    )

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_constraints_"))
    t.add_constraint("positive_price", "o_totalprice > 0")
    t.add_generated_column("order_year", "CAST(year(o_orderdate) AS INT)")
    t.append(o)
    rejected = 0
    try:
        t.append(o.withColumn("o_totalprice", -F.col("o_totalprice")))
    except ConstraintViolationError:
        rejected = 1
    assert rejected == 1, "violating batch must be rejected"
    return (
        t.snapshot()
        .groupBy("order_year")
        .agg(
            F.count("*").alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
    )


@query(
    "sql_udf_registered",
    oracle="""
    SELECT (o_orderkey * 2654435761) % 1000 AS bucket,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY 1
    """,
    tags=("udf", "sql"),
)
def sql_udf_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF registered into the SQL namespace via
    ``spark.udf.register`` and invoked from a SQL STRING — the
    catalog-function path (CREATE FUNCTION analog), distinct from
    the DataFrame-side pandas_udf battery. The function is Knuth
    multiplicative-hash bucketing in exact integer arithmetic, so the
    DuckDB oracle reproduces it verbatim.

    Scale: a row-at-a-time Python UDF is the SLOW path (documented
    tradeoff vs the codegen expression in the oracle — the same
    bucketing is expressible as a built-in, and production code
    should prefer it); the query exists to pin the registration API,
    not to recommend the plan. Arrow batching
    (spark.sql.execution.pythonUDF.arrow.enabled) applies when on.
    """
    spark.udf.register(
        "knuth_bucket", lambda k: (k * 2654435761) % 1000, "bigint"
    )
    T(spark, sf_dir, "orders").createOrReplaceTempView("v_w24_orders")
    return spark.sql(
        """
        SELECT knuth_bucket(o_orderkey) AS bucket,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_price
        FROM v_w24_orders
        GROUP BY 1
        """
    )


@query(
    "sql_join_hint_broadcast",
    oracle="""
    SELECT n_name,
           count(*) AS n_suppliers,
           CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "join", "hint"),
)
def sql_join_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL hint-comment syntax: ``/*+ BROADCAST(n) */`` forces the
    nation side to broadcast from inside the SQL text — the knob SQL
    users reach for when statistics mislead the planner. Semantics
    are identical to the unhinted join (same oracle); the plan is
    pinned to BroadcastHashJoin in tests/test_plans.py.

    Scale: the hint pins the safe choice here (25-row dim); the
    anti-pattern — hint-broadcasting a scale-growing table — is what
    test_q9_aqe_broadcasts_without_hint guards against elsewhere.
    """
    T(spark, sf_dir, "supplier").createOrReplaceTempView("v_w24_supplier")
    T(spark, sf_dir, "nation").createOrReplaceTempView("v_w24_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n_name,
               count(*) AS n_suppliers,
               CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_acctbal
        FROM v_w24_supplier s JOIN v_w24_nation n ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "scalar_collation_counts",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN upper(source)
                  WHEN doc_id % 3 = 1 THEN source
                  ELSE concat(upper(substr(source, 1, 1)), substr(source, 2))
             END AS s
      FROM documents
    )
    SELECT count(DISTINCT s) AS n_distinct_cs,
           count(DISTINCT lower(s)) AS n_distinct_ci,
           count(*) FILTER (WHERE lower(s) = 'web') AS n_web_ci
    FROM mixed
    """,
    tags=("scalar", "collation"),
)
def scalar_collation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: COUNT DISTINCT and equality under
    UTF8_LCASE collation over a deliberately case-mangled column
    (upper / as-is / title-case by doc_id). The collated distinct
    count and predicate match DuckDB's lower() semantics — grouping
    ON the collated key itself is avoided because the representative
    casing an engine surfaces is implementation-defined.

    Scale: collation comparisons run in codegen (specialized
    UTF8_LCASE comparators, no per-row lowercase materialization) —
    distinct/join/sort on collated keys shuffles the raw bytes, not
    lowercased copies.
    """
    d = T(spark, sf_dir, "documents")
    s = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(F.initcap("source"))
    )
    sc = F.collate(s, "UTF8_LCASE")
    return d.select(s.alias("s"), sc.alias("sc")).agg(
        F.countDistinct("s").alias("n_distinct_cs"),
        F.countDistinct("sc").alias("n_distinct_ci"),
        F.count_if(F.col("sc") == F.lit("web")).alias("n_web_ci"),
    )


@query(
    "lakehouse_partition_evolution",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
    tags=("lakehouse", "partition"),
)
def lakehouse_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style partition-spec evolution under the hash gate:
    the first half of orders lands UNPARTITIONED (the pre-evolution
    era), then the spec evolves to identity-partition on
    o_orderstatus and the second half lands with one file per status
    and min==max zone maps. The status='F' lookup then prunes every
    non-F file of the new-spec commit while - correctly - keeping all
    old-spec files (they carry no status stats, so skipping them
    would be unsafe; this is exactly Iceberg's evolved-spec scan
    contract). The residual row-level predicate makes the result
    value-exact, which the oracle verifies over raw orders.

    Scale: spec evolution never rewrites history - old files stay
    valid, new files get the new pruning dimension - so changing the
    partitioning of a 100 TB table is a metadata operation;
    tests/test_lakehouse_maint.py pins the asymmetric file-skipping.
    """
    from lakehouse_test_spark.plans.lakehouse import LakehouseTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    mid = o.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    t = LakehouseTable(spark, tempfile.mkdtemp(prefix="lh_specevo_"))
    t.append(o.where(F.col("o_orderkey") <= mid))
    t.set_partition_spec(["o_orderstatus"])
    t.append_partitioned(o.where(F.col("o_orderkey") > mid))
    pruned, _scanned, _total = t.scan_pruned("o_orderstatus", "F", "F")
    return (
        pruned.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            dround(dsum(F.col("o_totalprice")), 2).alias("total_price"),
        )
    )
