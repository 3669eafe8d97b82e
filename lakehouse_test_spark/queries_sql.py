"""Queries authored in PURE Spark SQL (``spark.sql`` over registered
temp views) — the second half of the mandated DataFrame/SQL API
surface. Semantics and plans are identical to the DataFrame API
(both land in Catalyst); these entries prove the engine's SQL door
works end-to-end, including the optimizer features SQL users lean on
hardest: CTEs, window frames, correlated-subquery decorrelation, and
LATERAL VIEW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register (idempotently) a temp view for a fixture table and
    return its name. Views are session-scoped metadata — zero data
    movement."""
    vname = f"v_{name}"
    load_table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@query(
    "sql_cte_window_share",
    oracle="""
    WITH monthly AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders
      GROUP BY 1, 2
    )
    SELECT o_custkey, month,
           CAST(round(spend, 2) AS DOUBLE) AS spend,
           CAST(round(CAST(spend AS DOUBLE) * 100.0
                      / CAST(sum(spend) OVER (PARTITION BY month) AS DOUBLE), 4)
                AS DOUBLE) AS pct_of_month
    FROM monthly
    WHERE o_custkey <= 100
    """,
    tags=("sql", "window", "agg"),
)
def sql_cte_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window share-of-total in pure SQL: per-customer monthly
    spend as a percentage of that month's total.

    Scale: same plan the DataFrame twin would get — partial agg into
    the (custkey, month) shuffle, then a month-partitioned window. The
    custkey filter must NOT push below the window (the percentage is
    of the WHOLE month) and Catalyst correctly keeps it above, since
    it references a non-partition column of the window.
    """
    v = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        WITH monthly AS (
          SELECT o_custkey,
                 to_date(date_trunc('month', o_orderdate)) AS month,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
          FROM {v}
          GROUP BY 1, 2
        )
        SELECT o_custkey, month,
               CAST(round(spend, 2) AS DOUBLE) AS spend,
               CAST(round(CAST(spend AS DOUBLE) * 100.0
                          / CAST(sum(spend) OVER (PARTITION BY month) AS DOUBLE), 4)
                    AS DOUBLE) AS pct_of_month
        FROM monthly
        WHERE o_custkey <= 100
        """
    )


@query(
    "sql_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          )
    """,
    tags=("sql", "subquery", "semi", "anti"),
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS in pure SQL: customers with a
    big order but no finished orders.

    Scale: Catalyst decorrelates both subqueries into a LeftSemi and a
    LeftAnti hash join — no per-row re-execution (the plan pin in
    tests/test_plans.py asserts exactly that). This is the query shape
    where a naive engine goes O(n²); declaring it in SQL and letting
    the optimizer rewrite is the whole Spark-first thesis.
    """
    vc = _view(spark, sf_dir, "customer")
    vo = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name
        FROM {vc} c
        WHERE EXISTS (
                SELECT 1 FROM {vo} o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
              )
          AND NOT EXISTS (
                SELECT 1 FROM {vo} o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
        """
    )


@query(
    "sql_lateral_explode_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
      WHERE doc_id < 50
    )
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n
    FROM toks
    WHERE term <> ''
    GROUP BY doc_id, term
    HAVING count(*) >= 3
    """,
    tags=("sql", "explode", "text"),
)
def sql_lateral_explode_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode in pure SQL: per-doc term frequencies for
    repeated terms — the SQL spelling of the tokenize→explode→count
    pipeline (generator runs inside the scan stage, map-side).
    """
    v = _view(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        SELECT doc_id, term, count(*) AS n
        FROM {v}
        LATERAL VIEW explode(split(lower(text), '\\\\s+')) t AS term
        WHERE doc_id < 50 AND term <> ''
        GROUP BY doc_id, term
        HAVING count(*) >= 3
        """
    )


@query(
    "sql_lateral_column_alias",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,6)) AS p
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           CAST(round(p * 0.07, 2) AS DOUBLE) AS tax,
           CAST(round(round(p * 0.07, 2) + p, 2) AS DOUBLE) AS gross,
           CAST(round((round(p * 0.07, 2) + p) * 0.99, 2) AS DOUBLE)
             AS discounted_gross
    FROM t
    """,
    tags=("sql", "scalar"),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    a SIBLING alias in the same list (``tax`` feeds ``gross`` feeds
    ``discounted_gross``) — the ergonomic form that otherwise forces
    nested subqueries. The oracle expands the chain manually, pinning
    that Spark's lateral resolution computes exactly the nested
    expression.

    Scale: resolution is purely analytical — one projection in the
    physical plan, same as the hand-expanded form."""
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, tax, gross, discounted_gross
        FROM (
          SELECT o_orderkey,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS p,
                 round(p * 0.07, 2) AS tax_d,
                 CAST(tax_d AS DOUBLE) AS tax,
                 round(tax_d + p, 2) AS gross_d,
                 CAST(gross_d AS DOUBLE) AS gross,
                 CAST(round(gross_d * 0.99, 2) AS DOUBLE) AS discounted_gross
          FROM {o} WHERE o_orderkey <= 2000
        )
        """
    )