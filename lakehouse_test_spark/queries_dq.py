"""Data-quality operators: referential-integrity audit, declarative
expectation checks, and deterministic weighted sampling.

The DQ pass every lakehouse ingest runs between landing and
publishing a table (the reference's counter-based verification —
SURVEY.md §2a op 35 — generalized from "did every message arrive" to
"does the landed data satisfy its contract").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'orders.o_custkey -> customer' AS fk,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
    tags=("dq", "join"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key conformance audit: orphan counts for each declared
    FK edge of the star schema — the join-integrity gate before
    publishing a table version.

    Each edge is one LEFT ANTI join (hash, null-safe) counting rows
    whose key has no match in the parent. Anti joins broadcast the
    parent when small (nation) and shuffle-hash otherwise — exactly
    the plan a fact-to-dim integrity sweep needs at 100 TB; no
    row-level orphan list is materialized here, only counts (the
    drill-down query is the same join minus the count).
    """
    cases = [
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for fk, child, ck, parent, pk in cases:
        c = T(spark, sf_dir, child)
        p = T(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        parts.append(
            c.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


@query(
    "dq_expectations",
    oracle="""
    SELECT 'orders.o_totalprice_positive' AS expectation,
           count(*) AS n_checked,
           count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS n_failed
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderstatus_domain',
           count(*),
           count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM orders
    UNION ALL
    SELECT 'events.ts_in_range',
           count(*),
           count(*) FILTER (WHERE ts < TIMESTAMP '2020-01-01'
                               OR ts > TIMESTAMP '2030-01-01')
    FROM events
    UNION ALL
    SELECT 'documents.text_nonempty',
           count(*),
           count(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0)
    FROM documents
    """,
    tags=("dq", "agg"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation checks (Deequ/Great-Expectations
    shape): each rule is a conditional count evaluated in the same
    scan as the row count — N rules over one table cost ONE pass, not
    N (all rules fold into a single aggregate projection, map-side
    combined). Rules here: positivity, categorical domain, timestamp
    range, non-empty text."""
    o = T(spark, sf_dir, "orders")
    e = T(spark, sf_dir, "events")
    d = T(spark, sf_dir, "documents")

    def check(df: DataFrame, name: str, failed) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.count_if(failed).alias("n_failed"),
        ).select(F.lit(name).alias("expectation"), "n_checked", "n_failed")

    o_rules = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).alias("f1"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias("f2"),
    )
    o_part = o_rules.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders.o_totalprice_positive").alias("expectation"),
                    F.col("n").alias("n_checked"),
                    F.col("f1").alias("n_failed"),
                ),
                F.struct(
                    F.lit("orders.o_orderstatus_domain").alias("expectation"),
                    F.col("n").alias("n_checked"),
                    F.col("f2").alias("n_failed"),
                ),
            )
        ).alias("r")
    ).select("r.expectation", "r.n_checked", "r.n_failed")
    e_part = check(
        e,
        "events.ts_in_range",
        (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
        | (F.col("ts") > F.lit("2030-01-01").cast("timestamp")),
    )
    d_part = check(
        d,
        "documents.text_nonempty",
        F.col("text").isNull() | (F.length(F.trim("text")) == 0),
    )
    return o_part.unionByName(e_part).unionByName(d_part)


@query(
    "sample_weighted_hash",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             least(n_chars / 400.0, 1.0) AS keep_p,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
               / 4294967295.0 AS u
      FROM documents
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS kept_ids_md5
    FROM scored
    WHERE u < keep_p
    GROUP BY source
    """,
    tags=("dq", "sampling", "llm"),
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each doc with
    probability proportional to a quality weight (here length-capped
    keep_p = min(n_chars/400, 1)), decided by comparing a uniform
    hash of the doc id against the weight — reproducible importance
    sampling for pretraining-mixture construction (the weighted
    generalization of corpus_mixture_sample's fixed rates).

    Membership depends only on doc_id and the weight column — no RNG
    state, so retries/re-partitions/engines agree row-for-row (the
    md5 over the kept id list proves membership equality, not just
    matching counts). Pure projection + one small rollup shuffle.
    """
    d = T(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967295.0)
    keep_p = F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    kept = d.where(u < keep_p)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("kept_ids_md5"),
    )
