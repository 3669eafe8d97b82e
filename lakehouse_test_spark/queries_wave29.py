"""Round-4 wave AC: Spark 4 SQL-surface features, hash-checked.

- ``sql_pipe_syntax`` — SQL pipe operators (``|>``: FROM → WHERE →
  EXTEND → AGGREGATE → ORDER BY), the Spark 4 pipe-syntax dialect,
  verified value-equal to the classic relational form.
- ``sql_session_variables`` — DECLARE / SET VARIABLE driving a
  parameterized aggregation (session-scoped typed variables).
- ``sql_named_window`` — the WINDOW clause: one named frame shared by
  several analytic functions (DuckDB supports the same clause, so the
  oracle uses identical text).

Reference parity: none (the reference has no SQL dialect surface);
extends SURVEY.md §2b's SQL-surface group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
    GROUP BY l_returnflag
    """,
    tags=("sql", "pipe", "lineitem"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): each ``|>`` stage transforms the
    previous result — the linear dataflow dialect. Catalyst compiles
    it to the identical plan as the classic form, which the hash gate
    proves on values."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1994-01-01'
        |> EXTEND CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6)) AS rev
        |> AGGREGATE count(*) AS n_items,
                     CAST(round(sum(rev), 2) AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        """
    )


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_totalprice >= 50000 AND o_orderpriority <> '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("sql", "variables", "orders"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (Spark 4 DECLARE/SET VARIABLE): typed,
    session-scoped state referenced directly in query text — the ANSI
    answer to string-formatted parameters."""
    _view(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE min_price DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE skip_priority STRING DEFAULT ''")
    spark.sql("SET VARIABLE min_price = 50000.0")
    spark.sql("SET VARIABLE skip_priority = '1-URGENT'")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_totalprice >= min_price AND o_orderpriority <> skip_priority
        GROUP BY o_orderstatus
        """
    )


@query(
    "sql_named_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2)
                AS DOUBLE) AS running_total,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,6))
                      - lag(CAST(o_totalprice AS DECIMAL(18,6)), 1, 0) OVER w,
                2) AS DOUBLE) AS delta_prev
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    tags=("sql", "window", "orders"),
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINDOW clause: one named frame, three analytic functions —
    the spec's answer to repeating OVER(...) definitions (and Spark
    plans them in a single WindowExec pass)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2)
                    AS DOUBLE) AS running_total,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,6))
                          - lag(CAST(o_totalprice AS DECIMAL(18,6)), 1, 0) OVER w,
                    2) AS DOUBLE) AS delta_prev
        FROM orders
        WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        """
    )


@query(
    "similarity_sparkml_brp_lsh",
    oracle=None,  # LSH bucket draws are engine-internal: rows-only
    tags=("similarity", "ml", "interop", "embeddings"),
)
def similarity_sparkml_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyspark.ml Euclidean-LSH path SURVEY.md §2b names
    (``BucketedRandomProjectionLSH``): embeddings → dense vectors →
    seed-pinned BRP-LSH → approxNearestNeighbors for a query vector,
    top-10 by Euclidean distance. Registered to prove the ml-package
    similarity surface end-to-end; the PRODUCTION ANN paths are the
    hand-rolled multiprobe LSH / IVF / persisted index in
    operators/similarity.py + ann_index.py (bucketed, plan-pinned,
    recall-graded against exact brute force). Recall vs brute-force
    Euclidean is pinned in tests/test_wave29.py.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from lakehouse_test_spark.operators.similarity import _query_vector

    e = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", array_to_vector("embedding").alias("features"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=7,
    )
    model = lsh.fit(e)
    from pyspark.ml.linalg import Vectors

    q = Vectors.dense(_query_vector(spark, sf_dir, 0))
    return (
        model.approxNearestNeighbors(e, q, 10, distCol="euclid_dist")
        .select("vec_id", "label", F.round("euclid_dist", 4).alias("euclid_dist"))
    )


@query(
    "sql_udtf_table_args",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_unique,
           CAST(list_max(list_transform(string_split(text, ' '),
                                        w -> len(w))) AS BIGINT) AS longest
    FROM documents
    WHERE doc_id % 97 = 0
    """,
    tags=("sql", "udtf", "documents"),
)
def sql_udtf_table_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4): the function
    receives whole input rows via ``TABLE(view)`` instead of scalar
    columns — SQL-native table-in/table-out, executed as an
    Arrow-batched Python UDTF. Hash-gated against a DuckDB
    re-implementation of the same per-document token statistics."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, n_words: bigint, n_unique: bigint, longest: bigint")
    class DocTokenStats:
        def eval(self, row):
            words = (row["text"] or "").split(" ")
            yield (
                row["doc_id"],
                len(words),
                len(set(words)),
                max((len(w) for w in words), default=0),
            )

    spark.udtf.register("doc_token_stats", DocTokenStats)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 97 == 0
    ).createOrReplaceTempView("udtf_docs_slice")
    return spark.sql("SELECT s.* FROM doc_token_stats(TABLE(udtf_docs_slice)) s")
