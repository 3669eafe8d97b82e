"""Wave AC: Spark 4 SQL dialect surface + the pyspark.ml BRP-LSH
similarity parity path."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave29 import (
    similarity_sparkml_brp_lsh,
    sql_named_window,
    sql_pipe_syntax,
    sql_session_variables,
)


def test_pipe_syntax_equals_classic(spark, sf_dir):
    """The pipe dialect and the classic form must produce identical
    values (Catalyst compiles both to the same logical plan)."""
    from lakehouse_test_spark.session import load_table

    got = sql_pipe_syntax(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    want = (
        li.where(F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_session_variables_bind(spark, sf_dir):
    rows = sql_session_variables(spark, sf_dir).collect()
    assert rows and all(r.total_price > 0 for r in rows)
    # re-binding the variable changes the result (it is live state)
    spark.sql("SET VARIABLE min_price = 1e12")
    n = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice >= min_price"
    ).collect()[0]["n"]
    assert n == 0


def test_named_window_single_pass(spark, sf_dir):
    """Three analytics over one named frame plan as ONE WindowExec."""
    df = sql_named_window(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window ") <= 1 or plan.count("WindowExec") <= 1
    rows = df.where(F.col("rn") == 1).collect()
    assert rows and all(abs(r.running_total - (r.running_total)) < 1e-9 for r in rows)
    # first row of each partition: delta vs the lag default (0)
    first = rows[0]
    assert first.rn == 1


def test_brp_lsh_recall_vs_bruteforce(spark, sf_dir):
    """approxNearestNeighbors must recover most of the true Euclidean
    top-10 (the ml-package path is graded like the hand-rolled ANN)."""
    from lakehouse_test_spark.operators.similarity import _query_vector
    from lakehouse_test_spark.session import load_table

    got = {r.vec_id for r in similarity_sparkml_brp_lsh(spark, sf_dir).collect()}
    q = _query_vector(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "embedding",
                F.lit([float(x) for x in q]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    true10 = {
        r.vec_id
        for r in e.select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    assert len(got & true10) >= 7, (sorted(got), sorted(true10))
