"""Distributed ALS matrix factorization over the purchase graph
(customer × part, quantity-weighted) — the classical recommender
trained entirely with DataFrame ops + grouped ``applyInPandas``
normal-equation solves.

Why this shape scales: each half-step of ALS solves an independent
rank×rank linear system PER ENTITY using only that entity's
interactions — exactly a ``groupBy(entity).applyInPandas`` with the
other side's factors joined in (Arrow-batched; the per-group numpy
solve is O(n_i·rank² + rank³)). Factor state is two slim DataFrames
((id, array<double>) — rank·8 bytes per entity), localCheckpoint-ed
per iteration so plan depth stays constant (the cluster.py
discipline). No RNG anywhere: factors initialize from md5-derived
pseudo-noise, and every per-group solve sorts its rows, so training
is bit-reproducible at any partitioning.

The reference has no ML surface (Pulsar/Kafka harness, SURVEY.md §0);
this extends the mandated LLM/ML-adjacent data-pipeline battery.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table

ALS_RANK = 4
ALS_REG = 0.1
ALS_ITERS = 3


def _init_factors(ids: DataFrame, id_col: str, rank: int = ALS_RANK) -> DataFrame:
    """Deterministic pseudo-random init in [-0.5, 0.5): factor k of
    entity e = (md5(k || e) mod 1000)/1000 − 0.5 — no RNG object, so
    init is identical across runs/partitionings/engines."""
    comps = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(str(k) + ":"), F.col(id_col).cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
        ).cast("double")
        / 1000.0
        - 0.5
        for k in range(rank)
    ]
    return ids.select(id_col, F.array(*comps).alias("f"))


def _solve_side(
    inter: DataFrame,
    other_factors: DataFrame,
    group_col: str,
    other_col: str,
    rank: int,
    reg: float,
) -> DataFrame:
    """One ALS half-step: solve (VᵀV + λ·n·I)·u = Vᵀr per group —
    independent rank×rank systems, one per entity, via grouped
    applyInPandas. Rows are sorted by the other id inside each group
    so float accumulation order (and thus the result) is exact and
    partitioning-independent."""
    import numpy as np

    joined = inter.join(
        other_factors.withColumnRenamed("f", "of").withColumnRenamed(
            other_factors.columns[0], other_col
        ),
        other_col,
    ).select(group_col, other_col, "r", "of")
    schema = f"{group_col} bigint, f array<double>"

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(other_col)
        V = np.stack(pdf["of"].to_numpy())
        r = pdf["r"].to_numpy(dtype=np.float64)
        A = V.T @ V + reg * len(pdf) * np.eye(rank)
        b = V.T @ r
        f = np.linalg.solve(A, b)
        return pd.DataFrame(
            {group_col: [int(pdf[group_col].iloc[0])], "f": [f.tolist()]}
        )

    return joined.groupBy(group_col).applyInPandas(solve, schema)


def als_train(
    inter: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
    rank: int = ALS_RANK,
    iters: int = ALS_ITERS,
    reg: float = ALS_REG,
) -> tuple[DataFrame, DataFrame]:
    """Train ALS factors over (user, item, rating) interactions.
    Returns (user_factors, item_factors) as (id, f: array<double>)
    DataFrames (localCheckpoint-ed — safe to reuse across jobs)."""
    inter = inter.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i"), F.col(rating_col).alias("r")
    ).localCheckpoint(eager=True)
    item_f = _init_factors(inter.select("i").distinct(), "i", rank).localCheckpoint(
        eager=True
    )
    user_f = None
    for _ in range(iters):
        new_user = _solve_side(inter, item_f, "u", "i", rank, reg).localCheckpoint(
            eager=True
        )
        if user_f is not None:
            user_f.unpersist()
        user_f = new_user
        new_item = _solve_side(inter, user_f, "i", "u", rank, reg).localCheckpoint(
            eager=True
        )
        item_f.unpersist()
        item_f = new_item
    return user_f, item_f


def als_rmse(inter: DataFrame, user_f: DataFrame, item_f: DataFrame) -> float:
    """Training RMSE of the factor model — the convergence metric."""
    pred = (
        inter.select(F.col("u"), F.col("i"), F.col("r"))
        .join(user_f.withColumnRenamed("f", "uf"), "u")
        .join(item_f.withColumnRenamed("f", "if"), "i")
        .select(
            (
                F.col("r")
                - F.aggregate(
                    F.zip_with(F.col("uf"), F.col("if"), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("e")
        )
    )
    return float(pred.agg(F.sqrt(F.avg(F.col("e") * F.col("e")))).head()[0])


@query("recsys_als_topk", oracle=None, tags=("ml", "recsys", "pandas_udf", "iterative"))
def recsys_als_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS recommendations end-to-end: factorize the customer×part
    quantity matrix (rank 4, 3 alternating solves) and emit the
    top-10 unseen-part recommendations for the smallest custkey.
    Rows-only gate (iterative, Python solves); bit-reproducibility,
    numpy parity, and RMSE descent are pinned in
    tests/test_recsys.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    inter = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.sum("l_quantity").cast("double").alias("r"))
    )
    user_f, item_f = als_train(inter)
    target = inter.agg(F.min("u")).head()[0]
    uvec = user_f.where(F.col("u") == target).head()["f"]
    seen = inter.where(F.col("u") == target).select("i")
    score = F.aggregate(
        F.zip_with(F.col("f"), F.lit([float(x) for x in uvec]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        item_f.join(seen, "i", "left_anti")
        .select(
            F.lit(int(target)).alias("custkey"),
            F.col("i").alias("partkey"),
            F.round(score, 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("partkey"))
        .limit(10)
    )
