"""ALS matrix factorization (operators/recsys.py): numpy parity,
bit-reproducibility, convergence, and the gate query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.recsys import (
    ALS_RANK,
    ALS_REG,
    als_rmse,
    als_train,
)
from .conftest import SMOKE_SF_DIR


def _toy_interactions(spark):
    """A small planted low-rank matrix: 12 users × 9 items, ratings
    from a rank-2 generator (ALS should fit it nearly exactly)."""
    rng = np.random.RandomState(2)
    U = rng.standard_normal((12, 2))
    V = rng.standard_normal((9, 2))
    R = U @ V.T + 3.0
    rows = [
        Row(u=u, i=i, r=float(R[u, i]))
        for u in range(12)
        for i in range(9)
        if (u + i) % 3 != 0  # ~2/3 observed
    ]
    return spark.createDataFrame(rows)


def _ref_als(rows, rank, iters, reg):
    """Pure-Python mirror: same init (md5 pseudo-noise), same sorted
    accumulation, same normal equations."""
    import hashlib

    def init(eid):
        out = []
        for k in range(rank):
            h = hashlib.md5(f"{k}:{eid}".encode()).hexdigest()[:8]
            out.append((int(h, 16) % 1000) / 1000.0 - 0.5)
        return np.array(out)

    users = sorted({u for u, _, _ in rows})
    items = sorted({i for _, i, _ in rows})
    Vf = {i: init(i) for i in items}
    Uf = {}
    by_u = {u: sorted((i, r) for uu, i, r in rows if uu == u) for u in users}
    by_i = {i: sorted((u, r) for u, ii, r in rows if ii == i) for i in items}
    for _ in range(iters):
        for u in users:
            V = np.stack([Vf[i] for i, _ in by_u[u]])
            r = np.array([r for _, r in by_u[u]])
            A = V.T @ V + reg * len(by_u[u]) * np.eye(rank)
            Uf[u] = np.linalg.solve(A, V.T @ r)
        for i in items:
            Um = np.stack([Uf[u] for u, _ in by_i[i]])
            r = np.array([r for _, r in by_i[i]])
            A = Um.T @ Um + reg * len(by_i[i]) * np.eye(rank)
            Vf[i] = np.linalg.solve(A, Um.T @ r)
    return Uf, Vf


def test_als_matches_python_reference(spark):
    inter = _toy_interactions(spark)
    uf, vf = als_train(inter, iters=2)
    rows = [(r.u, r.i, r.r) for r in inter.collect()]
    Uref, Vref = _ref_als(rows, ALS_RANK, 2, ALS_REG)
    got_u = {r.u: list(r.f) for r in uf.collect()}
    for u, w in Uref.items():
        assert got_u[u] == pytest.approx(list(w), abs=1e-9)


def test_als_reproducible_and_converges(spark):
    inter = _toy_interactions(spark)
    uf1, vf1 = als_train(inter, iters=2)
    uf2, vf2 = als_train(inter.repartition(13), iters=2)
    assert sorted(map(tuple, ((r.u, *r.f) for r in uf1.collect()))) == sorted(
        map(tuple, ((r.u, *r.f) for r in uf2.collect()))
    )
    # fitting a planted rank-2 matrix: error must drop well below the
    # ratings' natural scale and improve with more iterations
    uf3, vf3 = als_train(inter, iters=3)
    rmse2 = als_rmse(inter.selectExpr("u", "i", "r"), uf1, vf1)
    rmse3 = als_rmse(inter.selectExpr("u", "i", "r"), uf3, vf3)
    assert rmse3 <= rmse2 + 1e-9
    assert rmse3 < 0.5


def test_als_gate_query(spark):
    from lakehouse_test_spark.operators.recsys import recsys_als_topk

    rows = recsys_als_topk(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
