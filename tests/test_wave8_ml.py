"""Wave-F ML operators: distributed logistic regression parity and
determinism (queries_wave8.logreg_train_gd / text_quality_logreg)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from .conftest import SMOKE_SF_DIR


def test_logreg_gd_matches_numpy(spark):
    """The aggregate-based GD must match a numpy reference to high
    precision (decimal-exact sums: the only drift is the final
    float conversion)."""
    from lakehouse_test_spark.queries_wave8 import logreg_train_gd

    rng = np.random.RandomState(3)
    X = rng.standard_normal((500, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] + 0.1 * rng.standard_normal(500) > 0).astype(float)
    df = spark.createDataFrame(
        [
            Row(y=float(yy), x0=1.0, x1=float(a), x2=float(b))
            for (a, b), yy in zip(X, y)
        ]
    )
    got = logreg_train_gd(df, 3, iters=5, lr=1.0)

    w = np.zeros(3)
    Xb = np.hstack([np.ones((500, 1)), X])
    for _ in range(5):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w - 1.0 * (Xb.T @ (p - y)) / 500
    assert got == pytest.approx(list(w), abs=1e-9)
    # the learned boundary is the planted one (positive slope features)
    assert got[1] > 0 and got[2] > 0


def test_logreg_deterministic_across_partitionings(spark):
    """Decimal-cast gradient sums are associative: weights must be
    bit-identical under different partition counts."""
    from lakehouse_test_spark.queries_wave8 import logreg_train_gd

    rng = np.random.RandomState(5)
    rows = [
        Row(y=float(i % 2), x0=1.0, x1=float(v))
        for i, v in enumerate(rng.standard_normal(400))
    ]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(rows).repartition(17)
    assert logreg_train_gd(df1, 2, iters=4) == logreg_train_gd(df2, 2, iters=4)


def test_quality_logreg_gate(spark):
    from lakehouse_test_spark.queries_wave8 import text_quality_logreg

    rows = {r.feature: r.weight for r in text_quality_logreg(spark, SMOKE_SF_DIR).collect()}
    assert set(rows) == {
        "bias",
        "log_chars",
        "n_tokens",
        "chars_per_token",
        "distinct_ratio",
        "__train_accuracy__",
    }
    assert 0.0 <= rows["__train_accuracy__"] <= 1.0
