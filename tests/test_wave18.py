"""Wave-P tests: bot detection invariants and MMR numpy parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave18 import (
    embedding_mmr_selection,
    events_bot_detection,
)
from lakehouse_test_spark.session import load_table


def test_bot_detection_invariants(spark, sf_dir):
    rows = events_bot_detection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["error_ratio"] <= 1
        assert r["mean_gap_s"] >= 0
        assert r["gap_cv"] >= 0
        # flag definition is reproducible from the emitted columns
        expect = (r["n_events"] >= 10 and r["gap_cv"] < 0.3) or r["error_ratio"] > 0.5
        assert r["bot_suspect"] == expect


def test_mmr_matches_numpy_reference(spark, sf_dir):
    """The greedy MMR chain must equal an independent numpy replay
    over the same candidate pool (relevance to centroid, 0.7/0.3
    trade-off, smallest-id tiebreak)."""
    got = embedding_mmr_selection(spark, sf_dir).collect()
    assert [r["rank"] for r in got] == list(range(1, 11))

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    V_all = np.array(e["embedding"].tolist(), dtype=np.float64)
    ids_all = e["vec_id"].to_numpy()
    # centroid per the query: decimal-summed per-dim mean
    centroid = V_all.mean(axis=0)
    cn = centroid / np.linalg.norm(centroid)
    rel_all = (V_all @ cn) / np.linalg.norm(V_all, axis=1)
    order = np.lexsort((ids_all, -rel_all))[:200]
    ids = ids_all[order]
    rel = rel_all[order]
    V = V_all[order]
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    selected: list[int] = []
    expect_ids = []
    for _ in range(10):
        maxsim = (V @ V[selected].T).max(axis=1) if selected else np.zeros(len(ids))
        score = 0.7 * rel - 0.3 * maxsim
        score[selected] = -np.inf
        best = np.lexsort((ids, -score))[0]
        selected.append(int(best))
        expect_ids.append(int(ids[best]))
    assert [r["vec_id"] for r in got] == expect_ids
    # diversity property: selected set is not just the top-10 by relevance
    top10_rel = list(ids[:10])
    assert expect_ids != top10_rel or len(set(expect_ids)) == 10
