"""Wave-K tests: association rules, robust means, uniqueness DQ,
curriculum ordering, per-label top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_test_spark.queries_wave13 import (
    agg_trimmed_winsorized_mean,
    basket_association_rules,
    dq_uniqueness_keys,
    embedding_topk_per_label,
    pipeline_curriculum_order,
)
from lakehouse_test_spark.session import load_table


def test_association_rules_metric_identities(spark, sf_dir):
    rows = basket_association_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["pair_count"] >= 5
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1 + 1e-9
        assert r["lift"] > 0
        # lift = confidence / P(consequent) >= confidence
        assert r["lift"] >= r["confidence"] - 1e-9 or r["lift"] < 1


def test_trimmed_mean_matches_numpy(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in agg_trimmed_winsorized_mean(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = np.sort(grp["l_extendedprice"].to_numpy())
        n = len(x)
        k = int(np.floor(n * 0.1))
        trimmed = x[k : n - k].mean()
        wins = np.clip(x, x[k], x[n - k - 1]).mean()
        assert rows[flag]["trimmed_mean"] == pytest.approx(round(trimmed, 2), abs=0.02)
        assert rows[flag]["winsorized_mean"] == pytest.approx(round(wins, 2), abs=0.02)
        assert rows[flag]["n_rows"] == n


def test_uniqueness_declared_keys(spark, sf_dir):
    rows = {(r["table_name"], r["key_cols"]): r for r in dq_uniqueness_keys(spark, sf_dir).collect()}
    assert rows[("orders", "o_orderkey")]["is_unique"]
    assert rows[("events", "event_id")]["is_unique"]
    # the fixtures' lineitem REUSES line numbers within an order — the
    # audit is precisely what surfaces that
    li = rows[("lineitem", "l_orderkey,l_linenumber")]
    assert li["is_unique"] == (li["n_dup_rows"] == 0)
    for r in rows.values():
        assert r["n_dup_rows"] == r["n_rows"] - r["n_distinct"]


def test_curriculum_positions_contiguous_and_sorted(spark, sf_dir):
    rows = pipeline_curriculum_order(spark, sf_dir).collect()
    assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))
    buckets = [r["difficulty_bucket"] for r in rows]
    assert buckets == sorted(buckets)  # easy -> hard never interleaves


def test_topk_per_label_shape(spark, sf_dir):
    rows = embedding_topk_per_label(spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    n_labels = load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    assert len(by_label) == n_labels
    for label, rs in by_label.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cs = [r["cos_to_centroid"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)
        assert all(-1 - 1e-9 <= c <= 1 + 1e-9 for c in cs)


def test_join_cardinality_estimate_unbiasedness_shape(spark, sf_dir):
    from lakehouse_test_spark.queries_wave14 import stats_join_cardinality_estimate

    r = stats_join_cardinality_estimate(spark, sf_dir).collect()[0]
    assert r["estimated_rows"] == r["sampled_rows"] * 16
    assert r["rel_error"] >= 0
    # key-correlated sampling at 1/16 should land within ~50% at smoke scale
    assert r["rel_error"] < 0.5


def test_blocking_quality_bounds(spark, sf_dir):
    from lakehouse_test_spark.queries_wave14 import linkage_blocking_quality

    r = linkage_blocking_quality(spark, sf_dir).collect()[0]
    if r["n_true_pairs"]:
        assert 0 <= r["pair_completeness"] <= 1
        assert r["n_true_in_block"] <= r["n_true_pairs"]
    else:
        # no ground-truth dup pairs at this scale -> the conditional
        # aggregates are NULL by construction (sum/ratio over an
        # empty set), matching the oracle
        assert r["pair_completeness"] is None
        assert r["n_true_in_block"] is None
    assert 0 <= r["reduction_ratio"] <= 1


def test_k_anonymity_covers_all_customers(spark, sf_dir):
    from lakehouse_test_spark.queries_wave14 import dq_k_anonymity

    rows = dq_k_anonymity(spark, sf_dir).collect()
    total = sum(r["group_size"] for r in rows)
    assert total == load_table(spark, sf_dir, "customer").count()
    for r in rows:
        assert 1 <= r["l_diversity"] <= 3
        assert r["below_k10"] == (r["group_size"] < 10)
