"""Connected-components / cluster-dedup tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.cluster import (
    connected_components,
    dedup_clusters_from_pairs,
)


def test_connected_components_known_graph(spark):
    """Two chains + a singleton-free triangle + isolated pair."""
    edges = spark.createDataFrame(
        [
            Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),   # chain -> comp 1
            Row(src=10, dst=11), Row(src=11, dst=12), Row(src=10, dst=12),  # triangle -> comp 10
            Row(src=20, dst=21),                                        # pair -> comp 20
        ]
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_deep_path_graph(spark):
    """10k-node path graph: the adversarial deep-diameter case. With
    pointer doubling this must converge in O(log n) iterations (well
    under max_iter=25) instead of O(n), and the persisted/checkpointed
    loop must keep per-iteration cost bounded rather than re-running
    the whole accumulated join chain each round."""
    import time

    n = 10_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.monotonic()
    comp = connected_components(edges)
    rows = comp.collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n
    assert all(r.component == 0 for r in rows), "path graph must collapse to one component"
    # O(log n) iterations of bounded-size joins on 10k rows: generous
    # wall-clock bound that an O(n)-iteration or O(k^2)-lineage
    # implementation cannot meet even on a fully contended machine
    # (observed: ~80s solo, ~125s under a concurrent full suite; an
    # O(n)-iteration version needs thousands of joins, i.e. hours)
    assert elapsed < 300, f"deep-path convergence took {elapsed:.0f}s"


def test_connected_components_nonconvergence_raises(spark):
    """max_iter too small for the diameter must raise, not silently
    split components."""
    import pytest

    edges = spark.range(63).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_dedup_clusters_keeper_and_size(spark):
    pairs = spark.createDataFrame(
        [Row(doc_a=5, doc_b=9), Row(doc_a=9, doc_b=7), Row(doc_a=100, doc_b=101)]
    )
    out = {r.doc_id: (r.keeper_doc_id, r.cluster_size)
           for r in dedup_clusters_from_pairs(pairs, "doc_a", "doc_b").collect()}
    assert out[5] == (5, 3) and out[9] == (5, 3) and out[7] == (5, 3)
    assert out[100] == (100, 2) and out[101] == (100, 2)


def test_embedding_lsh_pairs_finds_planted_dupes(spark):
    """Planted near-identical vectors must collide in a bucket and
    survive exact verification; random vectors must not."""
    import numpy as np

    from lakehouse_test_spark.operators.similarity import _planes, lsh_bucket
    from lakehouse_test_spark.operators.dedup import cosine

    rng = np.random.RandomState(3)
    base = rng.standard_normal(64)
    rows = [Row(vec_id=0, embedding=[float(x) for x in base]),
            Row(vec_id=1, embedding=[float(x) for x in base + 0.01 * rng.standard_normal(64)])]
    rows += [Row(vec_id=i, embedding=[float(x) for x in rng.standard_normal(64)])
             for i in range(2, 300)]
    e = spark.createDataFrame(rows)

    planes = _planes()
    b = e.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    a_side = b.select("bucket", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b_side = b.select(F.col("bucket").alias("bucket_b"), F.col("vec_id").alias("vec_b"),
                      F.col("embedding").alias("emb_b"))
    cand = a_side.join(b_side, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
    verified = cand.withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b"))).where(F.col("cos") >= 0.9)
    got = {(r.vec_a, r.vec_b) for r in verified.collect()}
    assert (0, 1) in got
    assert all(a in (0, 1) or b in (0, 1) or False for a, b in got) or got == {(0, 1)}


def test_pagerank_cycle_uniform(spark):
    """On a directed cycle every node has identical rank 1/n."""
    from lakehouse_test_spark.operators.cluster import pagerank

    n = 8
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], ["src", "dst"]
    )
    ranks = {r.node: r.rank for r in pagerank(edges, max_iter=30).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-3
    for v in ranks.values():
        assert abs(v - 1.0 / n) < 1e-3


def test_pagerank_star_hub_dominates(spark):
    """Spokes pointing at a hub: the hub's rank must exceed every
    spoke's, and total mass stays 1 (dangling hub redistributes)."""
    from lakehouse_test_spark.operators.cluster import pagerank

    edges = spark.createDataFrame([(i, 99) for i in range(1, 9)], ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank(edges, max_iter=30).collect()}
    hub = ranks.pop(99)
    assert all(hub > v for v in ranks.values())
    assert abs(hub + sum(ranks.values()) - 1.0) < 1e-3


def test_cc_survives_default_1g_vanilla_session(spark):
    """Regression: the per-iteration plan must stay bounded so CC runs
    inside a driver-default session (found by tools/driver_sim.py —
    a 1g vanilla session OOM'd on a 111-edge graph when plans
    accumulated across 4 un-checkpointed iterations). The proxy here:
    a deep path graph must keep every iteration's analyzed plan under
    a fixed size."""
    from lakehouse_test_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    out = connected_components(edges, "src", "dst")
    # single path component, canonical label 0
    assert out.where("component != 0").count() == 0
    # the returned (checkpointed) plan must be tiny — no lineage tail
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 4000, f"plan not truncated: {len(plan)} chars"
