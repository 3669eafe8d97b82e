"""Connected components over similarity graphs — the step that turns
near-duplicate *pairs* (MinHash-LSH / SimHash / embedding-LSH output)
into dedup *clusters* with one canonical keeper per cluster.

At 100 TB the pair graph has billions of edges and no driver-side
union-find fits; this is the iterative min-label-propagation
algorithm (alternating small-star/large-star style) expressed as
DataFrame joins — every iteration is one shuffle, convergence in
O(log n) iterations for typical near-dup graphs (shallow components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Min-label propagation with pointer doubling: every node
    converges to the minimum node id reachable from it. Returns
    (node, component).

    Each iteration does two steps:
    1. edge step — labels flow one hop across edges (min of own and
       neighbors' labels);
    2. shortcut step — each node re-labels to its label's label
       (pointer doubling), so the distance a label has travelled
       roughly doubles per iteration → O(log diameter) convergence
       even on path graphs (a 10k chain converges in ~15 iterations,
       not 10k).

    Scale hygiene for deep/iterative lineage:
    - each iteration's labels are persisted and the previous
      iteration's are unpersisted, so the ``changed`` probe and the
      next join never re-execute the whole accumulated chain;
    - labels are eagerly ``localCheckpoint``-ed every
      ``checkpoint_every`` iterations (default: every iteration) to
      truncate the Catalyst plan. Plan depth, not data volume, is the
      failure mode: by iteration 4-5 the accumulated self-join plan
      plus AQE stage bookkeeping OOMs a default-1g driver even on a
      100-edge graph (persist caches blocks but does NOT truncate the
      plan). One extra O(nodes) materialization per round is the
      GraphFrames checkpointInterval posture and costs ~nothing
      relative to the round's shuffles.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` iterations (with doubling, 25 covers diameters up to
    ~2^25 — non-convergence means something is genuinely wrong rather
    than silently splitting components).
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = both.unionByName(
        both.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).persist()

    converged = False
    for i in range(max_iter):
        # 1. edge step: min over own label and neighbors' labels
        incoming = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
        )
        hop = (
            labels.select("node", "component")
            .unionByName(incoming)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # 2. shortcut step: component := label(component); labels are
        # node ids, so every component value resolves in the mapping
        mapping = hop.select(
            F.col("node").alias("m_node"), F.col("component").alias("m_comp")
        )
        new_labels = (
            hop.join(mapping, hop.component == mapping.m_node, "left")
            .select("node", F.coalesce("m_comp", "component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels


def dedup_clusters_from_pairs(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Pairs → clusters: connected components + canonical keeper
    (minimum id). Output: (doc_id, keeper_doc_id, cluster_size)."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("keeper_doc_id"),
            "cluster_size",
        )
    )


@query("dedup_clusters", oracle=None, tags=("dedup", "llm", "graph"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup resolution: MinHash-LSH pairs → connected
    components → canonical keeper per cluster.

    Rows-only (iterative algorithm, no SQL twin); determinism comes
    from min-label convergence. tests/test_cluster.py validates
    components against a hand-built graph and against the LSH pairs.
    """
    from lakehouse_test_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).cache()
    return dedup_clusters_from_pairs(pairs, "doc_a", "doc_b")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-4,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over an edge list, expressed as DataFrame joins with
    the same iterative-lineage hygiene as ``connected_components``:
    per-iteration persist + unpersist, ``localCheckpoint`` every
    ``checkpoint_every`` rounds, and an L1-delta stopping rule.

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard correction, computed as one scalar agg per round.

    Scale: each round is one shuffle (contributions grouped by dst);
    out-degrees are computed once and cached; ranks are (node, double)
    pairs — state is O(nodes), never O(edges). Convergence monitoring
    costs one extra join per round on the node-sized frames.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:  # empty graph: empty ranks, not a ZeroDivisionError
        e.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist()

    for i in range(max_iter):
        with_deg = ranks.join(deg, ranks.node == deg.a, "left")
        dangling = (
            with_deg.where(F.col("deg").isNull()).agg(F.sum("rank")).first()[0] or 0.0
        )
        contribs = (
            e.join(ranks, e.a == ranks.node)
            .join(deg, "a")
            .select(F.col("b").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )
        ranks.unpersist()
        ranks = new_ranks
        if delta < tol:
            break
    e.unpersist()
    deg.unpersist()
    return ranks


@query("graph_pagerank_similarity", oracle=None, tags=("graph", "llm", "embeddings"))
def graph_pagerank_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the same-label similarity graph (the
    threshold-join pair output): which embeddings sit at the center of
    their similarity neighborhoods — the centrality signal used to
    pick representative documents per near-dup cluster.

    Rows-only (iterative; no SQL twin). Correctness is pinned by
    tests/test_cluster.py: uniform rank on a cycle, hub dominance on a
    star, sum(rank) == 1.
    """
    from lakehouse_test_spark.operators.similarity import similarity_threshold_join

    pairs = similarity_threshold_join(spark, sf_dir).select("vec_a", "vec_b")
    ranks = pagerank(pairs, "vec_a", "vec_b", max_iter=10)
    return ranks.select(
        F.col("node").alias("vec_id"), F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), F.asc("vec_id")).limit(50)
