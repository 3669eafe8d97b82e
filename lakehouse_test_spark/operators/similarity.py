"""Similarity search over the ``embeddings`` table
(``embedding: array<float>``): exact brute-force cosine top-k as the
correctness baseline, and a random-hyperplane LSH-bucketed variant as
the 100 TB path.

All vector math runs JVM-side via higher-order array functions
(zip_with / transform / aggregate) inside codegen — no Python in the
per-row path. The LSH projection constants are generated once on the
driver with a fixed seed and folded into the plan as literals
(broadcast to every task for free).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.dedup import DUCKDB_COSINE, cosine
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table

EMBED_DIM = 64
LSH_PLANES = 16  # 65,536 buckets — candidate fraction ≈ probes/2^16
LSH_SEED = 42
N_PROBES = 128  # query-directed multiprobe: buckets examined per query


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch one embedding to use as the search query (driver-side,
    O(1) — a real service would receive the vector as input)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return list(row[0])


def cosine_to_literal(emb: Column, vec: list[float]) -> Column:
    """Cosine between an embedding column and a constant query vector
    (vector folded into the plan as an array literal)."""
    lit_vec = F.lit([float(x) for x in vec])
    return cosine(emb, lit_vec)


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           CAST(round({DUCKDB_COSINE.format(a="e.embedding", b="q.qe")}, 4) AS DOUBLE) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    tags=("similarity", "llm", "embeddings"),
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a query vector (vec_id=0) — ANN baseline.

    Scale: one scan, cosine in codegen, TakeOrdered top-k (no global
    sort). Ordering is on the *rounded* score with vec_id tiebreak so
    the boundary is deterministic across engines.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    qvec = _query_vector(spark, sf_dir, 0)
    return (
        e.select(
            "vec_id",
            "label",
            F.round(cosine_to_literal(F.col("embedding"), qvec), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "similarity_pairwise_block",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(round({DUCKDB_COSINE.format(a="a.embedding", b="b.embedding")}, 4) AS DOUBLE) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 50 AND b.vec_id < 50
    """,
    tags=("similarity", "llm", "embeddings"),
)
def similarity_pairwise_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine within a bounded block (the building block of
    block-nested similarity join; blocks are what you broadcast)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cos_sim")
        )
    )


def lsh_bucket(emb: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <emb, plane_i>
    packed into an int (bit i = plane i).

    The planes fold into the plan as ONE nested array literal walked
    with higher-order functions, instead of n_planes × dim scalar
    literals — a 3× cheaper expression tree to build and codegen
    (1024 Literal nodes → 1), with byte-identical bucket ids. Still
    pure codegen, zero Python per row.
    """
    mat = F.lit([[float(x) for x in p] for p in planes])

    def _bit(plane: Column, i: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(emb, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot > 0, F.pow(F.lit(2.0), i.cast("double"))).otherwise(F.lit(0.0))

    bits = F.transform(mat, lambda p, i: _bit(p, i))
    return F.aggregate(bits, F.lit(0.0), lambda acc, x: acc + x).cast("int")


def _planes(n_planes: int = LSH_PLANES, dim: int = EMBED_DIM, seed: int = LSH_SEED) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def ranked_buckets(qvec: np.ndarray, planes: np.ndarray) -> list[int]:
    """All 2^planes bucket ids ranked by query-directed probe cost
    (Lv et al., VLDB'07): the summed |margin| of the hyperplanes
    flipped relative to the query's own bucket. Near-orthogonal
    neighbors flip exactly the low-margin bits first, so this ranking
    buys far more recall per candidate than Hamming-radius probing.
    Driver-side only: 2^16 subsets rank in well under a second.
    """
    import itertools

    margins = qvec @ planes.T  # signed distances
    base = sum((1 << i) for i, m in enumerate(margins) if m > 0)
    flips: list[tuple[float, int]] = []
    idx = range(len(planes))
    for r in range(len(planes) + 1):
        for subset in itertools.combinations(idx, r):
            cost = float(sum(abs(margins[i]) for i in subset))
            mask = sum(1 << i for i in subset)
            flips.append((cost, base ^ mask))
    flips.sort()
    return [b for _, b in flips]


def multiprobe_buckets(qvec: np.ndarray, planes: np.ndarray, n_probes: int = N_PROBES) -> list[int]:
    """Fixed-size query-directed probe list (cheapest ``n_probes``
    bucket flips). 128 of 65,536 buckets ≈ 0.2% of bucket space."""
    return ranked_buckets(qvec, planes)[:n_probes]


def adaptive_probes(
    bucketed: DataFrame,
    qvec: np.ndarray,
    planes: np.ndarray,
    target_candidates: int,
    max_probes: int = 4096,
) -> list[int]:
    """IVF-style probe selection: walk buckets in query-directed cost
    order, accumulating the bucket histogram's counts until
    ``target_candidates`` vectors are covered.

    The histogram (bucket → count) is index metadata — at most
    2^planes rows regardless of corpus size, collected once per index
    build in a real deployment (recomputed per call here). This keeps
    the candidate fraction ~target/corpus at any scale: tiny corpora
    probe enough buckets to fill top-k, 100 TB corpora stop after a
    few lists.
    """
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    probes: list[int] = []
    cum = 0
    for b in ranked_buckets(qvec, planes):
        if b not in counts:
            continue
        probes.append(b)
        cum += counts[b]
        if cum >= target_candidates or len(probes) >= max_probes:
            break
    return probes


@query("similarity_lsh_topk", oracle=None, tags=("similarity", "llm", "approx", "embeddings"))
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH with query-directed
    multiprobe (margin-ranked bucket flips), re-ranked by exact cosine.

    Scale: bucket assignment is a map-only pass; the probe list is an
    IN-filter pushed to the scan, chosen IVF-style from the bucket
    histogram in query-directed cost order until ~3k candidates are
    covered — a fixed candidate *count*, so the scanned fraction
    shrinks as the corpus grows (≤2% asserted on the planted-cluster
    fixture). Deterministic (seeded planes) → stable rows; recall is
    asserted on planted clusters in tests/test_operators.py.
    """
    planes = _planes()
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    qvec = np.array(_query_vector(spark, sf_dir, 0))
    # persist: the 16-plane bucket projection is a big codegen unit —
    # one materialization feeds both the histogram and the probe scan
    bucketed = e.withColumn("bucket", lsh_bucket(F.col("embedding"), planes)).persist()
    probe_buckets = adaptive_probes(bucketed, qvec, planes, target_candidates=30)
    cand = bucketed.where(F.col("bucket").isin(probe_buckets))
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(cosine_to_literal(F.col("embedding"), list(qvec)), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "similarity_threshold_join",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(round({DUCKDB_COSINE.format(a="a.embedding", b="b.embedding")}, 4) AS DOUBLE) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label AND a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
      AND {DUCKDB_COSINE.format(a="a.embedding", b="b.embedding")} >= 0.2
    """,
    tags=("similarity", "llm", "embeddings"),
)
def similarity_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity join: same-label pairs (on a 10% slice) above a
    cosine threshold — the blocking key (label) stands in for the
    coarse quantizer of an IVF index: equi-join on the block, exact
    kernel inside the block.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    a = e.select("label", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(
        F.col("label").alias("label_b"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_raw", cosine(F.col("emb_a"), F.col("emb_b")))
        .where(F.col("cos_raw") >= 0.2)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


def ann_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exact: bool = False,
    index_path: str | None = None,
) -> DataFrame:
    """Library entry point: top-k nearest by cosine for an arbitrary
    query vector; exact scan or LSH-bucketed depending on ``exact``.

    Pass ``index_path`` (a directory written by
    ``operators.ann_index.ann_index_build``) to serve from the
    persisted index instead — no bucketing pass, no histogram job, and
    the scan prunes to the probed bands (the 100 TB serving path).
    """
    if index_path is not None and not exact:
        from lakehouse_test_spark.operators.ann_index import ann_index_query

        return ann_index_query(
            spark, index_path, query_vec, k=k, target_candidates=3 * k
        )
    if exact:
        return (
            embeddings.select(
                "vec_id", F.round(cosine_to_literal(F.col("embedding"), query_vec), 4).alias("cos_sim")
            )
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(k)
        )
    planes = _planes()
    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding"), planes)).persist()
    probes = adaptive_probes(bucketed, np.array(query_vec), planes, target_candidates=3 * k)
    return (
        bucketed.where(F.col("bucket").isin(probes))
        .select(
            "vec_id", F.round(cosine_to_literal(F.col("embedding"), query_vec), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


IVF_NLIST = 64  # coarse-quantizer centroids
IVF_NPROBE = 4  # inverted lists scanned per query
IVF_ITERS = 3  # Lloyd refinement passes at index build


def _nearest_centroid(emb: Column, centroids: list[list[float]]) -> Column:
    """Argmin-by-L2 assignment of an embedding column against a
    broadcast centroid matrix (one nested array literal; squared
    distance + running argmin entirely in codegen — no Python, no
    shuffle)."""
    mat = F.lit(centroids)

    def _d2(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(emb, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.transform(mat, lambda c: _d2(c))
    best = F.array_min(dists)
    return F.array_position(dists, best).cast("int") - 1


def ivf_train(
    embeddings: DataFrame,
    nlist: int = IVF_NLIST,
    iters: int = IVF_ITERS,
    dim: int = EMBED_DIM,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: deterministic seed sample (top
    ``nlist`` vec_ids by md5 order — order-stable across partitionings)
    followed by ``iters`` Lloyd passes expressed as DataFrame jobs.

    Scale: each pass is ONE shuffle on the nlist-bounded cluster id;
    the per-dimension means run as ``dim`` built-in avg aggregates
    (partial map-side), so shuffle rows are nlist × partitions, never
    corpus-sized. Centroids (nlist × dim ≈ 16 KB) round-trip through
    the driver between passes — index metadata, same as FAISS keeps in
    RAM. Empty clusters keep their previous centroid.
    """
    seed = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(nlist)
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in seed]
    for _ in range(iters):
        assigned = embeddings.select(
            _nearest_centroid(F.col("embedding"), centroids).alias("list_id"),
            "embedding",
        )
        means = (
            assigned.groupBy("list_id")
            .agg(
                *[
                    F.avg(F.col("embedding")[i].cast("double")).alias(f"d{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        nxt = list(centroids)
        for r in means:
            nxt[r["list_id"]] = [float(r[f"d{i}"]) for i in range(dim)]
        centroids = nxt
    return centroids


@query("similarity_ivf_topk", oracle=None, tags=("similarity", "llm", "approx", "embeddings", "ivf"))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via a real IVF-Flat index: k-means coarse quantizer
    (64 lists, 3 Lloyd passes), nearest-``nprobe``-list probing, exact
    cosine re-rank inside the probed lists.

    Scale: training shuffles only nlist-bounded partial aggregates;
    assignment is a map-only codegen pass; the query probes
    nprobe/nlist of the corpus (4/64 ≈ 6% here; at 100 TB nlist grows
    ~sqrt(n) so the scanned fraction keeps shrinking while each list
    stays executor-sized). The probe filter is an IN-list on the
    materialized list_id column, so partition pruning applies when the
    index is written bucketed by list_id. Deterministic: seeded sample
    + fixed iteration count. Recall vs the exact scan is asserted on
    planted clusters in tests/test_operators.py.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    centroids = ivf_train(e)
    qvec = np.array(_query_vector(spark, sf_dir, 0))
    order = np.argsort([float(np.sum((qvec - np.array(c)) ** 2)) for c in centroids])
    probe_lists = [int(i) for i in order[:IVF_NPROBE]]
    indexed = e.withColumn("list_id", _nearest_centroid(F.col("embedding"), centroids))
    return (
        indexed.where(F.col("list_id").isin(probe_lists))
        .select(
            "vec_id",
            "label",
            F.round(cosine_to_literal(F.col("embedding"), list(qvec)), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query("dedup_embedding_lsh_pairs", oracle=None, tags=("dedup", "similarity", "llm", "approx", "embeddings"))
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-bucket ALL vectors,
    generate candidate pairs per bucket (equi-join, no n² blow-up),
    verify exact cosine >= 0.9.

    On the uniform-random fixture this is deterministically empty
    (max pairwise cosine ~0.48) — the *plan* is the point; recall on
    planted duplicates is asserted in tests/test_cluster.py.
    """
    planes = _planes()
    e = load_table(spark, sf_dir, "embeddings")
    b = e.withColumn("bucket", lsh_bucket(F.col("embedding"), planes)).select(
        "vec_id", "bucket", "embedding"
    )
    a_side = b.select(
        F.col("bucket"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b_side = b.select(
        F.col("bucket").alias("bucket_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    cand = a_side.join(
        b_side, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    return (
        cand.withColumn("cos_raw", cosine(F.col("emb_a"), F.col("emb_b")))
        .where(F.col("cos_raw") >= 0.9)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
      FROM embeddings
    ),
    err AS (
      SELECT e.vec_id, e.label, q.scale,
             list_transform(e.embedding,
               x -> abs(CAST(x AS DOUBLE)
                        - greatest(-127.0, least(127.0,
                            floor(CAST(x AS DOUBLE)
                                  / (CASE WHEN q.scale = 0 THEN 1.0 ELSE q.scale END)
                                  + 0.5)))
                          * (CASE WHEN q.scale = 0 THEN 1.0 ELSE q.scale END)))
               AS errs
      FROM embeddings e JOIN q USING (vec_id)
    )
    SELECT vec_id, label,
           CAST(round(scale, 6) AS DOUBLE) AS scale,
           CAST(round(sqrt(list_sum(list_transform(errs, x -> x * x)) / len(errs)), 6)
                AS DOUBLE) AS rmse,
           CAST(round(list_max(errs), 6) AS DOUBLE) AS max_err
    FROM err
    """,
    tags=("similarity", "llm", "embeddings", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column
    (scale = max|x|/127, q = clamp(round-half-up(x/scale))), reporting
    the scale and the reconstruction error (RMSE + max abs) — the
    compression stage that cuts an embedding store 4x before ANN
    serving. Round-half-up is spelled floor(x+0.5) so both engines
    agree at ties.

    Scale: pure per-row array math in codegen, zero shuffle, zero
    Python — the whole op rides the scan. The same expressions applied
    with transform() produce the quantized array itself; this query
    returns the per-vector audit stats so the quality of the
    compression is oracle-checked end to end.
    """
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    # all-zero vector -> scale 0; quantize against an effective scale
    # of 1 (errors are identically 0) instead of dividing by zero
    raw_scale = (
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(xd(x)))) / 127.0
    )
    q = e.select(
        "vec_id",
        "label",
        "embedding",
        raw_scale.alias("scale"),
        F.when(raw_scale == 0, F.lit(1.0)).otherwise(raw_scale).alias("eff_scale"),
    )
    recon = F.transform(
        F.col("embedding"),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0), F.floor(xd(x) / F.col("eff_scale") + 0.5).cast("double")
            ),
        )
        * F.col("eff_scale"),
    )
    errs = F.zip_with(F.col("embedding"), recon, lambda x, r: F.abs(xd(x) - r))
    with_errs = q.select("vec_id", "label", "scale", errs.alias("errs"))
    n = F.size(F.col("errs"))
    return with_errs.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("scale"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("errs"), F.lit(0.0), lambda acc, x: acc + x * x
                )
                / n
            ),
            6,
        ).alias("rmse"),
        F.round(F.array_max(F.col("errs")), 6).alias("max_err"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the embedding compressor behind IVF-PQ
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 8  # 64 dims → 8 subvectors of 8 dims
PQ_K = 16  # centroids per subspace → 4-bit codes, 64 bits per vector


def _subvec(emb: Column, s: int, sub_dim: int) -> Column:
    return F.transform(
        F.slice(emb, s * sub_dim + 1, sub_dim), lambda x: x.cast("double")
    )


def _pq_exploded(embeddings: DataFrame, n_sub: int, sub_dim: int) -> DataFrame:
    """(vec_id, s, sv): one row per (vector, subspace) — the shape that
    lets ALL subspaces train/assign in one job."""
    subs = F.array(
        *[
            F.struct(F.lit(s).alias("s"), _subvec(F.col("embedding"), s, sub_dim).alias("sv"))
            for s in range(n_sub)
        ]
    )
    return embeddings.select("vec_id", F.explode(subs).alias("x")).select(
        "vec_id", F.col("x.s").alias("s"), F.col("x.sv").alias("sv")
    )


def _pq_code(cb_lit: Column, s: Column, sv: Column) -> Column:
    """Nearest-centroid code for a subvector against the per-subspace
    codebook (3-level nested array literal; argmin in codegen)."""
    cents = F.element_at(cb_lit, s + 1)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(sv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train(
    embeddings: DataFrame,
    n_sub: int = PQ_SUBSPACES,
    k: int = PQ_K,
    iters: int = 3,
    dim: int = EMBED_DIM,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011): an
    independent k-means per subspace, all subspaces per Lloyd pass in
    ONE DataFrame job.

    Mechanics: explode each vector into (subspace, subvector) rows;
    assignment is an in-plan argmin against the nested codebook
    literal; the M-step is one groupBy (subspace, cluster) computing
    sub_dim avg aggregates (map-side partials — shuffle rows are
    n_sub × k × partitions, never corpus-sized). Codebooks
    (n_sub × k × sub_dim ≈ 1 K floats) round-trip through the driver
    between passes, exactly like the IVF coarse quantizer.

    Deterministic: seeded by the first k vectors in md5(vec_id) order,
    fixed iteration count, no RNG. Returns codebooks[s][c] =
    sub_dim-float centroid.
    """
    sub_dim = dim // n_sub
    seed_rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(k)
        .collect()
    )
    codebooks = [
        [
            [float(x) for x in r["embedding"][s * sub_dim : (s + 1) * sub_dim]]
            for r in seed_rows
        ]
        for s in range(n_sub)
    ]
    exploded = _pq_exploded(embeddings, n_sub, sub_dim)
    for _ in range(iters):
        cb_lit = F.lit(codebooks)
        assigned = exploded.select(
            "s", "sv", _pq_code(cb_lit, F.col("s"), F.col("sv")).alias("code")
        )
        means = (
            assigned.groupBy("s", "code")
            .agg(*[F.avg(F.col("sv")[d]).alias(f"d{d}") for d in range(sub_dim)])
            .collect()
        )
        nxt = [[list(c) for c in cb] for cb in codebooks]
        for r in means:
            nxt[r["s"]][r["code"]] = [float(r[f"d{d}"]) for d in range(sub_dim)]
        codebooks = nxt
    return codebooks


def pq_quantize(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Assign PQ codes and report per-vector reconstruction error:
    (vec_id, codes array<int>, recon_err double). Pure projection —
    the 100 TB encode path is a map-only pass; codes are
    n_sub × log2(k) bits per vector (64 bits here vs 2 KB raw)."""
    n_sub = len(codebooks)
    sub_dim = dim // n_sub
    cb_lit = F.lit(codebooks)
    codes = F.array(
        *[
            _pq_code(cb_lit, F.lit(s), _subvec(F.col("embedding"), s, sub_dim))
            for s in range(n_sub)
        ]
    )
    recon_err = F.sqrt(
        sum(
            F.aggregate(
                F.zip_with(
                    _subvec(F.col("embedding"), s, sub_dim),
                    F.element_at(F.element_at(cb_lit, s + 1), F.element_at(F.col("codes"), s + 1) + 1),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for s in range(n_sub)
        )
    )
    return (
        embeddings.select("vec_id", "embedding")
        .withColumn("codes", codes)
        .withColumn("recon_err", F.round(recon_err, 6))
        .drop("embedding")
    )


@query("embedding_pq_codebook", oracle=None, tags=("similarity", "llm", "embeddings", "quantization", "ivf"))
def embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization training + encode over the embedding
    corpus: 8 subspaces × 16 centroids (64-bit codes, 32× smaller
    than the raw vectors), reporting per-subspace cluster sizes and
    mean reconstruction error — the compression stage of an IVF-PQ
    index, complementing ``similarity_ivf_topk`` (coarse stage) and
    ``embedding_quantize_int8`` (scalar stage). Rows-only gate
    (iterative k-means); determinism and quantizer-optimality
    properties are pinned in tests/test_operators.py.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    codebooks = pq_train(e)
    q = pq_quantize(e, codebooks)
    out = (
        q.select("vec_id", "recon_err", F.posexplode("codes").alias("s", "code"))
        .groupBy("s", "code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.avg("recon_err"), 4).alias("avg_vec_recon_err"),
        )
    )
    return out


@query("similarity_ivfpq_topk", oracle=None, tags=("similarity", "llm", "approx", "embeddings", "ivf", "quantization"))
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via a full IVF-PQ pipeline (Jégou et al. 2011), the
    memory-bound architecture real billion-vector services run:

    1. coarse quantizer (64-list k-means, ``ivf_train``) routes each
       vector to an inverted list;
    2. the RESIDUAL (vector − list centroid) is product-quantized to
       a 64-bit code (``pq_train`` on residuals — residual PQ beats
       raw PQ because residuals concentrate near zero);
    3. query time: probe the ``IVF_NPROBE`` nearest lists, estimate
       distances by ADC — a per-query lookup table of
       ||q_residual_sub − codebook[s][c]||² (8×16 floats folded into
       the plan as a literal; the per-row work is 8 array lookups,
       no vector math) — keep the best 50;
    4. exact cosine re-rank of the survivors against the RAW vectors.

    Scale: the scan over probed lists touches only codes (8 bytes per
    vector, 256× smaller than raw float32×64); raw vectors are fetched
    only for the 50 ADC survivors. Deterministic (seeded k-means,
    fixed iterations); recall vs the exact scan is pinned in
    tests/test_operators.py on planted clusters.  Rows-only gate.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    qvec = np.array(_query_vector(spark, sf_dir, 0))

    centroids = ivf_train(e)
    cent_lit = F.lit(centroids)
    indexed = e.withColumn(
        "list_id", _nearest_centroid(F.col("embedding"), centroids)
    ).withColumn(
        "residual",
        F.zip_with(
            F.col("embedding"),
            F.element_at(cent_lit, F.col("list_id") + 1),
            lambda x, c: x.cast("double") - c,
        ),
    )
    res_df = indexed.select("vec_id", F.col("residual").alias("embedding")).persist()
    codebooks = pq_train(res_df, iters=2)
    coded = (
        pq_quantize(res_df, codebooks)
        .join(indexed.select("vec_id", "list_id", "embedding"), "vec_id")
    )

    order = np.argsort([float(np.sum((qvec - np.array(c)) ** 2)) for c in centroids])
    probe_lists = [int(i) for i in order[:IVF_NPROBE]]
    # per-list ADC lookup tables: ||(q - centroid)_sub - cb[s][c]||^2
    n_sub = len(codebooks)
    sub_dim = EMBED_DIM // n_sub
    luts = {}
    for li in probe_lists:
        qr = qvec - np.array(centroids[li])
        luts[li] = [
            [
                float(np.sum((qr[s * sub_dim : (s + 1) * sub_dim] - np.array(c)) ** 2))
                for c in codebooks[s]
            ]
            for s in range(n_sub)
        ]
    lut_lit = F.lit([luts[li] for li in probe_lists])  # [probe_idx][s][c]
    probe_idx = F.array_position(
        F.lit(probe_lists), F.col("list_id")
    )  # 1-based, 0 if absent
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.element_at(lut_lit, probe_idx.cast("int")), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    survivors = (
        coded.where(F.col("list_id").isin(probe_lists))
        .withColumn("adc", adc)
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(50)
    )
    out = survivors.select(
        "vec_id",
        F.round(cosine_to_literal(F.col("embedding"), [float(x) for x in qvec]), 4).alias(
            "cos_sim"
        ),
    ).orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)
    rows = out.collect()
    res_df.unpersist()
    return spark.createDataFrame(rows, out.schema)
