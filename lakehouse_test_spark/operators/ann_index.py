"""Persisted ANN index: a build/query split over the LSH and IVF
similarity paths in ``operators/similarity.py``.

At 100 TB the index must be an artifact, not a per-query computation:
``similarity_lsh_topk`` / ``similarity_ivf_topk`` demonstrate the
*algorithms* (and re-derive planes/centroids/histograms per call,
acceptable for a one-shot query), while this module is the serving
shape — ``ann_index_build`` pays the corpus passes ONCE and writes

    <path>/meta.json        planes or centroids + the bucket histogram
                            (index metadata: ≤ 2^planes / nlist entries,
                            driver-sized at any corpus size — the same
                            thing FAISS keeps in RAM)
    <path>/vectors/         the corpus with its precomputed bucket id,
                            PARTITIONED by a bucket band (directory-level
                            partition pruning) and SORTED by bucket
                            within files (parquet row-group pruning)

and ``ann_index_query`` then answers a top-k probe with NO full-corpus
work at all: probe selection walks the stored histogram driver-side,
and the one Spark job is a scan whose partition filter + pushed bucket
predicate touch only the probed bands (pinned by
tests/test_ann_index.py on both the plan and the job count).

The reference has no similarity surface (it is a Pulsar/Kafka harness,
SURVEY.md §0); this is part of the mandated LLM-data extension.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.operators.similarity import (
    EMBED_DIM,
    IVF_NLIST,
    LSH_PLANES,
    _nearest_centroid,
    _planes,
    cosine_to_literal,
    ivf_train,
    lsh_bucket,
    ranked_buckets,
)

# LSH buckets are grouped into 256 directory partitions ("bands") so the
# partition count stays filesystem-friendly while still pruning 255/256
# of the data at planning time; the exact bucket predicate then prunes
# row groups inside each band.
_BAND_BITS = 8


def _band_of(bucket_col, n_planes: int):
    shift = max(0, n_planes - _BAND_BITS)
    return F.shiftright(bucket_col.cast("int"), shift).alias("band")


def ann_index_build(
    embeddings: DataFrame,
    path: str,
    kind: str = "lsh",
    n_planes: int = LSH_PLANES,
    nlist: int = IVF_NLIST,
    dim: int = EMBED_DIM,
) -> dict:
    """Build and persist an ANN index over ``embeddings``
    (``vec_id``, ``embedding``, and any passenger columns).

    kind="lsh": random-hyperplane buckets (seeded planes folded into the
    plan as literals). kind="ivf": k-means coarse quantizer trained with
    ``ivf_train`` (nlist-bounded shuffles), list id as the bucket.

    Cost: the LSH build is ONE map-only pass over the corpus plus the
    write shuffle (repartitionByRange on bucket); IVF adds the bounded
    training passes. The histogram is aggregated from the bucket column
    in the same session and stored in meta.json; nothing here is
    proportional to corpus size except the single write.
    """
    if kind == "lsh":
        planes = _planes(n_planes, dim)
        bucketed = embeddings.withColumn(
            "bucket", lsh_bucket(F.col("embedding"), planes)
        )
        meta: dict = {
            "kind": "lsh",
            "n_planes": n_planes,
            "dim": dim,
            "planes": [[float(x) for x in p] for p in planes],
        }
        shift = max(0, n_planes - _BAND_BITS)
    elif kind == "ivf":
        centroids = ivf_train(embeddings, nlist=nlist, dim=dim)
        bucketed = embeddings.withColumn(
            "bucket", _nearest_centroid(F.col("embedding"), centroids)
        )
        meta = {"kind": "ivf", "nlist": nlist, "dim": dim, "centroids": centroids}
        shift = 0  # ≤ nlist directories — band == bucket
    else:
        raise ValueError(f"unknown index kind: {kind}")

    bucketed = bucketed.withColumn(
        "band", F.shiftright(F.col("bucket").cast("int"), shift)
    )
    vectors_dir = os.path.join(path, "vectors")
    (
        bucketed.repartitionByRange(
            max(1, embeddings.sparkSession.sparkContext.defaultParallelism), "bucket"
        )
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(vectors_dir)
    )
    # histogram from the WRITTEN table (one bounded aggregate; also
    # doubles as a build verification read-back)
    hist_rows = (
        embeddings.sparkSession.read.parquet(vectors_dir)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    meta["histogram"] = {str(r["bucket"]): int(r["cnt"]) for r in hist_rows}
    meta["band_shift"] = shift
    meta["files"] = _list_vector_files(path)
    os.makedirs(path, exist_ok=True)
    _atomic_write_meta(path, meta)
    return meta


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def _atomic_write_meta(path: str, meta: dict) -> None:
    """meta.json IS the index's commit point (histogram + file
    manifest swap in one os.replace): readers resolve their file list
    through the manifest, so a reader never sees a half-written
    append — it reads either the old index or the new one."""
    import uuid as _uuid

    tmp = os.path.join(path, f".meta-{_uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))


def _list_vector_files(path: str) -> list[str]:
    """Relative paths of data files under vectors/ (excluding Spark's
    in-flight _temporary staging)."""
    vdir = os.path.join(path, "vectors")
    out = []
    for root, _dirs, files in os.walk(vdir):
        if "_temporary" in root:
            continue
        for fn in files:
            if fn.startswith("part-") and fn.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, fn), vdir))
    return sorted(out)


def _vectors_frame(spark: SparkSession, path: str, meta: dict, bands=None) -> DataFrame:
    """Scan the index through its MANIFEST (snapshot isolation: files
    not yet committed to meta.json are invisible), pruning whole band
    directories driver-side before Spark even lists them. Indexes
    built before the manifest existed fall back to a directory scan."""
    vdir = os.path.join(path, "vectors")
    files = meta.get("files")
    if files is None:
        return spark.read.parquet(vdir)
    if bands is not None:
        want = {int(b) for b in bands}
        files = [
            f
            for f in files
            if int(f.split("band=", 1)[1].split("/", 1)[0].split(os.sep, 1)[0])
            in want
        ]
    if not files:
        return spark.read.parquet(vdir).limit(0)
    return spark.read.option("basePath", vdir).parquet(
        *[os.path.join(vdir, f) for f in files]
    )


def _select_probes(meta: dict, query_vec: list[float], target_candidates: int) -> list[int]:
    """Probe selection against the STORED histogram — pure driver-side
    arithmetic, no Spark job (this is what 'index metadata' buys)."""
    hist = {int(k): v for k, v in meta["histogram"].items()}
    qvec = np.array(query_vec, dtype=float)
    if meta["kind"] == "lsh":
        planes = np.array(meta["planes"])
        order = ranked_buckets(qvec, planes)
    else:
        cents = [np.array(c) for c in meta["centroids"]]
        order = [
            int(i)
            for i in np.argsort([float(np.sum((qvec - c) ** 2)) for c in cents])
        ]
    probes: list[int] = []
    cum = 0
    for b in order:
        if b not in hist:
            continue
        probes.append(b)
        cum += hist[b]
        if cum >= target_candidates:
            break
    return probes


def ann_index_query(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    target_candidates: int = 30,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k by exact cosine over the probed slice of a persisted index.

    No training, no histogram job, no full-corpus scan: probes come from
    meta.json driver-side; the scan filter is (band IN ...) AND
    (bucket IN ...), so directory partitions prune at planning time and
    parquet row-group stats prune inside the probed bands.
    """
    meta = _load_meta(path)
    probes = _select_probes(meta, query_vec, target_candidates)
    bands = sorted({b >> meta["band_shift"] for b in probes})
    df = _vectors_frame(spark, path, meta, bands)
    cols = ["vec_id"] + (extra_cols or [])
    return (
        df.where(F.col("band").isin(bands) & F.col("bucket").isin(probes))
        .select(
            *cols,
            F.round(
                cosine_to_literal(F.col("embedding"), [float(x) for x in query_vec]), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ann_index_query_batch(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    target_candidates: int = 30,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Serve MANY probes against the persisted index in ONE pruned
    scan — the production batch-lookup shape (embedding services
    answer lookups in batches, not one Spark job per query).

    Probe selection stays driver-side per query (histogram walk);
    the single scan reads the UNION of all probed bands/buckets, a
    broadcast (query_id, bucket) table restricts each candidate to
    the queries that probed its bucket, a broadcast query-vector
    table supplies the cosine operand, and one window shuffle ranks
    per-query top-k. Cost: one partition-pruned scan of the probed
    slice + one |candidates|-sized shuffle, independent of how many
    corpus buckets exist.
    """
    from pyspark.sql import Window

    from lakehouse_test_spark.operators.similarity import cosine

    meta = _load_meta(path)
    probe_rows = [
        (int(qid), int(b))
        for qid, vec in queries
        for b in _select_probes(meta, [float(x) for x in vec], target_candidates)
    ]
    if not probe_rows:
        raise ValueError("no probes selected (empty index?)")
    bands = sorted({b >> meta["band_shift"] for _, b in probe_rows})
    buckets = sorted({b for _, b in probe_rows})
    probes_df = spark.createDataFrame(probe_rows, "query_id int, bucket int")
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id int, qvec array<double>",
    )
    cols = ["vec_id"] + (extra_cols or [])
    cand = (
        _vectors_frame(spark, path, meta, bands)
        .where(F.col("band").isin(bands) & F.col("bucket").isin(buckets))
        .join(F.broadcast(probes_df), "bucket")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            *cols,
            F.round(cosine(F.col("embedding"), F.col("qvec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def _bucket_expr(meta: dict):
    """Bucket assignment column from STORED index metadata (no
    retraining — the planes/centroids in meta.json are the index)."""
    if meta["kind"] == "lsh":
        planes = np.array(meta["planes"])
        return lsh_bucket(F.col("embedding"), planes)
    cents = meta["centroids"]
    return _nearest_centroid(F.col("embedding"), cents)


def ann_index_append(embeddings: DataFrame, path: str) -> dict:
    """Incrementally add vectors to a persisted index: bucket them
    with the stored planes/centroids, append parquet into the band
    partitions, and merge the delta histogram into meta.json.

    This is the maintenance half of the build/query split: a
    streaming pipeline calls it per micro-batch (see
    ``stream_embeddings_to_ann_index``), so the index stays fresh
    without ever re-touching the existing corpus — cost is
    O(new vectors) bucketing + a bounded histogram merge.
    """
    meta = _load_meta(path)
    shift = meta["band_shift"]
    before = set(_list_vector_files(path))
    bucketed = embeddings.withColumn("bucket", _bucket_expr(meta)).withColumn(
        "band", F.shiftright(F.col("bucket").cast("int"), shift)
    )
    delta_rows = (
        bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    (
        bucketed.repartition(max(1, min(8, len(delta_rows) or 1)), "bucket")
        .sortWithinPartitions("bucket")
        .write.mode("append")
        .partitionBy("band")
        .parquet(os.path.join(path, "vectors"))
    )
    hist = meta["histogram"]
    for r in delta_rows:
        k = str(r["bucket"])
        hist[k] = hist.get(k, 0) + int(r["cnt"])
    # COMMIT: histogram + manifest swap atomically (os.replace) — a
    # concurrent reader sees the whole batch or none of it; files from
    # a crashed append stay orphaned (never adopted: the diff is
    # against the pre-write listing), preserving exactly-once under
    # foreachBatch replay. Single concurrent WRITER by contract (the
    # streaming maintenance path); readers need no lock at all.
    after = _list_vector_files(path)
    committed = set(meta.get("files") or [])
    meta["files"] = sorted(committed | (set(after) - before))
    _atomic_write_meta(path, meta)
    return meta


def stream_embeddings_to_ann_index(
    spark: SparkSession, source_dir: str, path: str, schema=None
):
    """Streaming index maintenance: a bounded embedding stream
    (file source, one file per micro-batch) appended to the persisted
    index via ``foreachBatch`` → ``ann_index_append``. Returns after
    the AvailableNow drain; the index then answers queries over
    everything ingested — the production shape for 'embeddings land
    continuously, ANN stays queryable'."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.take(1):
            ann_index_append(batch_df, path)

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(path, "_stream_checkpoint")
        )
        .start()
    )
    q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# Gate queries: build-once, query-many over a cached on-disk index
# ---------------------------------------------------------------------------


def _cached_index(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Build (or reuse) the persisted index for a fixture dir. The cache
    key includes the fixture path so sf0.001/sf0.01/sf0.1 don't collide;
    contents are deterministic (seeded planes / seeded k-means)."""
    import hashlib

    from lakehouse_test_spark.session import load_table

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join("/tmp", "lakehouse_ann_index", f"{key}-{kind}")
    if not os.path.exists(os.path.join(path, "meta.json")):
        e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
        ann_index_build(e.select("vec_id", "label", "embedding"), path, kind=kind)
    return path


@query(
    "similarity_index_lsh_topk",
    oracle=None,
    tags=("similarity", "llm", "approx", "embeddings", "index"),
)
def similarity_index_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 served from the PERSISTED LSH index: probe selection
    walks the stored histogram driver-side and the single Spark job
    scans only the probed bands (partition-pruned) — the serving path a
    100 TB deployment would run, vs ``similarity_lsh_topk`` which
    rebuilds its index per call. Rows-only gate (bucketing is not
    SQL-expressible); recall and scan-pruning are pinned in
    tests/test_ann_index.py."""
    from lakehouse_test_spark.operators.similarity import _query_vector

    path = _cached_index(spark, sf_dir, "lsh")
    qvec = _query_vector(spark, sf_dir, 0)
    return ann_index_query(spark, path, qvec, k=10, extra_cols=["label"])


@query(
    "similarity_index_batch_topk",
    oracle=None,
    tags=("similarity", "llm", "approx", "embeddings", "index", "batch"),
)
def similarity_index_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 for a BATCH of probes served from the persisted LSH
    index in one pruned scan + one window shuffle — the
    embedding-service lookup shape (N lookups ≠ N Spark jobs).
    Rows-only gate; per-query parity with the single-probe path and
    the job-count pin live in tests/test_ann_index.py."""
    from lakehouse_test_spark.operators.similarity import _query_vector

    path = _cached_index(spark, sf_dir, "lsh")
    queries = [(i, _query_vector(spark, sf_dir, i)) for i in (0, 3, 7)]
    return ann_index_query_batch(spark, path, queries, k=10, extra_cols=["label"])


@query(
    "similarity_index_ivf_topk",
    oracle=None,
    tags=("similarity", "llm", "approx", "embeddings", "index", "ivf"),
)
def similarity_index_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 served from the PERSISTED IVF index (k-means trained
    once at build time; queries never retrain). Rows-only gate."""
    from lakehouse_test_spark.operators.similarity import _query_vector

    path = _cached_index(spark, sf_dir, "ivf")
    qvec = _query_vector(spark, sf_dir, 0)
    return ann_index_query(spark, path, qvec, k=10, extra_cols=["label"])
