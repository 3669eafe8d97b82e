"""Deduplication operators over ``documents`` / ``embeddings``:
exact (hash-groupBy), MinHash-LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design (the whole point at 100 TB):
- exact dedup is a single hash-shuffle on a 16-byte fingerprint;
- MinHash signatures are a pure projection (array_min over a
  per-permutation rehash of the shingle-hash array — zero shuffle);
  SimHash is explode + 64 partial conditional sums (one shuffle);
- LSH banding turns the O(n²) pair problem into an equi-join on
  (band, band_hash) — only colliding candidates are verified
  exactly, so verification cost tracks the true duplicate rate;
- every hash is Spark's xxhash64 (JVM, codegen) — no Python.

The reference has no dedup (SURVEY.md §2a "explicitly absent");
mandated by the BASELINE.json north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_test_spark.operators.text import word_shingles, ws_tokens
from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table, register_query_cache

NUM_PERMS = 64
# 16 bands × 4 rows: the s-curve knee sits at (1/16)^(1/4) = 0.50 —
# exactly the verification threshold — so low-similarity candidate
# pairs collapse (vs 32×2's knee at 0.18) while recall at the fixture's
# true-pair similarities (j ≥ 0.88) stays 1.0, verified empirically by
# test_minhash_lsh_matches_exact against the exact O(n²) answer.
LSH_BANDS = 16
ROWS_PER_BAND = NUM_PERMS // LSH_BANDS
JACCARD_THRESHOLD = 0.5


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_fingerprint",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "llm"),
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5(normalized text) → keeper + copy count.

    Scale: one shuffle keyed on a 16-byte hash (never the full text);
    min(doc_id) keeps the earliest copy deterministically. Filtering
    n_copies > 1 yields the purge list.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_exact_summary",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT md5(lower(trim(text)))) AS n_unique,
           count(*) - count(DISTINCT md5(lower(trim(text)))) AS n_dupes
    FROM documents GROUP BY lang
    """,
    tags=("dedup", "llm"),
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language dedup accounting (docs vs unique fingerprints)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_dupes"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, SQL-expressible on a linear pairing)
# ---------------------------------------------------------------------------


def _jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two string-array columns (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS sh
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
                     THEN round(len(list_intersect(a.sh, b.sh)) * 1.0
                                / len(list_distinct(list_concat(a.sh, b.sh))), 4)
                     ELSE 0.0 END AS DOUBLE) AS jaccard
    FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
    """,
    tags=("dedup", "llm"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard on a linear pairing (doc i vs i+1).

    The linear pairing keeps this oracle-checkable at O(n); the full
    O(n²) problem is what dedup_minhash_lsh solves with banding.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles(ws_tokens(F.col("text")), 3).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(_jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH fuzzy dedup (the scale path)
# ---------------------------------------------------------------------------


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc array of distinct 64-bit shingle hashes.

    Each shingle string is hashed exactly once (xxhash64); everything
    downstream (signatures, verification) works on longs — smaller
    shuffles, and permutation hashing runs over fixed 12-byte inputs
    instead of re-scanning strings 64×. Jaccard over 64-bit hashes
    equals string Jaccard w.h.p. (collision ~n²/2⁶⁴).
    """
    # CPU-heavy per-row stage: make sure it runs on every core even
    # when the source is a single small file (at 100 TB the scan
    # already yields thousands of partitions and this is a no-op-ish
    # round-robin; locally it is the difference between 1 and N cores)
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    # hash each TOKEN once, then mix 3 token-hashes per shingle
    # (xxhash64 over 24 fixed bytes) — vs hashing each ~20-byte
    # concatenated shingle string, every token's bytes are hashed
    # once instead of three times and no concat strings are
    # allocated. Hash-identity of a shingle ≙ identity of its token
    # hash triple w.h.p., same collision bound as before.
    toks = docs.select(
        F.col(id_col),
        F.transform(ws_tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("__th"),
    )
    n = F.size("__th")
    sh = F.transform(
        # ANSI guard: docs under 3 tokens must yield [], not a
        # descending sequence feeding element_at(_, 0)
        F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.xxhash64(
            F.element_at(F.col("__th"), i),
            F.element_at(F.col("__th"), i + F.lit(1)),
            F.element_at(F.col("__th"), i + F.lit(2)),
        ),
    )
    return toks.select(F.col(id_col), F.array_distinct(sh).alias("shl"))


def _signature_col(num_perms: int = NUM_PERMS) -> Column:
    """MinHash signature as ONE array column over a ``shl``
    shingle-hash array: sig[i] = min over shingles of xxhash64(i, h)
    — the i-salted rehash stands in for an independent permutation.

    REFERENCE IMPLEMENTATION (kept for the exact-parity test of the
    Arrow kernel below). Catalyst evaluates higher-order functions
    interpreted — outside whole-stage codegen — so this expression,
    while analysis-cheap, spends ~0.78 s at sf0.1 walking 64×|shl|
    lambda invocations per doc. The production signature path is
    :func:`signatures_from_shingles`."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perms - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shl"), lambda h: F.xxhash64(i, h))
        ),
    ).alias("sig")


def _xxh64_sig_mapper(id_field: str, num_perms: int, banded: bool = False):
    """mapInArrow kernel: per-doc MinHash signature via a vectorized
    numpy XXH64 (guide §4.2 — batch-at-a-time native math where the
    equivalent JVM expression chain is interpreted).

    Byte-identical to ``_signature_col``: Spark's
    ``xxhash64(int i, long h)`` is ``XXH64.hashLong(h,
    XXH64.hashInt(i, 42))``; the per-perm seeds ``hashInt(i, 42)``
    are constants, and ``hashLong``'s first mix ``k1 =
    rotl31(h·P2)·P1`` is seed-independent, so one pass computes k1
    for every shingle and each perm costs 8 vector ops + a segmented
    min. Exactness is pinned by
    tests/test_operators.py::test_minhash_arrow_signature_parity.

    With ``banded=True`` the kernel also folds the LSH banding in —
    emitting the exploded ``(id, band, bh)`` rows directly, where
    ``bh = xxhash64(int band, sig[4b], .., sig[4b+3])`` (the chained
    hashLong walk), byte-identical to the banding expression in
    ``lsh_candidate_pairs``. This removes the interpreted 16-struct
    band transform AND the Generate(explode) from the JVM plan."""
    if banded and num_perms % ROWS_PER_BAND:
        # n_bands derives from num_perms // ROWS_PER_BAND below; a
        # non-divisible num_perms would silently drop the trailing
        # permutations and diverge from the LSH_BANDS expression path
        raise ValueError(
            f"banded kernel needs num_perms divisible by {ROWS_PER_BAND}; "
            f"got {num_perms}"
        )

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        P1 = np.uint64(0x9E3779B185EBCA87)
        P2 = np.uint64(0xC2B2AE3D27D4EB4F)
        P3 = np.uint64(0x165667B19E3779F9)
        P4 = np.uint64(0x85EBCA77C2B2AE63)
        P5 = np.uint64(0x27D4EB2F165667C5)

        def rotl(x, r):
            return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

        def fmix(h):
            h = h ^ (h >> np.uint64(33))
            h = h * P2
            h = h ^ (h >> np.uint64(29))
            h = h * P3
            return h ^ (h >> np.uint64(32))

        with np.errstate(over="ignore"):
            # seed_i = XXH64.hashInt(i, 42) — i is int-typed, exactly
            # the sequence-element type _signature_col feeds xxhash64
            i = np.arange(num_perms, dtype=np.uint64)
            s = (np.uint64(42) + P5 + np.uint64(4)) ^ (i * P1)
            seeds = fmix(rotl(s, 23) * P2 + P3)
            seed_base = seeds + P5 + np.uint64(8)

        for batch in batches:
            # errstate scoped per batch and EXITED before each yield:
            # holding it across a yield leaves overflow suppression
            # active in the consuming worker thread between batches
            # (r11 ADVICE), masking overflow warnings in unrelated
            # code; wrapping-uint64 overflow is intentional only for
            # the hash math below.
            with np.errstate(over="ignore"):
                ids = batch.column(0)
                lst = batch.column(1)
                lengths = pc.list_value_length(lst).to_numpy()
                # shingle-less docs (<3 tokens) are dropped HERE, not
                # with a JVM-side Filter(size(shl) > 0): predicate
                # pushdown substitutes the whole shingle HOF
                # expression into the filter condition, so the array
                # is built twice per row (measured 0.19 s → 5.6 s on a
                # 50k-doc corpus). The Python stage is a projection
                # barrier — the child computes shl exactly once.
                keep = lengths > 0
                if not keep.all():
                    ids = ids.filter(pa.array(keep))
                    lst = lst.filter(pa.array(keep))
                    lengths = lengths[keep]
                n = len(lengths)
                if n == 0:
                    continue
                flat = (
                    lst.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                    .view(np.uint64)
                )
                starts = np.zeros(n, dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts[1:])
                k1 = rotl(flat * P2, 31) * P1  # shared by all perms
                out = np.empty((n, num_perms), dtype=np.int64)
                for j in range(num_perms):
                    h = fmix(rotl(seed_base[j] ^ k1, 27) * P1 + P4)
                    # signed min — array_min compares bigints signed
                    out[:, j] = np.minimum.reduceat(h.view(np.int64), starts)
                if not banded:
                    offsets = pa.array(
                        np.arange(0, (n + 1) * num_perms, num_perms, dtype=np.int32),
                        type=pa.int32(),
                    )
                    sig = pa.ListArray.from_arrays(
                        offsets, pa.array(out.reshape(-1), type=pa.int64())
                    )
                    rb = pa.RecordBatch.from_arrays(
                        [ids, sig], names=[id_field, "sig"]
                    )
                else:
                    # banded: bh[i, b] = chained hashLong over the
                    # band's ROWS_PER_BAND sig values, seeded with
                    # hashInt(b, 42)
                    n_bands = num_perms // ROWS_PER_BAND
                    b = np.arange(n_bands, dtype=np.uint64)
                    bs = (np.uint64(42) + P5 + np.uint64(4)) ^ (b * P1)
                    band_seeds = fmix(rotl(bs, 23) * P2 + P3)
                    sig_u = out.view(np.uint64)
                    bh = np.empty((n, n_bands), dtype=np.int64)
                    for bi in range(n_bands):
                        h = np.full(n, band_seeds[bi], dtype=np.uint64)
                        for r in range(ROWS_PER_BAND):
                            v = sig_u[:, bi * ROWS_PER_BAND + r]
                            h = (h + P5 + np.uint64(8)) ^ (rotl(v * P2, 31) * P1)
                            h = fmix(rotl(h, 27) * P1 + P4)
                        bh[:, bi] = h.view(np.int64)
                    idx = np.repeat(np.arange(n, dtype=np.int64), n_bands)
                    rb = pa.RecordBatch.from_arrays(
                        [
                            ids.take(pa.array(idx)),
                            pa.array(
                                np.tile(np.arange(n_bands, dtype=np.int32), n),
                                type=pa.int32(),
                            ),
                            pa.array(bh.reshape(-1), type=pa.int64()),
                        ],
                        names=[id_field, "band", "bh"],
                    )
            yield rb

    return gen


def signatures_from_shingles(
    shl: DataFrame, id_col: str = "doc_id", num_perms: int = NUM_PERMS
) -> DataFrame:
    """MinHash signatures from a ``shl`` shingle-hash frame via the
    Arrow numpy kernel (values byte-identical to ``_signature_col``).

    Scale: still zero shuffle — one map-side Arrow pass per
    partition; only (id, shl) crosses the Python boundary and only
    (id, sig) comes back. Shingle-less docs are dropped inside the
    kernel (see the in-kernel comment: a JVM Filter over the HOF
    column would double-evaluate the shingle expression)."""
    sel = shl.select(F.col(id_col), "shl")
    id_type = sel.schema[id_col].dataType.simpleString()
    return sel.mapInArrow(
        _xxh64_sig_mapper(id_col, num_perms),
        schema=f"{id_col} {id_type}, sig array<bigint>",
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_perms: int = NUM_PERMS
) -> DataFrame:
    """Per-doc MinHash signature (``sig``: array<bigint> of length
    ``num_perms``), computed entirely map-side.

    Scale: the whole signature stage is map-local — zero shuffle (the
    old explode+groupBy shape shuffled O(docs×perms) partials); the
    per-perm rehash runs in the vectorized Arrow kernel. Docs with no
    shingles (<3 tokens) carry no signature and are dropped."""
    shl = shingle_hashes(docs, id_col, text_col)
    return signatures_from_shingles(shl, id_col, num_perms)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", star_threshold: int = 64
) -> DataFrame:
    """Band the signature (LSH_BANDS × ROWS_PER_BAND) and self-join on
    (band, band_hash) to produce candidate pairs (a < b).

    Scale: the join key is (band_id, 8-byte hash) — collisions are
    rare for non-duplicates, so join output ≈ true-duplicate pairs.
    Hot buckets are the real risk: boilerplate-heavy corpora put
    thousands of near-identical docs in ONE bucket, and an all-pairs
    self-join there is quadratic *output* — AQE skew splitting cannot
    help because the blowup is the result itself, not a lopsided
    partition. Buckets above ``star_threshold`` therefore emit
    spanning-star edges (every member → the bucket's min id) instead
    of the clique: linear output that preserves exactly the
    connectivity the downstream cluster step needs, while small
    buckets keep the full all-pairs recall.
    """
    # band structs from the array signature — one transform over a
    # 16-element sequence (seed ``b`` hashes identically to the old
    # per-band ``lit(b)``), keeping the whole banding stage inside
    # the same small expression tree as the signature
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                b,
                *[
                    F.element_at(F.col("sig"), b * ROWS_PER_BAND + r + 1)
                    for r in range(ROWS_PER_BAND)
                ],
            ).alias("bh"),
        ),
    )
    banded = sig.select(F.col(id_col), F.explode(bands).alias("x")).select(
        F.col(id_col), F.col("x.band").alias("band"), F.col("x.bh").alias("bh")
    )
    return _pairs_from_banded(banded, id_col, star_threshold)


def banded_from_shingles(
    shl: DataFrame, id_col: str = "doc_id", num_perms: int = NUM_PERMS
) -> DataFrame:
    """Exploded LSH band rows ``(id, band, bh)`` straight from the
    Arrow kernel — signature AND banding in one map-side pass, no
    interpreted band transform, no Generate node. Values are
    byte-identical to the expression banding in
    ``lsh_candidate_pairs`` (pinned by
    tests/test_operators.py::test_minhash_arrow_banding_parity)."""
    sel = shl.select(F.col(id_col), "shl")
    id_type = sel.schema[id_col].dataType.simpleString()
    return sel.mapInArrow(
        _xxh64_sig_mapper(id_col, num_perms, banded=True),
        schema=f"{id_col} {id_type}, band int, bh bigint",
    )


def _pairs_from_banded(
    banded: DataFrame, id_col: str = "doc_id", star_threshold: int = 64
) -> DataFrame:
    """Candidate pairs from exploded band rows (shared tail of the
    expression and Arrow banding paths)."""
    # ONE hash aggregate builds each bucket's member list; pairs are
    # expanded inside the plan with array transforms (no window sort,
    # no self-join exchange, no second shuffle for the bucket stats —
    # measured 2× faster than the window + self-join shape at sf0.1).
    # The aggregation buffer holds one id array per bucket — the same
    # data the windowed variant buffered per sort partition; the star
    # guard keeps *output* linear for mega-buckets either way.
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    n = F.size("ids")
    clique_pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    anchor = F.element_at("ids", 1)
    star_pairs = F.transform(
        F.slice(F.col("ids"), 2, n - 1),
        lambda y: F.struct(anchor.alias("id_a"), y.alias("id_b")),
    )
    pairs = F.when(n <= star_threshold, clique_pairs).otherwise(star_pairs)
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


@query("dedup_minhash_lsh", oracle=None, tags=("dedup", "llm", "approx"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH fuzzy dedup: signature → band → candidate join →
    exact Jaccard verification at threshold 0.5.

    Rows-only check (xxhash64 has no DuckDB twin); tests/test_dedup.py
    validates recall+precision against the exact O(n²) answer at
    sf0.001. Deterministic: every hash is seeded, no RNG.
    """
    d = load_table(spark, sf_dir, "documents")
    # shared by signature + verify paths within ONE execution; bench
    # releases it between timed passes via release_query_caches() so
    # best-of-N never times a warm shingle cache from a prior pass
    shl = register_query_cache(shingle_hashes(d).cache())
    cand = _pairs_from_banded(banded_from_shingles(shl))
    verified = (
        cand.join(shl.select(F.col("doc_id").alias("id_a"), F.col("shl").alias("sh_a")), "id_a")
        .join(shl.select(F.col("doc_id").alias("id_b"), F.col("shl").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    """DuckDB twin of dedup_simhash, generated: 64 conditional bit
    sums from the portable md5-derived token hash, 4x16-bit bands,
    any-band-equal candidate pairs verified at Hamming <= 3."""
    bit_sums = ",\n             ".join(
        (
            f"sum(CASE WHEN (h{1 if b < 32 else 2} >> {b % 32}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) AS s{b}"
        )
        for b in range(64)
    )
    bands = ",\n           ".join(
        "("
        + " + ".join(
            f"CASE WHEN s{16 * k + j} > 0 THEN {1 << j} ELSE 0 END"
            for j in range(16)
        )
        + f") AS band{k}"
        for k in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.band{k}, b.band{k}))" for k in range(4))
    anyband = " OR ".join(f"a.band{k} = b.band{k}" for k in range(4))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS BIGINT) AS h1,
             CAST(CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS BIGINT) AS h2
      FROM toks WHERE tok <> ''
    ), sums AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashed GROUP BY doc_id
    ), fp AS (
      SELECT doc_id,
           {bands}
      FROM sums
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({ham} AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND ({anyband})
    WHERE {ham} <= 3
    """


@query("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "llm", "approx"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprint from token hashes, split
    into 4×16-bit bands; pairs matching any band are verified by
    Hamming distance ≤ 3 (pigeonhole guarantees recall).

    Scale: fingerprinting is 64 conditional sums over exploded tokens
    (map-side partials); candidate generation is 4 equi-joins on
    16-bit band values + full-fingerprint verify. HASH-CHECKED against
    a generated DuckDB oracle (portable md5-derived token hash) —
    the banded-candidate + Hamming-verify pipeline is oracle-exact,
    not just rows-counted; tests additionally validate the Hamming
    property directly.
    """
    d = load_table(spark, sf_dir, "documents")
    if d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        d = d.repartition(spark.sparkContext.defaultParallelism)
    toks = d.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    # engine-portable 64-bit token hash (two md5-derived 32-bit
    # halves) so the whole operator is DuckDB-hash-checkable; swap in
    # xxhash64 on a real cluster for pure speed - every downstream
    # step is hash-agnostic
    h1 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("bigint")
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(h1 if b < 32 else h2, b % 32).bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_sums)
    band_cols = []
    for k in range(4):
        expr = F.lit(0)
        for j in range(16):
            b = 16 * k + j
            expr = expr + F.when(F.col(f"s{b}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        band_cols.append(expr.cast("int").alias(f"band{k}"))
    fp = sums.select("doc_id", *band_cols)

    a = fp.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"band{k}").alias(f"a{k}") for k in range(4)]
    )
    b_ = fp.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"band{k}").alias(f"b{k}") for k in range(4)]
    )
    cands = None
    for k in range(4):
        c = a.join(b_, (F.col(f"a{k}") == F.col(f"b{k}")) & (F.col("id_a") < F.col("id_b")))
        cands = c if cands is None else cands.unionByName(c)
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))) for k in range(4)
    )
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= 3)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, computed in
    double with a fixed operation order (dot / (sqrt(na)*sqrt(nb)))
    so Spark and the DuckDB oracle produce bit-identical IEEE results.
    """
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, x: acc + x
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


#: DuckDB twin of cosine() — same op order, double math.
DUCKDB_COSINE = """
list_aggregate(list_transform(range(1, len({a}) + 1),
               i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')
/ (sqrt(list_aggregate(list_transform(range(1, len({a}) + 1),
        i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), 'sum'))
   * sqrt(list_aggregate(list_transform(range(1, len({b}) + 1),
          i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')))
"""


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(round({DUCKDB_COSINE.format(a="a.embedding", b="b.embedding")}, 4) AS DOUBLE) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
    tags=("dedup", "llm", "embeddings"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup scores on a linear pairing (vec i vs i+1).

    Oracle-checkable exact path; the scale path for all-pairs is LSH
    bucketing (operators/similarity.py) with this same cosine kernel
    as the verifier.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("vec_b") == F.col("vec_a") + 1)
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cos_sim"),
        )
    )


@query(
    "dedup_containment",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS sh
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(CASE WHEN len(a.sh) > 0
                     THEN round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 4)
                     ELSE 0.0 END AS DOUBLE) AS containment_ab,
           CAST(CASE WHEN len(b.sh) > 0
                     THEN round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(b.sh), 4)
                     ELSE 0.0 END AS DOUBLE) AS containment_ba,
           len(a.sh) > 0
             AND len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh) >= 0.9
             AS a_inside_b
    FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
    """,
    tags=("dedup", "llm"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B| / |A| on the linear
    pairing — the signal Jaccard misses: a short doc fully quoted
    inside a long one has low Jaccard but containment ≈ 1, the common
    boilerplate/quotation near-dup in web corpora (Broder's original
    resemblance-vs-containment distinction).

    Scale: same linear-pairing shape as dedup_ngram_jaccard (the full
    problem rides the MinHash-LSH candidate generator: containment
    verification is one division swap in the verify stage).
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles(ws_tokens(F.col("text")), 3).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    contain = lambda side: F.when(  # noqa: E731
        F.size(F.col(f"{side}.sh")) > 0,
        inter.cast("double") / F.size(F.col(f"{side}.sh")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(contain("a"), 4).alias("containment_ab"),
            F.round(contain("b"), 4).alias("containment_ba"),
            (contain("a") >= 0.9).alias("a_inside_b"),
        )
    )


def search_similar_docs(
    spark: SparkSession,
    sf_dir: str,
    query_doc_id: int,
    k: int = 10,
) -> DataFrame:
    """Query-by-document similarity search: the query doc's distinct
    3-gram shingles fold into the plan as an array literal (a few KB —
    broadcast for free), every doc scores one codegen'd Jaccard
    against it, TakeOrdered returns the top-k. The interactive twin of
    the batch dedup pipeline; at qps-scale the same literal-fold runs
    against the LSH-bucketed index to skip the full scan.
    """
    d = load_table(spark, sf_dir, "documents")
    qrow = (
        d.where(F.col("doc_id") == query_doc_id)
        .select(word_shingles(ws_tokens(F.col("text")), 3).alias("sh"))
        .head()
    )
    q_sh = sorted(qrow["sh"]) if qrow else []
    sh = word_shingles(ws_tokens(F.col("text")), 3)
    return (
        d.where(F.col("doc_id") != query_doc_id)
        .select(
            "doc_id",
            F.round(_jaccard(sh, F.lit(q_sh)), 4).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_id"))
        .limit(k)
    )


@query(
    "similarity_docs_by_jaccard",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS sh
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents)
    ),
    q AS (SELECT sh AS qsh FROM s WHERE doc_id = 0)
    SELECT s.doc_id,
           CAST(CASE WHEN len(list_distinct(list_concat(s.sh, q.qsh))) > 0
                     THEN round(len(list_intersect(s.sh, q.qsh)) * 1.0
                                / len(list_distinct(list_concat(s.sh, q.qsh))), 4)
                     ELSE 0.0 END AS DOUBLE) AS jaccard
    FROM s CROSS JOIN q
    WHERE s.doc_id <> 0
    ORDER BY jaccard DESC, s.doc_id
    LIMIT 10
    """,
    tags=("similarity", "dedup", "llm"),
)
def similarity_docs_by_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents most shingle-similar to doc 0 (query-by-
    document) — see :func:`search_similar_docs` for the scale story.
    Ordering on the rounded score with doc_id tiebreak keeps the
    boundary deterministic across engines."""
    return search_similar_docs(spark, sf_dir, query_doc_id=0, k=10)
