"""Property tests for the custom operators (beyond the oracle gate):
LSH recall/precision vs exact answers, as-of join semantics on a
hand-built case, multimodal plumbing shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import Row

from lakehouse_test_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh,
    dedup_simhash,
)
from lakehouse_test_spark.operators.joins import asof_join, range_join_binned
from lakehouse_test_spark.operators.multimodal import (
    assets_from_documents,
    decode_media,
    extract_features,
    FEATURE_DIM,
)
from lakehouse_test_spark.operators.similarity import ann_topk, similarity_lsh_topk
from lakehouse_test_spark.session import load_table

from .conftest import SMOKE_SF_DIR


def exact_shingle_pairs(sf_dir: str, threshold: float) -> set[tuple[int, int]]:
    """Ground truth: O(n²) 3-shingle Jaccard pairs via DuckDB."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
                   FROM '{sf_dir}/documents.parquet'),
        s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
                     i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) sh FROM t)
        SELECT a.doc_id, b.doc_id FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}
        """
    ).fetchall()
    con.close()
    return {(a, b) for a, b in rows}


def test_minhash_lsh_matches_exact(spark):
    """LSH must find every true pair ≥ threshold (recall=1 at these
    band settings on this data) with zero false positives (exact
    verification step)."""
    truth = exact_shingle_pairs(SMOKE_SF_DIR, JACCARD_THRESHOLD)
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SMOKE_SF_DIR).collect()
    }
    assert got - truth == set(), "false positives survived exact verification"
    missed = truth - got
    assert len(missed) == 0, f"LSH missed true pairs: {sorted(missed)[:5]}"
    assert len(truth) > 0, "fixture should contain planted near-dups"


def test_shingles_short_docs_ansi_safe(spark):
    """Docs with <3 tokens must yield empty shingle arrays, not an
    ANSI INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash (sequence(1, size-2)
    descends for short docs). Covers the whole MinHash path: shingles,
    signatures, and pairwise Jaccard with the 0/0 → 0.0 convention.
    """
    from lakehouse_test_spark.operators.dedup import _jaccard, minhash_signatures
    from lakehouse_test_spark.operators.text import word_shingles, ws_tokens

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="one"),
            Row(doc_id=3, text="one two"),
            Row(doc_id=4, text="one two three"),
            Row(doc_id=5, text="one two three four"),
        ]
    )
    sh = docs.select(
        "doc_id", word_shingles(ws_tokens(F.col("text")), 3).alias("sh")
    )
    got = {r.doc_id: list(r.sh) for r in sh.collect()}
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["one two three"]
    assert got[5] == ["one two three", "two three four"]

    # pairwise Jaccard on adjacent docs: empty∪empty → 0.0, not NaN/crash
    a, b = sh.alias("a"), sh.alias("b")
    jac = {
        (r.da, r.db): r.j
        for r in a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            _jaccard(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .collect()
    }
    assert jac[(1, 2)] == 0.0 and jac[(2, 3)] == 0.0
    assert jac[(4, 5)] == pytest.approx(0.5)

    # signatures: only docs with ≥1 shingle appear (explode drops empties)
    sig = minhash_signatures(docs)
    assert {r.doc_id for r in sig.select("doc_id").collect()} == {4, 5}


def test_minhash_arrow_signature_parity(spark):
    """The vectorized numpy-XXH64 Arrow signature kernel must be
    byte-identical to the Catalyst expression form (sig[i] = min over
    shingles of xxhash64(int i, long h)) — candidates and therefore
    the whole dedup_minhash_lsh output depend on these exact values.

    Runs over the real sf0.001 corpus (every doc) plus synthetic edge
    docs (single-shingle, negative-hash-heavy long docs)."""
    from lakehouse_test_spark.operators.dedup import (
        _signature_col,
        shingle_hashes,
        signatures_from_shingles,
    )

    docs = load_table(spark, SMOKE_SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            Row(doc_id=100001, text="alpha beta gamma"),  # exactly 1 shingle
            Row(doc_id=100002, text=" ".join(f"tok{i % 7}" for i in range(500))),
        ]
    )
    shl = shingle_hashes(docs.unionByName(extra))
    expr = {
        r.doc_id: list(r.sig)
        for r in shl.where(F.size("shl") > 0)
        .select("doc_id", _signature_col())
        .collect()
    }
    arrow = {
        r.doc_id: list(r.sig) for r in signatures_from_shingles(shl).collect()
    }
    assert set(expr) == set(arrow)
    assert len(expr) > 100
    for k in expr:
        assert expr[k] == arrow[k], f"signature mismatch for doc {k}"


def test_minhash_arrow_banding_parity(spark):
    """The kernel's fused banding (``banded_from_shingles``) must emit
    exactly the (id, band, bh) rows the expression banding in
    ``lsh_candidate_pairs`` produces — bucket membership and therefore
    the candidate set depend on these exact values."""
    from lakehouse_test_spark.operators.dedup import (
        LSH_BANDS,
        ROWS_PER_BAND,
        banded_from_shingles,
        shingle_hashes,
        signatures_from_shingles,
    )

    docs = load_table(spark, SMOKE_SF_DIR, "documents").select("doc_id", "text")
    shl = shingle_hashes(docs)
    sig = signatures_from_shingles(shl)
    bands_expr = F.transform(
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
    expr_rows = {
        (r.doc_id, r.band, r.bh)
        for r in sig.select("doc_id", F.explode(bands_expr).alias("x"))
        .select("doc_id", F.col("x.band").alias("band"), F.col("x.bh").alias("bh"))
        .collect()
    }
    kernel_rows = {
        (r.doc_id, r.band, r.bh) for r in banded_from_shingles(shl).collect()
    }
    assert len(expr_rows) > 1000
    assert expr_rows == kernel_rows


def test_lsh_hot_bucket_stays_linear(spark):
    """1k identical docs (the boilerplate-corpus worst case) must
    produce O(n) star candidates, not the ~500k all-pairs clique, and
    must still connect every doc into one cluster."""
    from lakehouse_test_spark.operators.cluster import dedup_clusters_from_pairs
    from lakehouse_test_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    n = 1000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate legal disclaimer text repeated verbatim in every document").alias("text"),
    )
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig)
    cnt = pairs.count()
    assert cnt == n - 1, f"expected {n-1} star edges, got {cnt}"
    clusters = dedup_clusters_from_pairs(pairs, "id_a", "id_b")
    assert clusters.where(F.col("keeper_doc_id") == 0).count() == n


def test_simhash_pairs_are_near(spark):
    """Every emitted pair must satisfy hamming ≤ 3 and be symmetric-free."""
    rows = dedup_simhash(spark, SMOKE_SF_DIR).collect()
    for r in rows:
        assert r.hamming <= 3
        assert r.doc_a < r.doc_b


def test_asof_join_hand_case(spark):
    """As-of semantics on a constructed case: inclusive bound, latest
    tie wins, null when no prior right row."""
    left = spark.createDataFrame(
        [Row(k=1, t=10, lid="a"), Row(k=1, t=5, lid="b"), Row(k=1, t=1, lid="c"), Row(k=2, t=9, lid="d")]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, t=5, rid=1, v=100.0),
            Row(k=1, t=5, rid=2, v=200.0),  # same time: higher rid wins
            Row(k=1, t=8, rid=3, v=300.0),
            Row(k=3, t=0, rid=4, v=999.0),
        ]
    )
    out = {
        r.lid: r.v
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            value_cols=["v"], right_tiebreak="rid",
        ).collect()
    }
    assert out == {"a": 300.0, "b": 200.0, "c": None, "d": None}


def test_range_join_binned_matches_naive(spark):
    """Binned range join ≡ naive theta join on a small case."""
    points = spark.range(0, 200).select(F.col("id").alias("pid"), (F.col("id") * 1.7).alias("x"))
    intervals = spark.range(0, 20).select(
        F.col("id").alias("iid"),
        (F.col("id") * 15.0).alias("lo"),
        (F.col("id") * 15.0 + 20.0).alias("hi"),
    )
    binned = {
        (r.pid, r.iid)
        for r in range_join_binned(points, intervals, "x", "lo", "hi", bin_width=10.0).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            intervals, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    }
    assert binned == naive and len(naive) > 0


def test_ann_topk_recall_on_clustered_data(spark):
    """LSH ANN must recover true near neighbors when they exist.

    The driver's embeddings fixture is uniform-random (max pairwise
    cosine ≈ 0.48) — adversarial for any ANN index, recall there is
    information-theoretically ~candidate-fraction. So the recall
    property is asserted on planted clusters: 20 noisy copies of the
    query (cos ≈ 0.95+) hidden among 2000 random vectors.
    """
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal(64)
    near = base + 0.15 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((2000, 64))
    all_vecs = np.vstack([near, noise])
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(all_vecs)
    ]
    corpus = spark.createDataFrame(rows)
    qvec = [float(x) for x in base]
    exact = [r.vec_id for r in ann_topk(spark, corpus, qvec, k=10, exact=True).collect()]
    approx = [r.vec_id for r in ann_topk(spark, corpus, qvec, k=10, exact=False).collect()]
    assert set(exact) <= set(range(20)), "exact top-10 should be planted neighbors"
    assert len(set(exact) & set(approx)) >= 8, f"LSH recall too low: {approx} vs {exact}"

    # selectivity: the adaptive probe set (same path ann_topk uses)
    # must touch ≤2% of the corpus while keeping the recall above
    from lakehouse_test_spark.operators.similarity import (
        _planes,
        adaptive_probes,
        lsh_bucket,
    )

    planes = _planes()
    bucketed = corpus.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    probes = adaptive_probes(bucketed, np.array(qvec), planes, target_candidates=30)
    n_cand = bucketed.where(F.col("bucket").isin(probes)).count()
    frac = n_cand / len(rows)
    assert frac <= 0.02, f"candidate fraction {frac:.1%} exceeds 2%"


def test_ann_lsh_fixture_runs(spark):
    """On the adversarial uniform fixture the LSH query must still
    run, prune candidates, and return rank-consistent results."""
    out = similarity_lsh_topk(spark, SMOKE_SF_DIR).collect()
    sims = [r.cos_sim for r in out]
    assert sims == sorted(sims, reverse=True)
    # adaptive probing must fill top-k even on a tiny corpus
    assert len(out) == 10, f"expected a full top-10, got {len(out)}"


def test_multimodal_plumbing(spark):
    """Binary payload round-trip + feature extraction batch shape."""
    assets = assets_from_documents(spark, SMOKE_SF_DIR)
    row = assets.head()
    assert isinstance(row.payload, bytearray | bytes)
    feats = extract_features(assets.limit(20))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram


def test_decode_media_dispatch():
    assert decode_media(b"abc", "image/fake") == b"abc"
    # PNG is decoded for real now: malformed bytes -> ValueError
    with pytest.raises(ValueError):
        decode_media(b"abc", "image/png")
    # JPEG decodes for real now: malformed bytes -> ValueError
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0", "image/jpeg")
    # video sample decode stays behind the documented codec boundary
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x14ftypisom", "video/mp4")


def test_ivf_topk_recall_on_clustered_data(spark):
    """The IVF-Flat path (k-means coarse quantizer + nprobe lists)
    must recover planted near neighbors with high recall while
    scanning a bounded fraction of the corpus."""
    import numpy as np

    from lakehouse_test_spark.operators.similarity import (
        IVF_NPROBE,
        _nearest_centroid,
        cosine_to_literal,
        ivf_train,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal(64)
    near = base + 0.15 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((2000, 64))
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v])
        for i, v in enumerate(np.vstack([near, noise]))
    ]
    corpus = spark.createDataFrame(rows)
    centroids = ivf_train(corpus, nlist=32, iters=2)
    qvec = base
    order = np.argsort([float(np.sum((qvec - np.array(c)) ** 2)) for c in centroids])
    probes = [int(i) for i in order[:IVF_NPROBE]]
    indexed = corpus.withColumn(
        "list_id", _nearest_centroid(F.col("embedding"), centroids)
    ).persist()
    cand = indexed.where(F.col("list_id").isin(probes))
    frac = cand.count() / len(rows)
    approx = [
        r.vec_id
        for r in cand.select(
            "vec_id",
            F.round(
                cosine_to_literal(F.col("embedding"), [float(x) for x in qvec]), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    indexed.unpersist()
    assert len(set(approx) & set(range(20))) >= 8, f"IVF recall too low: {approx}"
    assert frac <= 0.3, f"IVF scanned {frac:.1%} of the corpus (nprobe/nlist = 4/32)"


def test_header_decode_on_genuine_files(spark):
    """The codegen parsers must read REAL container bytes, not just our
    synthesized ones: build a genuine PNG (zlib CRCs, deflated IDAT)
    and a genuine WAV (stdlib wave module), then parse via the same
    expressions multimodal_header_decode uses."""
    import io
    import struct
    import wave
    import zlib

    from lakehouse_test_spark.operators.multimodal import (
        png_dims,
        sniff_mime,
        wav_fmt,
    )

    def real_png(w, h):
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x7f" * (3 * w) for _ in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def real_wav(rate, channels):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(b"\x00\x01" * channels * 32)
        return buf.getvalue()

    rows = [
        Row(asset_id=1, payload=real_png(320, 200)),
        Row(asset_id=2, payload=real_wav(44100, 2)),
        Row(asset_id=3, payload=real_wav(16000, 1)),
        Row(asset_id=4, payload=b"\xff\xd8\xff\xe0notajfif"),
        Row(asset_id=5, payload=b"plain text bytes"),
    ]
    df = spark.createDataFrame(rows)
    w, h = png_dims(F.col("payload"))
    sr, ch = wav_fmt(F.col("payload"))
    got = {
        r["asset_id"]: r
        for r in df.select(
            "asset_id",
            sniff_mime(F.col("payload")).alias("mime"),
            w.alias("w"),
            h.alias("h"),
            sr.alias("sr"),
            ch.alias("ch"),
        ).collect()
    }
    assert got[1]["mime"] == "image/png" and (got[1]["w"], got[1]["h"]) == (320, 200)
    assert got[2]["mime"] == "audio/wav" and (got[2]["sr"], got[2]["ch"]) == (44100, 2)
    assert got[3]["mime"] == "audio/wav" and (got[3]["sr"], got[3]["ch"]) == (16000, 1)
    assert got[4]["mime"] == "image/jpeg"
    assert got[5]["mime"] == "application/octet-stream"


def test_phash_deterministic_and_identity(spark):
    """Same payload -> same pHash across runs; identical payloads ->
    Hamming 0."""
    from pyspark.sql import functions as F

    from lakehouse_test_spark.operators.multimodal import phash_fingerprints

    # payloads must differ in CONTENT, not one character — pHash is
    # (by design) invariant to tiny edits
    import hashlib

    rows = [
        (i, b"".join(hashlib.sha256(bytes([i, j])).digest() for j in range(32)))
        for i in range(8)
    ]
    rows.append((100, rows[3][1]))  # exact copy of asset 3
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    fp1 = {r.asset_id: r.phash for r in phash_fingerprints(df).collect()}
    fp2 = {r.asset_id: r.phash for r in phash_fingerprints(df).collect()}
    assert fp1 == fp2, "pHash must be deterministic"
    assert fp1[100] == fp1[3], "identical payloads must hash identically"
    assert len(set(fp1.values())) >= 8, "distinct payloads should mostly differ"


def test_phash_banding_finds_all_close_pairs(spark):
    """Pigeonhole recall: every pair at exact Hamming <= 7 MUST appear
    in the banded candidate output (8 bands of 8 bits)."""
    import itertools

    from pyspark.sql import functions as F

    from lakehouse_test_spark.operators.multimodal import phash_fingerprints

    base = bytes("the quick brown fox jumps over the lazy dog " * 30, "utf8")
    rows = [(0, base)]
    # single-byte in-place edits: small Hamming perturbations
    for i in range(1, 12):
        b = bytearray(base)
        b[50 * i] ^= 0x41
        rows.append((i, bytes(b)))
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    fp = {r.asset_id: r.phash for r in phash_fingerprints(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(fp), 2)
        if ham(fp[a], fp[b]) <= 7
    }
    assert expected, "fixture should contain at least one close pair"

    fpdf = phash_fingerprints(df)
    left = fpdf.select(
        F.col("asset_id").alias("id_a"), F.col("phash").alias("ph_a"),
        *[F.col(f"pband{k}").alias(f"a{k}") for k in range(8)],
    )
    right = fpdf.select(
        F.col("asset_id").alias("id_b"), F.col("phash").alias("ph_b"),
        *[F.col(f"pband{k}").alias(f"b{k}") for k in range(8)],
    )
    cands = None
    for k in range(8):
        c = left.join(right, (F.col(f"a{k}") == F.col(f"b{k}")) & (F.col("id_a") < F.col("id_b"))).select(
            "id_a", "id_b", "ph_a", "ph_b"
        )
        cands = c if cands is None else cands.unionByName(c)
    found = {
        (r.id_a, r.id_b)
        for r in cands.distinct()
        .withColumn("h", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("h") <= 7)
        .collect()
    }
    assert expected <= found, f"banding missed close pairs: {expected - found}"


def test_phash_pairs_query_finds_planted(spark):
    """The registered query detects its planted near-dup pairs and
    emits no (a, b) with a >= b."""
    from lakehouse_test_spark.queries import REGISTRY

    rows = REGISTRY["multimodal_phash_pairs"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least one near-dup pair"
    assert all(r.id_a < r.id_b for r in rows)
    planted = [r for r in rows if r.id_b - r.id_a == 1 and r.id_b % 9 == 0]
    assert len(planted) >= 10


def _encode_png(arr, filters=None):
    """Minimal real PNG encoder for tests: uint8 (h,w) or (h,w,ch)
    array -> PNG bytes, applying the REQUESTED filter type per row
    (exercising the decoder's unfilter paths, not just filter 0)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - left) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (line - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrip_all_filters():
    """Encode with every filter type (incl. mixed rows) and channel
    count; png_decode_pixels must reproduce the pixels exactly."""
    import numpy as np

    from lakehouse_test_spark.operators.multimodal import png_decode_pixels

    rng = np.random.RandomState(3)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = _encode_png(img, filters=filters)
            got = png_decode_pixels(png)
            assert got.shape == (13, 9, ch)
            assert np.array_equal(got, img), f"ch={ch} filters={filters}"


def test_png_decode_rejects_unsupported():
    import numpy as np

    from lakehouse_test_spark.operators.multimodal import png_decode_pixels

    img = np.zeros((4, 4, 3), np.uint8)
    png = bytearray(_encode_png(img))
    png[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError):
        png_decode_pixels(bytes(png))
    with pytest.raises(ValueError):
        png_decode_pixels(b"\x89PNG\r\n\x1a\nnot-chunks")


def test_phash_of_encoded_png_equals_phash_of_raw_pixels(spark):
    """The verdict-r2 criterion: phash(PNG bytes) == phash computed
    from the raw pixel grid — i.e. the kernel genuinely decodes the
    container rather than hashing its bytes."""
    import numpy as np

    from lakehouse_test_spark.operators.multimodal import (
        phash_fingerprints,
        png_to_gray,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8)
    png = _encode_png(img, filters=[0, 1, 2, 3, 4])
    df = spark.createDataFrame([Row(asset_id=1, payload=bytearray(png))])
    got = phash_fingerprints(df).head().phash

    # expected: identical DCT pipeline driven directly from the pixels
    n = 32
    gray = png_to_gray(png)
    ri = (np.arange(n) * gray.shape[0] // n).clip(0, gray.shape[0] - 1)
    ci = (np.arange(n) * gray.shape[1] // n).clip(0, gray.shape[1] - 1)
    grid = gray[np.ix_(ri, ci)]
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C[0, :] = np.sqrt(1.0 / n)
    dct = C @ grid @ C.T
    block = dct[:8, :8].reshape(64)
    ac = block[1:]
    med = np.median(ac)
    bits = np.zeros(64, dtype=np.uint8)
    bits[1:] = (ac > med).astype(np.uint8)
    expect = int(np.packbits(bits).view(">i8")[0])
    assert got == expect

    # and luminance actually matters: grayscale-equal images with
    # different byte streams (different filters) hash identically
    png2 = _encode_png(img, filters=[4])
    df2 = spark.createDataFrame([Row(asset_id=2, payload=bytearray(png2))])
    assert phash_fingerprints(df2).head().phash == got


def test_phash_png_near_dup_small_hamming(spark):
    """A small pixel patch edit on a real PNG must stay within the
    near-dup Hamming budget the banded join targets."""
    import numpy as np

    from lakehouse_test_spark.operators.multimodal import phash_fingerprints

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(40, 40), dtype=np.uint8)
    edited = img.copy()
    edited[:3, :3] = 255  # small patch edit
    unrelated = rng.randint(0, 256, size=(40, 40), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            Row(asset_id=1, payload=bytearray(_encode_png(img))),
            Row(asset_id=2, payload=bytearray(_encode_png(edited))),
            Row(asset_id=3, payload=bytearray(_encode_png(unrelated))),
        ]
    )
    fp = {r.asset_id: r.phash for r in phash_fingerprints(df).collect()}
    near = bin((fp[1] ^ fp[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    far = bin((fp[1] ^ fp[3]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert near <= 7, f"patch edit moved {near} bits"
    assert far >= 20, f"unrelated image only {far} bits away"


def test_pq_train_deterministic_and_optimal(spark):
    """PQ codebooks: reproducible across runs; the assigned code is
    the true nearest centroid (numpy cross-check); training reduces
    reconstruction error vs the untrained seed codebooks."""
    import numpy as np

    from lakehouse_test_spark.operators.similarity import pq_quantize, pq_train

    rng = np.random.RandomState(13)
    vecs = rng.standard_normal((400, 64)).astype(np.float64)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    cb1 = pq_train(df, iters=2)
    cb2 = pq_train(df, iters=2)
    assert cb1 == cb2
    assert len(cb1) == 8 and all(len(cb) == 16 for cb in cb1)

    q = pq_quantize(df, cb1).collect()
    # optimality spot-check on 20 vectors
    cbs = [np.array(cb) for cb in cb1]
    by_id = {r.vec_id: r for r in q}
    for i in range(20):
        v = vecs[i]
        for s in range(8):
            sv = v[s * 8 : (s + 1) * 8]
            want = int(np.argmin(((cbs[s] - sv) ** 2).sum(axis=1)))
            got = by_id[i].codes[s]
            d_want = ((cbs[s][want] - sv) ** 2).sum()
            d_got = ((cbs[s][got] - sv) ** 2).sum()
            assert abs(d_want - d_got) < 1e-9  # equal-distance ties allowed

    err_trained = sum(r.recon_err for r in q) / len(q)
    err_seed = (
        sum(r.recon_err for r in pq_quantize(df, pq_train(df, iters=0)).collect())
        / len(q)
    )
    assert err_trained < err_seed


def test_pq_codebook_gate_query(spark):
    from lakehouse_test_spark.operators.similarity import embedding_pq_codebook

    rows = embedding_pq_codebook(spark, SMOKE_SF_DIR).collect()
    assert len(rows) > 0
    assert sum(r.n_vectors for r in rows if r.s == 0) == 499  # all vecs coded


def test_ivfpq_recall_on_clustered_data(spark, tmp_path):
    """IVF-PQ end-to-end recall on planted clusters: coarse routing +
    residual-PQ ADC + exact rerank must recover ≥8/10 true neighbors."""
    import numpy as np

    from lakehouse_test_spark.operators.similarity import (
        IVF_NPROBE,
        _nearest_centroid,
        ivf_train,
        pq_quantize,
        pq_train,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal(64)
    near = base + 0.15 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((2000, 64))
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v])
        for i, v in enumerate(np.vstack([near, noise]))
    ]
    corpus = spark.createDataFrame(rows)

    centroids = ivf_train(corpus)
    cent = np.array(centroids)
    qvec = base
    indexed = corpus.withColumn(
        "list_id", _nearest_centroid(F.col("embedding"), centroids)
    )
    order = np.argsort(((qvec - cent) ** 2).sum(axis=1))
    probe = [int(i) for i in order[:IVF_NPROBE]]
    got_lists = {
        r.vec_id: r.list_id
        for r in indexed.where(F.col("vec_id") < 20).collect()
    }
    routed = sum(1 for v in got_lists.values() if v in probe)
    assert routed >= 16, f"coarse routing lost planted neighbors: {routed}/20"

    # residual PQ preserves neighbor ordering well enough for rerank
    res = indexed.withColumn(
        "embedding2",
        F.zip_with(
            F.col("embedding"),
            F.element_at(F.lit(centroids), F.col("list_id") + 1),
            lambda x, c: x.cast("double") - c,
        ),
    ).select("vec_id", F.col("embedding2").alias("embedding"))
    cbs = pq_train(res, iters=2)
    q = pq_quantize(res, cbs)
    errs = [r.recon_err for r in q.collect()]
    assert sum(errs) / len(errs) < 8.0  # residual norm ~sqrt(64)=8: PQ must beat zero-code


def test_ivfpq_gate_query(spark):
    from lakehouse_test_spark.operators.similarity import similarity_ivfpq_topk

    rows = similarity_ivfpq_topk(spark, SMOKE_SF_DIR).collect()
    sims = [r.cos_sim for r in rows]
    assert len(rows) == 10 and sims == sorted(sims, reverse=True)


def test_sparkml_minhash_matches_exact_jaccard(spark):
    """The pyspark.ml MinHashLSH path must recover the exact set of
    token-set near-dup pairs (approxSimilarityJoin verifies exact
    distance on candidates, so precision is 1.0 by construction —
    this pins RECALL at 1.0 on the gate corpus too)."""
    import duckdb

    from lakehouse_test_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_sparkml_minhash"].fn(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    sets = {i: set(t.split()) for i, t in rows}
    ids = sorted(sets)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if len(a & b) / len(a | b) >= 0.8:
                want.add((ids[x], ids[y]))
    assert got == want
