"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, plus decode / feature-extract plumbing
as Arrow-batched pandas UDFs over mapInPandas.

Decode has two layers here:

- **Container/header decode is REAL** (``sniff_mime``, ``png_dims``,
  ``wav_fmt``): spec-correct byte-offset parsing of PNG IHDR
  (big-endian), WAV RIFF/fmt (little-endian) and JPEG magic, entirely
  in JVM codegen (binary substring → hex → conv) — no Python, no
  codec library. Verified end-to-end by the oracle-checked
  ``multimodal_header_decode`` query and against genuine files built
  with zlib/wave in tests.
- **PNG pixel decode is REAL** (``png_decode_pixels``): stdlib zlib
  inflate of the IDAT stream + numpy scanline unfiltering
  (None/Sub/Up/Average/Paeth per RFC 2083) — no codec library.
- **JPEG pixel decode is REAL** (``jpeg_codec.jpeg_decode_pixels``):
  baseline T.81 — canonical Huffman, restart markers, dequantize,
  exact matrix IDCT, 4:2:0/4:2:2 chroma upsample, BT.601 — pure
  numpy + stdlib, verified by encode/decode roundtrip against the
  sibling test encoder (progressive JPEGs raise ValueError).
  pHash consumes both for ``image/png``/``image/jpeg`` payloads.
- **Motion-JPEG VIDEO decode is REAL too** (round 11,
  ``avi_mjpeg_frames`` + ``video_frame_sample``): RIFF/AVI container
  walk + per-frame baseline-JPEG decode — no ffmpeg, hash-gated by
  ``multimodal_video_frames`` (quantization-exact uniform frames make
  the decoded luminance SQL-predictable). Only INTER-FRAME codecs
  (H.264 etc.) still need ffmpeg: the parser raises a clearly-marked
  NotImplementedError naming the codec it found (container metadata
  parses for real either way: ``multimodal_mp4_boxes``).

Fixture note: the driver ships no binary fixture, so the ``payload``
column is synthesized deterministically as UTF-8 bytes of
``documents.text`` — the plumbing is byte-identical to real media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lakehouse_test_spark.registry import query
from lakehouse_test_spark.session import load_table

def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal asset table: payload = UTF-8 bytes of
    the text, metadata derived deterministically from the content."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(sha256(text)) AS payload_sha256,
           lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
           CAST(length(text) % 640 + 1 AS INTEGER) AS width,
           CAST(length(text) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
    tags=("multimodal", "llm"),
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column battery: byte length, content hash, magic-bytes
    prefix, typed metadata projection — all JVM built-ins on a binary
    column (the scan/filter layer of a media pipeline).
    """
    a = assets_from_documents(spark, sf_dir)
    return a.select(
        "asset_id",
        F.octet_length("payload").cast("bigint").alias("byte_len"),
        F.lower(F.sha2("payload", 256)).alias("payload_sha256"),
        F.lower(F.substring(F.hex("payload"), 1, 8)).alias("magic_hex"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


FEATURE_DIM = 8
_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_decode_pixels(data: bytes):
    """REAL pixel-level PNG decode with nothing but stdlib ``zlib``
    and numpy: chunk walk → IDAT concat → inflate → per-scanline
    unfilter (None/Sub/Up/Average/Paeth exactly per the PNG spec,
    RFC 2083 §6) → (height, width, channels) uint8 array.

    Supports the mainstream subset: bit depth 8, color types 0
    (grayscale), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    Palette/16-bit/Adam7 raise ValueError (route those to a codec
    backend on a real cluster).

    Unfiltering: Sub is a cumulative sum over pixel groups (vector
    op); Up is one vector add; Average/Paeth carry a left-pixel
    dependency, so they walk the scanline pixel-by-pixel with the
    channel arithmetic vectorized — cost is width iterations per
    filtered row, only for rows that chose those filters.
    """
    import struct as _struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat = bytearray()
    hdr = None
    while pos + 8 <= len(data):
        (ln,) = _struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            hdr = _struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f = row[0]
        line = np.frombuffer(row, dtype=np.uint8, offset=1).astype(np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: recon = raw + recon[x - bpp]
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            l2 = line.reshape(w, ch)
            p2 = prev.reshape(w, ch)
            r2 = rec.reshape(w, ch)
            for x in range(w):
                left = (l2[x] + ((left + p2[x]) >> 1)) & 0xFF
                r2[x] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            a = np.zeros(ch, dtype=np.int32)
            c = np.zeros(ch, dtype=np.int32)
            l2 = line.reshape(w, ch)
            p2 = prev.reshape(w, ch)
            r2 = rec.reshape(w, ch)
            for x in range(w):
                b = p2[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                a = (l2[x] + pred) & 0xFF
                r2[x] = a
                c = b
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    return out.reshape(h, w, ch)


def png_to_gray(data: bytes):
    """Decode a PNG and reduce to a (h, w) float64 luminance plane
    (ITU-R BT.601 weights for color; alpha ignored)."""
    import numpy as np

    px = png_decode_pixels(data).astype(np.float64)
    ch = px.shape[2]
    if ch == 1:
        return px[:, :, 0]
    if ch == 2:
        return px[:, :, 0]
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode a media payload to raw frames/samples.

    ``image/png`` (stdlib zlib inflate + numpy unfiltering) and
    ``image/jpeg`` (baseline T.81: Huffman + dequant + matrix IDCT +
    chroma upsample, operators/jpeg_codec.py) are decoded FOR REAL —
    no codec library anywhere — returning raw interleaved pixel
    bytes. ``video/x-msvideo`` (round 11) decodes FOR REAL too when
    the stream is Motion-JPEG: RIFF/AVI container walk + per-frame
    baseline-JPEG decode (:func:`video_frame_sample`), returning the
    frames' pixel bytes concatenated. ``fake/*`` mimes round-trip the
    bytes so the pipeline is testable. Inter-frame video codecs
    (H.264 etc.) still need ffmpeg — the AVI parser raises a
    NotImplementedError NAMING the codec it found; container metadata
    is parsed for real either way (``multimodal_mp4_boxes``).
    """
    if mime.startswith("image/fake") or mime.startswith("fake/"):
        return payload
    if mime == "image/png":
        return png_decode_pixels(payload).tobytes()
    if mime == "image/jpeg":
        from lakehouse_test_spark.operators.jpeg_codec import jpeg_decode_pixels

        return jpeg_decode_pixels(payload).tobytes()
    if mime in ("video/x-msvideo", "video/avi"):
        return b"".join(f.tobytes() for f in video_frame_sample(payload))
    raise NotImplementedError(
        f"decode for mime={mime!r} requires a codec backend (ffmpeg); "
        "not available in this environment"
    )


def _extract_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: deterministic 8-dim byte-statistics feature
    per asset (stands in for a CNN/audio embedding; Arrow-batched)."""
    import numpy as np

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            raw = np.frombuffer(decode_media(bytes(payload), "image/fake"), dtype=np.uint8)
            if raw.size == 0:
                feats.append([0.0] * FEATURE_DIM)
                continue
            hist = np.bincount(raw % FEATURE_DIM, minlength=FEATURE_DIM).astype("float64")
            feats.append(list(np.round(hist / raw.size, 6)))
        yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})


def extract_features(assets: DataFrame) -> DataFrame:
    """Distributed feature extraction over binary payloads.

    Scale: mapInPandas keeps data in Arrow record batches — one
    Python worker per core, no per-row serialization; partitioning is
    inherited from the scan, so this pipelines after the source with
    no shuffle.
    """
    return assets.select("asset_id", "payload").mapInPandas(
        _extract_features_batches, schema=_FEATURE_SCHEMA
    )


@query("multimodal_feature_extract", oracle=None, tags=("multimodal", "llm", "pandas_udf"))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction end-to-end: binary payload → mapInPandas →
    fixed-dim feature vector → per-dimension corpus stats.

    Rows-only check (the kernel is Python-side by design); the
    deterministic fake decode makes results stable across runs.
    """
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return (
        feats.select(F.posexplode("features").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 5).alias("mean_activation"),
        )
        .orderBy("dim")
    )


@query("multimodal_frame_sample", oracle=None, tags=("multimodal", "llm", "pandas_udf"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: treat each payload as a fake "video"
    of 16-byte frames, keep every 4th frame, return per-asset counts.
    Same mapInPandas shape a real ffmpeg-backed sampler would use.
    """
    frame_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("n_sampled", LongType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames = [max(len(bytes(p)) // 16, 0) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_frames": n_frames,
                    "n_sampled": [(n + 3) // 4 for n in n_frames],
                }
            )

    a = assets_from_documents(spark, sf_dir)
    return a.select("asset_id", "payload").mapInPandas(sample, schema=frame_schema)


@query(
    "multimodal_audio_chunks",
    oracle="""
    WITH assets AS (
      SELECT doc_id AS asset_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    chunks AS (
      SELECT asset_id,
             unnest(range(0, CAST(ceil(n_bytes / 256.0) AS BIGINT))) AS chunk_id,
             h, n_bytes
      FROM assets
    )
    SELECT asset_id, chunk_id,
           CAST(least(256, n_bytes - chunk_id * 256) AS INTEGER) AS chunk_bytes,
           md5(substr(h, CAST(chunk_id * 512 + 1 AS BIGINT), 512)) AS chunk_hex_md5
    FROM chunks
    """,
    tags=("multimodal", "llm", "audio"),
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunk segmentation of a binary payload — the audio
    preprocessing shape (fixed-duration PCM frames for feature
    extraction) applied to the synthesized byte payloads. Every chunk
    is content-verified: md5 over the hex encoding, because the DuckDB
    oracle cannot slice BLOBs but both engines agree byte-for-byte on
    hex strings.

    Scale: pure codegen — sequence over chunk indices, substring
    slicing, explode; no UDF, no shuffle. The same plan shape carries
    a real decoder: swap the hash projection for a mapInPandas decode
    of each chunk (operators/multimodal.decode_media), partitioning
    and row explosion unchanged.
    """
    CHUNK = 256
    a = assets_from_documents(spark, sf_dir)
    n = F.length("payload")
    n_chunks = F.ceil(n.cast("double") / CHUNK).cast("bigint")
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    ex = a.select(
        "asset_id",
        F.hex(F.col("payload")).alias("h"),
        n.alias("n_bytes"),
        F.explode(idx).alias("chunk_id"),
    )
    return ex.select(
        "asset_id",
        "chunk_id",
        F.least(F.lit(CHUNK), F.col("n_bytes") - F.col("chunk_id") * CHUNK)
        .cast("int")
        .alias("chunk_bytes"),
        F.md5(
            F.substring(
                F.col("h"), (F.col("chunk_id") * CHUNK * 2 + 1).cast("int"), CHUNK * 2
            )
        ).alias("chunk_hex_md5"),
    )


# ---------------------------------------------------------------------------
# Real container-header decode: PNG / WAV / JPEG, pure JVM codegen
# ---------------------------------------------------------------------------
#
# The parsers below read genuine on-disk container formats at their
# spec-defined byte offsets. All arithmetic is binary substring →
# hex → conv(16,10) — whole-stage-codegen expressions, zero Python.
# Parity anchor: the reference treats payloads as opaque bytes end to
# end (src/main/java/io/streamnative/lakehouse/PerformanceConsumer.java);
# header decode is part of the mandated multimodal extension surface.

from pyspark.sql import Column  # noqa: E402


def _u(hex_col: Column) -> Column:
    """Unsigned integer from a hex string (both engines agree base-16)."""
    return F.conv(hex_col, 16, 10).cast("bigint")


def _swap_bytes(hex_col: Column, nbytes: int) -> Column:
    """Reverse the byte order of a fixed-width hex string (LE <-> BE)."""
    return F.concat(*[F.substring(hex_col, 2 * i + 1, 2) for i in reversed(range(nbytes))])


def be_u32(payload: Column, off: int) -> Column:
    """Big-endian uint32 at 0-based byte offset ``off`` (PNG/network order)."""
    return _u(F.hex(F.substring(payload, off + 1, 4)))


def le_u32(payload: Column, off: int) -> Column:
    """Little-endian uint32 at ``off`` (RIFF/WAV order)."""
    return _u(_swap_bytes(F.hex(F.substring(payload, off + 1, 4)), 4))


def le_u16(payload: Column, off: int) -> Column:
    """Little-endian uint16 at ``off``."""
    return _u(_swap_bytes(F.hex(F.substring(payload, off + 1, 2)), 2))


def sniff_mime(payload: Column) -> Column:
    """Magic-byte MIME sniffing: PNG signature, JPEG SOI, RIFF/WAVE."""
    h = F.hex(F.substring(payload, 1, 12))
    return (
        F.when(h.startswith("89504E470D0A1A0A"), F.lit("image/png"))
        .when(h.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(
            h.startswith("52494646") & (F.substring(h, 17, 8) == F.lit("57415645")),
            F.lit("audio/wav"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )


def png_dims(payload: Column) -> tuple[Column, Column]:
    """(width, height) from the PNG IHDR chunk.

    Layout: 8-byte signature, 4-byte chunk length, 4-byte "IHDR",
    then width/height as big-endian uint32 at offsets 16 and 20.
    """
    return be_u32(payload, 16), be_u32(payload, 20)


def wav_fmt(payload: Column) -> tuple[Column, Column]:
    """(sample_rate, channels) from a canonical WAV fmt chunk.

    Layout: "RIFF" + size + "WAVE" + "fmt " + chunk size (16) +
    audio format, then channels (LE u16 @22) and sample rate (LE u32 @24).
    """
    return le_u32(payload, 24), le_u16(payload, 22)


def _be_hex(col: Column, nbytes: int) -> Column:
    return F.lpad(F.hex(col.cast("bigint")), 2 * nbytes, "0")


def _le_hex(col: Column, nbytes: int) -> Column:
    return _swap_bytes(_be_hex(col, nbytes), nbytes)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize spec-valid media containers from ``documents``:
    doc_id%3==0 → PNG (header + text bytes as fake IDAT), 1 → WAV
    (canonical 44-byte header + text bytes as PCM data), 2 → JPEG
    (SOI/APP0 magic + text bytes). Header fields derive
    deterministically from n_chars so the decode is oracle-checkable.
    Hex assembly + unhex keeps synthesis in codegen too.
    """
    d = load_table(spark, sf_dir, "documents")
    width = (F.col("n_chars") % 640 + 1).cast("bigint")
    height = (F.col("n_chars") % 480 + 1).cast("bigint")
    rate = (F.lit(8000) + (F.col("n_chars") % 8) * 4000).cast("bigint")
    ch = (F.col("n_chars") % 2 + 1).cast("bigint")
    body = F.hex(F.encode("text", "UTF-8"))
    n_body = F.octet_length(F.encode("text", "UTF-8")).cast("bigint")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _be_hex(width, 4),
        _be_hex(height, 4),
        F.lit("0802000000" + "00000000"),  # bit depth 8, truecolor, zeroed CRC
        body,
    )
    wav_hex = F.concat(
        F.lit("52494646"),
        _le_hex(n_body + 36, 4),
        F.lit("57415645" + "666D7420" + "10000000" + "0100"),
        _le_hex(ch, 2),
        _le_hex(rate, 4),
        _le_hex(rate * ch * 2, 4),  # byte rate
        _le_hex(ch * 2, 2),  # block align
        F.lit("1000"),  # 16 bits/sample
        F.lit("64617461"),
        _le_hex(n_body, 4),
        body,
    )
    jpeg_hex = F.concat(F.lit("FFD8FFE0"), body)
    kind = F.pmod(F.col("doc_id"), F.lit(3))
    payload_hex = (
        F.when(kind == 0, png_hex).when(kind == 1, wav_hex).otherwise(jpeg_hex)
    )
    return d.select(F.col("doc_id").alias("asset_id"), F.unhex(payload_hex).alias("payload"))


@query(
    "multimodal_header_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
             ELSE 'image/jpeg' END AS mime,
           CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 640 + 1 AS BIGINT) END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 480 + 1 AS BIGINT) END AS height,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (n_chars % 8) * 4000 AS BIGINT) END AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN CAST(n_chars % 2 + 1 AS BIGINT) END AS channels
    FROM documents
    """,
    tags=("multimodal", "llm"),
)
def multimodal_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header decode over a mixed media corpus: sniff each
    payload's MIME from magic bytes, then parse PNG width/height
    (big-endian IHDR) and WAV sample-rate/channels (little-endian fmt)
    at their spec offsets. The oracle recomputes the expected fields
    from the source columns — a hash match proves the byte-level
    round-trip (synthesis AND parse) is spec-consistent.

    Scale: narrow projection, zero shuffle, all codegen; at 100 TB
    this runs at scan speed and the parsed fields feed partition
    pruning / routing without touching a codec.
    """
    a = synthesize_media(spark, sf_dir)
    mime = sniff_mime(F.col("payload"))
    w, h = png_dims(F.col("payload"))
    sr, nch = wav_fmt(F.col("payload"))
    is_png = mime == "image/png"
    is_wav = mime == "audio/wav"
    return a.select(
        "asset_id",
        mime.alias("mime"),
        F.when(is_png, w).alias("width"),
        F.when(is_png, h).alias("height"),
        F.when(is_wav, sr).alias("sample_rate"),
        F.when(is_wav, nch).alias("channels"),
    )


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) image near-dup
# ---------------------------------------------------------------------------


def phash_fingerprints(assets: DataFrame) -> DataFrame:
    """64-bit perceptual hashes over binary payloads via a vectorized
    numpy DCT kernel in ``mapInPandas``.

    The REAL pHash pipeline (decode → grayscale 32×32 → 2-D DCT-II →
    top-left 8×8 AC coefficients → median-threshold bits). PNG
    payloads decode for real (``png_decode_pixels``) and baseline
    JPEGs decode for real too (``jpeg_codec.jpeg_decode_pixels`` —
    Huffman + IDCT in pure numpy); payloads that are neither (or are
    malformed) use the deterministic fallback (payload bytes tiled
    into the 32×32 grid — locality-preserving, so nearby payloads
    give nearby pixel grids; only inter-frame video codecs still
    need ffmpeg — MJPEG-AVI decodes for real, see
    ``video_frame_sample`` — the rest is unchanged).

    Scale: Arrow-batched, numpy-einsum over the whole batch (one
    (B,32,32) tensor contraction per batch — no per-row Python), zero
    shuffle; fingerprints are 8 bytes/row downstream. This is the
    multimodal twin of MinHash signatures: fixed-width map-side
    sketches that make near-dup detection a bounded equi-join.
    """
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("phash", LongType()),
            *[StructField(f"pband{k}", LongType()) for k in range(8)],
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = 32
        k = np.arange(n)
        # orthonormal DCT-II basis
        C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        C[0, :] = np.sqrt(1.0 / n)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            grids = np.zeros((len(pdf), n, n), dtype=np.float64)
            for i, payload in enumerate(pdf["payload"]):
                b_raw = bytes(payload)
                gray = None
                # REAL paths: decode pixels, luminance, nearest-
                # neighbor 32×32 downsample. Malformed containers
                # (e.g. a fake IDAT, or the synthesized
                # magic-plus-text JPEGs) fall back to byte tiling
                # instead of failing the whole pipeline.
                if b_raw[:8] == _PNG_MAGIC:
                    try:
                        gray = png_to_gray(b_raw)
                    except ValueError:
                        gray = None
                elif b_raw[:3] == b"\xff\xd8\xff":
                    try:
                        from lakehouse_test_spark.operators.jpeg_codec import (
                            jpeg_decode_pixels,
                        )

                        px = jpeg_decode_pixels(b_raw).astype(np.float64)
                        if px.ndim == 3:
                            gray = (
                                0.299 * px[..., 0]
                                + 0.587 * px[..., 1]
                                + 0.114 * px[..., 2]
                            )
                        else:
                            gray = px
                    except Exception:  # malformed/fake JPEG bytes
                        gray = None
                elif b_raw[:4] == b"RIFF" and b_raw[8:12] == b"AVI ":
                    # VIDEO near-dup keys on the first frame (round
                    # 11): MJPEG frames decode natively via the AVI
                    # walk; inter-frame codecs and torn containers
                    # fall back to byte tiling like any malformed
                    # payload — the pipeline never fails on codec
                    try:
                        frames = video_frame_sample(b_raw, every_n=1)
                        if frames:
                            px = frames[0].astype(np.float64)
                            gray = (
                                0.299 * px[..., 0]
                                + 0.587 * px[..., 1]
                                + 0.114 * px[..., 2]
                            ) if px.ndim == 3 else px
                    except (ValueError, NotImplementedError):
                        gray = None
                if gray is not None:
                    ri = (np.arange(n) * gray.shape[0] // n).clip(0, gray.shape[0] - 1)
                    ci = (np.arange(n) * gray.shape[1] // n).clip(0, gray.shape[1] - 1)
                    grids[i] = gray[np.ix_(ri, ci)]
                    continue
                b = np.frombuffer(b_raw, dtype=np.uint8)
                grids[i] = np.resize(b if b.size else np.zeros(1, np.uint8), (n, n))
            dct = np.einsum("ij,bjk,lk->bil", C, grids, C, optimize=True)
            block = dct[:, :8, :8].reshape(len(pdf), 64)
            ac = block[:, 1:]  # drop the DC term
            med = np.median(ac, axis=1, keepdims=True)
            bits = np.zeros((len(pdf), 64), dtype=np.uint8)
            bits[:, 1:] = (ac > med).astype(np.uint8)
            packed = np.packbits(bits, axis=1)  # (B, 8) big-endian bytes
            ph = packed.copy().view(">i8").ravel().astype(np.int64)
            u = packed.copy().view(">u8").ravel()
            out = {
                "asset_id": pdf["asset_id"].to_numpy(),
                "phash": ph,
            }
            for band in range(8):
                out[f"pband{band}"] = (
                    (u >> np.uint64(8 * band)) & np.uint64(0xFF)
                ).astype(np.int64)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(kernel, out_schema)


@query("multimodal_phash_pairs", oracle=None, tags=("multimodal", "llm", "dedup", "pandas_udf"))
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: fingerprint via
    the DCT kernel, candidate pairs from 8×8-bit Hamming bands
    (pigeonhole: distance ≤ 7 ⇒ at least one band identical), verify
    with the exact popcount of the XOR — the SimHash discipline
    applied to pixels instead of tokens.

    A deterministic near-dup set is planted (every 9th asset gets a
    copy of its neighbor's payload with a few bytes perturbed) so the
    operator has work to do at any sf. Rows-only gate (the DCT has no
    SQL twin); tests pin determinism, the Hamming property, and
    planted-pair recall.

    Scale: fingerprints are one mapInPandas pass (no shuffle); each
    band join shuffles 1-byte keys; verify is codegen bit_count.
    8-bit bands collide at ~n²/256 per band — tolerable for the
    verify stage here, but at larger corpora the recall/cost dial is
    bands × width: 4×16-bit bands (guarantee d≤3, collisions
    ~n²/65536) or a coarse quantizer prefix on the band key, the
    same tradeoff as similarity_lsh_topk.
    """
    a = assets_from_documents(spark, sf_dir)
    # plant near-dups: every 9th asset becomes its neighbor's payload
    # with 4 bytes overwritten in place (length-preserving, so the
    # tiled pixel grid stays aligned — the analog of a small patch
    # edit on a real image)
    base = a.select("asset_id", "payload")
    perturbed = base.where((F.col("asset_id") % 9 == 0) & (F.col("asset_id") > 0)).select(
        (F.col("asset_id")).alias("pid"), F.col("payload").alias("src")
    )
    neighbor = base.select((F.col("asset_id") + 1).alias("pid"), F.col("payload").alias("np"))
    planted = (
        base.join(perturbed.join(neighbor, "pid").select("pid", "np"),
                  base.asset_id == F.col("pid"), "left")
        .select(
            "asset_id",
            F.when(
                F.col("np").isNotNull(),
                F.overlay(F.col("np"), F.lit(b"@@@@"), 11),
            )
            .otherwise(F.col("payload"))
            .alias("payload"),
        )
    )
    fp = phash_fingerprints(planted)
    left = fp.select(
        F.col("asset_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        *[F.col(f"pband{k}").alias(f"a{k}") for k in range(8)],
    )
    right = fp.select(
        F.col("asset_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        *[F.col(f"pband{k}").alias(f"b{k}") for k in range(8)],
    )
    cands = None
    for k in range(8):
        c = left.join(
            right, (F.col(f"a{k}") == F.col(f"b{k}")) & (F.col("id_a") < F.col("id_b"))
        ).select("id_a", "id_b", "ph_a", "ph_b")
        cands = c if cands is None else cands.unionByName(c)
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cands.distinct()
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= 7)
        .select("id_a", "id_b", "hamming")
    )


@query(
    "multimodal_audio_features",
    oracle="""
    WITH wav AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> ord(substr(text, CAST(i AS INTEGER), 1))) AS bytes
      FROM documents WHERE doc_id % 3 = 1
    ),
    samples AS (
      SELECT doc_id,
             list_transform(range(1, len(bytes) // 2 + 1),
                            i -> CASE WHEN bytes[2*i-1] + 256 * bytes[2*i] >= 32768
                                      THEN bytes[2*i-1] + 256 * bytes[2*i] - 65536
                                      ELSE bytes[2*i-1] + 256 * bytes[2*i] END) AS s
      FROM wav
    )
    SELECT doc_id AS asset_id,
           CAST(len(s) AS BIGINT) AS n_samples,
           CAST(round(sqrt(list_aggregate(list_transform(s, x -> CAST(x AS DOUBLE) * x),
                                          'sum') / len(s)), 4) AS DOUBLE) AS rms,
           CAST(len(list_filter(range(1, len(s)),
                                i -> (s[i] >= 0) <> (s[i+1] >= 0))) AS BIGINT)
             AS zero_crossings
    FROM samples
    WHERE len(s) > 0
    """,
    tags=("multimodal", "llm", "audio", "pandas_udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio DSP under the oracle gate: parse each WAV asset's
    PCM data chunk (16-bit LE samples after the 44-byte header) and
    compute RMS energy and the zero-crossing count — the two
    cheapest speech/music discriminators — vectorized in numpy over
    Arrow batches.

    The oracle reconstructs the identical samples from the source
    text bytes (the synthesis is deterministic), so a hash match
    proves the byte-exact PCM parse AND the feature math. This is the
    audio twin of multimodal_header_decode: container handling in
    codegen, sample kernels in mapInPandas.

    Scale: one map-side pass, features are 3 numbers per asset; the
    same kernel shape carries any frame-level feature (MFCC, VAD) by
    widening the numpy step.
    """
    import numpy as np

    assets = synthesize_media(spark, sf_dir)
    wav = assets.where(F.pmod(F.col("asset_id"), F.lit(3)) == 1)

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)[44:]  # past the canonical WAV header
                n = len(data) // 2
                if n == 0:
                    continue
                s = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.float64)
                rms = float(np.sqrt(np.mean(s * s)))
                nonneg = s >= 0
                zc = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                rows.append((int(aid), n, round(rms, 4), zc))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["asset_id", "n_samples", "rms", "zero_crossings"]
                )

    return wav.mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# MP4/ISO-BMFF container: box walk with DATA-DRIVEN offsets
# ---------------------------------------------------------------------------


def be_u32_at(payload: Column, off: Column) -> Column:
    """Big-endian uint32 at a COLUMN offset (0-based) — the dynamic
    twin of ``be_u32`` for offset chains parsed from the data."""
    return _u(F.hex(payload.substr(off + 1, F.lit(4))))


def fourcc_at(payload: Column, off: Column) -> Column:
    """4-character box type code at a column offset."""
    return F.decode(payload.substr(off + 1, F.lit(4)), "UTF-8")


def synthesize_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-valid minimal MP4 (ISO-BMFF) per document: ``ftyp`` (20 B,
    isom) + ``moov`` holding a version-0 ``mvhd`` (108 B: identity
    matrix, rate 1.0, timescale/duration derived from n_chars) +
    ``mdat`` carrying the text bytes. Hex assembly + unhex keeps
    synthesis in codegen, like ``synthesize_media``."""
    d = load_table(spark, sf_dir, "documents")
    timescale = (F.lit(600) * (F.col("n_chars") % 4 + 1)).cast("bigint")
    duration = (F.col("n_chars") * 7).cast("bigint")
    body = F.hex(F.encode("text", "UTF-8"))
    n_body = F.octet_length(F.encode("text", "UTF-8")).cast("bigint")
    mvhd_hex = F.concat(
        F.lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
        _be_hex(timescale, 4),
        _be_hex(duration, 4),
        F.lit("00010000" + "0100" + "0000" + "00" * 8),
        F.lit("00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000"),
        F.lit("00000000" * 6 + "00000002"),
    )
    mp4_hex = F.concat(
        F.lit("00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"),
        F.lit("00000074" + "6D6F6F76"),
        mvhd_hex,
        _be_hex(n_body + 8, 4),
        F.lit("6D646174"),
        body,
    )
    return d.select(F.col("doc_id").alias("asset_id"), F.unhex(mp4_hex).alias("payload"))


@query(
    "multimodal_mp4_boxes",
    oracle="""
    SELECT doc_id AS asset_id,
           3 AS n_top_boxes,
           'ftyp,moov,mdat' AS box_types,
           CAST(600 * (n_chars % 4 + 1) AS BIGINT) AS timescale,
           CAST(n_chars * 7 AS BIGINT) AS duration_ticks,
           -- exact integer arithmetic: round() of small rationals
           -- lands on .5 boundaries where the engines' half-up vs
           -- half-even disagree; (ticks*1e4) // timescale cannot
           CAST((n_chars * 7 * 10000) // (600 * (n_chars % 4 + 1)) AS BIGINT)
             AS duration_sec_e4
    FROM documents
    """,
    tags=("multimodal", "llm", "video"),
)
def multimodal_mp4_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF box walk over MP4 payloads: read each top-level
    box's big-endian size, jump size bytes, read the next — offsets
    come from the DATA, not from constants — then parse
    timescale/duration out of the ``moov``→``mvhd`` child and count
    top-level boxes by walking until the payload ends. The oracle
    recomputes the expected fields from the source columns, so a hash
    match proves the synthesis AND the data-driven walk are
    spec-consistent (same posture as ``multimodal_header_decode``).

    Scale: pure codegen byte arithmetic (binary substr at column
    offsets → hex → conv), zero shuffle, zero Python — container
    metadata extraction at scan speed; sample decode stays behind the
    documented codec boundary.
    """
    a = synthesize_video(spark, sf_dir)
    p = F.col("payload")
    total = F.octet_length(p).cast("bigint")
    off0 = F.lit(0).cast("bigint")
    s1 = be_u32_at(p, off0)
    off1 = s1
    s2 = be_u32_at(p, off1)
    off2 = s1 + s2
    s3 = be_u32_at(p, off2)
    off3 = s1 + s2 + s3
    n_boxes = (
        F.when(off0 < total, 1).otherwise(0)
        + F.when(off1 < total, 1).otherwise(0)
        + F.when(off2 < total, 1).otherwise(0)
        + F.when(off3 < total, 1).otherwise(0)
    )
    types = F.concat_ws(
        ",",
        fourcc_at(p, off0 + 4),
        fourcc_at(p, off1 + 4),
        fourcc_at(p, off2 + 4),
    )
    timescale = be_u32_at(p, s1 + 28)
    duration = be_u32_at(p, s1 + 32)
    return a.select(
        "asset_id",
        n_boxes.cast("int").alias("n_top_boxes"),
        types.alias("box_types"),
        timescale.alias("timescale"),
        duration.alias("duration_ticks"),
        # exact integer division (subtract the modulus, then divide
        # evenly) — see the oracle comment on the .5-boundary
        # rounding divergence this avoids
        (
            (duration * 10000 - F.pmod(duration * 10000, timescale)) / timescale
        )
        .cast("bigint")
        .alias("duration_sec_e4"),
    )


# ---------------------------------------------------------------------------
# AVI/MJPEG container: REAL video frame decode, no ffmpeg (round 11)
# ---------------------------------------------------------------------------
# Motion-JPEG in a RIFF/AVI container is the one mainstream video
# format whose SAMPLE decode needs no codec backend beyond a baseline
# JPEG decoder — which operators/jpeg_codec.py already implements from
# the T.81 spec. Writer and parser below share only the bytestream
# (the same independence posture as the JPEG pair); inter-frame codecs
# (H.264/VP9/AV1...) stay behind the documented NotImplementedError —
# a from-scratch motion-compensated decoder is out of scope, and the
# parser names the codec it found so the failure is actionable.


def avi_encode_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal spec-valid AVI wrapping baseline-JPEG frames: RIFF
    ``AVI `` → ``hdrl`` LIST (``avih`` main header + ``strl`` with a
    ``vids/MJPG`` stream header and a ``BITMAPINFOHEADER``) →
    ``movi`` LIST of ``00dc`` chunks (word-aligned per RIFF) →
    ``idx1``. Pure struct packing — the produce-path twin of
    :func:`avi_mjpeg_frames`."""
    import struct

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(frames)
    buf_sz = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        int(1_000_000 // max(fps, 1)),  # dwMicroSecPerFrame
        0, 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, buf_sz, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, max(fps, 1), 0, n,
                      buf_sz, 0xFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_body) - 4, len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, ln)
        for off, ln in idx_entries
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Walk a RIFF/AVI container and return its video frame payloads
    (``..dc``/``..db`` chunks inside the ``movi`` LIST), validating
    the stream's codec: MJPG frames are standalone baseline JPEGs the
    native decoder handles; any OTHER fccHandler raises a
    NotImplementedError naming it (an inter-frame codec needs a
    motion-compensated decoder this engine intentionally does not
    ship). Word-aligned chunk padding and nested LISTs are handled
    per the RIFF spec; truncation raises."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")
    frames: list[bytes] = []
    handler: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            b0, b1 = pos + 8, pos + 8 + ln
            if b1 > end:
                raise ValueError(f"truncated AVI chunk {fcc!r} at {pos}")
            if fcc == b"LIST":
                walk(b0 + 4, b1)
            elif fcc == b"strh" and data[b0 : b0 + 4] == b"vids":
                handler.append(data[b0 + 4 : b0 + 8])
            elif fcc[2:4] in (b"dc", b"db"):
                frames.append(data[b0:b1])
            pos = b1 + (ln & 1)  # RIFF chunks are word-aligned

    declared_end = 8 + struct.unpack("<I", data[4:8])[0]
    if declared_end > len(data):
        raise ValueError(
            f"truncated AVI: RIFF declares {declared_end} bytes, "
            f"payload has {len(data)}"
        )
    walk(12, declared_end)
    if frames and not handler:
        raise ValueError("AVI carries frames but no 'vids' stream header")
    if handler and handler[0].upper() not in (b"MJPG", b"JPEG"):
        raise NotImplementedError(
            f"AVI codec {handler[0]!r} needs an inter-frame decoder "
            "(ffmpeg); only MJPG decodes natively"
        )
    return frames


def video_frame_sample(payload: bytes, every_n: int = 1) -> list:
    """REAL video frame sampling: parse the AVI container, keep every
    ``every_n``-th frame, decode each kept frame's JPEG to pixels
    (operators/jpeg_codec.py — no codec library). Returns a list of
    uint8 arrays, (h, w) gray or (h, w, 3) RGB."""
    from lakehouse_test_spark.operators.jpeg_codec import jpeg_decode_pixels

    return [
        jpeg_decode_pixels(f)
        for f in avi_mjpeg_frames(payload)[:: max(every_n, 1)]
    ]


@query(
    "multimodal_video_frames",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(3 AS INTEGER) AS n_frames,
           CAST(2 AS INTEGER) AS n_sampled,
           CAST(((doc_id % 8) + ((doc_id + 2) % 8)) * 16 AS DOUBLE)
             AS mean_luma
    FROM documents
    """,
    tags=("multimodal", "llm", "video", "pandas_udf"),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end, HASH-CHECKED (round 11 — closes
    the last documented decode gap for the MJPEG codec): per document,
    synthesize a 3-frame Motion-JPEG AVI (each frame a uniform
    grayscale whose value is a multiple of 32 — a level the baseline
    quantizer reproduces EXACTLY, so the decoded luminance is
    SQL-predictable), then in the same Arrow-batched kernel walk the
    RIFF container, sample every 2nd frame, decode each kept frame's
    JPEG (operators/jpeg_codec.py, no codec library), and report the
    decoded mean luminance. The oracle recomputes frame counts AND the
    exact luminance from doc_id, so a hash match proves the encoder,
    container writer, parser, sampler, and pixel decoder agree to the
    pixel value. Inter-frame codecs stay behind the documented
    NotImplementedError (the parser names the codec it found).

    Scale: mapInPandas keeps payloads in Arrow record batches — one
    Python worker per core, no per-row serialization, no shuffle;
    real corpora swap the synthesis for a binary-column scan and keep
    the identical kernel."""
    import numpy as np

    from lakehouse_test_spark.operators.jpeg_codec import (
        jpeg_encode_pixels,
    )

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_frames", IntegerType()),
            StructField("n_sampled", IntegerType()),
            StructField("mean_luma", DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                jpgs = [
                    jpeg_encode_pixels(
                        np.full((16, 16), ((d + i) % 8) * 32, np.uint8)
                    )
                    for i in range(3)
                ]
                avi = avi_encode_mjpeg(jpgs, 16, 16, fps=5)
                frames = video_frame_sample(avi, every_n=2)
                luma = float(
                    np.mean([f.astype(np.float64).mean() for f in frames])
                )
                rows.append(
                    (d, len(avi_mjpeg_frames(avi)), len(frames), luma)
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_frames", "n_sampled", "mean_luma"]
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# TIFF/EXIF: little-endian IFD walk with DATA-DRIVEN offsets
# ---------------------------------------------------------------------------


def le_u16_at(payload: Column, off: Column) -> Column:
    """Little-endian uint16 at a COLUMN offset (0-based) — the dynamic
    twin of ``le_u16`` for offsets parsed from the data."""
    return _u(_swap_bytes(F.hex(payload.substr(off + 1, F.lit(2))), 2))


def le_u32_at(payload: Column, off: Column) -> Column:
    """Little-endian uint32 at a COLUMN offset (0-based)."""
    return _u(_swap_bytes(F.hex(payload.substr(off + 1, F.lit(4))), 4))


def synthesize_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-valid little-endian TIFF per document: ``II``/42 header,
    IFD0 with four 12-byte entries (ImageWidth 0x0100, ImageLength
    0x0101, Orientation 0x0112 as SHORTs; ExifIFDPointer 0x8769 as
    LONG) and a chained EXIF sub-IFD (ISOSpeedRatings 0x8827,
    PixelXDimension 0xA002). All field values derive deterministically
    from n_chars so the walk is oracle-checkable; hex assembly +
    unhex keeps synthesis in codegen (the synthesize_media posture).
    """
    d = load_table(spark, sf_dir, "documents")
    width = (F.col("n_chars") % 32 + 1) * 16
    height = (F.col("n_chars") % 24 + 1) * 9
    orientation = F.col("n_chars") % 8 + 1
    iso = (F.col("n_chars") % 16 + 1) * 100
    # layout: header 8B | IFD0: count(2) + 4*12 entries + next(4) = 54B
    # → EXIF IFD at 8 + 54 = 62: count(2) + 2*12 + next(4) = 30B
    exif_off = 62

    def entry(tag: int, typ: int, value: Column) -> Column:
        return F.concat(
            F.lit(f"{tag & 0xFF:02X}{(tag >> 8) & 0xFF:02X}"
                  f"{typ & 0xFF:02X}{(typ >> 8) & 0xFF:02X}"
                  "01000000"),
            _le_hex(value.cast("bigint"), 4),
        )

    ifd0 = F.concat(
        F.lit("0400"),  # 4 entries, LE u16
        entry(0x0100, 3, width),
        entry(0x0101, 3, height),
        entry(0x0112, 3, orientation),
        entry(0x8769, 4, F.lit(exif_off)),
        F.lit("00000000"),  # next IFD offset: none
    )
    exif_ifd = F.concat(
        F.lit("0200"),
        entry(0x8827, 3, iso),
        entry(0xA002, 4, width),
        F.lit("00000000"),
    )
    tiff_hex = F.concat(F.lit("49492A00" + "08000000"), ifd0, exif_ifd)
    return d.select(F.col("doc_id").alias("asset_id"), F.unhex(tiff_hex).alias("payload"))


@query(
    "multimodal_tiff_exif",
    oracle="""
    SELECT doc_id AS asset_id,
           'II' AS byte_order,
           42 AS magic,
           4 AS n_ifd0_entries,
           CAST((n_chars % 32 + 1) * 16 AS BIGINT) AS width,
           CAST((n_chars % 24 + 1) * 9 AS BIGINT) AS height,
           CAST(n_chars % 8 + 1 AS BIGINT) AS orientation,
           CAST((n_chars % 16 + 1) * 100 AS BIGINT) AS iso_speed,
           CAST((n_chars % 32 + 1) * 16 AS BIGINT) AS pixel_x_dim,
           TRUE AS well_formed
    FROM documents
    """,
    tags=("multimodal", "llm", "image"),
)
def multimodal_tiff_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF/EXIF IFD walk over little-endian TIFF payloads: read
    the byte-order mark and magic, follow the header's IFD offset
    (from the DATA), read the entry count, scan the entries by TAG
    (order-independent CASE extraction, not positional slicing),
    follow the ExifIFDPointer to the sub-IFD, and pull
    ISOSpeedRatings / PixelXDimension out of it. The oracle recomputes
    every field from the source columns, so a hash match proves the
    synthesis and the offset-chasing walk are spec-consistent — the
    same posture as ``multimodal_mp4_boxes``.

    Scale: pure codegen byte arithmetic (binary substr → hex → conv),
    zero shuffle, zero Python — EXIF extraction at scan speed across
    a 100 TB image corpus; pixel decode stays behind the documented
    codec boundary (decode_media).
    """
    a = synthesize_tiff(spark, sf_dir)
    p = F.col("payload")
    byte_order = F.decode(p.substr(1, 2), "UTF-8")
    magic = le_u16(p, 2)
    ifd0 = le_u32(p, 4)
    n0 = le_u16_at(p, ifd0)

    def tagv(base: Column, n_entries: int, tag: int) -> Column:
        """Value of ``tag`` among the first n_entries of the IFD at
        ``base`` — tag ids read from the data, matched by CASE."""
        v = F.lit(None).cast("bigint")
        for i in range(n_entries):
            e = base + 2 + 12 * i
            v = F.when(le_u16_at(p, e) == tag, le_u32_at(p, e + 8)).otherwise(v)
        return v

    width = tagv(ifd0, 4, 0x0100)
    height = tagv(ifd0, 4, 0x0101)
    orientation = tagv(ifd0, 4, 0x0112)
    exif_ptr = tagv(ifd0, 4, 0x8769)
    iso = tagv(exif_ptr, 2, 0x8827)
    pixel_x = tagv(exif_ptr, 2, 0xA002)
    next_ifd0 = le_u32_at(p, ifd0 + 2 + 12 * n0)
    return a.select(
        "asset_id",
        byte_order.alias("byte_order"),
        magic.cast("int").alias("magic"),
        n0.cast("int").alias("n_ifd0_entries"),
        width.alias("width"),
        height.alias("height"),
        orientation.alias("orientation"),
        iso.alias("iso_speed"),
        pixel_x.alias("pixel_x_dim"),
        ((magic == 42) & (next_ifd0 == 0) & (byte_order == "II")).alias("well_formed"),
    )
