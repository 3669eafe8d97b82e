"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, plus decode / feature-extract plumbing
as Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio libraries, so the decode kernel is
STUBBED (deterministic fake + a clearly-marked NotImplementedError
for real codecs) — but the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested, which is the part
that matters for the engine.

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


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode a media payload to raw frames/samples.

    STUB: real codecs (PIL/ffmpeg/librosa) are not in this container.
    ``fake/*`` mimes round-trip the bytes so the pipeline is testable;
    anything else raises until a codec backend is wired in.
    """
    if mime.startswith("image/fake") or mime.startswith("fake/"):
        return payload
    raise NotImplementedError(
        f"decode for mime={mime!r} requires a codec backend (PIL/ffmpeg); "
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
