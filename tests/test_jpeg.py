"""Baseline JPEG codec (operators/jpeg_codec.py): roundtrip fidelity,
format-machinery checks, and pHash integration on genuine JPEGs.

The encoder and decoder share only the bytestream (the encoder emits
its own DQT/DHT, the decoder is table-driven), so the roundtrip tests
exercise real marker parsing, canonical Huffman, dequantization, and
the IDCT — not a private in-memory shortcut.
"""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_test_spark.operators.jpeg_codec import (
    _D,
    jpeg_decode_pixels,
    jpeg_encode_pixels,
)


def _psnr(a, b) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255**2 / max(np.mean(err**2), 1e-12))


def test_dct_basis_orthonormal():
    assert np.allclose(_D @ _D.T, np.eye(8), atol=1e-12)


def test_constant_image_roundtrips_exact():
    img = np.full((16, 24), 130, dtype=np.uint8)
    dec = jpeg_decode_pixels(jpeg_encode_pixels(img))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_gray_gradient_high_fidelity_odd_dims():
    yy, xx = np.mgrid[0:37, 0:53]
    img = ((np.sin(yy / 6) + np.cos(xx / 9)) * 50 + 128).astype(np.uint8)
    dec = jpeg_decode_pixels(jpeg_encode_pixels(img))
    assert dec.shape == (37, 53)
    assert _psnr(dec, img) > 40


def test_rgb_444_roundtrip():
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [
            ((np.sin(yy / 5) + 1) * 100).astype(np.uint8),
            ((np.cos(xx / 7) + 1) * 100).astype(np.uint8),
            ((yy + xx) % 200).astype(np.uint8),
        ],
        axis=-1,
    )
    dec = jpeg_decode_pixels(jpeg_encode_pixels(img))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 38


def test_rgb_420_subsampling_decodes():
    """4:2:0 exercises the MCU interleave + chroma upsample path;
    chroma subsampling costs fidelity but luma structure survives."""
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [
            (yy * 3 % 256).astype(np.uint8),
            (xx * 2 % 256).astype(np.uint8),
            ((yy + xx) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    enc420 = jpeg_encode_pixels(img, subsampling="420")
    enc444 = jpeg_encode_pixels(img, subsampling="444")
    dec = jpeg_decode_pixels(enc420)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 25
    assert len(enc420) < len(enc444)  # subsampling actually compresses


def test_noise_image_stresses_ac_paths():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    dec = jpeg_decode_pixels(jpeg_encode_pixels(img))
    assert _psnr(dec, img) > 35


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        jpeg_decode_pixels(b"plainly not a jpeg")
    # minimal progressive header: SOI + SOF2
    bad = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(ValueError):
        jpeg_decode_pixels(bad)


def test_decode_media_returns_jpeg_pixels():
    from lakehouse_test_spark.operators.multimodal import decode_media

    img = np.full((8, 8), 200, dtype=np.uint8)
    raw = decode_media(jpeg_encode_pixels(img), "image/jpeg")
    assert np.array_equal(
        np.frombuffer(raw, dtype=np.uint8).reshape(8, 8), img
    )


def test_phash_of_encoded_jpeg_equals_phash_of_raw_pixels(spark):
    """pHash(JPEG bytes) must equal pHash computed from the raw pixel
    grid — proving the kernel actually decodes JPEGs rather than
    falling back to byte tiling."""
    from pyspark.sql import Row

    from lakehouse_test_spark.operators.multimodal import phash_fingerprints

    yy, xx = np.mgrid[0:64, 0:64]
    img = ((np.sin(yy / 8) * np.cos(xx / 11) + 1) * 120).astype(np.uint8)
    payload = jpeg_encode_pixels(img)

    df = spark.createDataFrame([Row(asset_id=1, payload=payload)])
    got = phash_fingerprints(df).collect()[0]["phash"]

    # reference pHash from the decoded pixels (same construction)
    gray = jpeg_decode_pixels(payload).astype(np.float64)
    n = 32
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C[0, :] = np.sqrt(1.0 / n)
    ri = (np.arange(n) * gray.shape[0] // n).clip(0, gray.shape[0] - 1)
    ci = (np.arange(n) * gray.shape[1] // n).clip(0, gray.shape[1] - 1)
    grid = gray[np.ix_(ri, ci)]
    dct = C @ grid @ C.T
    block = dct[:8, :8].reshape(64)
    ac = block[1:]
    med = np.median(ac)
    bits = np.zeros(64, dtype=np.uint8)
    bits[1:] = (ac > med).astype(np.uint8)
    expect = int(np.packbits(bits).view(">i8")[0])
    assert got == expect


def test_phash_jpeg_near_dup_small_hamming(spark):
    """Two JPEGs of the same scene with tiny pixel noise must land at
    small Hamming distance; an unrelated image must not."""
    from pyspark.sql import Row

    from lakehouse_test_spark.operators.multimodal import phash_fingerprints

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:48, 0:48]
    base = (
        30 * np.sin(yy / 3) + 40 * np.cos(xx / 4) + 25 * np.sin((xx + yy) / 5) + 128
    ).astype(np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    other = ((xx * 5 + yy * yy) % 256).astype(np.uint8)

    df = spark.createDataFrame(
        [
            Row(asset_id=1, payload=jpeg_encode_pixels(base)),
            Row(asset_id=2, payload=jpeg_encode_pixels(noisy)),
            Row(asset_id=3, payload=jpeg_encode_pixels(other)),
        ]
    )
    h = {r["asset_id"]: r["phash"] for r in phash_fingerprints(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    # nearest-neighbor 32×32 downsampling passes pixel noise straight
    # into the borderline AC bits, so near-dup distances run higher
    # than a blur-first pHash — the separation is what matters
    assert ham(h[1], h[2]) <= 16
    assert ham(h[1], h[3]) > 20


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    gray=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_never_errors_and_bounded(h, w, seed, gray):
    """Any uint8 image of any shape encodes to a parseable stream that
    decodes to the same shape with bounded quantization error."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = jpeg_decode_pixels(jpeg_encode_pixels(img))
    assert dec.shape == img.shape
    # worst-case quantization error bound: q=8 tables, DCT energy
    # spreads at most ~q*8 per pixel; chroma conversion adds slack
    assert float(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 96


# ---------------------------------------------------------------------------
# AVI/MJPEG container (round 11): real video frame decode, no ffmpeg
# ---------------------------------------------------------------------------


def test_avi_mjpeg_roundtrip_and_sampling():
    """Encode 5 JPEG frames into a spec-shaped RIFF/AVI, walk the
    container back out (byte-exact frames, word-aligned padding
    handled), decode a 1-in-2 sample to pixels within JPEG
    quantization error, and concatenate via decode_media."""
    from lakehouse_test_spark.operators.multimodal import (
        avi_encode_mjpeg,
        avi_mjpeg_frames,
        decode_media,
        video_frame_sample,
    )

    frames_px, jpgs = [], []
    for i in range(5):
        y, x = np.mgrid[0:24, 0:32]
        px = ((x * 4 + y * 3 + i * 11) % 256).astype(np.uint8)[..., None]
        px = px.repeat(3, axis=2)
        frames_px.append(px)
        jpgs.append(jpeg_encode_pixels(px))
    assert any(len(j) % 2 for j in jpgs)  # padding path exercised
    avi = avi_encode_mjpeg(jpgs, 32, 24, fps=5)
    assert [bytes(f) for f in avi_mjpeg_frames(avi)] == jpgs
    dec = video_frame_sample(avi, every_n=2)
    assert len(dec) == 3 and dec[0].shape == (24, 32, 3)
    for d, p in zip(dec, frames_px[::2]):
        assert float(np.abs(d.astype(int) - p.astype(int)).mean()) < 12
    raw = decode_media(avi, "video/x-msvideo")
    assert len(raw) == 5 * 24 * 32 * 3


def test_avi_rejects_interframe_codecs_and_truncation():
    """A non-MJPG stream header raises NotImplementedError NAMING the
    codec (inter-frame decode is intentionally out of scope); torn
    containers raise ValueError, never a silent empty frame list."""
    import pytest

    from lakehouse_test_spark.operators.multimodal import (
        avi_encode_mjpeg,
        avi_mjpeg_frames,
    )

    jpg = jpeg_encode_pixels(np.full((8, 8), 100, np.uint8))
    avi = avi_encode_mjpeg([jpg], 8, 8)
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_mjpeg_frames(avi.replace(b"vidsMJPG", b"vidsXVID"))
    with pytest.raises(ValueError, match="truncated"):
        avi_mjpeg_frames(avi[:40])
    with pytest.raises(ValueError, match="RIFF"):
        avi_mjpeg_frames(b"not an avi at all")
    # frames but no stream header: loud, not a silent guess
    naked = (
        b"RIFF" + (len(b"AVI LIST" + b"\x00" * 4)).to_bytes(4, "little")
    )
    import struct

    movi = b"movi" + b"00dc" + struct.pack("<I", len(jpg)) + jpg
    if len(jpg) % 2:
        movi += b"\x00"
    body = b"AVI " + b"LIST" + struct.pack("<I", len(movi)) + movi
    naked = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="stream header"):
        avi_mjpeg_frames(naked)


def test_video_phash_keys_on_first_frame(spark):
    """pHash over AVI payloads (round 11): two videos sharing a first
    frame hash identically no matter what the later frames hold; a
    noised first frame stays within a small Hamming distance; a
    non-MJPG video falls back to byte tiling without failing the
    pipeline."""
    from pyspark.sql import Row

    from lakehouse_test_spark.operators.multimodal import (
        avi_encode_mjpeg,
        phash_fingerprints,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    noised = np.clip(base.astype(int) + rng.integers(-4, 5, base.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32), dtype=np.uint8)

    def avi(first, extra):
        jpgs = [jpeg_encode_pixels(first)] + [jpeg_encode_pixels(f) for f in extra]
        return avi_encode_mjpeg(jpgs, 32, 32)

    a1 = avi(base, [other])
    a2 = avi(base, [base, noised])   # same first frame, different tail
    a3 = avi(noised, [])             # near-dup first frame
    bad = a1.replace(b"vidsMJPG", b"vidsH264")  # unsupported codec
    df = spark.createDataFrame(
        [Row(asset_id=i, payload=bytearray(p)) for i, p in enumerate([a1, a2, a3, bad])]
    )
    got = {r["asset_id"]: r["phash"] for r in phash_fingerprints(df).collect()}
    assert got[0] == got[1], "same first frame -> identical pHash"
    ham = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 10, f"noised first frame drifted {ham} bits"
    assert 3 in got  # fallback produced a hash, pipeline intact
