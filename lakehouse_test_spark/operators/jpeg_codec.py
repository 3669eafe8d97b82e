"""REAL baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib —
closes the last multimodal decode gap without any codec library.

- ``jpeg_decode_pixels``: marker walk (SOI/APPn/DQT/SOF0/DHT/DRI/
  SOS/EOI), canonical Huffman decode of the entropy-coded segment
  (byte unstuffing, restart markers, DC prediction + EXTEND), 8-bit
  dequantize → dezigzag → exact matrix IDCT, chroma upsampling for
  4:2:0/4:2:2, BT.601 YCbCr→RGB. Baseline sequential only —
  progressive (SOF2) and 12-bit raise ValueError (route to a codec
  backend on a real cluster).
- ``jpeg_encode_pixels``: the test-fixture twin — FDCT + quantize +
  canonical Huffman (tables EMITTED in DQT/DHT, so the decoder reads
  them like any foreign JPEG's), 4:4:4 or grayscale. Encoder and
  decoder share no tables at code level: the bytestream is the only
  contract, which is what the roundtrip tests exercise.

The 8×8 DCT uses the orthonormal basis matrix D (D @ D.T == I,
asserted in tests): FDCT F = D f Dᵀ, IDCT f = Dᵀ F D — bit-exact
float math, no approximation tricks needed at this scale.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0, :] *= 1 / np.sqrt(2)
    return d


_D = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman plumbing (canonical, per T.81 Annex C)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the BITS (count per length 1..16)
    and HUFFVAL arrays."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for decoding."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_decode_pixels(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) uint8 (grayscale) or
    (h, w, 3) uint8 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg[s + 1 : s + 65], dtype=np.uint8).astype(
                    np.int32
                )
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                vals = list(seg[s + 17 : s + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                s += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0xF))
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    # collect the entropy-coded segment: unstuff 0xFF00, stop at a
    # non-RST marker; remember restart-marker boundaries
    ecs = bytearray()
    boundaries = []  # byte offsets in ecs where an RST occurred
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                ecs.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                boundaries.append(len(ecs))
                i += 2
                continue
            break
        ecs.append(b)
        i += 1

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in frame["comps"]
    }
    br = _BitReader(bytes(ecs))
    pred = {c["id"]: 0 for c in frame["comps"]}
    bidx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                # resync at the recorded restart boundary
                br.align()
                if bidx < len(boundaries):
                    br.pos, br.bit = boundaries[bidx], 0
                    bidx += 1
                pred = {c["id"]: 0 for c in frame["comps"]}
            for comp, tdc, tac in scan:
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_symbol(br, huff_dc[tdc])
                        diff = _extend(br.read_bits(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, huff_ac[tac])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        spatial = _D.T @ block.reshape(8, 8) @ _D + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if len(comps) == 1:
        y = planes[comps[0]["id"]][:h, :w]
        return np.clip(np.round(y), 0, 255).astype(np.uint8)
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # replication upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[: mcuy * vmax * 8, : mcux * hmax * 8])
    y, cb, cr = (f[:h, :w] for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test-fixture twin; 4:4:4 / grayscale, own emitted tables)
# ---------------------------------------------------------------------------

#: flat-ish quality-table: enough compression to exercise every code
#: path, gentle enough that roundtrip PSNR stays high
_QLUMA = np.full(64, 8, dtype=np.int32)
_QLUMA[0] = 4


def _uniform_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid canonical table giving every symbol the same length L
    with n < 2^L (keeps the all-ones code unused)."""
    n = len(symbols)
    L = max(2, (n + 1).bit_length())
    bits = [0] * 16
    bits[L - 1] = n
    return bits, list(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode_pixels(px: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline
    JPEG, emitting the quant + Huffman tables it uses. ``subsampling``
    is "444" or "420" (RGB only; chroma averaged 2×2 — exercises the
    decoder's MCU interleave + upsample path)."""
    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        subsampling = "444"
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    if subsampling == "420":
        return _encode_420(planes, h, w)
    if subsampling != "444":
        raise ValueError("subsampling must be '444' or '420'")

    return _encode_444(planes, h, w)


def _tables():
    dc_bits, dc_vals = _uniform_table(_DC_SYMS)
    ac_bits, ac_vals = _uniform_table(_AC_SYMS)
    return (
        dc_bits,
        dc_vals,
        ac_bits,
        ac_vals,
        _canonical_codes(dc_bits, dc_vals),
        _canonical_codes(ac_bits, ac_vals),
    )


def _qmat() -> np.ndarray:
    q = np.zeros(64)
    q[ZIGZAG] = _QLUMA.astype(np.float64)
    return q.reshape(8, 8)


def _pad_plane(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-pad a plane up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_block(bw, block, pred, enc_dc, enc_ac, qmat) -> int:
    coef = _D @ (block - 128.0) @ _D.T
    # zigzag order: zz[i] = coef_natural[ZIGZAG[i]]
    zz = np.round(coef / qmat).astype(np.int32).reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = enc_dc[t]
    bw.write(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = enc_ac[0xF0]
            bw.write(c, ln)
            run -= 16
        sz = _category(v)
        c, ln = enc_ac[(run << 4) | sz]
        bw.write(c, ln)
        vv = v if v >= 0 else v + (1 << sz) - 1
        bw.write(vv, sz)
        run = 0
    if last_nz < 63:
        c, ln = enc_ac[0x00]
        bw.write(c, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _headers(h, w, comps, dc_bits, dc_vals, ac_bits, ac_vals) -> bytearray:
    """comps: list of (component id, hv byte)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in _QLUMA))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hv in comps:
        sof += bytes([cid, hv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([len(comps)])
    for cid, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    return out


def _encode_444(planes, h, w) -> bytes:
    dc_bits, dc_vals, ac_bits, ac_vals, enc_dc, enc_ac = _tables()
    qmat = _qmat()
    padded = [_pad_plane(p, 8, 8) for p in planes]
    bw = _BitWriter()
    preds = [0] * len(planes)
    ph, pw = padded[0].shape
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, plane in enumerate(padded):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(bw, block, preds[ci], enc_dc, enc_ac, qmat)
    out = _headers(
        h, w, [(i + 1, 0x11) for i in range(len(planes))],
        dc_bits, dc_vals, ac_bits, ac_vals,
    )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_420(planes, h, w) -> bytes:
    """4:2:0: MCU = 16×16 luma (4 Y blocks) + one 2×2-averaged block
    each of Cb/Cr — the decoder's interleave + upsample path."""
    dc_bits, dc_vals, ac_bits, ac_vals, enc_dc, enc_ac = _tables()
    qmat = _qmat()
    y = _pad_plane(planes[0], 16, 16)
    cb = _pad_plane(planes[1], 16, 16)
    cr = _pad_plane(planes[2], 16, 16)
    sub = lambda p: (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
    cbs, crs = sub(cb), sub(cr)
    bw = _BitWriter()
    preds = [0, 0, 0]
    ph, pw = y.shape
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    preds[0] = _encode_block(
                        bw, y[y0 : y0 + 8, x0 : x0 + 8], preds[0], enc_dc, enc_ac, qmat
                    )
            c0, c1 = my * 8, mx * 8
            preds[1] = _encode_block(
                bw, cbs[c0 : c0 + 8, c1 : c1 + 8], preds[1], enc_dc, enc_ac, qmat
            )
            preds[2] = _encode_block(
                bw, crs[c0 : c0 + 8, c1 : c1 + 8], preds[2], enc_dc, enc_ac, qmat
            )
    out = _headers(
        h, w, [(1, 0x22), (2, 0x11), (3, 0x11)],
        dc_bits, dc_vals, ac_bits, ac_vals,
    )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
