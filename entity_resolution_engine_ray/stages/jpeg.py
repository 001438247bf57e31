"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF — public spec).

Closes the last multimodal gap without Pillow: web corpora are mostly JPEG,
and the auto-sniffing decode path (stages/multimodal.decode_image) needs a
real decoder behind the FFD8 magic.

Scope (documented, checked, errors are loud):
- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI /
  RSTn). Progressive (SOF2), arithmetic coding, 12-bit and hierarchical
  modes raise NotImplementedError.
- encode: baseline 4:4:4 (and grayscale), Annex-K quantization tables
  scaled by ``quality``, standard Annex-K Huffman tables written as DHT
  (the decoder always reads tables from the stream, so the pair is
  self-consistent by construction).

Performance shape: DCT/IDCT, quantization, zigzag, level shift and color
transforms are whole-image vectorized numpy; only the entropy coding loop
is per-symbol Python (inherent to Huffman's serial bit stream) — fine for
the fixture-scale payloads this container processes; megapixel corpora
should swap in libjpeg via the Pillow gate.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public)
# --------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits-per-length counts, symbol values) per Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))

_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], _AC_LUMA_VALS)

_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], _AC_CHROMA_VALS)

# zigzag scan order: ZIGZAG[i] = flat (row-major) index of the i-th
# zigzag-ordered coefficient
_zz = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 2-D DCT basis: coeffs = D @ block @ D.T, block = D.T @ coeffs @ D
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT[0] /= np.sqrt(2)


def _build_huffman(bits: list[int], vals: list[int]):
    """(counts-per-length, values) → {(length, code): symbol} plus the
    encode map {symbol: (code, length)} — canonical JPEG code assignment."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) with h, w % 8 == 0 → (n_blocks, 8, 8), raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category s, s-bit two's-magnitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = int(a).bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_plane(writer, qcoef_zz: np.ndarray, dc_enc, ac_enc, pred: int) -> int:
    """Entropy-encode one component's quantized zigzag blocks; returns the
    updated DC predictor. qcoef_zz: (n_blocks, 64) int32 in zigzag order."""
    for blk in qcoef_zz:
        dc = int(blk[0])
        s, code = _magnitude(dc - pred)
        pred = dc
        c, ln = dc_enc[s]
        writer.write(c, ln)
        if s:
            writer.write(code, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_enc[0xF0]  # ZRL
                writer.write(c, ln)
                run -= 16
            s, code = _magnitude(v)
            c, ln = ac_enc[(run << 4) | s]
            writer.write(c, ln)
            writer.write(code, s)
            run = 0
        if last < 63:
            c, ln = ac_enc[0x00]  # EOB
            writer.write(c, ln)
    return pred


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex-K table (public formula)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray → baseline JFIF bytes.

    ``subsample=False`` → 4:4:4; ``subsample=True`` → 4:2:0 (box-averaged
    chroma, 2×2-Y MCUs — the web-corpus default and the decoder's
    upsampling test vector). Annex-K tables scaled by ``quality``."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    # RGB → YCbCr (BT.601 full-range, JFIF)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
        cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0
        planes = [y, cb, cr]
    sub = subsample and not gray
    qt = [_scaled_quant(QUANT_LUMA, quality), _scaled_quant(QUANT_CHROMA, quality)]
    hufs = [(_build_huffman(*DC_LUMA)[1], _build_huffman(*AC_LUMA)[1]),
            (_build_huffman(*DC_CHROMA)[1], _build_huffman(*AC_CHROMA)[1])]

    # per-component geometry: (plane, h_factor, v_factor)
    if sub:
        # pad Y to 16-multiples so chroma halves land on whole 8-blocks
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        ypad = np.pad(planes[0], ((0, ph - h), (0, pw - w)), mode="edge")
        half = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in (
                np.pad(planes[1], ((0, ph - h), (0, pw - w)), mode="edge"),
                np.pad(planes[2], ((0, ph - h), (0, pw - w)), mode="edge"),
            )
        ]
        geom = [(ypad, 2, 2), (half[0], 1, 1), (half[1], 1, 1)]
    else:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        geom = [
            (np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge"), 1, 1) for p in planes
        ]

    comp_blocks, comp_bw = [], []
    for ci, (pad, _, _) in enumerate(geom):
        blocks = _blockify(pad - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qt[0 if ci == 0 else 1]
        qc = np.round(coef / q).astype(np.int32)
        comp_blocks.append(qc.reshape(-1, 64)[:, _zz])
        comp_bw.append(pad.shape[1] // 8)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qt[: 1 if gray else 2]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(q.reshape(64)[_zz].astype(np.uint8))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_, hi, vi) in enumerate(geom):
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)] + (
        [] if gray else [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    )
    for tc_th, (bits, vals) in tables:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    hmax = max(hi for _, hi, _ in geom)
    vmax = max(vi for _, _, vi in geom)
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    for my in range(mcuy):  # interleaved MCU scan, same order the decoder walks
        for mx in range(mcux):
            for ci, (_, hi, vi) in enumerate(geom):
                dc_enc, ac_enc = hufs[0 if ci == 0 else 1]
                for by in range(vi):
                    for bx in range(hi):
                        idx = (my * vi + by) * comp_bw[ci] + (mx * hi + bx)
                        preds[ci] = _encode_plane(
                            writer, comp_blocks[ci][idx : idx + 1], dc_enc, ac_enc, preds[ci]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Bit reader over entropy-coded data with 0xFF00 unstuffing; RSTn
    markers are consumed by reset()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI per spec
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: stop feeding real bytes
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next RSTn marker (restart interval)."""
        self.acc, self.n = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (gray replicated).

    Supports SOF0, 8-bit, 1/3 components, sampling factors 1-2, DRI/RSTn.
    Progressive/arithmetic/12-bit streams raise NotImplementedError."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    scan_pos = None
    scan_comps: list[dict] = []
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", d[pos + 2 : pos + 4])[0]
        seg = d[pos + 4 : pos + 2 + ln]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) is decodable here (got SOF marker {marker:#x})"
            )
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                flat = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[_zz] = flat
                qt[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError("sampling factors beyond 2 unsupported")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)], _ = _build_huffman(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_pos is None or not comps:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in scan_comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        c["pred"] = 0

    reader = _BitReader(d, scan_pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align_to_marker()
                for c in scan_comps:
                    c["pred"] = 0
            for c in scan_comps:
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        s = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.receive(s), s)
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overrun")
                            blk[_zz[k]] = _extend(reader.receive(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk.reshape(8, 8) * q
            mcu_count += 1

    planes = []
    for c in scan_comps:
        px = np.einsum("ji,njk,kl->nil", _DCT, c["coef"], _DCT)  # IDCT
        plane = _unblockify(px, c["bh"] * 8, c["bw"] * 8) + 128.0
        # upsample to full resolution (sample replication) and crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
