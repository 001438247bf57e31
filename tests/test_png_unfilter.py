"""PNG Average/Paeth unfilter: exact vectorized fixpoint + fallback."""

import numpy as np

from entity_resolution_engine_ray.stages.multimodal import _unfilter_fixpoint_row


def test_png_fixpoint_unfilter_matches_scalar_reference():
    """Average/Paeth fixpoint unfilter == the sequential per-pixel loop on
    adversarial random rows (mod-256 wraps everywhere) for ch in 1/3/4."""
    from entity_resolution_engine_ray.stages.multimodal import _unfilter_fixpoint_row

    def scalar(f, cur, prev, ch):
        stride = len(cur)
        cb, pb = cur.tolist(), prev.tolist()
        ln = [0] * stride
        for x in range(stride):
            a = ln[x - ch] if x >= ch else 0
            if f == 3:
                ln[x] = (cb[x] + ((a + pb[x]) >> 1)) & 255
            else:
                b = pb[x]
                c = pb[x - ch] if x >= ch else 0
                p = a + b - c
                pa_ = abs(p - a)
                pb_ = abs(p - b)
                pc_ = abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                ln[x] = (cb[x] + pred) & 255
        return np.array(ln, dtype=np.int32)

    rng = np.random.default_rng(9)
    for ch in (1, 3, 4):
        for f in (3, 4):
            for w in (1, 2, 7, 64):
                cur = rng.integers(0, 256, w * ch).astype(np.int32)
                prev = rng.integers(0, 256, w * ch).astype(np.int32)
                got = _unfilter_fixpoint_row(f, cur, prev, ch)
                if got is None:  # sweep cap hit (w > cap only) → fallback
                    assert w * ch > 32
                    from entity_resolution_engine_ray.stages.multimodal import (
                        _unfilter_scalar_row,
                    )

                    got = _unfilter_scalar_row(f, cur, prev, ch)
                assert np.array_equal(got, scalar(f, cur, prev, ch)), (f, ch, w)


def test_png_megapixel_paeth_decode_budget():
    """1-MP all-Paeth-ish roundtrip stays well under the old list-loop cost
    (~3 s): encode a smooth gradient (Paeth's worst convergence shape is
    smooth horizontal runs), decode, assert exact roundtrip and a loose
    wall budget so a vectorization regression is caught."""
    import struct
    import time
    import zlib

    from entity_resolution_engine_ray.stages.multimodal import decode_png

    h, w, ch = 1000, 1000, 3
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx // 7 + yy // 11) % 256).astype(np.uint8)[:, :, None].repeat(ch, axis=2)
    # hand-assemble a PNG whose EVERY scanline uses filter 4 (Paeth):
    # filtered[x] = (raw[x] - paeth(left, up, upleft)) & 255, computable
    # forward from the known raw image
    raw = img.reshape(h, w * ch).astype(np.int32)
    a = np.zeros_like(raw)
    a[:, ch:] = raw[:, :-ch]
    b = np.zeros_like(raw)
    b[1:] = raw[:-1]
    c = np.zeros_like(raw)
    c[1:, ch:] = raw[:-1, :-ch]
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))
    filt = ((raw - pred) & 255).astype(np.uint8)
    scan = np.concatenate([np.full((h, 1), 4, dtype=np.uint8), filt], axis=1)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    out = decode_png(payload)
    dt = time.time() - t0
    assert np.array_equal(out, img)
    assert dt < 10.0, f"1MP all-Paeth decode took {dt:.1f}s"
    print(f"1MP all-Paeth smooth-gradient decode (scalar fallback): {dt:.2f}s")
    # noisy image: the fixpoint path certifies in a few sweeps per row
    noisy = (np.random.default_rng(2).integers(0, 256, (400, 1000, 3))).astype(np.uint8)
    raw = noisy.reshape(400, 3000).astype(np.int32)
    a = np.zeros_like(raw); a[:, 3:] = raw[:, :-3]
    b = np.zeros_like(raw); b[1:] = raw[:-1]
    c = np.zeros_like(raw); c[1:, 3:] = raw[:-1, :-3]
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))
    filt = ((raw - pred) & 255).astype(np.uint8)
    scan = np.concatenate([np.full((400, 1), 4, dtype=np.uint8), filt], axis=1)
    payload2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1000, 400, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    out2 = decode_png(payload2)
    dt2 = time.time() - t0
    assert np.array_equal(out2, noisy)
    print(f"0.4MP all-Paeth NOISY decode (fixpoint path): {dt2:.2f}s")
