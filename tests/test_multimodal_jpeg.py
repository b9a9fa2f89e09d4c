"""Baseline JPEG decoder (operators/jpeg.py) vs an INDEPENDENT minimal
encoder written directly from the T.81 forward equations.

The encoder below shares no code with the decoder: forward DCT is the
direct cosine double-sum (the decoder uses a precomputed basis-matrix
einsum), Huffman tables are built fresh per image as fixed-length
canonical codes (the decoder implements the generic Annex C decode walk),
and the byte stream is assembled segment by segment from the spec. That
makes a round-trip a two-implementation cross-check, the same evidence
structure as the PNG forward-filter oracle.

Exactness structure: an all-ones quantization table plus a CONSTANT
image makes the whole pipeline integer-exact (DC = 8*(v-128), all AC
exactly zero), so those cases assert bit-equality; random content
asserts bounded reconstruction error (quantization rounds each of 64
coefficients by <= 0.5).
"""

import struct

import numpy as np
import pytest

from spatialpandas_spark.operators.jpeg import decode_jpeg

Q_ONES = np.ones(64, dtype=np.int32)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct_direct(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 forward DCT as the literal double sum (slow, obvious,
    independent of the decoder's vectorized inverse)."""
    out = np.zeros((8, 8))
    p = block.astype(np.float64) - 128.0
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        p[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _mag(v: int) -> tuple[int, int]:
    """(size, magnitude bits) for a DC diff / AC value."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _block_symbols(zz: np.ndarray, pred: int):
    """Yield (kind, symbol, bits_size, bits_value) for one coefficient
    block; kind 0=DC 1=AC."""
    t, bits = _mag(int(zz[0]) - pred)
    yield 0, t, t, bits
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            yield 1, 0x00, 0, 0  # EOB
            return
        if v == 0:
            run += 1
            if run == 16:
                yield 1, 0xF0, 0, 0  # ZRL
                run = 0
            continue
        t, bits = _mag(v)
        yield 1, (run << 4) | t, t, bits
        run = 0
    return


def _canonical_fixed(symbols: set) -> tuple[list, bytes]:
    """Fixed-length canonical Huffman table over the used symbols: all
    codes get length L = ceil(log2(n+1)) (so the all-ones code stays
    unused, as T.81 requires). Returns (16 counts, symbol bytes)."""
    syms = sorted(symbols)
    L = max(1, (len(syms) + 1 - 1).bit_length())
    if len(syms) >= (1 << L):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    return counts, bytes(syms)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    img: np.ndarray,
    qluma: np.ndarray = Q_ONES,
    qchroma: np.ndarray = Q_ONES,
    subsample: bool | tuple = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal spec-following baseline encoder: 3-component YCbCr,
    4:4:4 (or 4:2:0 with ``subsample=True``, 4:2:2 with ``(2, 1)``),
    per-image fixed-length canonical Huffman tables, optional restart
    markers."""
    h, w = img.shape[:2]
    r, g, b = [img[:, :, i].astype(np.float64) for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if subsample is True:
        hv_y = (2, 2)
    elif subsample:
        hv_y = tuple(subsample)
    else:
        hv_y = (1, 1)
    mcu_w, mcu_h = 8 * hv_y[0], 8 * hv_y[1]
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad(plane, ph, pw):
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    ypad = pad(y, mcus_y * mcu_h, mcus_x * mcu_w)
    sx, sy = hv_y
    cbs = pad(cb, mcus_y * mcu_h, mcus_x * mcu_w)
    crs = pad(cr, mcus_y * mcu_h, mcus_x * mcu_w)
    # box-average down to the chroma grid (identity when 4:4:4)
    cbp = cbs.reshape(mcus_y * 8, sy, mcus_x * 8, sx).mean(axis=(1, 3))
    crp = crs.reshape(mcus_y * 8, sy, mcus_x * 8, sx).mean(axis=(1, 3))

    def qblock(plane, by, bx, qt):
        blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        return np.rint(_fdct_direct(blk) / qt.reshape(8, 8)).astype(np.int64)

    qly = np.zeros(64, np.int64)
    qly[_ZZ] = qluma  # DQT is zigzag-ordered; build the raster table
    qlc = np.zeros(64, np.int64)
    qlc[_ZZ] = qchroma
    qly_r, qlc_r = qly.reshape(8, 8), qlc.reshape(8, 8)

    # MCU-ordered zigzag blocks per component
    mcu_blocks = []  # list of (comp_idx, zz) in scan order, per MCU
    for my in range(mcus_y):
        for mx in range(mcus_x):
            one = []
            for by in range(hv_y[1]):
                for bx in range(hv_y[0]):
                    s = qblock(
                        ypad, my * hv_y[1] + by, mx * hv_y[0] + bx, qly_r
                    ).reshape(64)[_ZZ]
                    one.append((0, s))
            one.append((1, qblock(cbp, my, mx, qlc_r).reshape(64)[_ZZ]))
            one.append((2, qblock(crp, my, mx, qlc_r).reshape(64)[_ZZ]))
            mcu_blocks.append(one)

    # pass 1: collect used symbols (DC/AC x luma/chroma)
    used = {(0, 0): set(), (1, 0): set(), (0, 1): set(), (1, 1): set()}

    def walk(emit):
        preds = [0, 0, 0]
        for mi, mcu in enumerate(mcu_blocks):
            if restart_interval and mi and mi % restart_interval == 0:
                emit("rst", (mi // restart_interval - 1) % 8)
                preds = [0, 0, 0]
            for ci, zz in mcu:
                tid = 0 if ci == 0 else 1
                for kind, sym, nb, bits in _block_symbols(zz, preds[ci]):
                    emit((kind, tid), (sym, nb, bits))
                preds[ci] = int(zz[0])

    walk(lambda key, v: used[key].add(v[0]) if key != "rst" else None)
    tables = {k: _canonical_fixed(s or {0}) for k, s in used.items()}

    # canonical code assignment (mirrors nothing in the decoder: simple
    # sequential assignment within the single length class)
    codes = {}
    for k, (counts, syms) in tables.items():
        L = next(i + 1 for i, c in enumerate(counts) if c)
        codes[k] = {s: (i, L) for i, s in enumerate(syms)}

    bw = _BitWriter()

    def emit(key, v):
        if key == "rst":
            bw.flush()
            bw.out.append(0xFF)
            bw.out.append(0xD0 + v)
            return
        sym, nb, bits = v
        code, L = codes[key][sym]
        bw.put(code, L)
        if nb:
            bw.put(bits, nb)

    walk(emit)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qluma.tolist()))
    out += _seg(0xDB, bytes([0x01]) + bytes(qchroma.tolist()))
    hv_byte = (hv_y[0] << 4) | hv_y[1]
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, hv_byte, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for (kind, tid), (counts, syms) in sorted(tables.items()):
        out += _seg(0xC4, bytes([(kind << 4) | tid]) + bytes(counts) + syms)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0x00, 0x3F, 0x00]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- tests


def test_constant_gray_bit_exact():
    for v in (0, 64, 128, 200, 255):
        img = np.full((8, 8, 3), v, dtype=np.uint8)
        np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_constant_color_within_rounding():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:] = [200, 30, 90]
    out = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_random_gray_bounded_error():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(24, 16), dtype=np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    # all-ones tables: each of 64 coefficients rounds by <=0.5
    assert err <= 4, err


def test_random_color_bounded_error():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)  # non-multiple-of-8
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 6, err  # + chroma conversion rounding
    assert out.shape == img.shape


def test_smooth_color_420_subsampled():
    # smooth chroma (constant per 2x2) so 4:2:0 box-averaging is lossless
    yy, xx = np.mgrid[0:16, 0:16]
    base = ((yy // 2) * 8 + (xx // 2) * 4).astype(np.float64)
    img = np.stack([base, 255 - base, np.full_like(base, 80)], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 8, err


def test_smooth_color_422_subsampled():
    # chroma constant per 1x2 so 4:2:2 horizontal averaging is lossless
    yy, xx = np.mgrid[0:16, 0:16]
    base = (yy * 6 + (xx // 2) * 8).astype(np.float64)
    img = np.stack([base, 255 - base, np.full_like(base, 120)], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample=(2, 1)))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 8, err


def test_restart_markers():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, size=(8, 64), dtype=np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)  # 8 MCUs across
    plain = decode_jpeg(encode_jpeg(img))
    with_rst = decode_jpeg(encode_jpeg(img, restart_interval=2))
    np.testing.assert_array_equal(plain, with_rst)


def test_lossy_quant_tables_reduce_but_bound_error():
    q = np.full(64, 16, dtype=np.int32)
    q[0] = 8
    rng = np.random.default_rng(11)
    # smooth image: lossy tables should still reconstruct closely
    yy, xx = np.mgrid[0:16, 0:16]
    g = (100 + 40 * np.sin(yy / 5) + 40 * np.cos(xx / 5)).astype(np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(img, qluma=q, qchroma=q))
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err <= 8, err


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:1],  # no SOI
        lambda b: b"\x00\x00" + b[2:],  # wrong magic
        lambda b: b[: len(b) // 3],  # truncated mid-segments
        lambda b: b[:-40] if len(b) > 60 else b[:10],  # truncated entropy
    ],
)
def test_malformed_raises(mutate):
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_jpeg(mutate(bytearray(encode_jpeg(img))))


def test_sof2_with_baseline_scan_header_rejected():
    """SOF2 is SUPPORTED now (tests/test_jpeg_progressive.py), but a
    baseline-shaped scan header (Ss=0, Se=63 — a full-band DC scan)
    inside a progressive frame is malformed and must still raise."""
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_arithmetic_coding_rejected():
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(b))


def test_app_and_comment_segments_skipped():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    b = encode_jpeg(img)
    # splice APP0 + COM right after SOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    spliced = b[:2] + app0 + com + b[2:]
    np.testing.assert_array_equal(decode_jpeg(spliced), img)


def test_resize_jpeg_reencodes_png(spark):
    from spatialpandas_spark.operators.multimodal import resize_images
    from spatialpandas_spark.operators.png import decode_png, sniff_image

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, encode_jpeg(img))], "media_id long, payload binary"
    )
    row = resize_images(df, 4, 4, decoder="image").collect()[0]
    out = bytes(row["payload"])
    assert sniff_image(out) == "png"
    # constant image: decode exact, resize exact
    np.testing.assert_array_equal(
        decode_png(out), np.full((4, 4, 3), 77, dtype=np.uint8)
    )


def test_sniff_and_features_route_jpeg(spark):
    from spatialpandas_spark.operators.multimodal import extract_features
    from spatialpandas_spark.operators.png import sniff_image

    img = np.full((8, 8, 3), 64, dtype=np.uint8)
    payload = encode_jpeg(img)
    assert sniff_image(payload) == "jpeg"
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = extract_features(df, decoder="image").collect()[0]
    assert row["decode_ok"] == "ok"
    # constant-64 image decodes bit-exactly -> closed-form stats
    assert row["feature"][:3] == [64.0, 64.0, 64.0]
    assert row["feature"][9:12] == [0.0, 0.0, 0.0]  # fraction > 64
