"""Progressive JPEG decoder (operators/jpeg.py SOF2 path) vs an
INDEPENDENT progressive encoder written from T.81 Annex G's forward
description: spectral selection bands, successive approximation (point
transform on DC and AC), EOBn end-of-band run codes, the G.1.2.3
refinement bit-buffer discipline, interleaved DC scans, per-scan Huffman
table redefinition.

Shares only the forward-DCT/bit-writer/canonical-table helpers with the
baseline encoder oracle (tests/test_multimodal_jpeg.py) — none of which
appear in the decoder. The strongest invariant: a baseline stream and a
progressive stream of the SAME quantized coefficients must decode to
IDENTICAL pixel arrays, because progressive coding is a pure reordering
of the same data.
"""

import struct

import numpy as np
import pytest

from spatialpandas_spark.operators.jpeg import decode_jpeg

from tests.test_multimodal_jpeg import (
    Q_ONES,
    _ZZ,
    _BitWriter,
    _canonical_fixed,
    _fdct_direct,
    _seg,
    encode_jpeg,
)


def _mag_signed(v: int) -> tuple[int, int]:
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


class _Scan:
    """One progressive scan: collect (symbol | raw bits) ops in order,
    then emit DHT (rebuilt per scan — exercises table redefinition) +
    SOS + entropy data."""

    def __init__(self, comp_ids, ss, se, ah, al, table_class):
        self.comp_ids = comp_ids  # [(component id, table id)]
        self.ss, self.se, self.ah, self.al = ss, se, ah, al
        self.table_class = table_class  # 0 DC / 1 AC; None = no table
        self.ops: list = []  # ("sym", tid, symbol) | ("bits", value, n)

    def sym(self, tid, s):
        self.ops.append(("sym", tid, s))

    def bits(self, v, n):
        if n:
            self.ops.append(("bits", v, n))

    def emit(self) -> bytes:
        out = bytearray()
        codes = {}
        if self.table_class is not None:
            for tid in sorted({t for op in self.ops if op[0] == "sym" for t in [op[1]]}):
                used = {s for kind, t, s in (
                    op for op in self.ops if op[0] == "sym") if t == tid}
                counts, syms = _canonical_fixed(used or {0})
                out += _seg(
                    0xC4,
                    bytes([(self.table_class << 4) | tid])
                    + bytes(counts) + syms,
                )
                L = next(i + 1 for i, c in enumerate(counts) if c)
                codes[tid] = {s: (i, L) for i, s in enumerate(syms)}
        hdr = bytes([len(self.comp_ids)])
        for cid, tid in self.comp_ids:
            td_ta = (tid << 4) if self.table_class == 0 else tid
            hdr += bytes([cid, td_ta])
        hdr += bytes([self.ss, self.se, (self.ah << 4) | self.al])
        out += _seg(0xDA, hdr)
        bw = _BitWriter()
        for op in self.ops:
            if op[0] == "sym":
                code, L = codes[op[1]][op[2]]
                bw.put(code, L)
            else:
                bw.put(op[1], op[2])
        bw.flush()
        out += bw.out
        return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray,
    qluma: np.ndarray = Q_ONES,
    qchroma: np.ndarray = Q_ONES,
    subsample: bool = False,
    dc_al: int = 1,
    ac_al: int = 1,
    bands=((1, 5), (6, 63)),
) -> bytes:
    """Spec-following progressive encoder: interleaved first DC scan at
    point transform ``dc_al`` + DC refinement scans; per component and
    spectral band, an AC first scan at ``ac_al`` + refinement scans down
    to 0. Gray input (2-D) encodes a single-component frame."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        hv = [(1, 1)]
        qts = [0]
    else:
        r, g, b = [img[:, :, i].astype(np.float64) for i in range(3)]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        qts = [0, 1, 1]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def pad(plane, ph, pw):
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1]:] = out[:, plane.shape[1] - 1: plane.shape[1]]
        return out

    qly = np.zeros(64, np.int64)
    qly[_ZZ] = qluma
    qlc = np.zeros(64, np.int64)
    qlc[_ZZ] = qchroma
    qrs = [qly.reshape(8, 8), qlc.reshape(8, 8)]

    # quantized zigzag blocks on each component's MCU-padded grid, plus
    # the non-interleaved grid dims (what single-component scans cover)
    comp_blocks, comp_nb = [], []
    for ci, plane in enumerate(planes):
        ch, cv = hv[ci]
        cw, chh = -(-w * ch // hmax), -(-h * cv // vmax)
        # pad to the full MCU extent FIRST, then box-average — the same
        # order as the baseline oracle, so both encoders quantize
        # byte-identical blocks and exact-equality comparisons hold
        p = pad(plane, mcus_y * 8 * vmax, mcus_x * 8 * hmax)
        sy, sx = vmax // cv, hmax // ch
        if (sy, sx) != (1, 1):
            p = p.reshape(p.shape[0] // sy, sy, p.shape[1] // sx, sx).mean(
                axis=(1, 3)
            )
        nby, nbx = mcus_y * cv, mcus_x * ch
        grid = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8]
                grid[by, bx] = np.rint(
                    _fdct_direct(blk) / qrs[qts[ci]]
                ).reshape(64)[_ZZ]
        comp_blocks.append(grid)
        comp_nb.append((-(-cw // 8), -(-chh // 8)))

    scans: list[_Scan] = []

    # ---- DC first (interleaved over all components), then refinements
    sc = _Scan([(i + 1, 0 if i == 0 else 1) for i in range(len(planes))],
               0, 0, 0, dc_al, table_class=0)
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(len(planes)):
                ch, cv = hv[ci]
                tid = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(comp_blocks[ci][my * cv + by, mx * ch + bx, 0])
                        diff = (dc >> dc_al) - preds[ci]
                        preds[ci] = dc >> dc_al
                        t, bits = _mag_signed(diff)
                        sc.sym(tid, t)
                        sc.bits(bits, t)
    scans.append(sc)
    for al in range(dc_al - 1, -1, -1):
        sc = _Scan([(i + 1, 0) for i in range(len(planes))],
                   0, 0, al + 1, al, table_class=None)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(len(planes)):
                    ch, cv = hv[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            dc = int(
                                comp_blocks[ci][my * cv + by, mx * ch + bx, 0]
                            )
                            sc.bits((dc >> al) & 1, 1)
        scans.append(sc)

    # ---- AC scans per component and band: first at ac_al, then refine
    for ci in range(len(planes)):
        nbx, nby = comp_nb[ci]
        grid = comp_blocks[ci]
        for ss, se in bands:
            sc = _Scan([(ci + 1, 0)], ss, se, 0, ac_al, table_class=1)
            eobrun = 0

            def flush_eob(sc=sc):
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    sc.sym(0, n << 4)
                    sc.bits(eobrun - (1 << n), n)
                    eobrun = 0

            for by in range(nby):
                for bx in range(nbx):
                    zz = grid[by, bx]
                    vals = [
                        (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> ac_al)
                        for k in range(ss, se + 1)
                    ]
                    if not any(vals):
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last = max(i for i, v in enumerate(vals) if v)
                    for i, v in enumerate(vals):
                        if i > last:
                            eobrun += 1
                            break
                        if v == 0:
                            run += 1
                            if run == 16:
                                sc.sym(0, 0xF0)
                                run = 0
                            continue
                        t, bits = _mag_signed(v)
                        sc.sym(0, (run << 4) | t)
                        sc.bits(bits, t)
                        run = 0
                    # note: if the last nonzero is the final band coeff,
                    # no EOB for this block
            flush_eob()
            scans.append(sc)

            for al in range(ac_al - 1, -1, -1):
                sc = _Scan([(ci + 1, 0)], ss, se, al + 1, al, table_class=1)
                eobrun = 0
                # TWO correction-bit buffers (the jcphuff discipline):
                # bits carried from EOB-covered blocks flush WITH the
                # EOBn symbol; bits collected in the current block flush
                # after each emitted symbol. Conflating them misplaces
                # a carried block's prefix bits before the next symbol.
                br_pending: list[int] = []

                def flush_eob_r(sc=sc):
                    nonlocal eobrun, br_pending
                    if eobrun:
                        n = eobrun.bit_length() - 1
                        sc.sym(0, n << 4)
                        sc.bits(eobrun - (1 << n), n)
                        eobrun = 0
                        for b in br_pending:
                            sc.bits(b, 1)
                        br_pending = []

                for by in range(nby):
                    for bx in range(nbx):
                        zz = grid[by, bx]
                        absvs = [abs(int(zz[k])) >> al
                                 for k in range(ss, se + 1)]
                        newpos = [i for i, a in enumerate(absvs) if a == 1]
                        last_new = newpos[-1] if newpos else -1
                        run = 0
                        br_cur: list[int] = []
                        for i, a in enumerate(absvs):
                            if a == 0:
                                run += 1
                                continue
                            # ZRLs are emitted on REACHING any nonzero
                            # coefficient, but never past the last
                            # newly-significant one (those zeros fold
                            # into the EOB run) — T.81 G.1.2.3
                            while run > 15 and i <= last_new:
                                flush_eob_r()
                                sc.sym(0, 0xF0)
                                run -= 16
                                for b in br_cur:
                                    sc.bits(b, 1)
                                br_cur = []
                            if a > 1:  # history-significant: one bit
                                br_cur.append(a & 1)
                                continue
                            flush_eob_r()
                            sc.sym(0, (run << 4) | 1)
                            sc.bits(1 if int(zz[ss + i]) > 0 else 0, 1)
                            for b in br_cur:
                                sc.bits(b, 1)
                            br_cur = []
                            run = 0
                        if run > 0 or br_cur:
                            eobrun += 1
                            br_pending.extend(br_cur)
                            if eobrun == 0x7FFF:
                                flush_eob_r()
                flush_eob_r()
                scans.append(sc)

    # ---- assemble
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qluma.tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qchroma.tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], qts[ci]])
    out += _seg(0xC2, sof)
    for sc in scans:
        out += sc.emit()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- tests


def test_constant_gray_bit_exact():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(got, img)


def test_progressive_equals_baseline_same_coefficients():
    """Progressive coding is a pure reordering of the same quantized
    coefficients: both streams must decode to IDENTICAL pixels."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 21, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_deep_successive_approximation():
    """Three AC refinement levels + two DC levels — every refinement
    code path (ZRL-with-corrections, EOBn buffered bits) runs."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, dc_al=2, ac_al=3,
                                bands=((1, 2), (3, 20), (21, 63)))
    )
    np.testing.assert_array_equal(prog, base)


def test_grayscale_single_component():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (12, 19), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(img))
    base = decode_jpeg(
        encode_jpeg(np.repeat(img[:, :, None], 3, axis=2))
    )
    # luma of a gray RGB image is the gray value; compare the gray plane
    np.testing.assert_array_equal(got[:, :, 0], base[:, :, 0])


def test_subsampled_420_noninterleaved_geometry():
    """4:2:0 with width 20 makes the luma MCU-padded grid (4 blocks
    wide) strictly larger than the non-interleaved scan grid (3) — the
    AC scans must walk the component grid, not the MCU grid."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample=True))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=True))
    np.testing.assert_array_equal(prog, base)


def test_eobrun_spans_many_blocks():
    """A mostly-flat image makes long EOB runs (EOBn with n > 0) —
    the band-skip bookkeeping must stay aligned across blocks."""
    img = np.full((48, 48, 3), 128, dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # one busy corner block
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_lossy_quant_bounded_error():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    q = np.full(64, 4, dtype=np.int32)
    base = decode_jpeg(encode_jpeg(img, qluma=q, qchroma=q))
    prog = decode_jpeg(encode_jpeg_progressive(img, qluma=q, qchroma=q))
    np.testing.assert_array_equal(prog, base)


@pytest.mark.parametrize(
    "cut",
    [lambda b: b[: len(b) // 2], lambda b: b[: 2 * len(b) // 3]],
)
def test_truncation_raises(cut):
    """Mid-scan truncation must raise, never return a wrong image —
    the crawl contract shared with every other codec."""
    img = np.full((16, 16, 3), 50, dtype=np.uint8)
    rng = np.random.default_rng(2)
    img[4:12, 4:12] = rng.integers(0, 256, (8, 8, 3))
    b = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(cut(bytearray(b))))


def test_malformed_band_rejected():
    """A baseline-shaped scan header (Ss=0, Se=63) inside a progressive
    frame is invalid — the old 'flip SOF0 to SOF2' fuzz case."""
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_progressive_routes_through_spark_image_decoder(spark):
    """Same FFD8 magic, so the sniffing router needs no change — a
    progressive payload must flow through extract_features like any
    baseline JPEG."""
    from spatialpandas_spark.operators.multimodal import extract_features
    from spatialpandas_spark.operators.png import sniff_image

    img = np.full((8, 8, 3), 64, dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    assert sniff_image(payload) == "jpeg"
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = extract_features(df, decoder="image").collect()[0]
    assert row["decode_ok"] == "ok"
    assert row["feature"][:3] == [64.0, 64.0, 64.0]


def test_randomized_scan_configurations():
    """Randomized sweep over scan shapes — image size, subsampling,
    DC/AC successive-approximation depths, and random spectral band
    splits — every configuration must decode identically to baseline
    (the pure-reordering invariant), not just the hand-picked cases."""
    rng = np.random.default_rng(41)
    for trial in range(12):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        sub = bool(rng.integers(0, 2))
        dc_al = int(rng.integers(0, 3))
        ac_al = int(rng.integers(0, 3))
        # random band split points over 1..63
        cuts = sorted(set(rng.integers(2, 63, size=int(rng.integers(0, 3)))))
        edges = [1, *cuts, 64]
        bands = tuple(
            (edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1)
        )
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, subsample=sub, dc_al=dc_al, ac_al=ac_al, bands=bands
            )
        )
        np.testing.assert_array_equal(
            prog, base,
            err_msg=f"trial {trial}: {h}x{w} sub={sub} "
                    f"dc_al={dc_al} ac_al={ac_al} bands={bands}",
        )
