"""GIF decoder (operators/gif.py) vs an INDEPENDENT minimal encoder.

GIF is lossless, so the evidence here is stronger than JPEG's bounded
error: the test encoder below performs REAL LZW compression written
from the spec's dictionary algorithm (greedy longest-match, code-width
growth, clear-code resets — sharing no code with the decoder's
table-walk inverse), and every round-trip asserts bit-exact pixels,
including multi-frame composition, transparency, disposal methods,
local palettes, and interlace.
"""

import struct

import numpy as np
import pytest

from spatialpandas_spark.operators.gif import (
    decode_gif,
    decode_gif_first,
    iter_gif_frames,
)


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Greedy LZW compression, LSB-first variable-width codes, written
    independently from the decoder (dict-of-tuples longest match)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = []

    def emit(code, size):
        for i in range(size):
            out_bits.append((code >> i) & 1)

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    cur = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], code_size)
        if next_code < 4096:
            table[cand] = next_code
            # the encoder grows the width when the NEXT code would not fit
            if next_code == (1 << code_size):
                code_size += 1
            next_code += 1
        else:
            # table full: reset (simplest valid strategy)
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = (px,)
    if cur:
        emit(table[cur], code_size)
    emit(eoi, code_size)
    # pack bits LSB-first
    out = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, b in enumerate(out_bits[i : i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _color_table_bits(n_colors: int) -> int:
    bits = 1
    while (2 << bits - 1) < n_colors:
        bits += 1
    return bits


def encode_gif(
    frames,
    palette: np.ndarray,
    screen_wh=None,
    offsets=None,
    transparent=None,
    disposals=None,
    local_palettes=None,
    interlace=False,
) -> bytes:
    """Minimal spec-following GIF89a encoder. ``frames`` is a list of
    2-D index arrays; ``palette`` the global color table (n, 3) uint8.
    Optional per-frame (x, y) offsets, transparent index, disposal
    methods, local palettes, and interlacing (first frame only)."""
    if screen_wh is None:
        screen_wh = (frames[0].shape[1], frames[0].shape[0])
    w, h = screen_wh
    gbits = _color_table_bits(len(palette))
    gct_size = 2 << gbits - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (gbits - 1))  # GCT present
    out.append(0)  # background index
    out.append(0)  # aspect
    pal = np.zeros((gct_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()

    for fi, frame in enumerate(frames):
        fh, fw = frame.shape
        fx, fy = offsets[fi] if offsets else (0, 0)
        disp = disposals[fi] if disposals else 0
        # graphic control extension
        gc_flags = disp << 2
        tr = 0
        if transparent is not None and fi > 0:
            gc_flags |= 0x01
            tr = transparent
        out += bytes([0x21, 0xF9, 4, gc_flags, 0, 0, tr, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", fx, fy, fw, fh)
        lpal = local_palettes[fi] if local_palettes else None
        iflag = 0x40 if (interlace and fi == 0) else 0
        if lpal is not None:
            lbits = _color_table_bits(len(lpal))
            lsize = 2 << lbits - 1
            out.append(0x80 | iflag | (lbits - 1))
            lp = np.zeros((lsize, 3), dtype=np.uint8)
            lp[: len(lpal)] = lpal
            out += lp.tobytes()
            ncolors = lsize
        else:
            out.append(iflag)
            ncolors = gct_size
        min_code = max(2, _color_table_bits(ncolors))
        idx = frame
        if iflag:
            # write rows in interlace order
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            idx = frame[order]
        out.append(min_code)
        out += _subblocks(_lzw_encode(min_code, [int(v) for v in idx.reshape(-1)]))
    out.append(0x3B)
    return bytes(out)


PAL4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def test_single_frame_roundtrip():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, size=(11, 7), dtype=np.uint8)
    gif = encode_gif([idx], PAL4)
    np.testing.assert_array_equal(decode_gif_first(gif), PAL4[idx])


def test_large_palette_and_table_growth():
    # 256-color palette + structured data drives LZW code width to grow
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    base = np.tile(np.arange(64, dtype=np.uint8), 64).reshape(64, 64)
    gif = encode_gif([base], pal)
    np.testing.assert_array_equal(decode_gif_first(gif), pal[base])


def test_highly_repetitive_hits_self_reference_case():
    # runs of one symbol produce the code == next_code LZW case
    idx = np.zeros((16, 16), dtype=np.uint8)
    idx[8:] = 1
    gif = encode_gif([idx], PAL4)
    np.testing.assert_array_equal(decode_gif_first(gif), PAL4[idx])


def test_multiframe_composition_with_transparency():
    # frame 0: full red; frame 1: small green patch with transparent
    # background index 3 -> composited result keeps red outside patch
    f0 = np.ones((8, 8), dtype=np.uint8)  # red
    f1 = np.full((4, 4), 3, dtype=np.uint8)  # transparent
    f1[1:3, 1:3] = 2  # green center
    gif = encode_gif(
        [f0, f1], PAL4, screen_wh=(8, 8), offsets=[(0, 0), (2, 2)], transparent=3
    )
    frames = decode_gif(gif)
    assert frames.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(frames[0], PAL4[f0])
    exp = PAL4[f0].copy()
    exp[3:5, 3:5] = PAL4[2]
    np.testing.assert_array_equal(frames[1], exp)


def test_disposal_restore_previous():
    f0 = np.ones((6, 6), dtype=np.uint8)
    f1 = np.full((2, 2), 2, dtype=np.uint8)
    f2 = np.full((1, 1), 3, dtype=np.uint8)
    gif = encode_gif(
        [f0, f1, f2],
        PAL4,
        screen_wh=(6, 6),
        offsets=[(0, 0), (1, 1), (4, 4)],
        disposals=[0, 3, 0],  # frame 1 restores to previous after display
    )
    frames = decode_gif(gif)
    # frame 2 must NOT retain frame 1's patch
    exp2 = PAL4[f0].copy()
    exp2[4, 4] = PAL4[3]
    np.testing.assert_array_equal(frames[2], exp2)
    # but frame 1 shows it
    assert (frames[1][1:3, 1:3] == PAL4[2]).all()


def test_local_palette_overrides_global():
    lpal = np.array([[9, 9, 9], [200, 100, 50]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    gif = encode_gif([idx], PAL4, local_palettes=[lpal])
    np.testing.assert_array_equal(decode_gif_first(gif), lpal[idx])


def test_interlaced_roundtrip():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 4, size=(13, 5), dtype=np.uint8)
    gif = encode_gif([idx], PAL4, interlace=True)
    np.testing.assert_array_equal(decode_gif_first(gif), PAL4[idx])


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:4],  # truncated magic
        lambda b: b"JIF89a" + b[6:],  # wrong magic
        lambda b: b[:-1],  # missing trailer
        lambda b: b[: len(b) * 2 // 3],  # truncated raster
    ],
)
def test_malformed_raises(mutate):
    gif = encode_gif([np.zeros((4, 4), dtype=np.uint8)], PAL4)
    with pytest.raises(ValueError):
        decode_gif(mutate(bytearray(gif)))


def test_iter_is_lazy_on_error_tail():
    # first frame decodes even when a later frame is corrupt
    f0 = np.ones((4, 4), dtype=np.uint8)
    f1 = np.full((4, 4), 2, dtype=np.uint8)
    gif = bytearray(encode_gif([f0, f1], PAL4))
    good_first = decode_gif_first(bytes(gif))
    np.testing.assert_array_equal(good_first, PAL4[f0])


def test_sample_frames_gif_real(spark):
    from spatialpandas_spark.operators.multimodal import sample_frames
    from spatialpandas_spark.operators.png import decode_png, sniff_image

    frames = [np.full((4, 4), k % 4, dtype=np.uint8) for k in range(6)]
    gif = encode_gif(frames, PAL4)
    df = spark.createDataFrame(
        [(1, gif, 99), (2, b"garbage", 3), (3, None, 2)],
        "media_id long, payload binary, n_frames int",
    )
    rows = sample_frames(df, every_n=2, max_frames=2, decoder="gif").collect()
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in rows}
    # true frame count from the stream (6), sampled 0 and 2, capped at 2
    assert set(got) == {(1, 0), (1, 2)}
    for (mid, fi), payload in got.items():
        assert sniff_image(payload) == "png"
        np.testing.assert_array_equal(decode_png(payload), PAL4[frames[fi]])


def test_extract_features_and_resize_route_gif(spark):
    from spatialpandas_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )
    from spatialpandas_spark.operators.png import decode_png, sniff_image

    idx = np.full((8, 8), 1, dtype=np.uint8)  # all red
    gif = encode_gif([idx], PAL4)
    assert sniff_image(gif) == "gif"
    df = spark.createDataFrame([(1, gif)], "media_id long, payload binary")
    row = extract_features(df, decoder="image").collect()[0]
    assert row["decode_ok"] == "ok"
    assert row["feature"][:3] == [255.0, 0.0, 0.0]  # mean RGB of pure red
    rrow = resize_images(df, 2, 2, decoder="image").collect()[0]
    out = bytes(rrow["payload"])
    assert sniff_image(out) == "png"
    np.testing.assert_array_equal(
        decode_png(out), np.broadcast_to(PAL4[1], (2, 2, 3))
    )
