"""MJPEG-in-AVI container: parser vs an INDEPENDENT spec-layout
assembler (the WARC/zip/tar oracle discipline — the assembler below is
hand-built from the RIFF/AVI spec, deliberately NOT sharing code or
construction order with operators/avi.py's encoder: it interleaves a
JUNK chunk, omits idx1, and pads odd chunks), the production encoder's
layout checked field-by-field with raw struct reads, and the Spark
sample_frames path against a python twin."""

import struct
import sys

import numpy as np
import pytest

from spatialpandas_spark.operators.avi import (
    avi_metadata,
    encode_avi_mjpeg,
    iter_avi_frames,
    parse_avi,
)

sys.path.insert(0, "tests")
from test_multimodal_jpeg import encode_jpeg  # noqa: E402


def _chunk(fcc, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return fcc + struct.pack("<I", len(payload)) + payload + pad


def assemble_avi(frames, w, h, fps, with_movi=True, junk=True):
    """Independent spec-layout assembler (NOT the production encoder):
    avih + strl built field-by-field from the MS RIFF docs, a JUNK
    chunk between hdrl and movi (readers must skip unknown chunks),
    and no idx1 (the index is optional in AVI 1.0)."""
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    body = hdrl
    if junk:
        body += _chunk(b"JUNK", b"\x00" * 13)  # odd size: pad exercised
    if with_movi:
        movi = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
        body += _chunk(b"LIST", movi)
    return _chunk(b"RIFF", b"AVI " + body)


def _frames(n=5, size=8):
    rng = np.random.default_rng(42)
    imgs = [
        np.full((size, size, 3), 32 * i + 8, dtype=np.uint8) for i in range(n)
    ]
    return imgs, [encode_jpeg(im) for im in imgs]


def test_parse_independent_assembler():
    imgs, jpegs = _frames(5)
    # make one frame odd-length so the even-padding path runs
    jpegs[2] = jpegs[2] + b"" if len(jpegs[2]) % 2 else jpegs[2] + b"\xff\xd9"
    data = assemble_avi(jpegs, 8, 8, fps=4)
    meta = parse_avi(data)
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["total_frames"] == 5 and meta["n_streams"] == 1
    assert meta["fps"] == 4.0 and meta["handler"] == "MJPG"
    got = list(iter_avi_frames(data))
    assert got == jpegs  # exact payload slices, padding excluded


def test_sampled_frames_decode_to_original_pixels():
    from spatialpandas_spark.operators.jpeg import decode_jpeg

    imgs, jpegs = _frames(3)
    data = assemble_avi(jpegs, 8, 8, fps=2)
    for frame, img in zip(iter_avi_frames(data), imgs):
        # constant-value frames decode bit-exactly (DC-only blocks)
        assert np.array_equal(decode_jpeg(frame), img)


def test_header_only_probe_without_movi():
    _, jpegs = _frames(2)
    data = assemble_avi(jpegs, 8, 8, fps=2, with_movi=False)
    meta = avi_metadata(data)
    assert meta["total_frames"] == 2 and meta["width"] == 8
    assert parse_avi(data)["frames"] == []


def test_production_encoder_spec_layout_raw_struct_reads():
    """encode_avi_mjpeg checked with raw struct reads, not parse_avi:
    RIFF framing, avih fields, strh scale/rate, 00dc chunk ids, and
    idx1 entry offsets pointing at the actual frame chunks."""
    _, jpegs = _frames(4)
    data = encode_avi_mjpeg(jpegs, 8, 8, fps=5)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    # hdrl LIST comes first
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    avih_pos = data.index(b"avih")
    a = struct.unpack_from("<14I", data, avih_pos + 8)
    assert a[0] == 200_000          # usec/frame at 5 fps
    assert a[4] == 4 and a[6] == 1  # total frames, streams
    assert a[8] == 8 and a[9] == 8  # width, height
    strh_pos = data.index(b"strh")
    assert data[strh_pos + 8 : strh_pos + 16] == b"vidsMJPG"
    scale, rate = struct.unpack_from("<II", data, strh_pos + 8 + 20)
    assert (scale, rate) == (1, 5)
    # idx1 entries resolve to the movi frame chunks
    movi_pos = data.index(b"movi")
    idx_pos = data.index(b"idx1")
    n_idx = struct.unpack_from("<I", data, idx_pos + 4)[0] // 16
    assert n_idx == 4
    for i in range(n_idx):
        e = idx_pos + 8 + 16 * i
        assert data[e : e + 4] == b"00dc"
        _, off, ln = struct.unpack_from("<III", data, e + 4)
        cpos = movi_pos + off
        assert data[cpos : cpos + 4] == b"00dc"
        assert struct.unpack_from("<I", data, cpos + 4)[0] == ln
        assert data[cpos + 8 : cpos + 8 + ln] == jpegs[i]


def test_encoder_parser_roundtrip():
    _, jpegs = _frames(6)
    data = encode_avi_mjpeg(jpegs, 8, 8, fps=3)
    assert list(iter_avi_frames(data)) == jpegs
    m = avi_metadata(data)
    assert m["total_frames"] == 6 and m["fps"] == 3.0


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_avi_mjpeg([b"not a jpeg"], 8, 8)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8, fps=0)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 0, 8)


def test_malformed_containers_raise_valueerror():
    _, jpegs = _frames(2)
    good = assemble_avi(jpegs, 8, 8, fps=2)
    for bad in (
        b"",
        b"RIFF",
        b"RIFF\x10\x00\x00\x00WAVE",              # wrong form type
        good[:40],                                  # truncated in hdrl
        good[:12] + good[20:],                      # hdrl header torn off
    ):
        with pytest.raises(ValueError):
            parse_avi(bad)
    # declared chunk size overrunning the container must raise, not hang
    overrun = bytearray(good)
    overrun[16:20] = struct.pack("<I", 2**30)
    with pytest.raises(ValueError):
        parse_avi(bytes(overrun))


def test_sample_frames_avi_spark_matches_twin(spark):
    from spatialpandas_spark.operators.multimodal import sample_frames

    _, jpegs = _frames(7)
    good1 = assemble_avi(jpegs, 8, 8, fps=4)
    good2 = encode_avi_mjpeg(jpegs[:3], 8, 8, fps=2)
    rows = [
        (1, bytearray(good1), 7),
        (2, bytearray(good2), 3),
        (3, bytearray(b"RIFF garbage not avi"), 5),   # skipped
        (4, None, 2),                                  # null payload
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, n_frames int"
    )
    out = sample_frames(
        df, every_n=2, max_frames=3, decoder="avi"
    ).collect()
    got = sorted((r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in out)
    want = sorted(
        [(1, 0, jpegs[0]), (1, 2, jpegs[2]), (1, 4, jpegs[4]),
         (2, 0, jpegs[0]), (2, 2, jpegs[2])]
    )
    assert got == want


def test_probe_media_metadata_avi_row(spark):
    from spatialpandas_spark.operators.multimodal import (
        probe_media_metadata,
    )

    _, jpegs = _frames(3)
    header_only = assemble_avi(jpegs, 8, 8, fps=6, with_movi=False)
    df = spark.createDataFrame(
        [(1, bytearray(header_only))], "media_id long, payload binary"
    )
    r = probe_media_metadata(df).collect()[0]
    assert r["format"] == "avi" and r["probe_ok"] == "ok"
    assert (r["width"], r["height"]) == (8, 8)
    assert r["sample_rate"] == 6          # fps slot
    assert r["n_channels"] == 1           # stream count slot
    assert r["n_samples"] == 3            # total frames slot


# --- uncompressed DIB variant (round 12, second session) --------------

def test_dib_roundtrip_bit_exact():
    """encode_avi_dib -> decode_avi_frames is bit-exact (no codec in
    the path), including a width whose 3-byte rows need 4-byte pad."""
    from spatialpandas_spark.operators.avi import (
        decode_avi_frames,
        encode_avi_dib,
    )

    rng = np.random.default_rng(7)
    # w=5: row = 15 bytes -> padded to 16, exercising the stride path
    frames = [
        rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
        for _ in range(3)
    ]
    data = encode_avi_dib(frames, fps=6)
    meta = avi_metadata(data)
    assert meta["handler"] == "DIB" and meta["compression"] == ""
    assert meta["bit_count"] == 24 and meta["total_frames"] == 3
    got = list(decode_avi_frames(data))
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_decode_avi_frames_mjpeg_path():
    imgs, jpegs = _frames(3)
    from spatialpandas_spark.operators.avi import decode_avi_frames

    data = encode_avi_mjpeg(jpegs, 8, 8, fps=2)
    got = list(decode_avi_frames(data))
    for a, b in zip(imgs, got):
        assert np.array_equal(a, b)


def test_decode_avi_frames_rejects_unknown_codec():
    """The honest-gating rule: an h264 (or any unknown) fourcc raises
    with a clear message instead of emitting garbage."""
    from spatialpandas_spark.operators.avi import decode_avi_frames

    _, jpegs = _frames(1)
    data = bytearray(encode_avi_mjpeg(jpegs, 8, 8, fps=2))
    # rewrite both the strh handler and strf biCompression to H264
    pos = data.index(b"vidsMJPG")
    data[pos + 4 : pos + 8] = b"H264"
    strf_comp = data.index(b"MJPG", pos + 8)
    data[strf_comp : strf_comp + 4] = b"H264"
    with pytest.raises(ValueError, match="honestly gated"):
        list(decode_avi_frames(bytes(data)))


def test_encode_avi_dib_rejects_bad_input():
    from spatialpandas_spark.operators.avi import encode_avi_dib

    with pytest.raises(ValueError):
        encode_avi_dib([], fps=5)
    with pytest.raises(ValueError):
        encode_avi_dib([np.zeros((4, 4, 3), np.uint8)], fps=0)
    with pytest.raises(ValueError):
        encode_avi_dib(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
        )


# --- full video-column path (round 13, VERDICT r12 ask #5) ------------

def test_extract_features_avi_pools_all_frames(spark):
    """decoder='avi' = container walk -> frame slices -> JPEG decode ->
    pooled per-channel statistics, closed-form on two constant frames:
    mean (v1+v2)/2, min/max least/greatest, fgt the indicator average.
    A DIB container flows through the same kernel (codec dispatch), a
    non-AVI payload becomes a tagged error row, not a job failure."""
    from spatialpandas_spark.operators.avi import encode_avi_dib
    from spatialpandas_spark.operators.multimodal import extract_features

    v1, v2 = 40, 200
    jpegs = [
        encode_jpeg(np.full((8, 8, 3), v, dtype=np.uint8)) for v in (v1, v2)
    ]
    mj = encode_avi_mjpeg(jpegs, 8, 8, fps=5)
    dib = encode_avi_dib(
        [np.full((4, 4, 3), v, dtype=np.uint8) for v in (v1, v2)], fps=5
    )
    df = spark.createDataFrame(
        [(1, bytearray(mj)), (2, bytearray(dib)), (3, b"not avi")],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_features(df, decoder="avi").collect()
    }
    for mid in (1, 2):
        r = rows[mid]
        assert r["decode_ok"] == "ok"
        f = r["feature"]
        assert f[0] == f[1] == f[2] == (v1 + v2) / 2  # pooled mean
        assert f[3] == v1 and f[6] == v2              # min, max
        assert f[9] == 0.5                            # one frame > 64
    assert rows[3]["feature"] is None
    assert rows[3]["decode_ok"].startswith("error")


def test_media_features_routes_riff_avi_vs_wave():
    """The 'media' sniffing kernel must split RIFF by form type: AVI
    containers go to the video kernel, WAVE stays audio."""
    from spatialpandas_spark.operators.multimodal import _media_features

    frame = encode_jpeg(np.full((8, 8, 3), 100, dtype=np.uint8))
    data = encode_avi_mjpeg([frame], 8, 8, fps=5)
    f = _media_features(data)
    assert f[0] == 100.0 and f[3] == 100.0


# --- ADVICE r12 closeout (round 13) -----------------------------------

def test_fractional_fps_probe_rounds_not_truncates(spark):
    """ADVICE r12: a 30000/1001 (29.97) stream must probe as 30, not a
    truncated 29 — the sample_rate slot is nearest-int fps."""
    from spatialpandas_spark.operators.multimodal import (
        probe_media_metadata,
    )

    _, jpegs = _frames(2)
    data = bytearray(assemble_avi(jpegs, 8, 8, fps=30))
    strh_pos = data.index(b"strh")
    # strh payload: scale @+20, rate @+24 (payload starts at +8)
    struct.pack_into("<II", data, strh_pos + 8 + 20, 1001, 30000)
    meta = parse_avi(bytes(data))
    assert abs(meta["fps"] - 29.97) < 0.01
    df = spark.createDataFrame(
        [(1, bytes(data))], "media_id long, payload binary"
    )
    r = probe_media_metadata(df).collect()[0]
    assert r["sample_rate"] == 30


def test_strf_dims_fallback_when_avih_zero():
    """ADVICE r12: files with zero avih dims must fall back to the strf
    BITMAPINFOHEADER dims instead of reporting 0x0."""
    _, jpegs = _frames(2)
    data = bytearray(assemble_avi(jpegs, 8, 8, fps=4))
    avih_pos = data.index(b"avih")
    struct.pack_into("<II", data, avih_pos + 8 + 32, 0, 0)  # w, h -> 0
    meta = parse_avi(bytes(data))
    assert (meta["width"], meta["height"]) == (8, 8)  # from strf
    assert meta["top_down"] is False


def test_strf_avih_dim_disagreement_raises():
    _, jpegs = _frames(1)
    data = bytearray(assemble_avi(jpegs, 8, 8, fps=4))
    strf_pos = data.index(b"strf")
    struct.pack_into("<i", data, strf_pos + 8 + 4, 9)  # biWidth -> 9
    with pytest.raises(ValueError, match="disagree"):
        parse_avi(bytes(data))


def test_mjpeg_macroblock_aligned_strf_dims_tolerated():
    """ADVICE r13: real-world MJPEG encoders write macroblock-aligned
    (rounded-up-to-16) strf dims while avih carries the display size.
    Such files must parse (avih wins as display dims, warning field
    set), not raise — but a NON-aligned disagreement still raises."""
    _, jpegs = _frames(2, size=8)
    data = bytearray(assemble_avi(jpegs, 10, 10, fps=4))
    strf_pos = data.index(b"strf")
    # strf coded dims = 16x16 (10 rounded up to the macroblock)
    struct.pack_into("<ii", data, strf_pos + 8 + 4, 16, 16)
    meta = parse_avi(bytes(data))
    assert (meta["width"], meta["height"]) == (10, 10)  # display dims
    assert "macroblock-aligned" in meta["dims_warning"]
    # the probe path stays graceful too
    assert avi_metadata(bytes(data))["width"] == 10
    # 32x32 over 10x10 is NOT a rounding — still a hard error
    struct.pack_into("<ii", data, strf_pos + 8 + 4, 32, 32)
    with pytest.raises(ValueError, match="disagree"):
        parse_avi(bytes(data))


def test_top_down_dib_decodes_unflipped():
    """ADVICE r12: negative strf biHeight = top-down row order. The
    decoder must NOT vertically flip such frames. Encode bottom-up,
    then flag the container top-down: decoded rows come back in stored
    (bottom-up) order = the vertical mirror of the original."""
    from spatialpandas_spark.operators.avi import (
        decode_avi_frames,
        encode_avi_dib,
    )

    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_avi_dib([frame], fps=5))
    strf_pos = data.index(b"strf")
    struct.pack_into("<i", data, strf_pos + 8 + 8, -4)  # biHeight -> -4
    meta = parse_avi(bytes(data))
    assert meta["top_down"] is True
    assert (meta["width"], meta["height"]) == (4, 4)  # abs(-4) cross-checks
    (got,) = list(decode_avi_frames(bytes(data)))
    assert np.array_equal(got, frame[::-1])  # stored rows, unflipped
    # and the unmodified file still round-trips exactly
    (orig,) = list(decode_avi_frames(encode_avi_dib([frame], fps=5)))
    assert np.array_equal(orig, frame)


def test_encode_avi_mjpeg_rejects_empty_frames():
    """ADVICE r12: both encoders share the 'need at least one frame'
    contract (mjpeg previously emitted a zero-frame container)."""
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], 8, 8, fps=5)


def test_dib_truncated_frame_raises():
    from spatialpandas_spark.operators.avi import (
        decode_avi_frames,
        encode_avi_dib,
    )

    data = bytearray(
        encode_avi_dib([np.zeros((4, 4, 3), np.uint8)], fps=5)
    )
    # shrink the declared size of the 00db chunk below stride*h
    pos = data.index(b"00db")
    import struct as _s

    _s.pack_into("<I", data, pos + 4, 8)
    with pytest.raises(ValueError, match="shorter than stride"):
        list(decode_avi_frames(bytes(data)))
