"""Real-pixel multimodal decode: pure-numpy binary-PPM (P6) decoder and
the Arrow-batched extract_features path over it (no codec libraries —
ref analog: spatialpandas has no media surface, this is beyond-reference
pipeline tooling)."""

import numpy as np
import pytest

from spatialpandas_spark.operators.multimodal import (
    decode_ppm,
    extract_features,
)


def _ppm_bytes(img: np.ndarray, maxval: int = 255, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    hdr = f"P6\n{w} {h}\n{maxval}\n"
    if comment:
        hdr = f"P6\n# a comment\n{w}   {h}\n{maxval}\n"
    return hdr.encode() + img.astype(np.uint8).tobytes()


def test_decode_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    out = decode_ppm(_ppm_bytes(img))
    np.testing.assert_array_equal(out, img)


def test_decode_ppm_header_grammar():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = decode_ppm(_ppm_bytes(img, comment=True))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n2 2\n255\n" + b"\x00" * 12,  # wrong magic (PGM)
        b"P6\n2 2\n255\n" + b"\x00" * 5,  # truncated raster
        b"P6\n2 2\n70000\n" + b"\x00" * 12,  # 16-bit maxval
        b"P6",  # truncated header
    ],
)
def test_decode_ppm_malformed(payload):
    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_extract_features_ppm_real_pixels(spark):
    # one all-64 image and one ramp image: closed-form expected stats
    flat = np.full((2, 2, 3), 64, dtype=np.uint8)
    ramp = np.arange(12, dtype=np.uint8).reshape(2, 2, 3) * 10
    rows = [(1, _ppm_bytes(flat)), (2, _ppm_bytes(ramp)), (3, b"garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r
        for r in extract_features(df, decoder="ppm").collect()
    }
    assert got[1]["decode_ok"] == "ok"
    f1 = got[1]["feature"]
    assert f1[:3] == [64.0, 64.0, 64.0]  # means
    assert f1[9:12] == [0.0, 0.0, 0.0]  # nothing > 64
    f2 = got[2]["feature"]
    # ramp channels: R=[0,30,60,90] G=[10,40,70,100] B=[20,50,80,110]
    assert f2[0] == 45.0 and f2[1] == 55.0 and f2[2] == 65.0
    assert f2[3] == 0.0 and f2[6] == 90.0
    assert f2[9] == 0.25 and f2[11] == 0.5
    assert got[3]["feature"] is None
    assert got[3]["decode_ok"].startswith("error")


def test_extract_features_unknown_decoder_raises(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        extract_features(df, decoder="pillow")


# ---------- round-4: real resize + frame sampling over PPM ----------


def test_resize_rgb_nearest_closed_form():
    from spatialpandas_spark.operators.multimodal import resize_rgb

    # 2x2 distinct colors -> 4x4 nearest = 2x2 blocks of each color
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
        dtype=np.uint8,
    )
    up = resize_rgb(img, 4, 4, method="nearest")
    for (by, bx), col in [
        ((0, 0), [255, 0, 0]),
        ((0, 1), [0, 255, 0]),
        ((1, 0), [0, 0, 255]),
        ((1, 1), [255, 255, 0]),
    ]:
        block = up[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2]
        assert (block == np.array(col, dtype=np.uint8)).all(), (by, bx)
    # downscale 4x4 -> 2x2 returns the original colors (centers hit blocks)
    np.testing.assert_array_equal(resize_rgb(up, 2, 2, method="nearest"), img)


def test_resize_rgb_bilinear_closed_form():
    from spatialpandas_spark.operators.multimodal import resize_rgb

    # constant image stays exactly constant
    const = np.full((3, 5, 3), 77, dtype=np.uint8)
    assert (resize_rgb(const, 7, 2, method="bilinear") == 77).all()
    # 1x2 [a, b] -> 1x4 with half-pixel-center weights:
    # sx = (dx+0.5)/2 - 0.5 clipped -> 0, 0.25, 0.75, 1
    a, b = 0, 255
    img = np.array([[[a] * 3, [b] * 3]], dtype=np.uint8)
    out = resize_rgb(img, 4, 1, method="bilinear")
    expect = [
        a,
        round(0.75 * a + 0.25 * b),  # 63.75 -> 64
        round(0.25 * a + 0.75 * b),  # 191.25 -> 191
        b,
    ]
    np.testing.assert_array_equal(out[0, :, 0], np.array(expect, dtype=np.uint8))


def test_resize_images_ppm_real_pixels(spark):
    from spatialpandas_spark.operators.multimodal import (
        decode_ppm,
        resize_images,
    )

    img1 = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
        dtype=np.uint8,
    )
    img2 = np.full((3, 3, 3), 10, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, _ppm_bytes(img1)),
            (2, _ppm_bytes(img2)),
            (3, b"not a ppm"),
            (4, None),
        ],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(df, 4, 4, decoder="ppm", method="nearest").collect()
    }
    out1 = decode_ppm(bytes(rows[1]["payload"]))
    assert out1.shape == (4, 4, 3)
    # nearest 2x2 -> 4x4 blocks
    assert (out1[0:2, 0:2] == [255, 0, 0]).all()
    assert (out1[2:4, 2:4] == [255, 255, 0]).all()
    assert (decode_ppm(bytes(rows[2]["payload"])) == 10).all()
    assert rows[3]["payload"] is None  # undecodable -> null, not a crash
    assert rows[4]["payload"] is None
    assert rows[1]["width"] == rows[1]["height"] == 4


def test_sample_frames_ppm_stream(spark):
    from spatialpandas_spark.operators.multimodal import (
        decode_ppm,
        sample_frames,
    )

    # 5-frame stream of distinct constant colors; n_frames column LIES
    # (99) to prove the ppm decoder derives the true count from the bytes
    frames = [np.full((2, 2, 3), 10 * i, dtype=np.uint8) for i in range(5)]
    stream = b"".join(_ppm_bytes(f) for f in frames)
    df = spark.createDataFrame(
        [(1, stream, 99), (2, b"P6 garbage", 99), (3, None, 5)],
        "media_id long, payload binary, n_frames int",
    )
    out = sample_frames(df, every_n=2, max_frames=2, decoder="ppm").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    assert sorted(by_id[1]) == [0, 2]  # every 2nd frame, capped at 2
    np.testing.assert_array_equal(decode_ppm(by_id[1][0]), frames[0])
    np.testing.assert_array_equal(decode_ppm(by_id[1][2]), frames[2])
    assert 2 not in by_id  # malformed stream skipped
    assert 3 not in by_id  # null payload skipped


def test_sample_frames_ppm_takes_first_frames_when_every_n_1(spark):
    from spatialpandas_spark.operators.multimodal import sample_frames

    frames = [np.full((1, 1, 3), i, dtype=np.uint8) for i in range(6)]
    stream = b"".join(_ppm_bytes(f) for f in frames)
    df = spark.createDataFrame(
        [(1, stream, None)], "media_id long, payload binary, n_frames int"
    )
    out = sample_frames(df, every_n=1, max_frames=4, decoder="ppm").collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 1, 2, 3]
