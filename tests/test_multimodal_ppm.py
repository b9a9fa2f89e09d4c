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
