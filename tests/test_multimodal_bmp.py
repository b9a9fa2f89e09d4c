"""BMP decoder (operators/bmp.py): hand-assembled containers as the
independent oracle (the format has no entropy coding, so byte-level
construction from the public layout IS the reference), plus round-trip
via the package encoder and the fuzz contract."""

import struct

import numpy as np
import pytest

from spatialpandas_spark.operators.bmp import decode_bmp, encode_bmp
from spatialpandas_spark.operators.png import sniff_image


def _bmp24(img, top_down=False):
    """Independent 24-bit builder straight from the spec layout."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    ordered = img if top_down else img[::-1]
    rows[:, : w * 3] = ordered[:, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    hh = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + info + pix


def test_24bit_bottom_up_and_top_down():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(_bmp24(img)), img)
    np.testing.assert_array_equal(decode_bmp(_bmp24(img, top_down=True)), img)


def test_row_padding_widths():
    rng = np.random.default_rng(1)
    for w in (1, 2, 3, 4, 5):  # exercise every padding remainder
        img = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(_bmp24(img)), img)


def test_roundtrip_package_encoder():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(7, 6, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    assert sniff_image(payload) == "bmp"
    np.testing.assert_array_equal(decode_bmp(payload), img)


def test_8bit_palette():
    pal_rgb = np.array([[250, 10, 20], [0, 200, 0]], dtype=np.uint8)
    idx = np.array([[0, 1, 0], [1, 1, 0]], dtype=np.uint8)
    h, w = idx.shape
    pal = np.zeros((2, 4), dtype=np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]  # stored BGRX
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = idx[::-1]
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 0, 0, 2, 0)
    off = 54 + 8
    data = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off) + info
    data += pal.tobytes() + pix
    np.testing.assert_array_equal(decode_bmp(data), pal_rgb[idx])


def test_32bit_alpha_composites():
    h, w = 1, 2
    px = np.array(
        [[[10, 20, 200, 255], [10, 20, 200, 0]]], dtype=np.uint8
    )  # BGRA rows
    rows = px.reshape(h, w * 4)
    pix = rows[::-1].tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(pix), 0, 0, 0, 0)
    data = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + info + pix
    out = decode_bmp(data)
    np.testing.assert_array_equal(out[0, 0], [200, 20, 10])  # RGB, opaque
    np.testing.assert_array_equal(out[0, 1], [0, 0, 0])  # transparent -> black


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],
        lambda b: b"XX" + b[2:],
        lambda b: b[:-8],
    ],
)
def test_malformed_raises(mutate):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_bmp(mutate(bytearray(encode_bmp(img))))


def test_rle_rejected():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(img))
    struct.pack_into("<I", b, 30, 1)  # compression = BI_RLE8
    with pytest.raises(ValueError, match="compressed BMP"):
        decode_bmp(bytes(b))


def test_image_path_routes_bmp(spark):
    from spatialpandas_spark.operators.multimodal import (
        decode_image,
        extract_features,
        resize_images,
    )

    img = np.full((8, 8, 3), 64, dtype=np.uint8)
    payload = encode_bmp(img)
    np.testing.assert_array_equal(decode_image(payload), img)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = extract_features(df, decoder="image").collect()[0]
    assert row["decode_ok"] == "ok"
    assert row["feature"][:3] == [64.0, 64.0, 64.0]
    rrow = resize_images(df, 2, 2, decoder="image").collect()[0]
    out = bytes(rrow["payload"])
    assert sniff_image(out) == "bmp"  # BMP round-trips in its own format
    np.testing.assert_array_equal(
        decode_bmp(out), np.full((2, 2, 3), 64, dtype=np.uint8)
    )
