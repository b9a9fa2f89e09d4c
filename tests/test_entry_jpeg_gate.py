"""Pins the media gate's embedded constant-gray JPEG payloads
(__spark_entry__._JPEG_GATE_HEX) to the repo's own spec-written
encoders, so the hex blobs cannot drift from the code that defines
their expected decode: k < 4 must be the baseline (SOF0) encoding and
k >= 4 the progressive (SOF2) encoding of an 8x8 constant image at
_JPEG_GATE_VALUES[k], and every payload must decode bit-exactly."""

import numpy as np

import __spark_entry__ as entrymod
from tests.test_jpeg_progressive import encode_jpeg_progressive
from tests.test_multimodal_jpeg import encode_jpeg


def test_jpeg_gate_hex_matches_encoders():
    assert len(entrymod._JPEG_GATE_HEX) == 8
    for k, (v, h) in enumerate(
        zip(entrymod._JPEG_GATE_VALUES, entrymod._JPEG_GATE_HEX)
    ):
        img = np.full((8, 8, 3), v, np.uint8)
        enc = encode_jpeg(img) if k < 4 else encode_jpeg_progressive(img)
        assert h == enc.hex().upper(), k


def test_jpeg_gate_payloads_decode_bit_exact():
    from spatialpandas_spark.operators.jpeg import decode_jpeg

    for k, (v, h) in enumerate(
        zip(entrymod._JPEG_GATE_VALUES, entrymod._JPEG_GATE_HEX)
    ):
        got = decode_jpeg(bytes.fromhex(h))
        assert got.shape == (8, 8, 3)
        assert (got == v).all(), k
        # both fgt branches represented across the value table
    vals = entrymod._JPEG_GATE_VALUES
    assert any(v > 64 for v in vals) and any(v <= 64 for v in vals)


def test_jpeg_gate_marker_mix():
    # k<4 baseline (SOF0 = FFC0), k>=4 progressive (SOF2 = FFC2)
    for k, h in enumerate(entrymod._JPEG_GATE_HEX):
        b = bytes.fromhex(h)
        assert (b"\xff\xc0" in b) == (k < 4), k
        assert (b"\xff\xc2" in b) == (k >= 4), k
