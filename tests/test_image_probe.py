"""Header-only image metadata probe (multimodal.image_dimensions /
probe_image_metadata) vs the repo's real encoders: the probe must
report the exact dimensions the full decoder would, for every format —
including progressive JPEG — while reading only the header."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.multimodal import (
    encode_ppm,
    image_dimensions,
    probe_image_metadata,
)


def _payloads():
    from spatialpandas_spark.operators.bmp import encode_bmp
    from spatialpandas_spark.operators.png import encode_png

    import sys
    sys.path.insert(0, ".")
    from tests.test_jpeg_progressive import encode_jpeg_progressive
    from tests.test_multimodal_gif import encode_gif
    from tests.test_multimodal_jpeg import encode_jpeg

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (17, 29)).astype(np.uint8)
    return {
        "png": encode_png(img),
        "bmp": encode_bmp(img),
        "ppm": encode_ppm(img),
        "jpeg": encode_jpeg(img),
        "jpeg_progressive": encode_jpeg_progressive(img),
        "gif": encode_gif([idx], pal),
    }


def test_dimensions_match_encoders():
    for name, payload in _payloads().items():
        kind, w, h = image_dimensions(payload)
        assert (w, h) == (29, 17), name
        assert kind == ("jpeg" if name.startswith("jpeg") else name)


def test_probe_reads_header_only():
    """Truncating everything past the header must not matter."""
    for name, payload in _payloads().items():
        cut = payload[: max(64, len(payload) // 10)]
        kind, w, h = image_dimensions(cut)
        assert (w, h) == (29, 17), name


def test_malformed_raises():
    with pytest.raises(ValueError):
        image_dimensions(b"not an image at all")
    with pytest.raises(ValueError):
        image_dimensions(b"\x89PNG\r\n\x1a\n\x00")  # truncated IHDR
    with pytest.raises(ValueError):
        image_dimensions(b"\xff\xd8\xff\xd9")  # JPEG with no frame


def test_spark_probe_and_size_gating(spark):
    pls = _payloads()
    rows = [(i, p) for i, p in enumerate(pls.values())]
    rows += [(90, b"garbage"), (91, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in probe_image_metadata(df).collect()}
    for i, name in enumerate(pls):
        assert got[i]["probe_ok"] == "ok"
        assert (got[i]["width"], got[i]["height"]) == (29, 17)
        assert got[i]["n_bytes"] == len(list(pls.values())[i])
    assert got[90]["probe_ok"].startswith("error")
    assert got[91]["probe_ok"] == "error: null input"
    # the curation shape: size gate BEFORE decode
    kept = probe_image_metadata(df).filter(
        (F.col("probe_ok") == "ok") & (F.col("width") >= 20)
    )
    assert kept.count() == len(pls)


def test_media_probe_mixes_audio_and_images(spark):
    import struct as _s

    from spatialpandas_spark.operators.multimodal import probe_media_metadata

    # 16-bit stereo 8kHz WAV, 100 frames
    raw = b"\x00\x00" * 200
    fmt = _s.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVEfmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(raw)) + raw)
    wav = b"RIFF" + _s.pack("<I", len(body)) + body
    png = list(_payloads().values())[0]
    df = spark.createDataFrame(
        [(1, wav), (2, png), (3, b"junk")], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in probe_media_metadata(df).collect()}
    assert got[1]["format"] == "wav" and got[1]["probe_ok"] == "ok"
    assert (got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_samples"]) == (8000, 2, 100)
    assert got[2]["format"] == "png" and (got[2]["width"], got[2]["height"]) == (29, 17)
    assert got[3]["probe_ok"].startswith("error")
