"""Adversarial-input hardening for the codec layer: crawl payloads are
hostile, so every decoder must either return a valid array or raise
``ValueError`` — never crash with an unrelated exception, hang, or
return garbage shapes. Three fuzz families per codec: pure random
bytes, random bytes behind a valid magic, and random single-byte
mutations of a valid file (the bit-rot case)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialpandas_spark.operators.avi import parse_avi
from spatialpandas_spark.operators.bmp import decode_bmp
from spatialpandas_spark.operators.gif import decode_gif
from spatialpandas_spark.operators.jpeg import decode_jpeg
from spatialpandas_spark.operators.multimodal import decode_ppm, decode_wav
from spatialpandas_spark.operators.png import _PNG_MAGIC, decode_png

DECODERS = {
    "png": (decode_png, _PNG_MAGIC),
    "jpeg": (decode_jpeg, b"\xff\xd8"),
    "gif": (decode_gif, b"GIF89a"),
    "ppm": (decode_ppm, b"P6\n"),
    "wav": (decode_wav, b"RIFF"),
    "bmp": (decode_bmp, b"BM"),
    "avi": (parse_avi, b"RIFF"),  # 8th format (r12; flac fuzz lives
                                  # in test_multimodal_flac.py)
}


def _check(decoder, payload):
    try:
        out = decoder(payload)
    except ValueError:
        return  # the contract: malformed -> ValueError
    # if it decoded, the result must be structurally sane
    if isinstance(out, tuple):  # wav returns (samples, rate)
        arr, rate = out
        assert isinstance(rate, int) and rate >= 0
        assert arr.ndim == 2
    elif isinstance(out, dict):  # avi returns container metadata
        assert {"width", "height", "total_frames", "frames"} <= set(out)
        assert all(
            0 <= s <= e <= len(payload) for s, e in out["frames"]
        )
    else:
        arr = np.asarray(out)
        assert arr.dtype == np.uint8
        assert arr.shape[-1] == 3


@pytest.mark.parametrize("name", sorted(DECODERS))
@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=300), seed=st.integers(0, 2**32 - 1))
def test_random_bytes_never_crash(name, data, seed):
    decoder, magic = DECODERS[name]
    _check(decoder, data)
    _check(decoder, magic + data)  # valid magic, garbage body


def _valid_payloads():
    import struct
    import sys

    sys.path.insert(0, "tests")
    from test_multimodal_gif import PAL4, encode_gif
    from test_multimodal_jpeg import encode_jpeg

    from spatialpandas_spark.operators.bmp import encode_bmp
    from spatialpandas_spark.operators.multimodal import encode_ppm, encode_wav
    from spatialpandas_spark.operators.png import encode_png

    from spatialpandas_spark.operators.avi import encode_avi_mjpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    return {
        "png": encode_png(img),
        "jpeg": encode_jpeg(img),
        "gif": encode_gif([rng.integers(0, 4, size=(8, 8), dtype=np.uint8)], PAL4),
        "ppm": encode_ppm(img),
        "wav": encode_wav(
            rng.integers(-1000, 1000, size=(64, 1)).astype(np.int16), 8000
        ),
        "bmp": encode_bmp(img),
        "avi": encode_avi_mjpeg([encode_jpeg(img)] * 3, 8, 8, fps=5),
    }


_VALID = _valid_payloads()


@pytest.mark.parametrize("name", sorted(DECODERS))
@settings(max_examples=120, deadline=None)
@given(pos_frac=st.floats(0, 1), new_byte=st.integers(0, 255))
def test_single_byte_mutations_never_crash(name, pos_frac, new_byte):
    decoder, _ = DECODERS[name]
    payload = bytearray(_VALID[name])
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] = new_byte
    _check(decoder, bytes(payload))


@pytest.mark.parametrize("name", sorted(DECODERS))
@settings(max_examples=40, deadline=None)
@given(cut_frac=st.floats(0, 1))
def test_truncations_never_crash(name, cut_frac):
    decoder, _ = DECODERS[name]
    payload = _VALID[name]
    _check(decoder, payload[: int(cut_frac * len(payload))])


@pytest.mark.parametrize("name", sorted(DECODERS))
@settings(max_examples=120, deadline=None)
@given(
    start_frac=st.floats(0, 1),
    length=st.integers(1, 40),
    filler=st.binary(min_size=0, max_size=40),
)
def test_splice_mutations_never_crash(name, start_frac, length, filler):
    """Structure-aware hostility: excise a random internal span and/or
    splice random bytes mid-file — desynchronizes segment lengths,
    which is exactly where stray struct/index errors hide."""
    decoder, _ = DECODERS[name]
    payload = _VALID[name]
    pos = min(int(start_frac * len(payload)), len(payload) - 1)
    _check(decoder, payload[:pos] + payload[pos + length :])  # excise
    _check(decoder, payload[:pos] + filler + payload[pos:])  # splice


def test_jpeg_zeroed_sampling_factor_rejected():
    """Pinned r9 fuzz find: a single zeroed SOF byte (a component's
    sampling factors) previously reached reconstruction and crashed
    with ZeroDivisionError; T.81 B.2.2 factors are 1-4, so the decoder
    must reject 0 as malformed (ValueError per the codec contract)."""
    payload = bytearray(_VALID["jpeg"])
    pos = min(int(0.31640625 * len(payload)), len(payload) - 1)
    payload[pos] = 0
    _check(decode_jpeg, bytes(payload))
