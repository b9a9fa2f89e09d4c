"""Real-sample audio decode: pure-numpy RIFF/WAVE PCM parser, the
Arrow-batched extract_features("wav") path, and linear resampling —
no codec libraries (ref analog: spatialpandas has no media surface,
this is beyond-reference pipeline tooling)."""

import numpy as np
import pytest

from spatialpandas_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
    extract_features,
    resample_audio,
    resample_pcm,
)


def test_wav_roundtrip_u8_mono():
    s = np.arange(0, 256, 17, dtype=np.uint8)[:, None]
    out, sr = decode_wav(encode_wav(s, 8000, bits=8))
    assert sr == 8000
    np.testing.assert_array_equal(out, s)
    assert out.dtype == np.uint8


def test_wav_roundtrip_s16_stereo():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=(101, 2), dtype=np.int16)
    out, sr = decode_wav(encode_wav(s, 44100, bits=16))
    assert sr == 44100
    np.testing.assert_array_equal(out, s)
    assert out.dtype == np.int16


def test_wav_skips_unknown_chunks():
    # LIST metadata chunk (odd size -> word-aligned pad byte) before data
    s = np.array([[0, 1000], [-5, 7]], dtype=np.int16)
    raw = encode_wav(s, 16000, bits=16)
    # splice an unknown chunk between fmt and data
    fmt_end = raw.index(b"data")
    junk = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = raw[:fmt_end] + junk + raw[fmt_end:]
    spliced = (
        spliced[:4]
        + (len(spliced) - 8).to_bytes(4, "little")
        + spliced[8:]
    )
    out, sr = decode_wav(spliced)
    np.testing.assert_array_equal(out, s)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",  # no chunks
        b"OggS" + b"\x00" * 40,  # wrong container
        # fmt says float PCM (format 3)
        b"RIFF$\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x03\x00\x01\x00"
        + (8000).to_bytes(4, "little")
        + (32000).to_bytes(4, "little")
        + b"\x04\x00\x20\x00data\x00\x00\x00\x00",
    ],
)
def test_wav_malformed_raises(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_wav_features_closed_form(spark):
    # 4 known u8 samples: mean=(0+64+65+255)/4=96, min=0, max=255,
    # frac>64 = 2/4
    s = np.array([0, 64, 65, 255], dtype=np.uint8)[:, None]
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000, bits=8)))], "media_id long, payload binary"
    )
    row = extract_features(df, decoder="wav").collect()[0]
    assert row["decode_ok"] == "ok"
    f = row["feature"]
    assert f[:4] == [96.0, 0.0, 0.0, 0.0]  # mean ch0, pad ch1/ch2, min ch0
    assert f[3] == 0.0 and f[4] == 0.0
    expected = [96.0, 0.0, 0.0, 0.0, 0.0, 0.0, 255.0, 0.0, 0.0, 0.5, 0.0, 0.0]
    assert f == expected


def test_wav_features_s16_threshold(spark):
    # s16 threshold is 8192: samples 8192 (not >), 8193 (>) -> frac 1/2
    s = np.array([[8192], [8193]], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000, bits=16)))], "media_id long, payload binary"
    )
    f = extract_features(df, decoder="wav").collect()[0]["feature"]
    assert f[0] == 8192.5 and f[3] == 8192.0 and f[6] == 8193.0 and f[9] == 0.5


def test_wav_corrupt_rows_tagged_not_fatal(spark):
    good = bytearray(encode_wav(np.array([[1]], dtype=np.int16), 8000))
    df = spark.createDataFrame(
        [(1, good), (2, bytearray(b"not a wav")), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_features(df, decoder="wav").collect()}
    assert rows[1]["decode_ok"] == "ok"
    assert rows[2]["feature"] is None and rows[2]["decode_ok"].startswith("error")
    assert rows[3]["feature"] is None and rows[3]["decode_ok"].startswith("error")


def test_resample_pcm_constant_identity():
    s = np.full((50, 2), 123, dtype=np.int16)
    out = resample_pcm(s, 8000, 16000)
    assert out.shape == (100, 2)
    assert (out == 123).all()


def test_resample_pcm_linear_closed_form():
    # Upsample a ramp 2x with half-sample-center mapping: output j maps to
    # source (j + 0.5)/2 - 0.5; a linear ramp stays linear (edge-clamped).
    s = np.array([0, 100, 200, 300], dtype=np.int16)[:, None]
    out = resample_pcm(s, 1000, 2000)[:, 0]
    fx = np.clip((np.arange(8) + 0.5) * 4 / 8 - 0.5, 0, 3)
    expected = np.rint(np.interp(fx, np.arange(4), s[:, 0].astype(float)))
    np.testing.assert_array_equal(out, expected.astype(np.int16))


def test_resample_pcm_downsample_length():
    s = np.arange(441, dtype=np.int16)[:, None]
    out = resample_pcm(s, 44100, 16000)
    assert out.shape[0] == round(441 * 16000 / 44100)


def test_resample_audio_end_to_end(spark):
    s = np.arange(0, 160, dtype=np.int16)[:, None] * 100
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(s, 8000, bits=16))), (8, None)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in resample_audio(df, target_rate=16000).collect()
    }
    assert rows[8]["payload"] is None
    out, sr = decode_wav(bytes(rows[7]["payload"]))
    assert sr == 16000 and out.shape == (320, 1)
    # spot-check interior linearity against numpy interp
    fx = np.clip((np.arange(320) + 0.5) * 160 / 320 - 0.5, 0, 159)
    expected = np.rint(np.interp(fx, np.arange(160), s[:, 0].astype(float)))
    np.testing.assert_array_equal(out[:, 0], expected.astype(np.int16))


def test_resample_audio_codec_gated(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        resample_audio(df, 16000, decoder="ffmpeg")


def _wav_bytes(audio_format, bits, ch, rate, raw):
    """Hand-assembled RIFF/WAVE container (independent of encode_wav)."""
    import struct as _s

    fmt = _s.pack(
        "<HHIIHH", audio_format, ch, rate, rate * (bits // 8) * ch,
        (bits // 8) * ch, bits,
    )
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
    body += b"data" + _s.pack("<I", len(raw)) + raw
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_decode_wav_float32():
    vals = np.array([[0.0], [0.5], [-0.25], [1.0]], dtype="<f4")
    payload = _wav_bytes(3, 32, 1, 16000, vals.tobytes())
    samples, sr = decode_wav(payload)
    assert sr == 16000 and samples.dtype == np.dtype("<f4")
    np.testing.assert_array_equal(samples, vals)


def test_decode_wav_float64():
    vals = np.array([[0.125, -0.125]], dtype="<f8")
    samples, _ = decode_wav(_wav_bytes(3, 64, 2, 8000, vals.tobytes()))
    np.testing.assert_array_equal(samples, vals)


def test_decode_wav_24bit_sign_extension():
    # raw 3-byte LE samples: 0x000001 = 1, 0xFFFFFF = -1, 0x800000 = -2^23
    raw = bytes([0x01, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x80])
    samples, _ = decode_wav(_wav_bytes(1, 24, 1, 44100, raw))
    assert samples.dtype == np.int32
    assert samples[:, 0].tolist() == [1, -1, -(2**23)]


def test_decode_wav_32bit_pcm():
    vals = np.array([[2**30], [-(2**30)]], dtype="<i4")
    samples, _ = decode_wav(_wav_bytes(1, 32, 1, 22050, vals.tobytes()))
    assert samples[:, 0].tolist() == [2**30, -(2**30)]


def test_unsupported_wav_variants_raise():
    import pytest as _pt

    with _pt.raises(ValueError, match="bit depth"):
        decode_wav(_wav_bytes(1, 12, 1, 8000, b"\x00" * 12))
    with _pt.raises(ValueError, match="PCM/float"):
        decode_wav(_wav_bytes(0xFFFE, 16, 1, 8000, b"\x00" * 4))
    with _pt.raises(ValueError, match="float WAV bit"):
        decode_wav(_wav_bytes(3, 16, 1, 8000, b"\x00" * 4))


def test_float_wav_features(spark):
    from spatialpandas_spark.operators.multimodal import extract_features

    vals = np.array([[0.5], [0.5], [-0.5], [-0.5]], dtype="<f4")
    payload = _wav_bytes(3, 32, 1, 8000, vals.tobytes())
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = extract_features(df, decoder="wav").collect()[0]
    assert row["decode_ok"] == "ok"
    assert row["feature"][0] == 0.0   # mean
    assert row["feature"][3] == -0.5  # min
    assert row["feature"][6] == 0.5   # max
    assert row["feature"][9] == 0.5   # fraction above 1/4 scale


def test_media_decoder_mixes_modalities(spark):
    from spatialpandas_spark.operators.multimodal import (
        encode_ppm,
        extract_features,
    )

    img = np.full((2, 2, 3), 64, dtype=np.uint8)
    vals = np.array([[0.5], [-0.5]], dtype="<f4")
    rows = [
        (1, encode_ppm(img)),
        (2, _wav_bytes(3, 32, 1, 8000, vals.tobytes())),
        (3, b"neither"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_features(df, decoder="media").collect()}
    assert got[1]["decode_ok"] == "ok" and got[1]["feature"][0] == 64.0
    assert got[2]["decode_ok"] == "ok" and got[2]["feature"][6] == 0.5  # max
    assert got[3]["decode_ok"].startswith("error")
