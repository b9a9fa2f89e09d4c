"""FLAC decode (operators/flac.py): lossless round-trip vs the
independent same-repo encoder across subframe types / channel
assignments / depths, decoder-wider features via hand-built
bitstreams, corruption rejection, and the Spark extract_features
plumbing — the PNG/GIF/JPEG codec-oracle discipline on audio."""

import numpy as np
import pytest

from spatialpandas_spark.operators.flac import (
    _BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_streaminfo,
)


def _smooth(n=700, ch=2, seed=5):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.integers(-40, 40, size=(n, ch)), axis=0).astype(
        np.int32
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(mode="verbatim"),
        dict(mode="constant"),
        dict(mode="fixed", order=0, rice_k=12),
        dict(mode="fixed", order=1, rice_k=7),
        dict(mode="fixed", order=2, rice_k=7, part_order=2),
        dict(mode="fixed", order=3, rice_k=8),
        dict(mode="fixed", order=4, rice_k=9),
        dict(mode="lpc", lpc_coefs=[20, -10, 2], lpc_shift=4, rice_k=8),
        dict(mode="fixed", order=2, rice_k=7, channel_mode="left_side"),
        dict(mode="fixed", order=2, rice_k=7, channel_mode="right_side"),
        dict(mode="fixed", order=2, rice_k=7, channel_mode="mid_side"),
    ],
)
def test_roundtrip_lossless(kw):
    pcm = (
        np.full((600, 2), -123, np.int32)
        if kw["mode"] == "constant"
        else _smooth()
    )
    dec, sr = decode_flac(encode_flac(pcm, sample_rate=44100, **kw))
    assert sr == 44100
    assert dec.dtype == np.int32 and (dec == pcm).all()


def test_roundtrip_depths_and_shapes():
    rng = np.random.default_rng(2)
    for bps, lim, ch in ((8, 100, 1), (16, 3000, 3), (24, 1 << 20, 2)):
        pcm = rng.integers(-lim, lim, size=(457, ch)).astype(np.int32)
        dec, _ = decode_flac(
            encode_flac(pcm, bps=bps, mode="verbatim", blocksize=192)
        )
        assert (dec == pcm).all(), bps
    info = flac_streaminfo(encode_flac(pcm, bps=24, mode="verbatim"))
    assert (info["channels"], info["bps"], info["total_samples"]) == (2, 24, 457)


def _mono_frame_stream(subframe_bits, blocksize, bps=8, n=None):
    """Hand-assemble fLaC + STREAMINFO (no md5) + ONE mono frame whose
    subframe bits are supplied raw — covers decoder features the
    oracle encoder deliberately never emits."""
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(bps - 1, 5)
    si.write(n if n is not None else blocksize, 36)
    body = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)   # 16-bit blocksize-1 follows
    w.write(14, 4)  # 16-bit rate/10 follows
    w.write(0, 4)   # mono
    w.write(1, 3)   # 8 bps
    w.write(0, 1)
    w.write(0, 8)   # frame number 0
    w.write(blocksize - 1, 16)
    w.write(800, 16)
    w.align()
    hdr = w.bytes()
    w2 = _BitWriter()
    for b in hdr:
        w2.write(b, 8)
    w2.write(crc8(hdr), 8)
    for v, nbits in subframe_bits:
        w2.write(v, nbits)
    w2.align()
    frame = w2.bytes()
    return bytes(out + frame + crc16(frame).to_bytes(2, "big"))


def test_decoder_wasted_bits_and_escape_partition():
    """FIXED-order-0 subframe with 1 wasted bit and an ESCAPED (raw
    5-bit) residual partition — valid spec features the oracle encoder
    never writes."""
    resid = [3, -4, 0, 7, -8, 1, 2, -1]
    bits = [(0, 1), (8, 6), (1, 1)]  # pad, fixed o0, wasted flag
    # unary(wasted-1 = 0) -> a single 1 bit
    bits.append((1, 1))
    bits.append((0, 2))   # residual method 0
    bits.append((0, 4))   # partition order 0
    bits.append((15, 4))  # rice param escape
    bits.append((5, 5))   # raw 5-bit residuals
    for e in resid:
        bits.append((e & 0x1F, 5))
    dec, _ = decode_flac(_mono_frame_stream(bits, blocksize=len(resid)))
    assert dec[:, 0].tolist() == [e << 1 for e in resid]


def test_decoder_rice2_method():
    """Residual method 1 (5-bit rice2 params) decodes; the oracle
    encoder only writes method 0."""
    resid = [1, -2, 3, -4]
    k = 3
    bits = [(0, 1), (8, 6), (0, 1), (1, 2), (0, 4), (k, 5)]
    for e in resid:
        u = (abs(e) << 1) - (1 if e < 0 else 0)
        bits.append((1, (u >> k) + 1))  # unary quotient
        bits.append((u & ((1 << k) - 1), k))
    dec, _ = decode_flac(_mono_frame_stream(bits, blocksize=len(resid)))
    assert dec[:, 0].tolist() == resid


def test_corruption_rejected():
    pcm = _smooth(300)
    enc = bytearray(encode_flac(pcm, mode="fixed", order=2, rice_k=7))
    # flip a payload byte mid-frame: CRC-16 must catch it
    bad = bytearray(enc)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # flip an MD5 byte in STREAMINFO: decoded-PCM MD5 must catch it
    bad = bytearray(enc)
    bad[8 + 18] ^= 0x01  # 4 magic + 4 block hdr + 18 -> first md5 byte
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) // 2])
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")


def test_extract_features_flac_and_media_sniff(spark):
    """Spark plumbing: decoder='flac' decodes real payloads; the
    'media' sniffing decoder routes fLaC next to RIFF/WAVE; a corrupt
    payload degrades to an error row, not a job failure."""
    from spatialpandas_spark.operators.multimodal import (
        encode_wav,
        extract_features,
    )

    pcm = np.array([[0, 0], [8192, -8192], [16384, 100], [-4, 4]] * 4,
                   np.int32)
    flac = encode_flac(pcm, mode="fixed", order=1, rice_k=9)
    wav = encode_wav(pcm.astype(np.int16), 8000, bits=16)
    rows = [(0, bytearray(flac)), (1, bytearray(wav)), (2, bytearray(b"fLaCgarbage"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in extract_features(df, decoder="media").collect()
    }
    assert out[2]["feature"] is None and "error" in out[2]["decode_ok"]
    f0, f1 = out[0]["feature"], out[1]["feature"]
    assert f0 == f1  # same PCM through FLAC and WAV -> same stats
    s = pcm[:, :3].astype(np.float64)
    assert f0[0] == np.float32(s.mean(0)[0])
    assert f0[9] == np.float32((s > 8192).mean(0)[0])
    # dedicated decoder name is registered too
    only = extract_features(
        df.filter("media_id = 0"), decoder="flac"
    ).collect()[0]
    assert only["feature"] == f0


def test_probe_media_metadata_flac_headers_only(spark):
    """probe_media_metadata reads FLAC STREAMINFO only: a stream whose
    FRAMES are chopped off still probes (format/rate/channels/samples)
    while a full decode of the same bytes raises — the GIF-header
    discipline on audio."""
    from spatialpandas_spark.operators.flac import flac_streaminfo
    from spatialpandas_spark.operators.multimodal import (
        probe_media_metadata,
    )

    pcm = _smooth(300)
    full = encode_flac(pcm, sample_rate=44100, mode="fixed", order=1,
                       rice_k=9, blocksize=128)
    # keep magic + the (last) STREAMINFO block only: 4 + 4 + 38 bytes
    hdr_only = full[: 8 + 34]
    flac_streaminfo(hdr_only)  # parses
    with pytest.raises(ValueError):
        decode_flac(hdr_only)  # no frames -> short of total_samples

    df = spark.createDataFrame(
        [(1, bytearray(hdr_only)), (2, bytearray(b"fLaC\x80\x00\x00\x22"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in probe_media_metadata(df).collect()}
    ok = rows[1]
    assert (ok["format"], ok["sample_rate"], ok["n_channels"],
            ok["n_samples"], ok["probe_ok"]) == ("flac", 44100, 2, 300, "ok")
    assert rows[2]["probe_ok"].startswith("error")


from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=40, deadline=None)
@given(
    data=hst.lists(
        hst.tuples(hst.integers(-30000, 30000), hst.integers(-30000, 30000)),
        min_size=1,
        max_size=300,
    ),
    mode=hst.sampled_from(["verbatim", "fixed"]),
    order=hst.integers(0, 4),
    rice_k=hst.integers(0, 14),
    part_order=hst.integers(0, 2),
    channel_mode=hst.sampled_from(
        ["independent", "left_side", "right_side", "mid_side"]
    ),
    blocksize=hst.sampled_from([16, 64, 192, 4096]),
)
def test_property_roundtrip_lossless(
    data, mode, order, rice_k, part_order, channel_mode, blocksize
):
    """PROPERTY: decode(encode(pcm)) == pcm for arbitrary int16 stereo
    PCM under arbitrary legal (mode, order, rice_k, partition order,
    channel assignment, blocksize) — lossless is unconditional, not a
    property of friendly inputs; the encoder clamps orders and
    partition orders per frame the way real encoders do for short last
    blocks. This property FOUND that clamp: frames shorter than the
    predictor order produced spec-illegal subframes before it."""
    import numpy as np

    pcm = np.array(data, dtype=np.int32)
    dec, _ = decode_flac(
        encode_flac(
            pcm,
            mode=mode,
            order=order,
            rice_k=rice_k,
            part_order=part_order,
            channel_mode=channel_mode,
            blocksize=blocksize,
        )
    )
    assert (dec == pcm).all()


def test_resample_audio_flac_transcode(spark):
    """decoder='audio' sniffs FLAC beside WAV and transcodes to 16-bit
    RIFF/WAVE at the target rate: a FLAC and a WAV holding the SAME
    16-bit PCM produce byte-identical resampled outputs."""
    from spatialpandas_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        resample_audio,
    )

    pcm = _smooth(200).astype(np.int32)
    rows = [
        (0, bytearray(encode_flac(pcm, sample_rate=8000, mode="fixed",
                                  order=2, rice_k=8))),
        (1, bytearray(encode_wav(pcm.astype(np.int16), 8000, bits=16))),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in resample_audio(df, 16000, decoder="audio").collect()
    }
    assert out[2]["payload"] is None
    assert bytes(out[0]["payload"]) == bytes(out[1]["payload"])
    samples, sr = decode_wav(bytes(out[0]["payload"]))
    assert sr == 16000 and samples.shape[1] == 2
    assert len(samples) == 400  # 200 samples, 8k -> 16k


def test_encoder_rejects_unsupported_params():
    """ADVICE r10: bps outside the 3-bit frame-header codes and sample
    rates the 16-bit rate/10 field cannot represent raise up front with
    explicit messages — no bare KeyError, no silently masked rate."""
    pcm = np.zeros((16, 1), dtype=np.int64)
    with pytest.raises(ValueError, match="bps"):
        encode_flac(pcm, bps=32)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(pcm, sample_rate=44101)  # not divisible by 10
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(pcm, sample_rate=655360)  # > 16-bit rate/10 ceiling


def test_rice_block_bit_exact_twin():
    """The cached-word Rice reader (VERDICT r10 #7 throughput pass)
    must be BIT-EXACT with the per-bit unary()/read(k) formulation on
    randomized streams — same values, same final bit position, same
    truncation error — across k=0..14 and unaligned start offsets."""
    import random

    from spatialpandas_spark.operators.flac import _Bits

    rng = random.Random(11)
    for trial in range(60):
        k = rng.randrange(0, 15)
        n = rng.randrange(1, 64)
        data = bytes(rng.randrange(256) for _ in range(256))
        skew = rng.randrange(0, 8)
        a = _Bits(data); a.read(skew)
        b = _Bits(data); b.read(skew)

        def per_bit(bits, n, k):
            out = []
            for _ in range(n):
                q = bits.unary()
                v = (q << k) | bits.read(k)
                out.append((v >> 1) ^ -(v & 1))
            return out

        want = per_bit(a, n, k)
        got = b.rice_block(n, k)
        assert got == want and a.p == b.p, (trial, k, n, skew)

    # truncation: a stream of zero bits never terminates a unary prefix
    t = _Bits(bytes(8))
    with pytest.raises(ValueError, match="truncated"):
        t.rice_block(1, 4)
