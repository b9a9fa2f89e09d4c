"""Hypothesis properties for the round-4 surfaces: WAV codec laws,
resample invariants, and PQ code/ADC laws — all pure numpy (no Spark
job per example), so they run at full example counts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialpandas_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
    resample_pcm,
)


@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.integers(min_value=1, max_value=4),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_wav_roundtrip_is_identity(n, ch, sr, bits, seed):
    rng = np.random.default_rng(seed)
    if bits == 8:
        s = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
    else:
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    out, got_sr = decode_wav(encode_wav(s, sr, bits=bits))
    assert got_sr == sr
    np.testing.assert_array_equal(out, s)


@given(
    n=st.integers(min_value=1, max_value=400),
    sr=st.integers(min_value=100, max_value=48000),
    target=st.integers(min_value=100, max_value=48000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_resample_stays_in_sample_range(n, sr, target, seed):
    """Linear interpolation never exceeds the input's min/max, and the
    output length matches the rate ratio."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, 1), dtype=np.int16)
    out = resample_pcm(s, sr, target)
    assert out.shape[0] == max(1, round(n * target / sr))
    assert out.min() >= s.min() and out.max() <= s.max()


@given(
    n=st.integers(min_value=2, max_value=200),
    up=st.sampled_from([2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_resample_up_then_down_preserves_constant_segments(n, up, seed):
    """A constant signal survives any up/down chain exactly."""
    rng = np.random.default_rng(seed)
    v = int(rng.integers(-32768, 32768))
    s = np.full((n, 2), v, dtype=np.int16)
    mid = resample_pcm(s, 1000, 1000 * up)
    back = resample_pcm(mid, 1000 * up, 1000)
    assert (mid == v).all() and (back == v).all()
    assert back.shape[0] == n


def _kmeans_books(X, m_sub, n_codes):
    """Tiny deterministic stand-in mirroring train_pq's per-subspace
    structure, driver-free (no Spark in property tests)."""
    sub = X.shape[1] // m_sub
    return [
        X[:n_codes, j * sub : (j + 1) * sub].tolist() for j in range(m_sub)
    ]


@given(
    n=st.integers(min_value=4, max_value=60),
    m_sub=st.sampled_from([2, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_adc_equals_exact_in_lossless_limit(n, m_sub, seed):
    """Core PQ law, numpy replica: when every sub-vector is a codeword,
    the ADC score (sum of per-subspace LUT entries) equals the exact
    inner product of normalized vectors up to float addition order."""
    rng = np.random.default_rng(seed)
    dim = 8
    X = rng.standard_normal((n, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    books = np.asarray(_kmeans_books(X, m_sub, n))
    sub = dim // m_sub
    # encode: argmin L2 per subspace
    codes = np.stack(
        [
            np.argmin(
                ((X[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None]) ** 2).sum(-1),
                axis=1,
            )
            for j in range(m_sub)
        ],
        axis=1,
    )
    q = rng.standard_normal(dim)
    q = q / np.linalg.norm(q)
    lut = np.stack([q[j * sub : (j + 1) * sub] @ books[j].T for j in range(m_sub)])
    adc = sum(lut[j][codes[:, j]] for j in range(m_sub))
    exact = X @ q
    np.testing.assert_allclose(adc, exact, atol=1e-10)
