"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside (modality, mime, width/height/duration, …). Decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through Python row objects, and each batch amortizes
codec startup. The container used for development carries no image/audio
codecs, so compressed-format decode is STUBBED: ``decoder="fake"``
produces a deterministic feature vector from the bytes (real plumbing,
fake kernel); ``decoder="pillow"``/``"ffmpeg"`` raise
``NotImplementedError`` until the dependency exists in the runtime image.
``decoder="ppm"`` is a REAL decoder: binary P6 PPM needs no codec, so
:func:`decode_ppm` parses it with pure numpy and ``extract_features``
computes per-channel statistics from actual pixels.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

FEATURE_DIM = 32

_FEATURE_SCHEMA_SUFFIX = StructType(
    [
        StructField("feature", ArrayType(FloatType())),
        StructField("decode_ok", StringType()),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Attach a typed metadata struct for an opaque binary payload column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_decode_features(payload: bytes | None) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: a seeded
    pseudo-embedding derived from the payload digest. Lets the full Spark
    pipeline (schema, batching, partitioning) be exercised and tested
    without codecs."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = hashlib.sha256(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary-PPM (P6) decoder — needs no codec library.

    Supports the full header grammar (whitespace runs, ``#`` comments,
    any maxval < 256) and returns an (H, W, 3) uint8 array. Raises
    ``ValueError`` on malformed input.
    """
    data = bytes(payload)
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(data[start:pos]))
    width, height, maxval = vals
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # exactly one whitespace byte separates maxval from raster
    n = width * height * 3
    if len(data) - pos < n:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(height, width, 3)


def _ppm_features(payload: bytes | None) -> np.ndarray:
    """Real per-channel statistics from decoded pixels: mean, min, max,
    and fraction-above-64 for R/G/B (12 floats). Every value is a ratio
    of small integers over a power of two, so float32 holds it exactly —
    which is what lets the gate oracle reproduce it in closed form."""
    if payload is None:
        raise ValueError("null payload")
    flat = decode_ppm(payload).reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [flat.mean(0), flat.min(0), flat.max(0), (flat > 64).mean(0)]
    )
    return feats.astype(np.float32)


_DECODERS = {"fake": _fake_decode_features, "ppm": _ppm_features}


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
    batch_note: str | None = None,
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    Output: (id_col, feature array<float>, decode_ok). ``decoder="ppm"``
    decodes real pixels (pure numpy); ``"fake"`` is the deterministic
    no-codec stand-in; compressed formats stay gated on codec libraries.
    A row that fails to decode gets ``feature=NULL`` and an error tag
    instead of failing the job (at 100 TB some payloads WILL be corrupt).
    """
    if decoder not in _DECODERS:
        raise NotImplementedError(
            f"decoder={decoder!r} requires codec libraries not present in "
            "this runtime image; available: {'fake', 'ppm'}"
        )
    kernel = _DECODERS[decoder]

    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + list(_FEATURE_SCHEMA_SUFFIX.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for p in pdf[payload_col]:
                try:
                    feats.append(kernel(p).tolist())
                    status.append("ok")
                except (ValueError, TypeError) as exc:
                    feats.append(None)
                    status.append(f"error: {exc}"[:120])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": feats,
                    "decode_ok": status,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _require_fake(decoder: str) -> None:
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires codec libraries not present in "
            "this runtime image; only the deterministic 'fake' decoder is "
            "available (real Arrow/batch plumbing, stubbed kernel)"
        )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Resize image payloads via Arrow-batched ``mapInPandas``; output is
    (id, payload binary, width, height). The fake kernel emits a
    deterministic payload derived from (input digest, target dims) — same
    bytes for same input, different for different targets — so downstream
    schema/partitioning/dedup logic is fully exercisable without codecs.
    """
    _require_fake(decoder)
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(payload_col, BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                if p is None:
                    out.append(None)
                    continue
                digest = hashlib.sha256(
                    bytes(p) + f"|{width}x{height}".encode()
                ).digest()
                out.append(digest)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    decoder: str = "fake",
) -> DataFrame:
    """Sample every ``every_n``-th frame (up to ``max_frames``) from video
    payloads — one OUTPUT ROW PER FRAME (the explode-shaped mapInPandas
    batch: output length differs from input length), which is the shape a
    real ffmpeg kernel plugs into. Frame count comes from the metadata
    column (decoders that know better can override); the fake kernel
    derives deterministic per-frame bytes from (payload digest, index)."""
    _require_fake(decoder)
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, nf in zip(
                pdf[id_col], pdf[payload_col], pdf[n_frames_col]
            ):
                if p is None or nf is None:
                    continue
                digest = hashlib.sha256(bytes(p)).digest()
                picked = range(0, int(nf), every_n)
                for j, fi in zip(range(max_frames), picked):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        hashlib.sha256(digest + fi.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col, n_frames_col).mapInPandas(
        run, out_schema
    )
