"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside (modality, mime, width/height/duration, …). Decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through Python row objects, and each batch amortizes
codec startup. The container used for development carries no image/audio
codecs, so the decode step is STUBBED: ``decoder="fake"`` produces a
deterministic feature vector from the bytes (real plumbing, fake kernel);
``decoder="pillow"``/``"ffmpeg"`` raise ``NotImplementedError`` until the
dependency exists in the runtime image.
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


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
    batch_note: str | None = None,
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    Output: (id_col, feature array<float>, decode_ok). Real decoders are
    gated behind the runtime image having the codec libraries.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires codec libraries not present in "
            "this runtime image; only the deterministic 'fake' decoder is "
            "available (real Arrow/batch plumbing, stubbed kernel)"
        )

    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + list(_FEATURE_SCHEMA_SUFFIX.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p).tolist() for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": feats,
                    "decode_ok": ["ok"] * len(pdf),
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
