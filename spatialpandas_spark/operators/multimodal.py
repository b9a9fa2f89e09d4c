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
``decoder="ppm"`` is a REAL path end-to-end: binary P6 PPM needs no
codec, so :func:`decode_ppm` parses pixels with pure numpy,
``extract_features`` computes per-channel statistics from them,
``resize_images`` resamples them (:func:`resize_rgb`,
nearest/bilinear, closed-form-tested) and re-encodes P6, and
``sample_frames`` slices frames out of concatenated-P6 streams
(:func:`iter_ppm_stream`). ``decoder="wav"`` is likewise REAL for audio:
uncompressed RIFF/WAVE PCM (8-bit unsigned / 16-bit LE, any channel
count) parses with pure numpy (:func:`decode_wav`), ``extract_features``
computes per-channel sample statistics, and ``resample_audio`` does
linear-interpolation rate conversion (:func:`resample_pcm`).
``decoder="png"`` is a REAL *compressed* path: PNG's DEFLATE stream
inflates with stdlib ``zlib`` and the rest of the format (chunk CRCs,
scanline filters, color types incl. palette and alpha) is implemented
from the public spec in :mod:`spatialpandas_spark.operators.png` — see
that module's docstring for scope. ``decoder="jpeg"`` decodes baseline
JPEG for real too — Huffman entropy coding + 8x8 IDCT written from the
public T.81 spec (:mod:`spatialpandas_spark.operators.jpeg`), verified
against an independent spec-derived encoder. ``decoder="image"`` sniffs
the payload magic per row and routes PPM/PNG/JPEG to the right real
kernel — the mixed-crawl shape. JPEG covers BOTH baseline sequential
and progressive (SOF2) profiles. ``decoder="flac"`` decodes COMPRESSED
audio for real: LPC/fixed prediction + Rice residuals implemented from
the public spec (RFC 9639, :mod:`spatialpandas_spark.operators.flac`),
verified against an independent same-repo encoder like PNG/GIF/JPEG;
``decoder="media"`` sniffs ``fLaC`` alongside RIFF/WAVE and the image
magics. Remaining codec-gated: LOSSY compressed audio/video
(mp3/aac/h264) — their spec compliance needs psychoacoustic models and
entropy machinery (and conformance vectors) no pure-numpy runtime
ships, so they stay behind ``NotImplementedError`` permanently rather
than behind a wrong-output risk.
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


def _parse_ppm_header(data: bytes, pos: int = 0) -> tuple[int, int, int, int]:
    """Parse one binary-PPM (P6) header starting at ``pos``; returns
    (width, height, maxval, raster_start). Supports the full grammar
    (whitespace runs, ``#`` comments, any maxval < 256). Raises
    ``ValueError`` on malformed input."""
    if data[pos : pos + 2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos, vals = pos + 2, []
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
    return width, height, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary-PPM (P6) decoder — needs no codec library.
    Returns an (H, W, 3) uint8 array; raises ``ValueError`` on malformed
    input."""
    data = bytes(payload)
    width, height, _maxval, pos = _parse_ppm_header(data)
    n = width * height * 3
    if len(data) - pos < n:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(height, width, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array -> canonical binary-PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def resize_rgb(img: np.ndarray, width: int, height: int, method: str = "bilinear") -> np.ndarray:
    """Pure-numpy image resize, (H, W, 3) uint8 -> (height, width, 3).

    Both methods use the standard half-pixel-center (align_corners=False)
    mapping ``sx = (dx + 0.5) * S / D - 0.5``: ``nearest`` rounds the
    source coordinate; ``bilinear`` separably interpolates the 2x2
    neighborhood with edge clamping and rounds to uint8 once at the end
    (np.rint, ties-to-even). Deterministic and vectorized — no per-pixel
    Python."""
    sh, sw = img.shape[:2]
    if method == "nearest":
        ys = np.clip(((np.arange(height) + 0.5) * sh / height).astype(np.int64), 0, sh - 1)
        xs = np.clip(((np.arange(width) + 0.5) * sw / width).astype(np.int64), 0, sw - 1)
        return img[ys][:, xs]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = np.clip((np.arange(height) + 0.5) * sh / height - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(width) + 0.5) * sw / width - 0.5, 0, sw - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    im = img.astype(np.float64)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def iter_ppm_stream(data: bytes):
    """Iterate a concatenated-P6 'video' stream (the ffmpeg image2pipe
    ppm shape): yields (start, end) byte offsets of each complete frame.
    Raises ``ValueError`` on a malformed or truncated frame."""
    pos, n = 0, len(data)
    while pos < n:
        width, height, _maxval, raster = _parse_ppm_header(data, pos)
        end = raster + width * height * 3
        if end > n:
            raise ValueError("truncated PPM frame in stream")
        yield pos, end
        pos = end


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


def _png_features(payload: bytes | None) -> np.ndarray:
    """Same per-channel pixel statistics as :func:`_ppm_features`, over
    PNG payloads decoded for real (stdlib zlib + numpy, operators/png.py).
    Identical pixels in PPM and PNG produce identical features — the
    format-agnostic contract the mixed-crawl path relies on."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.png import decode_png

    flat = decode_png(payload).reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [flat.mean(0), flat.min(0), flat.max(0), (flat > 64).mean(0)]
    )
    return feats.astype(np.float32)


def _jpeg_features(payload: bytes | None) -> np.ndarray:
    """Per-channel pixel statistics over baseline JPEG payloads decoded
    for real (pure-numpy Huffman + IDCT, operators/jpeg.py)."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.jpeg import decode_jpeg

    flat = decode_jpeg(payload).reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [flat.mean(0), flat.min(0), flat.max(0), (flat > 64).mean(0)]
    )
    return feats.astype(np.float32)


def _gif_features(payload: bytes | None) -> np.ndarray:
    """Per-channel pixel statistics over the FIRST composited GIF frame
    (the still-image contract; pure-python LZW, operators/gif.py)."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.gif import decode_gif_first

    flat = decode_gif_first(payload).reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [flat.mean(0), flat.min(0), flat.max(0), (flat > 64).mean(0)]
    )
    return feats.astype(np.float32)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode any supported image payload to (H, W, 3) uint8 RGB by
    magic sniffing (PPM / PNG / baseline JPEG / GIF first frame) — the
    single-image public entry point behind the batched operators.
    Raises ``ValueError`` on unknown magic or malformed input."""
    from spatialpandas_spark.operators.png import decode_png, sniff_image

    kind = sniff_image(bytes(payload))
    if kind == "png":
        return decode_png(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "jpeg":
        from spatialpandas_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if kind == "gif":
        from spatialpandas_spark.operators.gif import decode_gif_first

        return decode_gif_first(payload)
    if kind == "bmp":
        return _decode_bmp_payload(payload)
    raise ValueError("unrecognized image magic")


def _image_features(payload: bytes | None) -> np.ndarray:
    """Magic-sniffing image features: route each payload to the PPM, PNG,
    JPEG, or GIF kernel by its header bytes (the mixed-format crawl
    column shape); unknown magic raises ``ValueError`` and becomes a
    tagged error row."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.png import sniff_image

    kind = sniff_image(bytes(payload))
    if kind == "png":
        return _png_features(payload)
    if kind == "ppm":
        return _ppm_features(payload)
    if kind == "jpeg":
        return _jpeg_features(payload)
    if kind == "gif":
        return _gif_features(payload)
    if kind == "bmp":
        return _pixel_features_rgb(_decode_bmp_payload(payload))
    raise ValueError("unrecognized image magic")


def _decode_bmp_payload(payload: bytes) -> np.ndarray:
    from spatialpandas_spark.operators.bmp import decode_bmp

    return decode_bmp(payload)


def _pixel_features_rgb(rgb: np.ndarray) -> np.ndarray:
    """The shared per-channel statistics over any decoded RGB array."""
    flat = rgb.reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [flat.mean(0), flat.min(0), flat.max(0), (flat > 64).mean(0)]
    )
    return feats.astype(np.float32)


def _bmp_features(payload: bytes | None) -> np.ndarray:
    if payload is None:
        raise ValueError("null payload")
    return _pixel_features_rgb(_decode_bmp_payload(payload))


def _avi_features(payload: bytes | None) -> np.ndarray:
    """Per-channel pixel statistics over ALL video frames of an
    MJPEG/DIB AVI container — the FULL video-column path (container
    walk -> frame slices -> JPEG entropy / raw-DIB decode -> the shared
    RGB statistics kernel), the decode-side complement of the
    header-only probe (operators/avi.py, tests/test_multimodal_avi.py).
    Statistics pool every frame's pixels, so a k-frame video weighs
    each frame equally (all frames share one geometry per the AVI
    stream header)."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.avi import decode_avi_frames

    frames = [f.reshape(-1, 3) for f in decode_avi_frames(payload)]
    if not frames:
        raise ValueError("avi: container has no video frames")
    return _pixel_features_rgb(np.concatenate(frames))


def _media_features(payload: bytes | None) -> np.ndarray:
    """Full media sniffing: images via :func:`_image_features`, RIFF/WAVE
    audio via the WAV kernel, FLAC audio via the spec decoder — one
    decoder for a heterogeneous media column (the crawl reality where
    one binary column mixes modalities)."""
    if payload is None:
        raise ValueError("null payload")
    head = bytes(payload[:4])
    if head == b"RIFF":
        if bytes(payload[8:12]) == b"AVI ":
            return _avi_features(payload)
        return _wav_features(payload)
    if head == b"fLaC":
        return _flac_features(payload)
    return _image_features(payload)


_DECODERS = {
    "fake": _fake_decode_features,
    "ppm": _ppm_features,
    "png": _png_features,
    "jpeg": _jpeg_features,
    "gif": _gif_features,
    "bmp": _bmp_features,
    "image": _image_features,
    "media": _media_features,
}


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
            f"this runtime image; available: {sorted(_DECODERS)}"
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


def _check_media_decoder(decoder: str, supported: tuple[str, ...]) -> None:
    if decoder not in supported:
        raise NotImplementedError(
            f"decoder={decoder!r} requires codec libraries not present in "
            f"this runtime image; available: {set(supported)} ('ppm' is a "
            "real pure-numpy kernel, 'fake' a deterministic stand-in)"
        )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
    method: str = "bilinear",
) -> DataFrame:
    """Resize image payloads via Arrow-batched ``mapInPandas``; output is
    (id, payload binary, width, height).

    ``decoder="ppm"`` is REAL: decode P6 pixels (pure numpy), resample
    with :func:`resize_rgb` (``method`` = nearest | bilinear), re-encode
    as canonical P6 — closed-form-tested on known pixels. ``"png"`` is
    equally real for the compressed case (stdlib-zlib decode, resample,
    re-encode PNG); ``"jpeg"`` decodes baseline JPEG for real and
    re-encodes the resized pixels as PNG (lossless — the package
    deliberately ships no lossy encoder); ``"image"`` sniffs each
    payload's magic and routes accordingly (PPM in -> PPM out, PNG in ->
    PNG out, JPEG in -> PNG out). A null or undecodable payload yields a
    null output payload instead of failing the job. ``decoder="fake"``
    emits a deterministic digest payload derived from (input bytes,
    target dims) so downstream plumbing is exercisable without any
    decodable input.
    """
    _check_media_decoder(
        decoder, ("fake", "ppm", "png", "jpeg", "gif", "bmp", "image")
    )
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(payload_col, BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    from spatialpandas_spark.operators.gif import decode_gif_first
    from spatialpandas_spark.operators.jpeg import decode_jpeg
    from spatialpandas_spark.operators.png import (
        decode_png,
        encode_png,
        sniff_image,
    )

    from spatialpandas_spark.operators.bmp import decode_bmp, encode_bmp

    _codecs = {
        "ppm": (decode_ppm, encode_ppm),
        "png": (decode_png, encode_png),
        "jpeg": (decode_jpeg, encode_png),  # lossless re-encode
        "gif": (decode_gif_first, encode_png),  # first frame, lossless
        "bmp": (decode_bmp, encode_bmp),
    }

    def kernel(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        if decoder == "fake":
            return hashlib.sha256(
                bytes(p) + f"|{width}x{height}".encode()
            ).digest()
        fmt = sniff_image(bytes(p)) if decoder == "image" else decoder
        if fmt not in _codecs:
            return None
        dec, enc = _codecs[fmt]
        try:
            return enc(resize_rgb(dec(p), width, height, method))
        except ValueError:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [kernel(p) for p in pdf[payload_col]]
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
    real ffmpeg kernel plugs into.

    ``decoder="ppm"`` is REAL: the payload is a concatenated-P6 stream
    (ffmpeg image2pipe ppm shape); the kernel walks the frame headers,
    derives the TRUE frame count from the stream itself (overriding the
    metadata column), and emits each sampled frame's exact byte slice as
    a standalone P6 payload. Malformed streams are skipped, not fatal.
    ``decoder="gif"`` is REAL for an actual compressed multi-frame
    container: animated GIF decodes via pure-python LZW
    (operators/gif.py), frames are COMPOSITED per the disposal/
    transparency rules (what a viewer shows), the true frame count comes
    from the stream, and each sampled frame re-encodes as lossless PNG.
    ``decoder="avi"`` is REAL for an actual VIDEO CONTAINER: the RIFF
    walker (operators/avi.py) locates the ``'movi'`` list's video
    chunks and emits each sampled frame's exact payload — for MJPEG, a
    standalone baseline JPEG decodable by operators/jpeg.py — without
    any entropy decode in the sampling pass (the ppm byte-slice
    discipline applied to a real container). ``decoder="fake"`` trusts
    ``n_frames_col`` and derives deterministic per-frame bytes from
    (payload digest, index)."""
    _check_media_decoder(decoder, ("fake", "ppm", "gif", "avi"))
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
                if p is None:
                    continue
                if decoder == "ppm":
                    try:
                        offsets = list(iter_ppm_stream(bytes(p)))
                    except ValueError:
                        continue
                    data = bytes(p)
                    for fi in list(range(0, len(offsets), every_n))[:max_frames]:
                        s, e = offsets[fi]
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(data[s:e])
                    continue
                if decoder == "avi":
                    from spatialpandas_spark.operators.avi import parse_avi

                    try:
                        data = bytes(p)
                        offsets = parse_avi(data)["frames"]
                    except ValueError:
                        continue  # malformed container: skip, not fatal
                    for fi in list(range(0, len(offsets), every_n))[:max_frames]:
                        s, e = offsets[fi]
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(data[s:e])
                    continue
                if decoder == "gif":
                    from spatialpandas_spark.operators.gif import (
                        iter_gif_frames,
                    )
                    from spatialpandas_spark.operators.png import encode_png

                    try:
                        # sampled frames still require sequential decode
                        # up to the last SAMPLED index (composition
                        # depends on every prior frame), but nothing
                        # after it — stop as soon as the quota is filled
                        taken = 0
                        for fi, frame in enumerate(iter_gif_frames(bytes(p))):
                            if fi % every_n:
                                continue
                            ids.append(mid)
                            idxs.append(fi)
                            frames.append(encode_png(frame))
                            taken += 1
                            if taken >= max_frames:
                                break
                    except ValueError:
                        # drop any partial rows from the malformed stream
                        del ids[len(ids) - taken :]
                        del idxs[len(idxs) - taken :]
                        del frames[len(frames) - taken :]
                    continue
                if nf is None:
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


# --------------------------------------------------------------- audio (WAV)
# Uncompressed RIFF/WAVE PCM needs no codec library — the same trick that
# made the image path real via binary PPM. The parser walks the RIFF chunk
# list (fmt / data, skipping unknown chunks per the spec's even-padding
# rule) and supports the two classic PCM layouts: unsigned 8-bit and
# signed 16-bit little-endian, any channel count.


def _parse_wav(data: bytes) -> tuple[dict, bytes]:
    """Parse a RIFF/WAVE container; returns (fmt dict, raw data bytes).
    Raises ``ValueError`` on malformed input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "n_channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            raw = body
        # chunks are word-aligned: odd sizes carry one pad byte
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    if fmt["audio_format"] == 1:  # integer PCM
        if fmt["bits"] not in (8, 16, 24, 32):
            raise ValueError(f"unsupported PCM bit depth {fmt['bits']}")
    elif fmt["audio_format"] == 3:  # IEEE float
        if fmt["bits"] not in (32, 64):
            raise ValueError(f"unsupported float WAV bit depth {fmt['bits']}")
    else:
        raise ValueError(
            f"unsupported WAV format {fmt['audio_format']} (PCM/float only)"
        )
    if fmt["n_channels"] < 1:
        raise ValueError("zero-channel WAV")
    return fmt, raw


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy WAV (RIFF PCM) decoder — needs no codec library.

    Returns ``(samples, sample_rate)`` where samples is an
    (n_samples, n_channels) array: uint8 for 8-bit PCM (raw 0..255,
    128 = silence), int16/int32 for 16/24/32-bit little-endian PCM
    (24-bit widened to int32 preserving raw values), float32/float64
    for IEEE-float WAVE (format 3, nominal -1..1). Raises
    ``ValueError`` on malformed input."""
    fmt, raw = _parse_wav(bytes(payload))
    ch = fmt["n_channels"]
    bits = fmt["bits"]
    if fmt["audio_format"] == 3:
        dtype = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
    elif bits == 8:
        dtype = np.dtype(np.uint8)
    elif bits == 16:
        dtype = np.dtype("<i2")
    elif bits == 32:
        dtype = np.dtype("<i4")
    else:  # 24-bit: assemble 3-byte LE frames into int32
        width = 3 * ch
        n = len(raw) // width
        if n == 0:
            raise ValueError("empty WAV data chunk")
        b = np.frombuffer(raw, dtype=np.uint8, count=n * ch * 3).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        # sign-extend 24 -> 32 bits without shifting into the sign bit
        vals = np.where(vals & 0x800000, vals - (1 << 24), vals).astype(np.int32)
        return vals.reshape(n, ch), fmt["sample_rate"]
    width = dtype.itemsize * ch
    n = len(raw) // width
    if n == 0:
        raise ValueError("empty WAV data chunk")
    samples = np.frombuffer(raw, dtype=dtype, count=n * ch).reshape(n, ch)
    return samples, fmt["sample_rate"]


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n, ch) integer array -> canonical RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    raw = np.ascontiguousarray(samples, dtype=dtype).tobytes()
    block = (bits // 8) * ch
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def resample_pcm(samples: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation PCM resample, (n, ch) int -> (m, ch) int with
    ``m = round(n * target_sr / sr)``. Uses the same half-sample-center
    (align_corners=False) mapping as :func:`resize_rgb` —
    ``sx = (dx + 0.5) * n / m - 0.5`` with edge clamping — and one
    ties-to-even rounding at the end. Vectorized; no per-sample Python."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n = samples.shape[0]
    m = max(1, int(round(n * target_sr / sr)))
    if m == n:
        return samples.copy()
    fx = np.clip((np.arange(m) + 0.5) * n / m - 0.5, 0, n - 1)
    x0 = np.floor(fx).astype(np.int64)
    x1 = np.minimum(x0 + 1, n - 1)
    w = (fx - x0)[:, None]
    out = samples[x0].astype(np.float64) * (1 - w) + samples[x1].astype(np.float64) * w
    info = np.iinfo(samples.dtype)
    return np.clip(np.rint(out), info.min, info.max).astype(samples.dtype)


_WAV_FGT_DIVISOR = 4  # threshold = full-scale / 4 (u8: 64, s16: 8192)


def _wav_features(payload: bytes | None) -> np.ndarray:
    """Real per-channel PCM statistics, layout-parallel to the image
    features: mean, min, max, and fraction-above-quarter-scale for up to
    3 channels (missing channels zero-filled) — 12 floats. Thresholds:
    raw value > 64 for unsigned 8-bit, > 8192 for signed 16-bit. With
    small sample counts every statistic is a dyadic rational, so the
    gate oracle reproduces the float32 values bit-exactly."""
    if payload is None:
        raise ValueError("null payload")
    samples, _sr = decode_wav(payload)
    if np.issubdtype(samples.dtype, np.floating):
        thresh = 1.0 / _WAV_FGT_DIVISOR  # float WAVE nominal scale ±1
    else:
        thresh = (int(np.iinfo(samples.dtype).max) + 1) // _WAV_FGT_DIVISOR
    return _pcm_feature_stats(samples, thresh)


def _pcm_feature_stats(samples: np.ndarray, thresh) -> np.ndarray:
    """The shared 12-float PCM feature layout (mean/min/max/
    fraction-above-threshold for up to 3 channels, zero-padded)."""
    s = samples[:, :3].astype(np.float64)
    nch = s.shape[1]
    pad = np.zeros(3 - nch)
    feats = np.concatenate(
        [
            np.r_[s.mean(0), pad],
            np.r_[s.min(0), pad],
            np.r_[s.max(0), pad],
            np.r_[(s > thresh).mean(0), pad],
        ]
    )
    return feats.astype(np.float32)


def _flac_features(payload: bytes | None) -> np.ndarray:
    """WAV-layout PCM statistics from a REAL FLAC decode
    (operators/flac.py): samples are signed at STREAMINFO bps, so the
    fraction-above threshold is full-scale/4 at that depth (s16: 8192,
    the WAV convention)."""
    if payload is None:
        raise ValueError("null payload")
    from spatialpandas_spark.operators.flac import (
        decode_flac,
        flac_streaminfo,
    )

    samples, _sr = decode_flac(payload)
    bps = flac_streaminfo(payload)["bps"]
    thresh = (1 << (bps - 1)) // _WAV_FGT_DIVISOR
    return _pcm_feature_stats(samples, thresh)


_DECODERS["wav"] = _wav_features
_DECODERS["flac"] = _flac_features
_DECODERS["avi"] = _avi_features


def resample_audio(
    df: DataFrame,
    target_rate: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "wav",
) -> DataFrame:
    """Resample audio payloads via Arrow-batched ``mapInPandas``; output
    is (id, payload binary, sample_rate int) — the audio analog of
    :func:`resize_images`.

    ``decoder="wav"`` is REAL: decode PCM (pure numpy), linear-resample
    with :func:`resample_pcm`, re-encode RIFF/WAVE at ``target_rate``
    preserving bit depth and channel count. ``decoder="audio"`` sniffs
    WAV vs FLAC per row — the transcode-to-PCM pipeline shape: FLAC
    input decodes through the real spec decoder (operators/flac.py),
    resamples, and lands as 16-bit RIFF/WAVE (8-bit widened <<8,
    24-bit narrowed >>8 — the standard transcode depths). A null or
    undecodable payload yields a null output payload instead of
    failing the job. ``decoder="fake"`` emits a deterministic digest
    payload; lossy formats (mp3/aac/…) stay codec-gated."""
    _check_media_decoder(decoder, ("fake", "wav", "audio"))
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(payload_col, BinaryType()),
            StructField("sample_rate", IntegerType()),
        ]
    )

    def kernel(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        if decoder == "fake":
            return hashlib.sha256(bytes(p) + f"|{target_rate}".encode()).digest()
        try:
            if decoder == "audio" and bytes(p[:4]) == b"fLaC":
                from spatialpandas_spark.operators.flac import (
                    decode_flac,
                    flac_streaminfo,
                )

                samples, sr = decode_flac(p)
                bps = flac_streaminfo(bytes(p))["bps"]
                if bps == 8:
                    samples = samples.astype(np.int32) << 8
                elif bps > 16:
                    samples = samples >> (bps - 16)
                samples = samples.astype(np.int16)
                bits = 16
            else:
                samples, sr = decode_wav(p)
                bits = 8 if samples.dtype == np.uint8 else 16
            return encode_wav(
                resample_pcm(samples, sr, target_rate), target_rate, bits
            )
        except ValueError:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: [kernel(p) for p in pdf[payload_col]],
                    "sample_rate": [target_rate] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# ----------------------------------------------- header-only metadata probe

def image_dimensions(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) from the HEADER ONLY — no decode. The
    scan-speed curation primitive: size/aspect filtering of a 100 TB
    crawl reads a few dozen bytes per payload instead of running the
    full entropy decoder (~1000x cheaper), and works on formats whose
    full decode is gated (progressive JPEG dimensions come from the
    SOFn marker regardless of coding process). Raises ``ValueError``
    on unknown or malformed headers — the codec-family contract."""
    import struct as _s

    from spatialpandas_spark.operators.png import sniff_image

    data = bytes(payload)
    kind = sniff_image(data)
    try:
        if kind == "png":  # IHDR: 8 magic + 4 len + 4 type, then w/h u32be
            w, h = _s.unpack(">II", data[16:24])
        elif kind == "gif":  # logical screen descriptor, u16le
            w, h = _s.unpack("<HH", data[6:10])
        elif kind == "bmp":  # BITMAPINFOHEADER, i32le (height may be <0)
            w, h = _s.unpack("<ii", data[18:26])
            h = abs(h)
        elif kind == "ppm":
            w, h, _maxv, _pos = _parse_ppm_header(data)
        elif kind == "jpeg":
            # walk markers to any SOFn (0xC0-0xCF minus DHT C4 / DAC CC /
            # DNL... C8 is JPG reserved): dims are in the frame header
            # for every coding process, baseline or progressive
            pos = 2
            w = h = None
            while pos + 4 <= len(data):
                if data[pos] != 0xFF:
                    raise ValueError("JPEG marker sync lost")
                marker = data[pos + 1]
                pos += 2
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    continue
                (seglen,) = _s.unpack(">H", data[pos : pos + 2])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = _s.unpack(">HH", data[pos + 3 : pos + 7])
                    break
                pos += seglen
            if w is None:
                raise ValueError("JPEG has no frame header")
        else:
            raise ValueError("unknown image format")
    except (_s.error, IndexError) as exc:
        raise ValueError(f"malformed {kind} header: {exc}") from exc
    if not (0 < w and 0 < h):
        raise ValueError(f"non-positive {kind} dimensions {w}x{h}")
    return kind, int(w), int(h)


def probe_image_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Header-only metadata pass over a binary image column: one Arrow
    batch scan emitting (id, format, width, height, n_bytes, probe_ok)
    — the cheap first stage of any multimodal curation pipeline (size /
    aspect / format gating BEFORE paying for decode). Corrupt or
    unknown payloads become tagged error rows, never job failures."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", IntegerType()),
            StructField("probe_ok", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, ws, hs, nb, oks = [], [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                if p is None:
                    fmts.append(None); ws.append(None); hs.append(None)
                    nb.append(None); oks.append("error: null input")
                    continue
                nb.append(len(p))
                try:
                    kind, w, h = image_dimensions(bytes(p))
                    fmts.append(kind); ws.append(w); hs.append(h)
                    oks.append("ok")
                except ValueError as exc:
                    fmts.append(None); ws.append(None); hs.append(None)
                    oks.append(f"error: {exc}"[:120])
            yield pd.DataFrame(
                {id_col: ids, "format": fmts, "width": ws, "height": hs,
                 "n_bytes": nb, "probe_ok": oks}
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def probe_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Mixed-media metadata pass: the image probe plus RIFF/WAVE and
    FLAC audio (format, sample_rate, n_channels, n_samples — duration
    is n_samples / sample_rate; FLAC reads STREAMINFO only, no frame
    decode) and RIFF/AVI video (width/height; fps in the sample_rate
    slot, stream count in n_channels, total frames in n_samples —
    header list only, frame chunks untouched). One Arrow scan, no
    decode math; corrupt payloads become tagged error rows. The
    superset schema lets one pass profile a whole crawl media column
    before any decoder runs."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("n_bytes", IntegerType()),
            StructField("probe_ok", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {f.name: [] for f in out_schema.fields}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                row = dict.fromkeys(cols)
                row[id_col] = mid
                if p is None:
                    row["probe_ok"] = "error: null input"
                else:
                    data = bytes(p)
                    row["n_bytes"] = len(data)
                    try:
                        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                            from spatialpandas_spark.operators.avi import (
                                avi_metadata,
                            )

                            mv = avi_metadata(data)
                            row.update(
                                format="avi",
                                width=mv["width"],
                                height=mv["height"],
                                # nearest int: a 30000/1001 stream
                                # reports 30, not a truncated 29
                                sample_rate=int(round(mv["fps"])),
                                n_channels=mv["n_streams"],
                                n_samples=mv["total_frames"],
                                probe_ok="ok",
                            )
                        elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                            fmt, raw = _parse_wav(data)
                            frame = fmt["n_channels"] * (fmt["bits"] // 8)
                            row.update(
                                format="wav",
                                sample_rate=fmt["sample_rate"],
                                n_channels=fmt["n_channels"],
                                n_samples=len(raw) // max(frame, 1),
                                probe_ok="ok",
                            )
                        elif data[:4] == b"fLaC":
                            from spatialpandas_spark.operators.flac import (
                                flac_streaminfo,
                            )

                            si = flac_streaminfo(data)
                            row.update(
                                format="flac",
                                sample_rate=si["sample_rate"],
                                n_channels=si["channels"],
                                n_samples=int(si["total_samples"]),
                                probe_ok="ok",
                            )
                        else:
                            kind, w, h = image_dimensions(data)
                            row.update(
                                format=kind, width=w, height=h, probe_ok="ok"
                            )
                    except ValueError as exc:
                        row["probe_ok"] = f"error: {exc}"[:120]
                for k, v in row.items():
                    cols[k].append(v)
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
