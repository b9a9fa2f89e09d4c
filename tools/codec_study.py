"""Codec-layer throughput study: decode+featurize rates for the real
image codecs (PNG / baseline JPEG / GIF / PPM) through the engine's
Arrow-batched ``extract_features`` path, against a single-process
numpy twin calling the same kernels directly (no framework overhead).

Answers the two questions the bench queries can't: (1) what per-image
decode cost does each format carry (the JPEG/GIF entropy loops are
bit-serial Python; PNG filter-0 rows and PPM are vectorized), and
(2) how much of that cost the engine's parallelism hides at local[32]
— the proxy for 1000-executor behavior, since decode is embarrassingly
parallel across payloads.

Prints one JSON line:
{"n_images": N, "px": WxH, "formats": {fmt: {"spark_sec": s,
"local_sec": s, "imgs_per_sec_spark": r, "imgs_per_sec_local": r}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("SPARK_GRAFT_CODEC_N", "1000"))
W = int(os.environ.get("SPARK_GRAFT_CODEC_W", "64"))
H = int(os.environ.get("SPARK_GRAFT_CODEC_H", "64"))
REPS = 3


def make_payloads():
    """Deterministic synthetic images: smooth gradients + noise bands —
    compressible enough to be fair to PNG/GIF, busy enough to be fair
    to JPEG."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    import test_multimodal_jpeg as tj
    from test_multimodal_gif import PAL4, encode_gif

    from spatialpandas_spark.operators.jpeg import _B
    from spatialpandas_spark.operators.multimodal import encode_ppm
    from spatialpandas_spark.operators.png import encode_png

    # the tests keep the deliberately-slow literal-double-sum DCT for
    # implementation independence; this TOOL only needs payloads fast,
    # so swap in the equivalent basis-matrix transform (same values)
    tj._fdct_direct = lambda blk: _B @ (blk.astype(np.float64) - 128.0) @ _B.T
    encode_jpeg = tj.encode_jpeg

    rng = np.random.default_rng(7)
    out = {"ppm": [], "png": [], "jpeg": [], "gif": []}
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(N_IMAGES):
        base = ((yy * (i % 5 + 1) + xx * (i % 3 + 1)) % 256).astype(np.uint8)
        img = np.stack(
            [base, np.roll(base, i % 7, axis=1), 255 - base], axis=2
        )
        img[(i % H), :] = rng.integers(0, 256, size=(W, 3), dtype=np.uint8)
        out["ppm"].append(encode_ppm(img))
        out["png"].append(encode_png(img))
        out["jpeg"].append(encode_jpeg(img))
        out["gif"].append(encode_gif([(base % 4).astype(np.uint8)], PAL4))
    return out


def main() -> None:
    from spatialpandas_spark.operators.multimodal import _DECODERS, extract_features
    from spatialpandas_spark.session import get_spark

    payloads = make_payloads()
    spark = get_spark(app_name="codec_study")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for fmt, plist in payloads.items():
        df = spark.createDataFrame(
            list(enumerate(plist)), "media_id long, payload binary"
        ).repartition(32).cache()
        df.count()

        def run_spark():
            return extract_features(df, decoder=fmt).filter(
                "decode_ok = 'ok'"
            ).count()

        n_ok = run_spark()  # warm
        assert n_ok == N_IMAGES, (fmt, n_ok)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            run_spark()
            ts.append(time.time() - t0)
        spark_sec = statistics.median(ts)

        kernel = _DECODERS[fmt]
        t0 = time.time()
        for p in plist:
            kernel(p)
        local_sec = time.time() - t0

        results[fmt] = {
            "spark_sec": round(spark_sec, 3),
            "local_sec": round(local_sec, 3),
            "imgs_per_sec_spark": round(N_IMAGES / spark_sec),
            "imgs_per_sec_local": round(N_IMAGES / local_sec),
        }
        df.unpersist()

    print(
        json.dumps(
            {"n_images": N_IMAGES, "px": f"{W}x{H}", "formats": results}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
