"""Streaming media featurization: extract_features is a stateless
narrow transform (mapInPandas), so it must run unchanged on a streaming
DataFrame and agree with its batch twin on the same finite input — the
same twin-equivalence contract the other streaming suites use. Covers
the mixed-format sniffing path (PNG + PPM + corrupt rows) end-to-end
through a file-source micro-batch stream."""

import numpy as np
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from spatialpandas_spark.operators.multimodal import encode_ppm, extract_features
from spatialpandas_spark.operators.png import encode_png

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def test_streaming_extract_features_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(30):
        img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
        payload = encode_png(img) if i % 2 == 0 else encode_ppm(img)
        rows.append((i, bytearray(payload)))
    rows.append((99, bytearray(b"not an image")))

    src = str(tmp_path / "media")
    # three files -> three micro-batches
    for lo, hi in ((0, 10), (10, 20), (20, 31)):
        spark.createDataFrame(rows[lo:hi], MEDIA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        extract_features(stream, decoder="image")
        .writeStream.format("memory")
        .queryName("media_feats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["media_id"]: (r["feature"], r["decode_ok"])
        for r in spark.sql("SELECT * FROM media_feats").collect()
    }

    batch = spark.createDataFrame(rows, MEDIA_SCHEMA)
    exp = {
        r["media_id"]: (r["feature"], r["decode_ok"])
        for r in extract_features(batch, decoder="image").collect()
    }
    assert set(got) == set(exp) and len(got) == 31
    for mid in exp:
        assert got[mid] == exp[mid], mid
    assert got[99][0] is None and got[99][1].startswith("error")
