"""Interop with reference-written parquet datasets.

The reference repo ships datasets actually written by spatialpandas
``to_parquet_dask`` (``tests/test_data/dask_*.parq``) — real
``_common_metadata`` partition bounds, dask file naming, packed variants
with a ``hilbert_distance`` index. These are used READ-ONLY as golden
inputs.
"""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.sources.reference_parquet import (
    load_divisions,
    load_partition_bounds,
    read_reference_parquet,
    st_point_to_flat,
    write_reference_parquet,
)

REF_DATA = "/root/reference/spatialpandas/tests/test_data"
PLAIN = f"{REF_DATA}/dask_8.0.0.parq"
PACKED = f"{REF_DATA}/dask_repart_8.0.0.parq"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PLAIN), reason="reference fixtures unavailable"
)


def test_load_partition_bounds_matches_embedded_json():
    pb = load_partition_bounds(PLAIN)
    assert list(pb) == ["multiline"]
    raw = json.loads(
        pq.read_metadata(f"{PLAIN}/_common_metadata").metadata[b"spatialpandas"]
    )["partition_bounds"]["multiline"]
    for i, (x0, y0, x1, y1) in enumerate(pb["multiline"]):
        assert (x0, y0, x1, y1) == (
            raw["x0"][str(i)], raw["y0"][str(i)], raw["x1"][str(i)], raw["y1"][str(i)]
        )


def test_read_reference_dataset_full(spark):
    df = read_reference_parquet(spark, PLAIN)
    rows = df.collect()
    assert len(rows) == pq.read_metadata(f"{PLAIN}/_metadata").num_rows
    # geometry arrives in this engine's multiline encoding: array<array<double>>
    first = rows[0]["multiline"]
    assert isinstance(first[0][0], float)


def test_read_reference_dataset_bounds_prunes_partitions(spark):
    pb = load_partition_bounds(PLAIN)["multiline"]
    # viewport overlapping ONLY partition 0
    x0, y0, x1, y1 = pb[0]
    ox0, _, _, _ = pb[1]
    probe = (x0, y0, min(x1, ox0) - 1e-6, y1)
    df = read_reference_parquet(spark, PLAIN, bounds=probe)
    files = {os.path.basename(f) for f in df.inputFiles()}
    assert files == {"part.0.parquet"}
    # disjoint viewport: empty, schema intact
    far = (x1 + 1e3, y1 + 1e3, x1 + 2e3, y1 + 2e3)
    empty = read_reference_parquet(spark, PLAIN, bounds=far)
    assert empty.count() == 0
    assert "multiline" in empty.columns


def test_reference_length_measure_on_real_geometry(spark):
    """Kernel parity on reference-written geometry: st_length equals a
    numpy recomputation from the raw buffers."""
    import numpy as np

    from spatialpandas_spark.functions.measures import st_length

    df = read_reference_parquet(spark, PLAIN)
    got = (
        df.select(F.col("a"), st_length(F.col("multiline"), "multiline").alias("l"))
        .orderBy("a")
        .collect()
    )
    t = pq.read_table(f"{PLAIN}/part.0.parquet").to_pydict()
    t2 = pq.read_table(f"{PLAIN}/part.1.parquet").to_pydict()
    rows = sorted(
        zip(t["a"] + t2["a"], t["multiline"] + t2["multiline"]),
        key=lambda kv: kv[0],
    )
    for (a, ml), r in zip(rows, got):
        exp = 0.0
        for ring in ml:
            xs = np.array(ring[0::2])
            ys = np.array(ring[1::2])
            exp += float(np.sum(np.hypot(np.diff(xs), np.diff(ys))))
        assert r["a"] == a
        assert r["l"] == pytest.approx(exp, rel=1e-12)


def test_load_divisions_packed_dataset():
    mins, maxes = load_divisions(PACKED)
    assert len(mins) == len(maxes) >= 2
    assert all(lo <= hi for lo, hi in zip(mins, maxes))
    # divisions are sorted across row groups in a packed dataset
    assert mins == sorted(mins)


def test_load_divisions_requires_hilbert_column():
    with pytest.raises(ValueError, match="hilbert_distance"):
        load_divisions(PLAIN)


def test_hilbert_range_read(spark):
    mins, maxes = load_divisions(PACKED)
    df = read_reference_parquet(
        spark, PACKED, hilbert_range=(mins[0], maxes[0])
    )
    n = df.count()
    full = read_reference_parquet(spark, PACKED).count()
    assert 0 < n < full


def test_write_reference_parquet_roundtrip(spark, tmp_path):
    """Our writer's output is readable back through the reference-format
    reader with bounds pruning, and its _common_metadata decodes with the
    exact logic the reference uses (json -> partition_bounds)."""
    from spatialpandas_spark import st_point, with_bounds

    path = str(tmp_path / "refout")
    df = spark.range(1000).select(
        F.col("id"),
        st_point(
            (F.col("id") % 100).cast("double"), (F.col("id") % 50).cast("double")
        ).alias("geom"),
    )
    df = with_bounds(df, "geom", "point").withColumn(
        "geom", st_point_to_flat("geom")
    ).repartitionByRange(4, "id").sortWithinPartitions("id")
    write_reference_parquet(df, path, geom_cols={"geom": "point"})

    names = sorted(os.listdir(path))
    assert "_common_metadata" in names and "_metadata" in names
    assert [n for n in names if n.endswith(".parquet")] == [
        f"part.{i}.parquet" for i in range(4)
    ]
    # decodes via the reference's own metadata shape
    pb = load_partition_bounds(path)
    assert list(pb) == ["geom"] and len(pb["geom"]) == 4

    back = read_reference_parquet(
        spark, path, bounds=(0.0, 0.0, 1000.0, 1000.0), point_columns=("geom",)
    )
    assert back.count() == 1000
    assert back.schema["geom"].dataType.typeName() == "struct"
    # pruning: each partition holds 250 consecutive ids -> x spans all
    # files (id%100), so prune on y instead via a thin viewport
    some = read_reference_parquet(spark, path, bounds=(0.0, 0.0, 5.0, 5.0))
    assert 0 < some.count() <= 1000
