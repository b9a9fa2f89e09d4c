"""Interop with datasets written by reference spatialpandas
(``to_parquet_dask`` / ``read_parquet_dask``).

Reference on-disk layout (ref ``io/parquet.py:143-182`` write,
``:488-519`` read, ``:522-543`` divisions; verified against the
reference-written fixtures ``tests/test_data/dask_*.parq``):

- one parquet file per dask partition, named ``part.{i}.parquet``;
- ``_common_metadata`` carrying a ``b'spatialpandas'`` key-value entry:
  JSON ``{"partition_bounds": {<geom_col>: {"x0": {"<i>": v, ...},
  "y0": ..., "x1": ..., "y1": ...}}}`` (pandas ``DataFrame.to_dict()``
  orientation, partition index as string keys);
- ``_metadata`` aggregating row-group footers; packed datasets carry a
  ``hilbert_distance`` column whose per-row-group min/max are the dask
  ``divisions`` (ref ``io/parquet.py:522-543``);
- geometry columns as plain nested ``list<double>`` arrays with
  interleaved x,y coords: point ``list<double>``(2),
  line/multipoint ``list<double>``, polygon/multiline
  ``list<list<double>>``, multipolygon ``list<list<list<double>>>`` —
  exactly this engine's column model except Point (struct{x,y} here).

Spark-first notes: pruning happens before ``spark.read`` ever lists
files (driver-side manifest decode, same as our native manifest reader),
and hilbert-range reads push a range predicate down to parquet row-group
stats — the divisions analog without dask's sorted-partition bookkeeping.
"""

from __future__ import annotations

import json
import os
import posixpath
import re

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialpandas_spark.sources import fs as _fs

_PART_RE = re.compile(r"part\.(\d+)\.parquet$")


def _natural_parts(path: str, filesystem=None) -> list[str]:
    """Dataset files in partition order (part.0, part.1, ... part.10)."""
    files = _fs.list_files(path, ".parquet", filesystem=filesystem)
    out = []
    for fp in files:
        m = _PART_RE.search(posixpath.basename(fp))
        if m:
            out.append((int(m.group(1)), fp))
    if out:
        return [fp for _, fp in sorted(out)]
    # fall back to lexicographic (our own writer's part-00000-... names)
    return files


def load_partition_bounds(path: str, filesystem=None) -> dict[str, list[tuple]]:
    """Decode the ``b'spatialpandas'`` partition-bounds metadata.

    Returns {geom_col: [(x0, y0, x1, y1), ...]} ordered by partition
    index; empty dict when no spatialpandas metadata exists.
    """
    cm = f"{path.rstrip('/')}/_common_metadata"
    if not _fs.exists(cm, filesystem=filesystem):
        return {}
    meta = _fs.read_parquet_metadata(cm, filesystem=filesystem).metadata or {}
    raw = meta.get(b"spatialpandas")
    if raw is None:
        return {}
    spatial = json.loads(raw.decode("utf-8"))
    out: dict[str, list[tuple]] = {}
    for col, cols in spatial.get("partition_bounds", {}).items():
        idx = sorted(cols["x0"], key=int)
        out[col] = [
            (cols["x0"][i], cols["y0"][i], cols["x1"][i], cols["y1"][i])
            for i in idx
        ]
    return out


def load_divisions(path: str, filesystem=None) -> tuple[list, list]:
    """Per-row-group ``hilbert_distance`` min/max — the reference's
    ``load_divisions`` (ref ``io/parquet.py:522-543``). Reads the
    aggregated ``_metadata`` footer when present, else per-file footers.
    """
    mpath = f"{path.rstrip('/')}/_metadata"
    metas = (
        [_fs.read_parquet_metadata(mpath, filesystem=filesystem)]
        if _fs.exists(mpath, filesystem=filesystem)
        else [
            _fs.read_parquet_metadata(fp, filesystem=filesystem)
            for fp in _natural_parts(path, filesystem=filesystem)
        ]
    )
    mins: list = []
    maxes: list = []
    for fmd in metas:
        div_col = None
        rg0 = fmd.row_group(0)
        for c in range(rg0.num_columns):
            if rg0.column(c).path_in_schema == "hilbert_distance":
                div_col = c
                break
        if div_col is None:
            raise ValueError(
                "Cannot load divisions: no hilbert_distance column"
            )
        for i in range(fmd.num_row_groups):
            st = fmd.row_group(i).column(div_col).statistics
            mins.append(st.min)
            maxes.append(st.max)
    return mins, maxes


def st_point_from_flat(col) -> F.Column:
    """Reference point encoding (flat ``list<double>`` [x, y]) -> this
    engine's point struct{x, y}. Null and empty (NaN-pair) safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull() & (F.size(c) >= 2),
        F.struct(c[0].alias("x"), c[1].alias("y")),
    )


def read_reference_parquet(
    spark: SparkSession,
    path: str,
    geometry: str | None = None,
    bounds: tuple[float, float, float, float] | None = None,
    hilbert_range: tuple[int, int] | None = None,
    point_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Read a reference-written dataset, pruning partitions via its
    embedded bounds metadata (parity with ``read_parquet_dask(bounds=)``).

    - ``geometry`` names the bounds entry to prune on (defaults to the
      only geometry column in the metadata, as in the reference);
    - ``hilbert_range`` adds a ``hilbert_distance`` range predicate that
      parquet row-group stats serve (the ``load_divisions`` fast path);
    - ``point_columns`` are flat [x, y] lists converted to point structs.
    """
    files = _natural_parts(path)
    pb = load_partition_bounds(path)
    if bounds is not None and pb:
        if geometry is None:
            if len(pb) != 1:
                raise ValueError(
                    f"geometry= required; dataset has bounds for {sorted(pb)}"
                )
            geometry = next(iter(pb))
        qx0, qy0, qx1, qy1 = bounds
        if qx1 < qx0:
            qx0, qx1 = qx1, qx0
        if qy1 < qy0:
            qy0, qy1 = qy1, qy0
        pbounds = pb[geometry]
        files = [
            fp
            for fp, (x0, y0, x1, y1) in zip(files, pbounds)
            if x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
        ]
        if not files:
            return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(*files)
    if hilbert_range is not None:
        lo, hi = hilbert_range
        df = df.filter(F.col("hilbert_distance").between(lo, hi))
    for c in point_columns:
        df = df.withColumn(c, st_point_from_flat(c))
    return df


_PANDAS_TYPE = {
    1: "list[float64]",
    2: "list[list[float64]]",
    3: "list[list[list[float64]]]",
}


def write_reference_parquet(
    df: DataFrame,
    path: str,
    geom_cols: dict[str, str],
    bounds_col: str = "bounds",
) -> None:
    """Write a dataset the reference's ``read_parquet_dask`` can open:
    ``part.{i}.parquet`` naming, aggregated ``_metadata``, and
    ``_common_metadata`` carrying the ``b'spatialpandas'``
    partition-bounds JSON plus pandas extension-dtype metadata.

    ``geom_cols`` maps column name -> reference dtype name (``point``,
    ``line``, ``multiline``, ``polygon``, ``multipolygon``, ...); those
    columns must already be in the reference's nested-list encoding
    (use ``st_point_to_flat`` for struct points). Partition bounds are
    computed from each written file's parquet footer stats on
    ``bounds_col`` (no second data scan).
    """
    import pyarrow as pa

    from spatialpandas_spark.sources.spatial_parquet import build_manifest

    df.write.mode("overwrite").parquet(path)
    # dask naming: rename spark's part-00000-uuid files (already in
    # partition order lexicographically) to part.{i}.parquet; the move
    # goes through the pyarrow fs layer so object-store paths work
    fsys, local = _fs.resolve(path)
    spark_parts = _fs.list_files(path, ".parquet", filesystem=fsys)
    if not spark_parts:
        raise ValueError(
            f"nothing written to {path!r} (empty DataFrame?) — a "
            "reference-format dataset needs at least one partition file"
        )
    files = []
    for i, fp in enumerate(spark_parts):
        dst = f"{local.rstrip('/')}/part.{i}.parquet"
        fsys.move(fp, dst)
        files.append(dst)

    manifest = build_manifest(path, bounds_col, filesystem=fsys)
    pb: dict[str, dict] = {}
    for col in geom_cols:
        entry = {"x0": {}, "y0": {}, "x1": {}, "y1": {}}
        for i, fp in enumerate(files):
            b = manifest.get(posixpath.basename(fp))
            if b is None:
                continue
            for k, v in zip(("x0", "y0", "x1", "y1"), b):
                entry[k][str(i)] = v
        pb[col] = entry

    schema = pq.read_schema(files[0], filesystem=fsys)
    pandas_cols = []
    for name in schema.names:
        t = schema.field(name).type
        depth = 0
        tt = t
        while pa.types.is_list(tt) or pa.types.is_large_list(tt):
            depth += 1
            tt = tt.value_type
        if name in geom_cols and depth in _PANDAS_TYPE:
            pandas_cols.append(
                {
                    "name": name,
                    "field_name": name,
                    "pandas_type": _PANDAS_TYPE[depth],
                    "numpy_type": f"{geom_cols[name]}[float64]",
                    "metadata": None,
                }
            )
        else:
            pandas_cols.append(
                {
                    "name": name,
                    "field_name": name,
                    "pandas_type": str(t),
                    "numpy_type": str(t),
                    "metadata": None,
                }
            )
    meta = {
        b"spatialpandas": json.dumps({"partition_bounds": pb}).encode(),
        b"pandas": json.dumps(
            {
                "index_columns": [],
                "column_indexes": [],
                "columns": pandas_cols,
                "creator": {"library": "pyarrow", "version": pa.__version__},
                "pandas_version": "2.0.0",
            }
        ).encode(),
    }
    schema = schema.with_metadata(meta)
    # aggregated _metadata + _common_metadata footers
    collector = []
    for fp in files:
        md = _fs.read_parquet_metadata(fp, filesystem=fsys)
        md.set_file_path(posixpath.basename(fp))
        collector.append(md)
    pq.write_metadata(
        schema, f"{local.rstrip('/')}/_metadata", collector, filesystem=fsys
    )
    pq.write_metadata(
        schema, f"{local.rstrip('/')}/_common_metadata", filesystem=fsys
    )


def st_point_to_flat(col) -> F.Column:
    """point struct{x,y} -> reference flat [x, y] list encoding."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.array(c["x"], c["y"]))
