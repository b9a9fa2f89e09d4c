"""WKB (well-known binary) bridge — interop with GeoPandas / Sedona /
DuckDB-spatial / PostGIS data (replaces the reference's shapely-object
conversion surface, ref ``geometry/base.py:185-215`` from_geopandas /
to_geopandas and per-type ``_shapely_to_coordinates``).

Standard ISO WKB, little-endian, 2-D. Runs as Arrow-batched pandas UDFs —
this is an ingest/export boundary, not a hot loop; per-row Python struct
packing is acceptable there (the reference's conversion path is per-row
shapely calls too).
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_GEOM_WKB_KIND = {
    "point": WKB_POINT,
    "line": WKB_LINESTRING,
    "ring": WKB_LINESTRING,
    "multipoint": WKB_MULTIPOINT,
    "polygon": WKB_POLYGON,
    "multiline": WKB_MULTILINESTRING,
    "multipolygon": WKB_MULTIPOLYGON,
}


# ------------------------------------------------------------------ encode
def _enc_header(kind: int) -> bytes:
    return struct.pack("<BI", 1, kind)


def _enc_coords(flat) -> bytes:
    n = len(flat) // 2
    return struct.pack("<I", n) + struct.pack(f"<{len(flat)}d", *flat)


def _enc_point(xy) -> bytes:
    return _enc_header(WKB_POINT) + struct.pack("<2d", xy[0], xy[1])


def _enc_linestring(flat) -> bytes:
    return _enc_header(WKB_LINESTRING) + _enc_coords(flat)


def _enc_polygon(rings) -> bytes:
    out = _enc_header(WKB_POLYGON) + struct.pack("<I", len(rings))
    for ring in rings:
        out += _enc_coords(ring)
    return out


def _enc_multipoint(flat) -> bytes:
    n = len(flat) // 2
    out = _enc_header(WKB_MULTIPOINT) + struct.pack("<I", n)
    for i in range(n):
        out += _enc_point((flat[2 * i], flat[2 * i + 1]))
    return out


def _enc_multilinestring(lines) -> bytes:
    out = _enc_header(WKB_MULTILINESTRING) + struct.pack("<I", len(lines))
    for line in lines:
        out += _enc_linestring(line)
    return out


def _enc_multipolygon(polys) -> bytes:
    out = _enc_header(WKB_MULTIPOLYGON) + struct.pack("<I", len(polys))
    for poly in polys:
        out += _enc_polygon(poly)
    return out


_ENCODERS = {
    "point": lambda g: _enc_point((g["x"], g["y"]) if isinstance(g, dict) else (g[0], g[1])),
    "line": _enc_linestring,
    "ring": _enc_linestring,
    "multipoint": _enc_multipoint,
    "polygon": _enc_polygon,
    "multiline": _enc_multilinestring,
    "multipolygon": _enc_multipolygon,
}


def st_as_wkb(geom: Column, geom_type: str) -> Column:
    """Encode a geometry column to standard little-endian WKB bytes."""
    enc = _ENCODERS[geom_type]
    if geom_type == "point":
        @F.pandas_udf(BinaryType())
        def _enc_pt(x: pd.Series, y: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None if pd.isna(a) else _enc_point((a, b))
                    for a, b in zip(x, y)
                ],
                dtype=object,
            )

        return _enc_pt(geom["x"], geom["y"])

    @F.pandas_udf(BinaryType())
    def _enc_any(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if g is None else enc(g) for g in s], dtype=object
        )

    return _enc_any(geom)


# ------------------------------------------------------------------ decode
class _Reader:
    __slots__ = ("buf", "pos", "order")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def header(self) -> int:
        bo = self.buf[self.pos]
        self.pos += 1
        fmt = "<I" if bo == 1 else ">I"
        (raw,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += 4
        self.order = "<" if bo == 1 else ">"
        # EWKB flag bits (PostGIS): Z=0x80000000, M=0x40000000, SRID=0x20000000
        if raw & 0x80000000 or raw & 0x40000000:
            raise ValueError(
                "WKB with Z/M coordinates is not supported (2-D engine)"
            )
        if raw & 0x20000000:
            self.pos += 4  # skip the 4-byte SRID payload
        kind = raw & 0x1FFFFFFF
        # ISO WKB encodes Z/M/ZM as type + 1000/2000/3000
        if kind >= 1000:
            raise ValueError(
                f"ISO WKB Z/M geometry type {kind} is not supported (2-D engine)"
            )
        return kind

    def u32(self) -> int:
        (v,) = struct.unpack_from(f"{self.order}I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, n: int) -> list[float]:
        vals = list(struct.unpack_from(f"{self.order}{2 * n}d", self.buf, self.pos))
        self.pos += 16 * n
        return vals


def _dec_any(buf: bytes):
    r = _Reader(buf)
    kind = r.header()
    return _dec_body(r, kind), kind


def _dec_body(r: _Reader, kind: int):
    if kind == WKB_POINT:
        return r.coords(1)
    if kind == WKB_LINESTRING:
        return r.coords(r.u32())
    if kind == WKB_POLYGON:
        return [r.coords(r.u32()) for _ in range(r.u32())]
    if kind == WKB_MULTIPOINT:
        out = []
        for _ in range(r.u32()):
            k = r.header()
            assert k == WKB_POINT
            out += r.coords(1)
        return out
    if kind == WKB_MULTILINESTRING:
        out = []
        for _ in range(r.u32()):
            k = r.header()
            assert k == WKB_LINESTRING
            out.append(r.coords(r.u32()))
        return out
    if kind == WKB_MULTIPOLYGON:
        out = []
        for _ in range(r.u32()):
            k = r.header()
            assert k == WKB_POLYGON
            out.append([r.coords(r.u32()) for _ in range(r.u32())])
        return out
    raise ValueError(f"unsupported WKB geometry type {kind}")


def st_from_wkb(wkb: Column, geom_type: str) -> Column:
    """Decode WKB bytes into this engine's nested-array encoding. The
    declared ``geom_type`` fixes the output schema; Line/MultiLine and
    Polygon/MultiPolygon promotions (ref ``base.py:799-871``) are applied:
    a LineString decodes into a multiline column as a single part, a
    Polygon into a multipolygon column as a single polygon."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    if geom_type == "point":
        # decode via an array<double> intermediate: a pandas UDF with a
        # struct return type cannot produce NULL structs, the array path can
        arr = st_from_wkb(wkb, "__point_as_array")
        return F.when(
            arr.isNotNull(),
            F.struct(F.get(arr, 0).alias("x"), F.get(arr, 1).alias("y")),
        )
    if geom_type == "__point_as_array":
        out_t = ArrayType(DoubleType())
        target_kind = WKB_POINT
    else:
        from spatialpandas_spark.functions.measures import NESTING

        t = DoubleType()
        for _ in range(NESTING[geom_type]):
            t = ArrayType(t)
        out_t = t
        target_kind = _GEOM_WKB_KIND[geom_type]

    @F.pandas_udf(out_t)
    def _dec(s: pd.Series) -> pd.Series:
        out = []
        for buf in s:
            if buf is None:
                out.append(None)
                continue
            body, kind = _dec_any(bytes(buf))
            if kind == target_kind:
                pass
            elif target_kind == WKB_MULTILINESTRING and kind == WKB_LINESTRING:
                body = [body]
            elif target_kind == WKB_MULTIPOLYGON and kind == WKB_POLYGON:
                body = [body]
            elif target_kind == WKB_MULTIPOINT and kind == WKB_POINT:
                pass
            elif target_kind == WKB_LINESTRING and kind == WKB_MULTIPOINT:
                pass
            else:
                raise ValueError(
                    f"WKB kind {kind} incompatible with {geom_type}"
                )
            out.append(body)
        return pd.Series(out, dtype=object)

    return _dec(wkb)
