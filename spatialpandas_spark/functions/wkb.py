"""WKB (well-known binary) bridge — interop with GeoPandas / Sedona /
DuckDB-spatial / PostGIS data (replaces the reference's shapely-object
conversion surface, ref ``geometry/base.py:185-215`` from_geopandas /
to_geopandas and per-type ``_shapely_to_coordinates``).

Standard ISO WKB, little-endian, 2-D. Runs as Arrow-batched pandas
UDFs. Encoding is VECTORIZED (VERDICT r9 #6): one flat numpy byte
buffer per Arrow batch, headers/counts/coords scattered with index
arithmetic, materialized as a pyarrow BinaryArray — no per-element
Python loop; the per-row struct encoders remain as the byte-exact twin
the identity battery compares against. Decoding stays per-row (the
import boundary must parse untrusted byte-order/flag variants
defensively; it is not the hot path).
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


def _odd(flat) -> bool:
    return len(flat) % 2 != 0


def _enc_coords(flat) -> bytes:
    if _odd(flat):
        raise ValueError(
            f"odd flat-coordinate length {len(flat)}: coordinates must "
            "be interleaved x,y pairs"
        )
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
    if _odd(flat):
        raise ValueError(
            f"odd flat-coordinate length {len(flat)}: coordinates must "
            "be interleaved x,y pairs"
        )
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


# -------------------------------------------------- vectorized encode
# numpy batch encoders (VERDICT r9 #6): one flat uint8 buffer per Arrow
# batch, headers/counts/coords scattered with vectorized index
# arithmetic, materialized as a pyarrow BinaryArray — no per-element
# Python loop. The per-row struct encoders above stay as the byte-exact
# twin every identity test compares against.

#: nesting depth of the list encoding per geometry type (point aside)
_ENC_DEPTH = {
    "line": 1,
    "ring": 1,
    "multipoint": 1,
    "polygon": 2,
    "multiline": 2,
    "multipolygon": 3,
}


def _u32le(vals) -> "np.ndarray":  # noqa: F821 - doc type
    import numpy as np

    return np.ascontiguousarray(vals, dtype="<u4").view(np.uint8).reshape(-1, 4)


def _scatter(out, dst, src2d) -> None:
    """out[dst[i] + j] = src2d[i, j] — one fancy-index store."""
    import numpy as np

    w = src2d.shape[1]
    out[(dst[:, None] + np.arange(w)[None, :]).ravel()] = src2d.ravel()


def _nested_arrays(s: pd.Series, depth: int):
    """Object Series of nested lists -> (validity, level offsets
    [o1..odepth], flat float64 values) via one pyarrow conversion."""
    import numpy as np
    import pyarrow as pa

    t = pa.float64()
    for _ in range(depth):
        t = pa.list_(t)
    arr = pa.array(s, type=t, from_pandas=True)
    valid = np.asarray(arr.is_valid())
    offsets = []
    cur = arr
    for level in range(depth):
        offsets.append(np.asarray(cur.offsets))
        cur = cur.values
        # only TOP-level nulls are legal (row nulls, handled by `valid`);
        # a null nested list or null coordinate would silently become
        # NaN under np.asarray, diverging from the per-row struct twin
        # which fails fast — keep the byte-identity contract by raising
        if cur.null_count:
            raise ValueError(
                f"null inside nested geometry at depth {level + 1} "
                f"({cur.null_count} null value(s)); the batch WKB "
                "encoder rejects malformed input like the per-row twin"
            )
    flat = np.asarray(cur, dtype=np.float64)
    return valid, offsets, flat


#: pa.binary() offsets are int32 — a batch whose encoded bytes reach
#: 2 GiB must not wrap silently (callers fall back to the per-row twin)
_MAX_BATCH_BYTES = (1 << 31) - 1


class _BatchTooLarge(Exception):
    pass


def _binary_from(out, sizes, valid) -> pd.Series:
    import numpy as np
    import pyarrow as pa

    n = len(sizes)
    total = int(np.asarray(sizes, dtype=np.int64).sum())
    if total > _MAX_BATCH_BYTES:
        raise _BatchTooLarge(total)
    boffs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(sizes, out=boffs[1:])
    ba = pa.BinaryArray.from_buffers(
        pa.binary(),
        n,
        [
            pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()),
            pa.py_buffer(boffs.tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
        null_count=int((~valid).sum()),
    )
    return ba.to_pandas()


def _enc_batch_point(x: pd.Series, y: pd.Series) -> pd.Series:
    import numpy as np

    xa = np.asarray(x, dtype=np.float64)
    ya = np.asarray(y, dtype=np.float64)
    # match the per-row twin: pd.isna(x) alone decides null
    valid = ~pd.isna(x).to_numpy()
    n = len(xa)
    rows = np.empty((n, 21), dtype=np.uint8)
    rows[:, 0] = 1
    rows[:, 1:5] = _u32le(np.full(n, WKB_POINT))
    rows[:, 5:13] = np.ascontiguousarray(xa, dtype="<f8").view(np.uint8).reshape(n, 8)
    rows[:, 13:21] = np.ascontiguousarray(ya, dtype="<f8").view(np.uint8).reshape(n, 8)
    sizes = np.where(valid, 21, 0).astype(np.int64)
    out = rows[valid].reshape(-1)
    return _binary_from(out, sizes, valid)


def _hdr9(k: int, kind, counts) -> "np.ndarray":  # noqa: F821
    """(k, 9) little-endian geometry headers: 0x01 + u32 kind + u32 count."""
    import numpy as np

    h = np.empty((k, 9), dtype=np.uint8)
    h[:, 0] = 1
    h[:, 1:5] = _u32le(np.broadcast_to(kind, (k,)))
    h[:, 5:9] = _u32le(counts)
    return h


def _assemble(total: int, blocks, coord_bytes) -> "np.ndarray":  # noqa: F821
    """Output assembly without per-coordinate index math: scatter the
    (few, fixed-width) header blocks to their positions, then store the
    coordinate byte stream — which appears in SOURCE ORDER in WKB — into
    every remaining position with one boolean-mask store. Header volume
    is O(geometries + parts + rings); only headers pay fancy indexing."""
    import numpy as np

    out = np.empty(total, dtype=np.uint8)
    mask = np.ones(total, dtype=bool)
    for pos, rows in blocks:
        w = rows.shape[1]
        idx = (pos[:, None] + np.arange(w)[None, :]).ravel()
        out[idx] = rows.ravel()
        mask[idx] = False
    out[mask] = coord_bytes
    return out


def _excl_starts(sizes) -> "np.ndarray":  # noqa: F821
    import numpy as np

    starts = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    return starts


def _check_even(nd, row_of_leaf, what: str) -> None:
    """Every leaf coordinate list must hold interleaved x,y pairs; an
    odd length would leave a dangling double in the byte stream that
    the header counts don't cover (shape-mismatch crash or corrupt WKB
    depending on type). Raise naming the offending ROW, matching the
    per-row twin's fail-fast on malformed input."""
    import numpy as np

    bad = np.nonzero(np.asarray(nd) & 1)[0]
    if len(bad):
        leaf = int(bad[0])
        row = int(row_of_leaf(leaf))
        raise ValueError(
            f"odd flat-coordinate length {int(nd[leaf])} in {what} "
            f"{leaf} (row {row}): coordinates must be interleaved "
            "x,y pairs"
        )


def _enc_batch(s: pd.Series, geom_type: str) -> pd.Series:
    import numpy as np

    kind = _GEOM_WKB_KIND[geom_type]
    depth = _ENC_DEPTH[geom_type]
    valid, offs, flat = _nested_arrays(s, depth)
    n = len(valid)
    cb = np.ascontiguousarray(flat, dtype="<f8").view(np.uint8).ravel()

    if depth == 1:
        o = offs[0]
        nd = (o[1:] - o[:-1]).astype(np.int64)  # doubles per row
        _check_even(nd, lambda i: i, "flat list")
        if geom_type == "multipoint":
            npts = nd // 2
            sizes = np.where(valid, 9 + npts * 21, 0)
            starts = _excl_starts(sizes)
            # per-point 5-byte headers at starts[row] + 9 + 21*j
            pt_row = np.repeat(np.arange(n), npts)
            j = np.arange(int(npts.sum()))
            pts_off = _excl_starts(npts)  # exclusive point counts
            pstart = starts[pt_row] + 9 + (j - pts_off[pt_row]) * 21
            ph = np.empty((len(j), 5), dtype=np.uint8)
            ph[:, 0] = 1
            ph[:, 1:5] = _u32le(np.full(len(j), WKB_POINT))
            blocks = [
                (starts[valid], _hdr9(int(valid.sum()), kind, npts[valid])),
                (pstart, ph),
            ]
        else:
            sizes = np.where(valid, 9 + 8 * nd, 0)
            starts = _excl_starts(sizes)
            blocks = [
                (starts[valid], _hdr9(int(valid.sum()), kind, nd[valid] // 2))
            ]
        out = _assemble(int(sizes.sum()), blocks, cb)
        return _binary_from(out, sizes, valid)

    if depth == 2:
        o1, o2 = offs
        part_hdr = 4 if geom_type == "polygon" else 9
        part_nd = (o2[1:] - o2[:-1]).astype(np.int64)  # doubles per part
        _check_even(
            part_nd, lambda i: np.searchsorted(o1, i, "right") - 1, "part"
        )
        part_bytes = part_hdr + 8 * part_nd
        pc = np.zeros(len(part_bytes) + 1, dtype=np.int64)
        np.cumsum(part_bytes, out=pc[1:])
        nparts = (o1[1:] - o1[:-1]).astype(np.int64)
        sizes = np.where(valid, 9 + (pc[o1[1:]] - pc[o1[:-1]]), 0)
        starts = _excl_starts(sizes)
        part_row = np.repeat(np.arange(n), nparts)
        pi = np.arange(len(part_bytes))
        pstart = starts[part_row] + 9 + (pc[pi] - pc[o1[part_row]])
        if geom_type == "polygon":
            ph = _u32le(part_nd // 2)
        else:
            ph = _hdr9(len(pi), WKB_LINESTRING, part_nd // 2)
        blocks = [
            (starts[valid], _hdr9(int(valid.sum()), kind, nparts[valid])),
            (pstart, ph),
        ]
        out = _assemble(int(sizes.sum()), blocks, cb)
        return _binary_from(out, sizes, valid)

    # depth == 3: multipolygon — rows -> polygons (9B hdr) -> rings
    # (4B count) -> coords
    o1, o2, o3 = offs
    ring_nd = (o3[1:] - o3[:-1]).astype(np.int64)
    _check_even(
        ring_nd,
        lambda i: np.searchsorted(
            o1, np.searchsorted(o2, i, "right") - 1, "right"
        )
        - 1,
        "ring",
    )
    ring_bytes = 4 + 8 * ring_nd
    rc = np.zeros(len(ring_bytes) + 1, dtype=np.int64)
    np.cumsum(ring_bytes, out=rc[1:])
    nrings = (o2[1:] - o2[:-1]).astype(np.int64)
    poly_bytes = 9 + (rc[o2[1:]] - rc[o2[:-1]])
    qc = np.zeros(len(poly_bytes) + 1, dtype=np.int64)
    np.cumsum(poly_bytes, out=qc[1:])
    npolys = (o1[1:] - o1[:-1]).astype(np.int64)
    sizes = np.where(valid, 9 + (qc[o1[1:]] - qc[o1[:-1]]), 0)
    starts = _excl_starts(sizes)
    poly_row = np.repeat(np.arange(n), npolys)
    qi = np.arange(len(poly_bytes))
    qstart = starts[poly_row] + 9 + (qc[qi] - qc[o1[poly_row]])
    ring_poly = np.repeat(qi, nrings)
    ri = np.arange(len(ring_bytes))
    rstart = qstart[ring_poly] + 9 + (rc[ri] - rc[o2[ring_poly]])
    blocks = [
        (starts[valid], _hdr9(int(valid.sum()), kind, npolys[valid])),
        (qstart, _hdr9(len(qi), WKB_POLYGON, nrings)),
        (rstart, _u32le(ring_nd // 2)),
    ]
    out = _assemble(int(sizes.sum()), blocks, cb)
    return _binary_from(out, sizes, valid)


def _enc_batch_safe(s: pd.Series, geom_type: str) -> pd.Series:
    """Batch encode with the 2 GiB-offset guard: an Arrow batch whose
    ENCODED bytes would overflow pa.binary()'s int32 offsets falls back
    to the per-row struct twin (byte-identical by construction) instead
    of wrapping silently."""
    try:
        return _enc_batch(s, geom_type)
    except _BatchTooLarge:
        enc = _ENCODERS[geom_type]
        return pd.Series(
            [None if g is None else enc(g) for g in s], dtype=object
        )


def _enc_batch_point_safe(x: pd.Series, y: pd.Series) -> pd.Series:
    try:
        return _enc_batch_point(x, y)
    except _BatchTooLarge:  # 21 B/row: needs a >100M-row batch
        return pd.Series(
            [
                None if pd.isna(a) else _enc_point((a, b))
                for a, b in zip(x, y)
            ],
            dtype=object,
        )


def st_as_wkb(geom: Column, geom_type: str) -> Column:
    """Encode a geometry column to standard little-endian WKB bytes
    (vectorized numpy batch encoder; byte-identical to the per-row
    struct twin by test)."""
    if geom_type not in _ENCODERS:
        raise KeyError(geom_type)
    if geom_type == "point":
        @F.pandas_udf(BinaryType())
        def _enc_pt(x: pd.Series, y: pd.Series) -> pd.Series:
            return _enc_batch_point_safe(x, y)

        return _enc_pt(geom["x"], geom["y"])

    @F.pandas_udf(BinaryType())
    def _enc_any(s: pd.Series) -> pd.Series:
        return _enc_batch_safe(s, geom_type)

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
