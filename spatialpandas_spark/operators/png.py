"""Pure-stdlib PNG codec (zlib + numpy) — a REAL compressed-format
image path with no codec library.

PNG's compression is DEFLATE, which ships in CPython's ``zlib``; the
rest of the format is chunk framing, per-scanline filters, and color
type layout — all implementable exactly from the public spec (RFC 2083 /
W3C PNG). That makes PNG the one compressed image format this runtime
can decode *for real*, closing the "compressed formats stay codec-gated"
caveat for the common web-corpus case (PNG is, with JPEG, the dominant
crawl image format).

Decoder scope (raises ``ValueError`` outside it, never a wrong image):
8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), all five filter types, non-interlaced. Alpha is
composited over black (the neutral choice for feature extraction —
premultiplied intensity, no invented background); palette lookups go
through PLTE. Output is always (H, W, 3) uint8 RGB, matching
``decode_ppm``'s contract so every downstream kernel (features, resize,
re-encode) is format-agnostic.

The encoder writes canonical non-interlaced 8-bit RGB with filter 0 on
every scanline — a valid PNG any external reader accepts; round-trip
``decode_png(encode_png(img)) == img`` is property-tested.

Filters Sub/Average/Paeth carry a left-pixel dependency, so scanline
reconstruction is sequential in x; rows are reconstructed with a
per-row numpy loop over columns on the filtered rows only (filter-0 and
Up rows — the overwhelmingly common output of real encoders' "fast"
modes — stay fully vectorized). This runs inside Arrow-batched
``mapInPandas`` per payload, so at 100 TB the cost is per-image decode
work that parallelizes across executors, not a driver loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel for each supported color type (8-bit samples)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _iter_chunks(data: bytes):
    """Yield (type, payload) for each chunk; verifies length framing and
    CRC-32 (a corrupt crawl payload fails loudly, not with garbage
    pixels)."""
    pos = len(_PNG_MAGIC)
    n = len(data)
    while pos < n:
        if n - pos < 12:
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError("truncated PNG chunk payload")
        payload = data[pos + 8 : end]
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        pos = end + 4


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. ``raw`` is the decompressed byte
    stream: height rows of (1 filter byte + stride data bytes). Returns
    (height, stride) uint8 of reconstructed bytes."""
    rows = raw.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    if np.any(ftypes > 4):
        raise ValueError("invalid PNG filter type")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = ftypes[y]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — vectorized (no left dependency)
            out[y] = (cur + prev) & 0xFF
        elif f == 1:  # Sub
            line = out[y]
            line[:bpp] = cur[:bpp] & 0xFF
            for x in range(bpp, stride):
                line[x] = (cur[x] + line[x - bpp]) & 0xFF
        elif f == 3:  # Average
            line = out[y]
            line[:bpp] = (cur[:bpp] + prev[:bpp] // 2) & 0xFF
            for x in range(bpp, stride):
                line[x] = (cur[x] + (int(line[x - bpp]) + prev[x]) // 2) & 0xFF
        else:  # Paeth
            line = out[y]
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[x] = (cur[x] + pred) & 0xFF
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to (H, W, 3) uint8 RGB. Pure stdlib-zlib +
    numpy; raises ``ValueError`` on malformed, truncated, corrupt, or
    out-of-scope input (16-bit, interlaced)."""
    data = bytes(payload)
    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG (missing magic)")
    width = height = None
    color_type = None
    palette = None
    idat = []
    seen_iend = False
    for ctype, chunk in _iter_chunks(data):
        if ctype == b"IHDR":
            if len(chunk) != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
        elif ctype == b"PLTE":
            if len(chunk) % 3 != 0:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped, per spec
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("PNG missing IEND")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    try:
        raw = np.frombuffer(
            zlib.decompress(b"".join(idat)), dtype=np.uint8
        )
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if raw.size != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    recon = _unfilter(raw, height, stride, bpp)

    if color_type == 2:  # RGB
        return recon.reshape(height, width, 3)
    if color_type == 0:  # grayscale -> replicate
        g = recon.reshape(height, width, 1)
        return np.repeat(g, 3, axis=2)
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = recon.reshape(height, width)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if color_type == 4:  # gray + alpha, composite over black
        ga = recon.reshape(height, width, 2).astype(np.uint16)
        g = (ga[:, :, 0] * ga[:, :, 1] + 127) // 255
        return np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
    # color_type == 6: RGBA, composite over black
    rgba = recon.reshape(height, width, 4).astype(np.uint16)
    rgb = (rgba[:, :, :3] * rgba[:, :, 3:4] + 127) // 255
    return rgb.astype(np.uint8)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(H, W, 3) uint8 RGB -> canonical 8-bit non-interlaced PNG bytes
    (filter 0 on every scanline)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects an (H, W, 3) uint8 array")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend the filter-0 byte per scanline in one allocation
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def sniff_image(payload: bytes) -> str:
    """Return 'png' | 'ppm' | 'jpeg' | 'gif' | 'bmp' | 'unknown' from the
    payload magic — lets a mixed crawl column route per-row to the right
    real decoder."""
    head = bytes(payload[:8])
    if head == _PNG_MAGIC:
        return "png"
    if head[:2] == b"P6":
        return "ppm"
    if head[:2] == b"\xff\xd8":
        return "jpeg"
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if head[:2] == b"BM":
        return "bmp"
    return "unknown"
