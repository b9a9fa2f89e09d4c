"""Pure-numpy BMP decoder — uncompressed Windows bitmaps from the
public format layout (BITMAPFILEHEADER + BITMAPINFOHEADER). BMP still
shows up in crawls (screenshots, old tooling exports) and costs ~70
lines: no entropy coding at all, just header fields, BGR byte order,
4-byte row padding, and bottom-up row direction.

Scope (``ValueError`` outside it): 8-bit palettized, 24-bit BGR, and
32-bit BGRA (alpha composited over black, matching the PNG decoder's
convention), BI_RGB (uncompressed) only, bottom-up or top-down
(negative height). RLE and bitfield compressions are rejected loudly.
Output is (H, W, 3) uint8 RGB like every other image decoder here.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP payload to (H, W, 3) uint8 RGB. Raises
    ``ValueError`` on malformed or out-of-scope input."""
    data = bytes(payload)
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (missing magic or truncated header)")
    (pix_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise ValueError("bad BMP plane count")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("bad BMP dimensions")

    palette = None
    if bpp == 8:
        (colors_used,) = struct.unpack_from("<I", data, 46)
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(data):
            raise ValueError("truncated BMP palette")
        pal = np.frombuffer(
            data[pal_off:pal_end], dtype=np.uint8
        ).reshape(n_colors, 4)
        palette = pal[:, [2, 1, 0]]  # BGRX -> RGB

    row_bytes = (width * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    need = pix_offset + row_bytes * height
    if pix_offset < 14 + hdr_size or need > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * height, offset=pix_offset
    ).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]

    if bpp == 8:
        idx = rows[:, :width]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("BMP palette index out of range")
        return palette[idx]
    if bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB
    # 32-bit BGRA: composite over black like the PNG decoder
    px = rows[:, : width * 4].reshape(height, width, 4).astype(np.uint16)
    rgb = (px[:, :, [2, 1, 0]] * px[:, :, 3:4] + 127) // 255
    return rgb.astype(np.uint8)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> canonical 24-bit bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects an (H, W, 3) uint8 array")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    return header + info + pix
