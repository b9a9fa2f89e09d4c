"""Pure-python GIF decoder (LZW + numpy) — the real multi-frame
compressed format for the video-ish sampling path.

GIF's entropy coder is variable-width LZW, fully specified in the
public GIF89a document and implementable in ~40 lines; everything else
is block framing, palettes, and frame compositing. That makes animated
GIF the one genuinely multi-frame compressed container this runtime can
decode end-to-end — so ``sample_frames`` works on real compressed
animations, not only concatenated-PPM streams.

Decoder scope (raises ``ValueError`` outside it, never wrong pixels):
GIF87a/GIF89a, global and local color tables, interlaced images,
graphic-control transparency, disposal methods 0-3 (unspecified / keep /
restore-background / restore-previous), deferred-clear LZW streams
(full 4096-entry table without reset). Frames come back COMPOSITED on
the logical screen — what a viewer shows and what a training pipeline
wants — as (H, W, 3) uint8 RGB; transparent never-painted pixels read
as black.

The LZW inner loop is bit-serial Python per payload (like JPEG's
Huffman); palette lookup, compositing, and interlace reordering are
vectorized numpy. Payloads decode inside Arrow-batched ``mapInPandas``
on executors, so the serial part parallelizes across files at 100 TB.

Correctness evidence (tests/test_multimodal_gif.py): GIF is lossless,
so an INDEPENDENT minimal encoder in the tests (real LZW compression
written from the spec's dictionary algorithm, sharing no code with this
decoder) round-trips bit-exactly, including multi-frame composition,
transparency, local palettes, and interlace.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (LSB-first variable-width codes) to
    ``expected`` palette indices. Handles clear codes, the code==next
    self-reference case, width growth at table-full boundaries, and
    deferred clear (table pinned at 4096)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad GIF LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code != eoi:
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError("GIF LZW stream ended before raster complete")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reorder interlaced GIF rows (4 passes: 8/0, 8/4, 4/2, 2/1)."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _read_color_table(data: bytes, pos: int, n: int):
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    return np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3), end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF data sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF data sub-block")
        chunks.append(data[pos : pos + n])
        pos += n


def iter_gif_frames(payload: bytes):
    """Yield composited (H, W, 3) uint8 RGB frames from a (possibly
    animated) GIF payload. Raises ``ValueError`` on malformed input."""
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing magic)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise ValueError("zero-dimension GIF")
    flags, bg_idx, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))

    screen = np.zeros((h, w, 3), dtype=np.uint8)
    painted = np.zeros((h, w), dtype=bool)
    # background color applies only where a GCT exists; else black
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)

    transparent = None
    disposal = 0
    n_frames = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if n_frames == 0:
                raise ValueError("GIF contains no image")
            return
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gc_flags = body[0]
                disposal = (gc_flags >> 2) & 0x7
                transparent = body[3] if gc_flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if fx + fw > w or fy + fh > h or fw == 0 or fh == 0:
            raise ValueError("GIF frame outside logical screen")
        table = gct
        if iflags & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (iflags & 0x07))
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF raster")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF palette index out of range")

        prev_region = screen[fy : fy + fh, fx : fx + fw].copy()
        prev_painted = painted[fy : fy + fh, fx : fx + fw].copy()
        rgb = table[idx]
        if transparent is not None:
            opaque = idx != transparent
        else:
            opaque = np.ones((fh, fw), dtype=bool)
        region = screen[fy : fy + fh, fx : fx + fw]
        region[opaque] = rgb[opaque]
        painted[fy : fy + fh, fx : fx + fw] |= opaque
        yield screen.copy()
        n_frames += 1

        if disposal == 2:  # restore to background
            screen[fy : fy + fh, fx : fx + fw] = bg_rgb
            painted[fy : fy + fh, fx : fx + fw] = False
        elif disposal == 3:  # restore to previous
            screen[fy : fy + fh, fx : fx + fw] = prev_region
            painted[fy : fy + fh, fx : fx + fw] = prev_painted
        transparent = None
        disposal = 0


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode all frames: (n_frames, H, W, 3) uint8 RGB, composited."""
    frames = list(iter_gif_frames(payload))
    return np.stack(frames, axis=0)


def decode_gif_first(payload: bytes) -> np.ndarray:
    """First composited frame — the still-image contract (matches the
    other decoders' (H, W, 3) shape)."""
    for frame in iter_gif_frames(payload):
        return frame
    raise ValueError("GIF contains no image")
