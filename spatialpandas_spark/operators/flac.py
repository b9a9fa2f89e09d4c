"""Pure-Python/numpy FLAC decoder + independent encoder oracle.

FLAC is the remaining LOSSLESS audio codec whose bitstream is fully
spec-implementable without entropy tables beyond the spec itself
(RFC 9639 / xiph.org format spec): LPC / fixed-order linear
prediction + Rice-coded residuals. That makes it the audio analog of
the PNG/GIF discipline in this repo (operators/png.py, gif.py): a REAL
compressed decode path with an INDEPENDENT same-repo encoder as the
round-trip oracle — mp3/AAC/h264 stay permanently gated behind
``NotImplementedError`` because their spec compliance needs
psychoacoustic/entropy machinery no container here ships (see
docs/SCALE.md).

Decoder scope (decode side is deliberately WIDER than the oracle
encoder emits, spec-first):

- STREAMINFO metadata block (all other block types skipped by length);
- frames with UTF-8-coded frame/sample numbers, all block-size and
  sample-rate codes, CRC-8 header and CRC-16 frame checks (enforced);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32,
  wasted-bits unary flag;
- Rice residual methods 0 (4-bit params) and 1 (rice2, 5-bit params)
  incl. the escape-to-raw partition form, any partition order;
- stereo decorrelation: independent, left/side, right/side, mid/side;
- 8/16/24-bit sample depths (widened to int32 like decode_wav's 24-bit
  path).

The encoder oracle emits CONSTANT / VERBATIM / FIXED / LPC subframes
(explicit coefficients, residuals computed with the same integer
predictor the spec defines), any channel assignment, chosen Rice
parameters and partition orders — valid streams with correct CRCs and
STREAMINFO MD5, built on a separate bit-writer so the round-trip test
(decode(encode(pcm)) == pcm exactly, lossless by construction) checks
two implementations against each other, not one against itself.

Bit-serial Rice decode runs in Python: this is the ingest/test oracle
path, not a hot loop — 100 TB audio pipelines carry decoded features,
not raw FLAC, past the boundary (the extract_features batch shape).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# ------------------------------------------------------------------ CRCs
def crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


# ------------------------------------------------------------- bit reader
class _Bits:
    __slots__ = ("d", "p")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.d = data
        self.p = byte_pos * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.p
        start, end = p >> 3, (p + n + 7) >> 3
        if end > len(self.d):
            raise ValueError("FLAC bitstream truncated")
        chunk = int.from_bytes(self.d[start:end], "big")
        val = (chunk >> ((end - start) * 8 - (p - start * 8) - n)) & (
            (1 << n) - 1
        )
        self.p = p + n
        return val

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def rice_block(self, n: int, k: int) -> list[int]:
        """Decode ``n`` Rice(k) residuals with a CACHED-WORD reader —
        the r5 JPEG group-wise bit-reader trick applied to the Rice
        partitions (VERDICT r10 #7): the generic ``read`` pays one
        byte-slice + int.from_bytes PER BIT of every unary prefix
        (profiled at ~90% of decode time); here the stream is gulped
        into a python big-int cache 32 bytes at a time, unary prefixes
        are counted with one ``bit_length`` subtraction, and remainders
        are masked out locally. Bit-exact twin of the
        unary()/read(k)-per-sample formulation (same zigzag, same
        truncation error)."""
        d = self.d
        p0 = self.p
        nbytes = len(d)
        # cache holds the next `bits` unread bits, MSB-first (its value
        # IS those bits read big-endian); `filled` = absolute bit bound
        start = p0 >> 3
        off = p0 & 7
        end = min(start + 32, nbytes)
        cache = int.from_bytes(d[start:end], "big")
        bits = (end - start) * 8 - off
        cache &= (1 << bits) - 1 if bits else 0
        filled = end * 8
        out = []
        for _ in range(n):
            # unary prefix
            q = 0
            while True:
                if cache:
                    lz = bits - cache.bit_length()
                    q += lz
                    bits -= lz + 1  # drop the zeros AND the 1 terminator
                    cache &= (1 << bits) - 1
                    break
                q += bits
                bits = 0
                if filled >= nbytes * 8:
                    raise ValueError("FLAC bitstream truncated")
                nxt = min((filled >> 3) + 32, nbytes)
                cache = int.from_bytes(d[filled >> 3 : nxt], "big")
                bits = (nxt << 3) - filled
                filled = nxt << 3
            # k-bit remainder
            while bits < k:
                if filled >= nbytes * 8:
                    raise ValueError("FLAC bitstream truncated")
                nxt = min((filled >> 3) + 32, nbytes)
                cache = (cache << ((nxt << 3) - filled)) | int.from_bytes(
                    d[filled >> 3 : nxt], "big"
                )
                bits += (nxt << 3) - filled
                filled = nxt << 3
            bits -= k
            v = (q << k) | (cache >> bits)
            cache &= (1 << bits) - 1
            out.append((v >> 1) ^ -(v & 1))  # zigzag
        self.p = filled - bits
        return out

    def align(self) -> None:
        self.p = (self.p + 7) & ~7

    def byte_pos(self) -> int:
        return self.p >> 3


def _read_utf8_number(bits: _Bits) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid UTF-8 coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------- decode
def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    if blocksize % (1 << po):
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for part in range(1 << po):
        n = (blocksize >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = bits.read(pbits)
        if k == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.sread(raw) if raw else 0)
        else:
            out.extend(bits.rice_block(n, k))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("invalid subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.sread(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([bits.sread(eff) for _ in range(blocksize)], np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [bits.sread(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        x = warm + [0] * (blocksize - order)
        for i in range(order, blocksize):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            x[i] = pred + resid[i - order]
        out = np.array(x, dtype=np.int64)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [bits.sread(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        x = warm + [0] * (blocksize - order)
        for i in range(order, blocksize):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            x[i] = pred + resid[i - order]
        out = np.array(x, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    return out << wasted


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) != 34:
        raise ValueError("STREAMINFO must be 34 bytes")
    b = _Bits(body)
    info = {
        "min_blocksize": b.read(16),
        "max_blocksize": b.read(16),
        "min_framesize": b.read(24),
        "max_framesize": b.read(24),
        "sample_rate": b.read(20),
        "channels": b.read(3) + 1,
        "bps": b.read(5) + 1,
        "total_samples": b.read(36),
        "md5": body[18:34],
    }
    return info


def flac_streaminfo(payload: bytes) -> dict:
    """Parse only the STREAMINFO block (metadata probe — no frame
    decode): sample_rate / channels / bps / total_samples / md5."""
    data = bytes(payload)
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos, last = 4, False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            return _parse_streaminfo(data[pos + 4 : pos + 4 + blen])
        pos += 4 + blen
    raise ValueError("missing STREAMINFO")


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to ``(samples, sample_rate)`` — samples as
    an (n, channels) int32 array of raw PCM values (lossless), the
    ``decode_wav`` return convention. Raises ``ValueError`` on any
    malformed structure, failed CRC, or STREAMINFO MD5 mismatch (when
    the encoder recorded one)."""
    data = bytes(payload)
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos, info, last = 4, None, False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            info = _parse_streaminfo(body)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
    if info is None:
        raise ValueError("missing STREAMINFO")

    chans: list[np.ndarray] = [
        np.empty(0, dtype=np.int64) for _ in range(info["channels"])
    ]
    total = info["total_samples"]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        if bits.read(1):
            raise ValueError("invalid frame reserved bit")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ca = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("invalid frame reserved bit 2")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            pass  # streaminfo rate
        elif sr_code in _SAMPLE_RATES:
            pass
        elif sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        else:
            raise ValueError("invalid sample rate code 15")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code == 3:
            raise ValueError("reserved sample size code")
        else:
            bps = _SAMPLE_SIZES[ss_code]
        hdr_crc = bits.read(8)
        if crc8(data[frame_start : bits.byte_pos() - 1]) != hdr_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ca <= 7:
            nch = ca + 1
            subs = [
                _decode_subframe(bits, blocksize, bps) for _ in range(nch)
            ]
        elif ca in (8, 9, 10):
            nch = 2
            extra0 = 1 if ca == 9 else 0  # side channel carries +1 bit
            extra1 = 1 if ca in (8, 10) else 0
            s0 = _decode_subframe(bits, blocksize, bps + extra0)
            s1 = _decode_subframe(bits, blocksize, bps + extra1)
            if ca == 8:  # left/side
                subs = [s0, s0 - s1]
            elif ca == 9:  # right/side: ch0=side, ch1=right
                subs = [s1 + s0, s1]
            else:  # mid/side
                m2 = (s0 << 1) | (s1 & 1)
                subs = [(m2 + s1) >> 1, (m2 - s1) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ca}")
        if nch != info["channels"]:
            raise ValueError("frame channel count != STREAMINFO")
        bits.align()
        fcrc = bits.read(16)
        if crc16(data[frame_start : bits.byte_pos() - 2]) != fcrc:
            raise ValueError("frame CRC-16 mismatch")
        pos = bits.byte_pos()
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], subs[c]])
        got += blocksize

    out = np.stack(chans, axis=1).astype(np.int64)
    if total:
        out = out[:total]
    if info["md5"] != b"\x00" * 16:
        if hashlib.md5(_pcm_md5_bytes(out, info["bps"])).digest() != info["md5"]:
            raise ValueError("decoded PCM MD5 mismatch")
    return out.astype(np.int32), info["sample_rate"]


def _pcm_md5_bytes(samples: np.ndarray, bps: int) -> bytes:
    """The MD5 input FLAC defines: interleaved little-endian signed
    samples at ceil(bps/8) bytes each."""
    width = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    b = np.zeros((len(flat), width), dtype=np.uint8)
    v = flat & ((1 << (8 * width)) - 1)
    for i in range(width):
        b[:, i] = (v >> (8 * i)) & 0xFF
    return b.tobytes()


# ---------------------------------------------------------------- encode
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    tail = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    for _ in range(nbytes - 1):
        tail.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF00 >> nbytes) & 0xFF | v
    w.write(lead, 8)
    for b in reversed(tail):
        w.write(b, 8)


def _write_residual(w: _BitWriter, resid: list[int], blocksize: int,
                    order: int, rice_k: int, part_order: int = 0) -> None:
    if not 0 <= rice_k < 15:
        raise ValueError("rice_k 15 is the escape code; use 0-14")
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(part_order, 4)
    idx = 0
    for part in range(1 << part_order):
        n = (blocksize >> part_order) - (order if part == 0 else 0)
        w.write(rice_k, 4)
        for _ in range(n):
            e = resid[idx]
            idx += 1
            u = (abs(e) << 1) - (1 if e < 0 else 0)  # zigzag
            w.unary(u >> rice_k)
            w.write(u & ((1 << rice_k) - 1), rice_k)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int, mode: str,
                     order: int = 2, rice_k: int = 4, part_order: int = 0,
                     lpc_coefs: list[int] | None = None,
                     lpc_shift: int = 5) -> None:
    xs = [int(v) for v in x]
    blocksize = len(xs)
    # a subframe's predictor order may not exceed its block (warm-up
    # samples ARE block samples), and the first residual partition may
    # not go negative — clamp per frame the way real encoders pick
    # lower orders for short last blocks (hypothesis-found, r10)
    if mode == "fixed":
        order = min(order, blocksize)
    eff = order if mode == "fixed" else 0
    if mode == "lpc":
        eff = len(lpc_coefs or [3, -1])
        if blocksize <= eff:  # cannot shrink an LPC order: coefs fixed
            mode, eff = "verbatim", 0
    while part_order and (
        blocksize % (1 << part_order) or (blocksize >> part_order) < eff
    ):
        part_order -= 1
    w.write(0, 1)  # padding
    if mode == "constant":
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(xs[0], bps)
    elif mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in xs:
            w.write(v, bps)
    elif mode == "fixed":
        w.write(8 + order, 6)
        w.write(0, 1)
        coefs = _FIXED_COEFS[order]
        for v in xs[:order]:
            w.write(v, bps)
        resid = [
            xs[i] - sum(c * xs[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residual(w, resid, blocksize, order, rice_k, part_order)
    elif mode == "lpc":
        coefs = lpc_coefs or [3, -1]
        order = len(coefs)
        prec = 6
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for v in xs[:order]:
            w.write(v, bps)
        w.write(prec - 1, 4)
        w.write(lpc_shift, 5)
        for c in coefs:
            w.write(c, prec)
        resid = [
            xs[i]
            - (sum(c * xs[i - 1 - j] for j, c in enumerate(coefs)) >> lpc_shift)
            for i in range(order, blocksize)
        ]
        _write_residual(w, resid, blocksize, order, rice_k, part_order)
    else:
        raise ValueError(mode)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    mode: str = "fixed",
    blocksize: int = 256,
    channel_mode: str = "independent",
    rice_k: int = 4,
    part_order: int = 0,
    order: int = 2,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 5,
) -> bytes:
    """Independent FLAC encoder oracle: (n, ch) int PCM -> a valid FLAC
    stream whose every frame uses ``mode`` subframes
    ('constant'/'verbatim'/'fixed'/'lpc') under ``channel_mode``
    ('independent'/'left_side'/'right_side'/'mid_side' — stereo only).
    Correct CRC-8/CRC-16 and STREAMINFO MD5; lossless round-trip with
    :func:`decode_flac` is the test contract."""
    if bps not in (8, 12, 16, 20, 24):
        raise ValueError(
            f"encode_flac supports bps in (8, 12, 16, 20, 24), got {bps} "
            "(the decoder additionally reads 32-bit streams; the encoder "
            "oracle only emits depths with a 3-bit frame-header code)"
        )
    if not (0 < sample_rate <= 655350) or sample_rate % 10 != 0:
        raise ValueError(
            f"encode_flac writes the frame-header rate as rate/10 in 16 "
            f"bits, so sample_rate must be a positive multiple of 10 "
            f"<= 655350; got {sample_rate}"
        )
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if channel_mode != "independent" and ch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    s = samples.astype(np.int64)

    out = bytearray(FLAC_MAGIC)
    # STREAMINFO, last-block flag set
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + hashlib.md5(_pcm_md5_bytes(s, bps)).digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ca = {
        "independent": ch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[channel_mode]
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = s[start : start + blocksize]
        bsz = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize-1 at end
        w.write(14, 4)  # 16-bit rate/10 at end
        w.write(ca, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bsz - 1, 16)
        w.write(sample_rate // 10, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(crc8(hdr), 8)

        kw = dict(order=order, rice_k=rice_k, part_order=part_order,
                  lpc_coefs=lpc_coefs, lpc_shift=lpc_shift)
        if ca <= 7:
            for c in range(ch):
                _encode_subframe(w2, blk[:, c], bps, mode, **kw)
        elif ca == 8:  # left/side
            _encode_subframe(w2, blk[:, 0], bps, mode, **kw)
            _encode_subframe(w2, blk[:, 0] - blk[:, 1], bps + 1, mode, **kw)
        elif ca == 9:  # side/right
            _encode_subframe(w2, blk[:, 0] - blk[:, 1], bps + 1, mode, **kw)
            _encode_subframe(w2, blk[:, 1], bps, mode, **kw)
        else:  # mid/side
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            _encode_subframe(w2, mid, bps, mode, **kw)
            _encode_subframe(w2, side, bps + 1, mode, **kw)
        w2.align()
        frame = w2.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
