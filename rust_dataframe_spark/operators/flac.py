"""Pure-stdlib FLAC codec (xiph.org format spec / RFC 9639) — lossless
audio decode for real, EXACT round-trip.

FLAC is the dominant lossless audio format in crawled audio corpora
(podcast archives, music datasets, speech corpora ship it alongside
WAV), and unlike MP3/OGG it needs no DSP library: the format is Rice-
coded linear prediction over integers — bit-exact by construction, all
implementable on the stdlib.

Decode surface (the complete subframe/stereo algebra of the spec):

* stream: ``fLaC`` magic, STREAMINFO + any other metadata blocks
  (padding / vorbis-comment / seektable skipped structurally).
* frames: 14-bit sync, blocking strategy, all block-size codes (192,
  576*2^n, 256*2^n, 8/16-bit at-end), sample-rate codes (streaminfo +
  table + 8/16-bit at-end), UTF-8-coded frame/sample number, CRC-8
  header check (poly 0x07) and CRC-16 frame check (poly 0x8005) —
  both fail loud on mismatch.
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (precision/shift/coefficients per spec), wasted-bits unary prefix.
* residual: Rice method 0 (4-bit params) and 1 (rice2, 5-bit params),
  partition orders 0-15, escape code -> raw n-bit residuals.
* stereo decorrelation: independent, left/side, right/side, mid/side
  (side channels carry the spec's +1 bit).
* STREAMINFO MD5 of the decoded stream is verified when present
  (non-zero) — the strongest whole-file integrity pin the format has.

Encoder half (:func:`encode_flac`) is the fixture mirror: real
CONSTANT / VERBATIM / FIXED(order 0-4) subframes with Rice-coded
residuals, independent or mid/side stereo, correct CRC-8/CRC-16/MD5 —
a conformant stream any FLAC decoder reads.  Lossless means catalog
oracles pin EXACT sample checksums (the jpeg_lossless.py discipline).

Scale note: decode runs executor-side inside Arrow-batched mapInPandas
(operators/multimodal.py); the driver never touches sample bytes.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["FlacError", "decode_flac", "encode_flac", "is_flac"]


class FlacError(ValueError):
    """Malformed stream, CRC/MD5 mismatch, or a reserved/invalid code —
    always fail loud, never emit guessed samples."""


def is_flac(data: bytes) -> bool:
    return bytes(data[:4]) == b"fLaC"


# ---------------------------------------------------------------------------
# CRCs (spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0, MSB-first)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# bit I/O (MSB-first)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def tell_byte(self) -> int:
        return self.byte

    def aligned(self) -> bool:
        return self.bit == 0

    def align(self) -> None:
        if self.bit:
            self.byte += 1
            self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise FlacError("bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.byte += 1
                self.bit = 0
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise FlacError("runaway unary code")
        return q


_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]

_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_utf8_number(br: _Bits) -> int:
    """The frame header's UTF-8-style coded number (extended to 36
    bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError("invalid UTF-8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad continuation byte in coded number")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts != 0:
        raise FlacError("block size not divisible by partition count")
    psize = blocksize >> po
    if psize < order or (po > 0 and psize == order):
        # RFC 9639: for po > 0 the first partition holds psize - order
        # samples and the partition size must be STRICTLY greater than the
        # predictor order; an == stream is spec-invalid (empty partition 0).
        raise FlacError("predictor order exceeds partition size")
    out: list[int] = []
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * cnt)
            else:
                out.extend(br.read_signed(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                r = br.read(param) if param else 0
                u = (q << param) | r
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1) != 0:
        raise FlacError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exhaust sample size")
    if t == 0:  # CONSTANT
        v = br.read_signed(eff)
        s = [v] * blocksize
    elif t == 1:  # VERBATIM
        s = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        s = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for e in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append(pred + e)
    elif t >= 32:  # LPC order t-31
        order = t - 31
        s = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise FlacError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift unsupported (reserved)")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for e in res:
            acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append((acc >> shift) + e)
    else:
        raise FlacError(f"reserved subframe type {t}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def decode_flac(data: bytes, *, verify_md5: bool = True):
    """Decode a FLAC stream to ``(sample_rate, channels, bps,
    samples)`` — ``samples`` a flat channel-interleaved list of signed
    ints.  CRC-8 / CRC-16 are always enforced; the STREAMINFO MD5 is
    enforced when present and ``verify_md5``."""
    data = bytes(data)
    if not is_flac(data):
        raise FlacError("bad magic (not a FLAC stream)")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata block header")
        hdr = data[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise FlacError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise FlacError("STREAMINFO must be 34 bytes")
            br = _Bits(body)
            min_bs = br.read(16)
            max_bs = br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            si = (min_bs, max_bs, rate, nch, bps, total, md5)
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise FlacError("missing STREAMINFO")
    _min_bs, _max_bs, rate, nch, bps, total, md5 = si
    if rate == 0:
        raise FlacError("sample rate 0 in STREAMINFO")
    samples: list[list[int]] = [[] for _ in range(nch)]
    while pos < len(data):
        hdr_start = pos
        br = _Bits(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"lost frame sync at byte {pos}")
        if br.read(1) != 0:
            raise FlacError("reserved bit set in frame header")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0:
            raise FlacError("reserved bit set in frame header")
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            frate = rate
        elif sr_code in _RATE_TABLE:
            frate = _RATE_TABLE[sr_code]
        elif sr_code == 12:
            frate = br.read(8) * 1000
        elif sr_code == 13:
            frate = br.read(16)
        elif sr_code == 14:
            frate = br.read(16) * 10
        else:
            raise FlacError("invalid sample rate code 15")
        if frate != rate:
            raise FlacError("frame sample rate differs from STREAMINFO")
        if ch_code <= 7:
            fch = ch_code + 1
            side = None
        elif ch_code == 8:
            fch, side = 2, "left"
        elif ch_code == 9:
            fch, side = 2, "right"
        elif ch_code == 10:
            fch, side = 2, "mid"
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        if fch != nch:
            raise FlacError("frame channel count differs from STREAMINFO")
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise FlacError("reserved sample size code 3")
        else:
            fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ss_code]
        if fbps != bps:
            raise FlacError("frame sample size differs from STREAMINFO")
        crc_pos = br.tell_byte()
        if not br.aligned():
            raise FlacError("frame header not byte-aligned before CRC-8")
        if _crc8(data[hdr_start:crc_pos]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")
        chans = []
        for c in range(fch):
            extra = (
                1
                if (side == "left" and c == 1)
                or (side == "right" and c == 0)
                or (side == "mid" and c == 1)
                else 0
            )
            chans.append(_decode_subframe(br, blocksize, fbps + extra))
        br.align()
        frame_end = br.tell_byte()
        if frame_end + 2 > len(data):
            raise FlacError("truncated frame footer")
        (crc16,) = struct.unpack(">H", data[frame_end : frame_end + 2])
        if _crc16(data[hdr_start:frame_end]) != crc16:
            raise FlacError("frame CRC-16 mismatch")
        pos = frame_end + 2
        if side == "left":
            left, sd = chans
            chans = [left, [a - b for a, b in zip(left, sd)]]
        elif side == "right":
            sd, right = chans
            chans = [[a + b for a, b in zip(sd, right)], right]
        elif side == "mid":
            mid, sd = chans
            lr = []
            rr = []
            for m, s in zip(mid, sd):
                m = (m << 1) | (s & 1)
                lr.append((m + s) >> 1)
                rr.append((m - s) >> 1)
            chans = [lr, rr]
        for c in range(nch):
            samples[c].extend(chans[c])
    n = len(samples[0])
    if total and n != total:
        raise FlacError(
            f"decoded {n} samples but STREAMINFO declares {total}"
        )
    inter = [0] * (n * nch)
    for c in range(nch):
        inter[c::nch] = samples[c]
    if verify_md5 and md5 != b"\x00" * 16:
        if _md5_of(inter, nch, bps) != md5:
            raise FlacError("decoded-stream MD5 mismatch")
    return rate, nch, bps, inter


def _md5_of(inter: list[int], nch: int, bps: int) -> bytes:
    """Spec MD5: interleaved samples, little-endian, ceil(bps/8) bytes,
    signed two's complement."""
    nbytes = (bps + 7) // 8
    h = hashlib.md5()
    mask = (1 << (8 * nbytes)) - 1
    h.update(
        b"".join(
            (v & mask).to_bytes(nbytes, "little") for v in inter
        )
    )
    return h.digest()


# ---------------------------------------------------------------------------
# encoder (fixture half): CONSTANT / VERBATIM / FIXED with Rice residuals
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, n: int, v: int) -> None:
        v &= (1 << n) - 1 if n else 0
        while n > 0:
            take = min(8 - self.n, n)
            self.acc = (self.acc << take) | ((v >> (n - take)) & ((1 << take) - 1))
            self.n += take
            n -= take
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(32, 0)
            q -= 32
        self.write(q + 1, 1)

    def align(self) -> None:
        if self.n:
            self.write(8 - self.n, 0)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n = 1
    while v >= (1 << (6 * n + (6 - n))) and n < 6:
        n += 1
    for i in range(n):
        out.append(0x80 | ((v >> (6 * (n - 1 - i))) & 0x3F))
    lead = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    return bytes([lead]) + bytes(out)


def _best_rice_param(res: list[int]) -> int:
    if not res:
        return 0
    tot = sum((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1 for v in res)
    mean = tot / len(res) if res else 0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(bw: _BitW, res: list[int]) -> None:
    bw.write(2, 0)  # method 0 (4-bit rice)
    bw.write(4, 0)  # partition order 0
    param = _best_rice_param(res)
    bw.write(4, param)
    for v in res:
        u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
        bw.write_unary(u >> param)
        if param:
            bw.write(param, u & ((1 << param) - 1))


def _encode_subframe(bw: _BitW, s: list[int], bps: int) -> None:
    n = len(s)
    if all(v == s[0] for v in s):
        bw.write(1, 0)
        bw.write(6, 0)  # CONSTANT
        bw.write(1, 0)
        bw.write(bps, s[0])
        return
    # pick the fixed order with the smallest residual magnitude sum
    best_order, best_res, best_cost = 0, s, sum(abs(v) for v in s)
    cur = s
    for order in range(1, 5):
        if n <= order:
            break
        cur = [cur[i] - cur[i - 1] for i in range(1, len(cur))]
        cost = sum(abs(v) for v in cur)
        if cost < best_cost:
            best_order, best_cost = order, cost
            best_res = cur
        # residual magnitudes can exceed what rice handles gracefully
    order = best_order
    if order == 0 and best_cost >= (1 << (bps + 2)) * n:
        bw.write(1, 0)
        bw.write(6, 1)  # VERBATIM
        bw.write(1, 0)
        for v in s:
            bw.write(bps, v)
        return
    bw.write(1, 0)
    bw.write(6, 8 + order)  # FIXED
    bw.write(1, 0)
    for v in s[:order]:
        bw.write(bps, v)
    _write_residual(bw, list(best_res) if order else list(s))


def encode_flac(
    sample_rate: int,
    channels: int,
    bps: int,
    samples: list[int],
    *,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """Encode channel-interleaved signed ``samples`` as a conformant
    FLAC stream (CONSTANT/VERBATIM/FIXED subframes, Rice residuals,
    partition order 0, optional mid/side for stereo, correct
    CRC-8/CRC-16 and STREAMINFO MD5).  Decoding reproduces the input
    exactly."""
    if channels < 1 or channels > 8:
        raise FlacError("channels must be 1..8")
    if bps not in (8, 12, 16, 20, 24, 32):
        raise FlacError("bps must be one of 8/12/16/20/24/32")
    if len(samples) % channels:
        raise FlacError("sample count not divisible by channel count")
    if mid_side and channels != 2:
        raise FlacError("mid_side requires stereo")
    n = len(samples) // channels
    lim = 1 << (bps - 1)
    for v in samples:
        if not -lim <= v < lim:
            raise FlacError(f"sample {v} out of range for {bps}-bit")
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(16, block_size)
    si.write(16, block_size)
    si.write(24, 0)
    si.write(24, 0)
    si.write(20, sample_rate)
    si.write(3, channels - 1)
    si.write(5, bps - 1)
    si.write(36, n)
    body = si.bytes() + _md5_of(samples, channels, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    fidx = 0
    for start in range(0, n, block_size):
        cnt = min(block_size, n - start)
        hdr = _BitW()
        hdr.write(14, 0x3FFE)
        hdr.write(1, 0)
        hdr.write(1, 0)  # fixed blocksize strategy
        hdr.write(4, 7)  # 16-bit blocksize-1 at end
        hdr.write(4, 0)  # rate from streaminfo
        ch_code = 10 if mid_side else channels - 1
        hdr.write(4, ch_code)
        hdr.write(3, ss_code)
        hdr.write(1, 0)
        for b in _utf8_number(fidx):
            hdr.write(8, b)
        hdr.write(16, cnt - 1)
        hdr.align()
        hbytes = bytearray(hdr.bytes())
        hbytes.append(_crc8(bytes(hbytes)))
        bw = _BitW()
        if mid_side:
            ls = samples[2 * start : 2 * (start + cnt) : 2]
            rs = samples[2 * start + 1 : 2 * (start + cnt) : 2]
            mid = [(a + b) >> 1 for a, b in zip(ls, rs)]
            sd = [a - b for a, b in zip(ls, rs)]
            _encode_subframe(bw, mid, bps)
            _encode_subframe(bw, sd, bps + 1)
        else:
            for c in range(channels):
                _encode_subframe(
                    bw,
                    samples[channels * start + c : channels * (start + cnt) : channels],
                    bps,
                )
        bw.align()
        frame = bytes(hbytes) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        fidx += 1
    return bytes(out)
