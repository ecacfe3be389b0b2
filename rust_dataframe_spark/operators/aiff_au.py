"""AIFF and AU (Sun/NeXT) audio containers — the remaining classic PCM
container formats after WAV/FLAC/Ogg/MP3 (legacy archives and research
datasets still carry both).

- **AIFF** (EA IFF 85): ``FORM``/``AIFF`` chunk tree, ``COMM`` with the
  format's famous 80-bit IEEE 754 extended-precision sample rate
  (parsed exactly: sign/15-bit exponent/explicit-integer-bit 64-bit
  mantissa — not a float cast), ``SSND`` with offset/blockSize header,
  big-endian PCM at 8/16/24/32 bits.  AIFF-C (``AIFC``) compression
  types gate loud except ``NONE``.  Frame-count cross-check: COMM
  ``numSampleFrames`` must match the SSND payload (desync fails loud).
- **AU**: ``.snd`` magic, data offset/size, encodings 1 (G.711 u-law —
  decoded through the SAME ITU expansion as the WAV path in
  :mod:`operators.wave_ext`), 2/3/4/5 (8/16/24/32-bit linear PCM,
  big-endian), 27 (A-law); float/ADPCM encodings gate loud.

Output contract matches :func:`operators.multimodal.decode_audio`
sources: ``(sample_rate, channels, sample_width, interleaved signed
samples)`` (G.711 expands to 16-bit).  Encoder halves emit conformant
fixtures, including the 80-bit rate encode.

Reference parity: no audio surface in the reference; extends the
multimodal matrix (SURVEY §8).
"""

from __future__ import annotations

import struct

__all__ = [
    "AiffError",
    "is_aiff",
    "decode_aiff",
    "encode_aiff",
    "is_au",
    "decode_au",
    "encode_au",
]


class AiffError(ValueError):
    """Malformed AIFF/AU structure."""


def is_aiff(head: bytes) -> bool:
    return head[:4] == b"FORM" and head[8:12] in (b"AIFF", b"AIFC")


def is_au(head: bytes) -> bool:
    return head[:4] == b".snd"


def _read_extended(b: bytes) -> int:
    """80-bit IEEE extended -> integer sample rate (exact for the
    integral rates audio files carry)."""
    if len(b) != 10:
        raise AiffError("extended float field must be 10 bytes")
    se = struct.unpack(">H", b[:2])[0]
    sign = -1 if se & 0x8000 else 1
    exp = se & 0x7FFF
    mant = struct.unpack(">Q", b[2:])[0]
    if exp == 0 and mant == 0:
        return 0
    if exp == 0x7FFF:
        raise AiffError("non-finite sample rate")
    val = sign * mant * 2.0 ** (exp - 16383 - 63)
    rate = int(round(val))
    if rate <= 0:
        raise AiffError(f"non-positive sample rate {val}")
    return rate


def _write_extended(rate: int) -> bytes:
    if rate <= 0:
        raise AiffError("rate must be positive")
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)
    return struct.pack(">HQ", 16383 + exp, mant)


def decode_aiff(data: bytes):
    """-> (sample_rate, channels, sample_width_bytes, samples)."""
    data = bytes(data)
    if not is_aiff(data[:12]):
        raise AiffError("not an AIFF (FORM/AIFF magic)")
    form_len = struct.unpack(">I", data[4:8])[0]
    end = min(len(data), 8 + form_len)
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        clen = struct.unpack(">I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise AiffError(f"chunk {cid!r} overruns FORM")
        if cid == b"COMM":
            nch, nframes = struct.unpack(">HI", body[:6])
            bits = struct.unpack(">H", body[6:8])[0]
            rate = _read_extended(body[8:18])
            if is_aifc:
                ctype = body[18:22]
                if ctype not in (b"NONE", b"sowt"):
                    raise AiffError(
                        f"AIFC compression {ctype!r} unsupported "
                        "(fail-loud)"
                    )
                if ctype == b"sowt":
                    raise AiffError(
                        "little-endian AIFC (sowt) unsupported (fail-loud)"
                    )
            comm = (nch, nframes, bits, rate)
        elif cid == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            ssnd = body[8 + off :]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise AiffError("missing COMM or SSND chunk")
    nch, nframes, bits, rate = comm
    if bits not in (8, 16, 24, 32):
        raise AiffError(f"bit depth {bits} unsupported")
    sw = bits // 8
    need = nframes * nch * sw
    if len(ssnd) < need:
        raise AiffError(
            f"SSND carries {len(ssnd)} bytes, COMM declares {need} "
            "(desynchronized frame count)"
        )
    samples = [
        int.from_bytes(ssnd[i : i + sw], "big", signed=True)
        for i in range(0, need, sw)
    ]
    return rate, nch, sw, samples


def encode_aiff(rate: int, nch: int, bits: int, samples: list[int]) -> bytes:
    if bits not in (8, 16, 24, 32):
        raise AiffError("bits must be 8/16/24/32")
    sw = bits // 8
    if len(samples) % nch:
        raise AiffError("sample count not divisible by channels")
    nframes = len(samples) // nch
    ssnd_body = struct.pack(">II", 0, 0) + b"".join(
        int(v).to_bytes(sw, "big", signed=True) for v in samples
    )
    comm = struct.pack(">HIH", nch, nframes, bits) + _write_extended(rate)
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    )
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


_AU_PCM = {2: 1, 3: 2, 4: 3, 5: 4}


def decode_au(data: bytes):
    """-> (sample_rate, channels, sample_width_bytes, samples);
    G.711 u-law/A-law expand to 16-bit via the WAV-path tables."""
    data = bytes(data)
    if not is_au(data[:4]):
        raise AiffError("not an AU (.snd magic)")
    off, size, enc, rate, nch = struct.unpack(">IIIII", data[4:24])
    if off < 24 or off > len(data):
        raise AiffError(f"bad AU data offset {off}")
    body = data[off:]
    if size != 0xFFFFFFFF:
        if size > len(body):
            raise AiffError("AU data size overruns file")
        body = body[:size]
    if enc in (1, 27):
        from .wave_ext import ALAW_TO_LIN, ULAW_TO_LIN

        table = ULAW_TO_LIN if enc == 1 else ALAW_TO_LIN
        return rate, nch, 2, [table[b] for b in body]
    if enc in _AU_PCM:
        sw = _AU_PCM[enc]
        if len(body) % sw:
            raise AiffError("AU payload not a whole sample multiple")
        if sw == 1:  # encoding 2 is SIGNED 8-bit linear
            return rate, nch, 1, [
                int.from_bytes(body[i : i + 1], "big", signed=True)
                for i in range(len(body))
            ]
        return rate, nch, sw, [
            int.from_bytes(body[i : i + sw], "big", signed=True)
            for i in range(0, len(body), sw)
        ]
    raise AiffError(
        f"AU encoding {enc} unsupported (float/ADPCM gate; fail-loud)"
    )


def encode_au(
    rate: int, nch: int, samples: list[int], *, encoding: int = 3
) -> bytes:
    if encoding not in (1, 27, *_AU_PCM):
        raise AiffError(f"encoder does not emit AU encoding {encoding}")
    if encoding in (1, 27):
        # G.711 fixture path: ``samples`` are the 8-bit CODES themselves
        # (decode expands them through the ITU tables)
        if any(not 0 <= v <= 255 for v in samples):
            raise AiffError("G.711 encoder takes 8-bit codes")
        body = bytes(samples)
    else:
        sw = _AU_PCM[encoding]
        body = b"".join(
            int(v).to_bytes(sw, "big", signed=True) for v in samples
        )
    hdr = b".snd" + struct.pack(">IIIII", 24, len(body), encoding, rate, nch)
    return hdr + body
