"""Pure-stdlib OGG container codec (RFC 3533) + FLAC-in-Ogg mapping
(RFC 9639 §10.2 / the FLAC-to-Ogg mapping spec).

OGG was half of the documented audio fake-decode gate ("MP3/OGG need a
codec lib").  That is true for Vorbis/Opus PAYLOADS — but the container
is a public page structure, and FLAC-in-Ogg payloads are exactly the
frames the round-8 :mod:`operators.flac` codec already decodes.  This
module implements the page layer for real — capture pattern, lacing
values, packet reassembly across pages (continued-packet flag), BOS/EOS
discipline, page-sequence gap detection, and the Ogg CRC-32 (forward
0x04C11DB7, zero init/xorout — NOT zlib's reflected CRC) enforced on
every page — and completes the sample path for FLAC-mapped streams by
reconstructing the native FLAC stream and delegating to
:func:`operators.flac.decode_flac` (CRC-8/16 + MD5 still enforced
there).  Vorbis and Opus payloads demux fine and fail LOUD at sample
decode — the honest boundary the decode policy mandates.

Fail-loud contract: structural violations (bad capture, CRC mismatch,
lost pages, desynchronized continuation, multiplexed streams, truncated
packets) raise :class:`OggError`; undecodable codec mappings raise
NotImplementedError.  The encoder half (:func:`encode_ogg_flac`) emits
a conformant FLAC-in-Ogg stream — 0x7F"FLAC" mapping header packet,
a VORBIS_COMMENT header packet (so the 2-byte header-count field is
nonzero and actually consumed), audio frames as one packet laced across
pages with a configurable segments-per-page cap so the continued-packet
path is genuinely exercised — for byte-real fixtures.

Reference parity note: the reference repo has no audio surface at all;
this extends the multimodal matrix (SURVEY §8).  Scale: pages are
sequential within one payload, but payloads are independent rows —
decode runs Arrow-batched on executors, O(bytes) per payload.
"""

from __future__ import annotations

import struct

__all__ = [
    "OggError",
    "is_ogg",
    "decode_ogg_packets",
    "decode_ogg_audio",
    "encode_ogg_flac",
]


class OggError(ValueError):
    """Malformed or unsupported Ogg page structure."""


def is_ogg(head: bytes) -> bool:
    """True when the payload starts with the RFC 3533 capture pattern."""
    return head[:4] == b"OggS"


# Ogg CRC-32: polynomial 0x04C11DB7, forward (non-reflected), init 0,
# no final xor — distinct from zlib/binascii's reflected CRC-32.
_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def _crc32_ogg(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def decode_ogg_packets(data: bytes) -> tuple[int, list[bytes]]:
    """Demux one logical Ogg stream to ``(serial, packets)``.

    Enforces: capture pattern + version 0 on every page, per-page CRC,
    BOS on the first page only, monotone gap-free page sequence, EOS on
    the final page, continuation-flag consistency, and single-stream
    (multiplexed serials raise — grouped/chained Ogg is out of scope,
    fail-loud)."""
    data = bytes(data)
    if not is_ogg(data):
        raise OggError("bad capture pattern (not an Ogg stream)")
    pos = 0
    serial = None
    expect_seq = 0
    packets: list[bytes] = []
    cur = bytearray()
    saw_eos = False
    while pos < len(data):
        if saw_eos:
            raise OggError("data after EOS page")
        if pos + 27 > len(data):
            raise OggError("truncated page header")
        if data[pos : pos + 4] != b"OggS":
            raise OggError(f"lost capture pattern at {pos}")
        if data[pos + 4] != 0:
            raise OggError(f"unsupported Ogg version {data[pos + 4]}")
        hdr_type = data[pos + 5]
        ser, seq, crc = struct.unpack_from("<III", data, pos + 14)
        nseg = data[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > len(data):
            raise OggError("truncated segment table")
        lacing = data[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > len(data):
            raise OggError("truncated page body")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _crc32_ogg(bytes(page)) != crc:
            raise OggError(f"page CRC mismatch at sequence {seq}")
        if serial is None:
            serial = ser
            if not hdr_type & 0x02:
                raise OggError("first page lacks BOS flag")
        elif ser != serial:
            raise OggError(
                f"multiplexed serials {serial:#x}/{ser:#x} unsupported "
                "(grouped/chained Ogg; fail-loud)"
            )
        elif hdr_type & 0x02:
            raise OggError("BOS flag on a non-first page")
        if seq != expect_seq:
            raise OggError(f"lost page: sequence {seq}, expected {expect_seq}")
        expect_seq += 1
        if bool(hdr_type & 0x01) != bool(cur):
            raise OggError(
                "continued-packet flag desynchronized with packet state"
            )
        if hdr_type & 0x04:
            saw_eos = True
        off = seg_end
        for lv in lacing:
            cur += data[off : off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur.clear()
        pos = page_end
    if cur:
        raise OggError("stream ends mid-packet (no terminating lacing value)")
    if not saw_eos:
        raise OggError("missing EOS page")
    if serial is None:
        raise OggError("empty Ogg stream")
    return serial, packets


def decode_ogg_audio(data: bytes, *, verify_md5: bool = True):
    """Decode an Ogg audio payload to ``(sample_rate, channels, bps,
    samples)``.  FLAC-in-Ogg decodes for real: the mapping packet +
    header packets + audio packets are reassembled into a native FLAC
    stream and handed to :func:`operators.flac.decode_flac` (so the
    frame CRCs and STREAMINFO MD5 stay enforced).  Vorbis/Opus demux
    but gate at sample decode."""
    from .flac import FlacError, decode_flac

    _serial, packets = decode_ogg_packets(data)
    if not packets:
        raise OggError("Ogg stream carries no packets")
    p0 = packets[0]
    if p0[:5] == b"\x7fFLAC":
        if len(p0) < 13:
            raise OggError("truncated FLAC mapping packet")
        major = p0[5]
        if major != 1:
            raise OggError(f"FLAC-in-Ogg mapping major version {major}")
        nhdr = int.from_bytes(p0[7:9], "big")
        if p0[9:13] != b"fLaC":
            raise OggError("FLAC mapping packet lacks fLaC magic")
        streaminfo = p0[13:]
        if not streaminfo or streaminfo[0] & 0x7F != 0:
            raise OggError("first mapped block is not STREAMINFO")
        rest = packets[1:]
        if nhdr:
            if nhdr > len(rest):
                raise OggError(
                    f"mapping declares {nhdr} header packets, "
                    f"stream carries {len(rest)}"
                )
            headers, frames = rest[:nhdr], rest[nhdr:]
        else:
            # count unknown (allowed by the mapping): header packets are
            # metadata blocks (first byte 0x01..0x7E); audio frames start
            # with the 14-bit sync 0xFFF8+.
            k = 0
            while k < len(rest) and rest[k][:1] != b"\xff":
                k += 1
            headers, frames = rest[:k], rest[k:]
        blocks = [bytearray(streaminfo)] + [bytearray(h) for h in headers]
        for b in blocks:
            if not b:
                raise OggError("empty metadata header packet")
            b[0] &= 0x7F
        blocks[-1][0] |= 0x80  # last-metadata flag on the final block
        native = b"fLaC" + b"".join(map(bytes, blocks)) + b"".join(frames)
        try:
            return decode_flac(native, verify_md5=verify_md5)
        except FlacError as e:
            raise OggError(f"mapped FLAC stream invalid: {e}") from e
    if p0[:7] == b"\x01vorbis":
        # round 10: real Vorbis decode (operators/vorbis.py — every
        # entropy table is stream-described, so no memorized-constant
        # gate applies); floats quantize to 16-bit PCM
        import math as _math

        from .vorbis import decode_vorbis

        rate, nch, chans = decode_vorbis(data)
        n = len(chans[0]) if chans else 0
        inter = []
        for i in range(n):
            for c in range(nch):
                v = int(_math.floor(chans[c][i] * 32767.0 + 0.5))
                inter.append(max(-32768, min(32767, v)))
        return rate, nch, 16, inter
    if p0[:8] == b"OpusHead":
        raise NotImplementedError(
            "Ogg Opus payload needs a SILK/CELT decoder; only FLAC-in-Ogg "
            "decodes here (page demux/metadata still real)"
        )
    raise OggError("unknown Ogg codec mapping packet")


# ---------------------------------------------------------------------------
# encoder (fixture half): FLAC-in-Ogg with real lacing + continuation
# ---------------------------------------------------------------------------


def _lacing(n: int) -> list[int]:
    vals = [255] * (n // 255) + [n % 255]
    # a packet of length k*255 still needs the terminating sub-255 value
    return vals


def encode_ogg_flac(
    sample_rate: int,
    channels: int,
    bps: int,
    samples: list[int],
    *,
    serial: int = 0x0D15EA5E,
    max_segs_per_page: int = 255,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """Encode channel-interleaved signed ``samples`` as a conformant
    FLAC-in-Ogg stream: BOS page carrying the 0x7F"FLAC" mapping packet
    (header-count = 1), one VORBIS_COMMENT header packet, then the FLAC
    audio frames as a single packet laced across pages capped at
    ``max_segs_per_page`` segments — a small cap forces multi-page
    continued packets, exercising the decoder's continuation path.
    Granule position carries the per-channel sample count on the page
    where the audio packet ends, -1 on no-packet-ends pages, 0 on
    header pages, per the mapping spec."""
    from .flac import encode_flac

    if not 1 <= max_segs_per_page <= 255:
        raise OggError("max_segs_per_page must be 1..255")
    native = encode_flac(
        sample_rate, channels, bps, samples,
        block_size=block_size, mid_side=mid_side,
    )
    # split the native stream: magic, metadata blocks, frames
    pos = 4
    blocks: list[bytes] = []
    while True:
        hdr = native[pos]
        blen = int.from_bytes(native[pos + 1 : pos + 4], "big")
        blocks.append(native[pos : pos + 4 + blen])
        pos += 4 + blen
        if hdr & 0x80:
            break
    frames = native[pos:]
    streaminfo = bytearray(blocks[0])
    streaminfo[0] &= 0x7F  # header packets carry their own last flags
    vendor = b"rust-dataframe-spark ogg muxer"
    vc_payload = (
        struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    )
    vc_block = bytes([0x04]) + len(vc_payload).to_bytes(3, "big") + vc_payload
    mapping = (
        b"\x7fFLAC\x01\x00" + (1).to_bytes(2, "big") + b"fLaC"
        + bytes(streaminfo)
    )
    n_per_ch = len(samples) // channels
    # (packet bytes, granule when it ends)
    pkts = [(mapping, 0), (vc_block, 0), (frames, n_per_ch)]

    pages: list[bytes] = []
    seg_budget: list[int] = []
    body = bytearray()
    continued = False
    granule = 0

    def flush(granule_val: int, *, bos: bool = False, eos: bool = False,
              cont: bool = False) -> None:
        hdr_type = (0x01 if cont else 0) | (0x02 if bos else 0) | (
            0x04 if eos else 0
        )
        page = bytearray(
            b"OggS\x00"
            + bytes([hdr_type])
            + struct.pack("<q", granule_val)
            + struct.pack("<III", serial, len(pages), 0)
            + bytes([len(seg_budget)])
            + bytes(seg_budget)
            + bytes(body)
        )
        crc = _crc32_ogg(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        pages.append(bytes(page))
        seg_budget.clear()
        body.clear()

    first = True
    eos_done = False
    for pi, (pkt, g_end) in enumerate(pkts):
        vals = _lacing(len(pkt))
        off = 0
        for vi, lv in enumerate(vals):
            seg_budget.append(lv)
            body += pkt[off : off + lv]
            off += lv
            ends_here = vi == len(vals) - 1
            if ends_here:
                granule = g_end
            if len(seg_budget) >= max_segs_per_page:
                last_overall = pi == len(pkts) - 1 and ends_here
                flush(
                    granule if ends_here else -1,
                    bos=first, eos=last_overall, cont=continued,
                )
                first = False
                eos_done = last_overall
                continued = not ends_here
        # headers get their own pages (mapping spec: the mapping packet
        # must finish its page; we extend that to all header packets)
        if seg_budget and pi < len(pkts) - 1:
            flush(granule, bos=first, cont=continued)
            first = False
            continued = False
    if not eos_done:
        # leftover audio segments (or an entirely empty stream) finish
        # on a final EOS page
        flush(granule, bos=first, eos=True, cont=continued)
    return b"".join(pages)
