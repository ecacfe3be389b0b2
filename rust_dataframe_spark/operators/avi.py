"""Pure-stdlib RIFF/AVI container codec — REAL video for the multimodal
decode matrix (MJPEG + uncompressed-DIB streams).

Round 7 closes the last documented-fake modality: ``sample_frames`` had a
real path only for animated GIFs; MP4/WebM genuinely need pyav/ffmpeg and
stay gated, but AVI — the RIFF container (public Microsoft "AVI RIFF File
Reference", the same chunk grammar as the WAV files :mod:`multimodal`
already parses) wrapping independently-decodable MJPEG frames (each
``00dc`` chunk is a complete baseline JPEG, decoded by the repo's own
:mod:`operators.jpeg`) — is fully within the pure-stdlib discipline.

Why this matters at scale, and why it beats the GIF path: GIF's LZW
stream is SEQUENTIAL — sampling frame 90 of 100 decodes all 90.  AVI
frames are independent chunks with an index, so :func:`decode_avi` does
cheap byte-slicing of the container and the decoder touches ONLY the
sampled frames: frame-sampling cost is O(sampled), not O(total), which is
the difference that matters when a 100 TB corpus stores hour-long clips
and the pipeline wants 4 frames per clip.

Container grammar (fail-loud — malformed structure raises
:class:`AviError`, never silently misparses)::

    RIFF 'AVI ' {
      LIST 'hdrl' { 'avih' (usec/frame, total, dims)
                    LIST 'strl' { 'strh' (vids, handler, scale/rate)
                                  'strf' (BITMAPINFOHEADER) } }
      LIST 'movi' { '00dc' <jpeg bytes> | '00db' <bottom-up BGR DIB>
                    | LIST 'rec ' { ... } }   # OpenDML interleave groups
      'idx1' (ckid, flags, offset, size)*     # validated when present
    }

All chunks even-padded per RIFF.  Compression fourccs: ``MJPG`` (frames
decoded via :func:`operators.jpeg.decode_jpeg`) and ``0`` / ``DIB ``
(BI_RGB 24-bit bottom-up BGR rows padded to 4 bytes — unflipped and
swapped to top-down RGB).  Anything else raises NotImplementedError per
the multimodal decode policy.

Reference parity note: RubyOnWorld/rust-dataframe has no media layer at
all — this extends the repo's beyond-reference multimodal matrix
(PNG=q327, WAV=q333, GIF=q334, JPEG=q387/q395, AVI=q397).
"""

from __future__ import annotations

import struct

__all__ = [
    "AviError",
    "is_avi",
    "encode_avi",
    "decode_avi",
    "decode_avi_frame",
]


class AviError(ValueError):
    """Malformed or unsupported AVI container structure."""


def is_avi(head: bytes) -> bool:
    """True when the first 12 bytes carry the RIFF/AVI signature."""
    return len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"AVI "


def _chunk(ckid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return ckid + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    usec_per_frame: int = 40_000,
    compression: bytes = b"MJPG",
) -> bytes:
    """Build an AVI container around pre-encoded frame payloads.

    ``compression=b'MJPG'``: each frame is a complete JPEG byte string
    (e.g. from :func:`operators.jpeg.encode_jpeg`), stored as ``00dc``.
    ``compression=b'DIB '``: each frame is a TOP-DOWN RGB plane
    (``width*height*3`` bytes); the encoder flips to the bottom-up BGR
    4-byte-padded rows BI_RGB mandates and stores ``00db``.  A standard
    ``idx1`` index is always emitted (offsets relative to the ``movi``
    list's type fourcc, the convention every real muxer uses).
    """
    if compression == b"MJPG":
        ckid, stored = b"00dc", list(frames)
        bitcount, bi_comp = 24, struct.unpack("<I", b"MJPG")[0]
    elif compression == b"DIB ":
        ckid, stored = b"00db", []
        row_out = (width * 3 + 3) & ~3
        for f in frames:
            if len(f) != width * height * 3:
                raise AviError("DIB frame must be width*height*3 RGB bytes")
            rows = []
            for y in range(height - 1, -1, -1):  # bottom-up
                row = bytearray()
                for x in range(width):
                    r, g, b = f[3 * (y * width + x):3 * (y * width + x) + 3]
                    row += bytes((b, g, r))  # BGR
                row += b"\x00" * (row_out - len(row))
                rows.append(bytes(row))
            stored.append(b"".join(rows))
        bitcount, bi_comp = 24, 0
    else:
        raise NotImplementedError(f"encode compression {compression!r}")

    max_bytes = max((len(f) for f in stored), default=0)
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0x10,  # usec, maxbytes/sec, padding, HASINDEX
        len(stored), 0, 1, max_bytes,  # total, initial, streams, sugg buf
        width, height, 0, 0, 0, 0,
    )
    # full 56-byte AVISTREAMHEADER (ADVICE r7: the old 52-byte payload left
    # a stray trailing dword where external parsers expect rcFrame by
    # offset): fccType fccHandler dwFlags wPriority wLanguage
    # dwInitialFrames dwScale dwRate dwStart dwLength
    # dwSuggestedBufferSize dwQuality dwSampleSize rcFrame{4 shorts}
    strh = (
        b"vids"
        + (compression if compression == b"MJPG" else b"DIB ")
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0,              # flags, prio, lang, initial
            usec_per_frame, 1_000_000,  # scale, rate -> fps = rate/scale
            0, len(stored), max_bytes, 0xFFFFFFFF, 0,
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bitcount, bi_comp,
        max_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = bytearray()
    idx = bytearray()
    for f in stored:
        # offset convention: relative to the 'movi' fourcc position
        idx += ckid + struct.pack("<III", 0x10, 4 + len(movi_payload), len(f))
        movi_payload += _chunk(ckid, f)
    movi = _list(b"movi", bytes(movi_payload))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (ckid, payload_start, payload_size) walking even-padded RIFF
    chunks in data[start:end); fail-loud on truncation."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise AviError(f"truncated chunk header at {pos}")
        ckid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise AviError(f"chunk {ckid!r} overruns parent at {pos}")
        yield ckid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes):
    """Parse an AVI container WITHOUT decoding any frame.

    Returns ``(width, height, usec_per_frame, compression, frames)``
    where ``compression`` is ``'MJPG'`` or ``'DIB'`` and ``frames`` is a
    list of raw per-frame chunk payloads (JPEG bytes / padded DIB rows).
    Pure byte-slicing — O(container) parse, frame decode deferred to
    :func:`decode_avi_frame` so samplers touch only the frames they
    take.  Validates: RIFF/AVI signature, header presence, a ``vids``
    stream, and (when ``idx1`` exists) that the index entry count for
    the video stream matches the frames found in ``movi``.
    """
    data = bytes(data)
    if not is_avi(data[:12]):
        raise AviError("not a RIFF/AVI payload")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = 8 + riff_size
    if end > len(data):
        raise AviError("RIFF size overruns payload")

    width = height = usec = None
    comp = None
    stream_no = None
    frames: list[bytes] = []
    idx_count = None
    n_streams_seen = 0

    def walk(start, stop, in_movi=False):
        nonlocal width, height, usec, comp, stream_no, idx_count
        nonlocal n_streams_seen
        for ckid, ps, sz in _iter_chunks(data, start, stop):
            if ckid == b"LIST":
                ltype = data[ps:ps + 4]
                walk(ps + 4, ps + sz, in_movi=in_movi or ltype == b"movi")
            elif ckid == b"avih":
                if sz < 56:
                    raise AviError("avih too short")
                vals = struct.unpack_from("<14I", data, ps)
                usec = vals[0]
                width, height = vals[8], vals[9]
            elif ckid == b"strh":
                if data[ps:ps + 4] == b"vids" and stream_no is None:
                    stream_no = n_streams_seen
                n_streams_seen += 1
            elif ckid == b"strf" and stream_no == n_streams_seen - 1 \
                    and comp is None:
                if sz < 40:
                    raise AviError("strf BITMAPINFOHEADER too short")
                bi_comp = struct.unpack_from("<I", data, ps + 16)[0]
                if bi_comp == struct.unpack("<I", b"MJPG")[0]:
                    comp = "MJPG"
                elif bi_comp == 0:
                    comp = "DIB"
                else:
                    raise NotImplementedError(
                        f"AVI compression fourcc 0x{bi_comp:08x} needs "
                        "pyav/ffmpeg; only MJPG and BI_RGB DIB decode here"
                    )
            elif ckid == b"idx1":
                want = f"{stream_no:02d}".encode() if stream_no is not None \
                    else b"00"
                cnt = 0
                for off in range(0, sz - sz % 16, 16):
                    ent = data[ps + off:ps + off + 4]
                    # count only FRAME entries for the video stream: a
                    # valid container may also index non-frame chunk kinds
                    # (e.g. '00pc' palette changes) for the same stream
                    # number — those are not movi video frames (ADVICE r7)
                    if ent[:2] == want and ent[2:4] in (b"dc", b"db"):
                        cnt += 1
                idx_count = cnt
            elif in_movi and len(ckid) == 4 and ckid[2:4] in (b"dc", b"db"):
                sn = ckid[:2]
                if sn.isdigit() and (
                    stream_no is None or int(sn) == stream_no
                ):
                    frames.append(data[ps:ps + sz])

    walk(12, end)
    if width is None or usec is None:
        raise AviError("missing avih header")
    if comp is None:
        raise AviError("no vids stream with a decodable strf found")
    if not frames:
        raise AviError("movi list holds no video frames")
    if idx_count is not None and idx_count != len(frames):
        raise AviError(
            f"idx1 lists {idx_count} video frames but movi holds "
            f"{len(frames)} — refusing a desynchronized container"
        )
    return width, height, usec, comp, frames


def decode_avi_frame(
    comp: str, width: int, height: int, payload: bytes
) -> tuple[int, bytes]:
    """Decode ONE frame payload to ``(channels, top-down pixel plane)``.

    MJPG: full JPEG decode via :mod:`operators.jpeg` (gray -> 1 channel,
    color -> 3); the frame's own SOF dimensions win over the container's
    (real muxers disagree on rounding).  DIB: unflip bottom-up 4-byte
    padded BGR rows to a top-down RGB plane.
    """
    if comp == "MJPG":
        from .jpeg import decode_jpeg

        _w, _h, ch, px = decode_jpeg(payload)
        return ch, px
    if comp == "DIB":
        row_in = (width * 3 + 3) & ~3
        if len(payload) < row_in * height:
            raise AviError("DIB frame shorter than its row geometry")
        out = bytearray(width * height * 3)
        for y in range(height):
            src = (height - 1 - y) * row_in
            for x in range(width):
                b, g, r = payload[src + 3 * x:src + 3 * x + 3]
                o = 3 * (y * width + x)
                out[o:o + 3] = bytes((r, g, b))
        return 3, bytes(out)
    raise NotImplementedError(f"frame compression {comp!r}")
