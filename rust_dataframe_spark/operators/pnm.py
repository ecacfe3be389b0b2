"""Pure-stdlib netpbm (PNM) codec — P1..P6: the raw interchange format
ML datasets and tooling pipelines actually move uncompressed pixels in.

Full matrix: ASCII bitmap/graymap/pixmap (P1/P2/P3) and binary
(P4/P5/P6); maxval 1..65535 (binary 16-bit samples are big-endian per
the spec); ``#`` comments anywhere in the header; P4 rows padded to
whole bytes, MSB first.  Output contract matches the other image
codecs: ``(width, height, channels, pixels)`` top-down interleaved —
bitmaps expand to 0/255 gray (P1/P4: 1 = black per the spec, so 1 ->
0), 16-bit samples are scaled to 8-bit by ``>> 8`` ONLY when maxval is
65535, otherwise non-byte maxvals gate loud (a silent rescale would be
a lossy lie).  Truncated rasters, oversize samples and malformed
headers raise :class:`PnmError`.  The encoder half emits P5/P6 and the
ASCII variants for byte-real fixtures.

Reference parity: no image surface in the reference; extends the
multimodal matrix (SURVEY §8).
"""

from __future__ import annotations

__all__ = ["PnmError", "is_pnm", "decode_pnm", "encode_pnm"]


class PnmError(ValueError):
    """Malformed or unsupported netpbm structure."""


def is_pnm(head: bytes) -> bool:
    return (
        len(head) >= 2
        and head[0:1] == b"P"
        and head[1:2] in b"123456"
    )


def _tokens(data: bytes, n: int, pos: int):
    """Read n whitespace-separated header tokens, skipping # comments;
    returns (values, new_pos)."""
    vals = []
    while len(vals) < n:
        if pos >= len(data):
            raise PnmError("truncated PNM header")
        c = data[pos : pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise PnmError("unterminated PNM comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tok = data[pos:end]
            if not tok.isdigit():
                raise PnmError(f"non-numeric PNM header token {tok!r}")
            vals.append(int(tok))
            pos = end
    return vals, pos


def decode_pnm(data: bytes) -> tuple[int, int, int, bytes]:
    data = bytes(data)
    if not is_pnm(data[:2]):
        raise PnmError("bad magic (not a PNM)")
    kind = data[1] - 0x30
    bitmap = kind in (1, 4)
    nch = 3 if kind in (3, 6) else 1
    n_hdr = 2 if bitmap else 3
    vals, pos = _tokens(data, n_hdr, 2)
    w, h = vals[0], vals[1]
    maxval = 1 if bitmap else vals[2]
    if w <= 0 or h <= 0:
        raise PnmError(f"bad dimensions {w}x{h}")
    if not bitmap and not 1 <= maxval <= 65535:
        raise PnmError(f"maxval {maxval} out of range")
    wide = maxval > 255
    if wide and maxval != 65535:
        raise PnmError(
            f"16-bit maxval {maxval} != 65535 unsupported (a silent "
            "rescale would be lossy; fail-loud)"
        )
    n_samples = w * h * nch
    out = bytearray()
    if kind in (1, 2, 3):  # ASCII
        if kind == 1:
            # P1 digits may be unseparated; read raster char-wise
            got = 0
            while got < n_samples and pos < len(data):
                c = data[pos : pos + 1]
                if c in b"01":
                    out.append(0 if c == b"1" else 255)  # 1 = black
                    got += 1
                elif c.isspace():
                    pass
                elif c == b"#":
                    nl = data.find(b"\n", pos)
                    pos = nl if nl >= 0 else len(data)
                else:
                    raise PnmError(f"bad P1 raster byte {c!r}")
                pos += 1
            if got < n_samples:
                raise PnmError("truncated P1 raster")
        else:
            vals, pos = _tokens(data, n_samples, pos)
            for v in vals:
                if v > maxval:
                    raise PnmError(f"sample {v} exceeds maxval {maxval}")
                out.append(v >> 8 if wide else v)
    else:  # binary: exactly one whitespace byte after the header
        pos += 1
        if kind == 4:
            row_bytes = (w + 7) // 8
            if pos + row_bytes * h > len(data):
                raise PnmError("truncated P4 raster")
            for y in range(h):
                base = pos + y * row_bytes
                for x in range(w):
                    bit = (data[base + (x >> 3)] >> (7 - (x & 7))) & 1
                    out.append(0 if bit else 255)
        else:
            per = 2 if wide else 1
            need = n_samples * per
            if pos + need > len(data):
                raise PnmError("truncated PNM raster")
            if wide:
                for i in range(n_samples):
                    v = (data[pos + 2 * i] << 8) | data[pos + 2 * i + 1]
                    if v > maxval:
                        raise PnmError("sample exceeds maxval")
                    out.append(v >> 8)
            else:
                raster = data[pos : pos + need]
                if maxval < 255 and any(v > maxval for v in raster):
                    raise PnmError("sample exceeds maxval")
                out += raster
    return w, h, nch, bytes(out)


def encode_pnm(
    w: int, h: int, channels: int, pixels: bytes, *, ascii_mode: bool = False
) -> bytes:
    """P5/P6 (or P2/P3 with ``ascii_mode``) at maxval 255."""
    if channels not in (1, 3) or len(pixels) != w * h * channels:
        raise PnmError("bad plane")
    if ascii_mode:
        kind = b"P2" if channels == 1 else b"P3"
        body = "\n".join(
            " ".join(
                str(v)
                for v in pixels[y * w * channels : (y + 1) * w * channels]
            )
            for y in range(h)
        )
        return kind + f"\n{w} {h}\n255\n{body}\n".encode()
    kind = b"P5" if channels == 1 else b"P6"
    return kind + f"\n{w} {h}\n255\n".encode() + bytes(pixels)
