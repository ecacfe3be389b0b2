"""Pure-stdlib APNG (animated PNG) demux + compositor — the animation
format modern web corpora carry alongside GIF.

Surface (the W3C/Mozilla APNG spec, now folded into PNG 3rd edition):
``acTL`` (frame/play counts), ``fcTL`` (per-frame control: region,
delay fraction, dispose_op, blend_op), ``fdAT`` (sequence-numbered
frame data), strict sequence-number validation, the default-image rule
(an ``IDAT`` not preceded by an ``fcTL`` is NOT part of the animation),
region-bounds enforcement, and the full compositing model:

* blend_op 0 (SOURCE): the frame rectangle replaces the canvas region,
  alpha included;
* blend_op 1 (OVER): non-premultiplied alpha compositing (exact
  integer rounding; binary-alpha inputs are bit-exact);
* dispose_op 0 (NONE) / 1 (BACKGROUND: region -> fully transparent
  black) / 2 (PREVIOUS: region reverts to the pre-render canvas;
  PREVIOUS on frame 0 degrades to BACKGROUND per spec).

Frames decode by reassembling a standalone PNG per frame (IHDR with the
region dims + shared PLTE/tRNS + the fdAT payloads re-labelled IDAT)
through :func:`operators.png.decode_png`, so every PNG feature the base
codec supports (filters, interlace, palettes, 16-bit) works inside
animations for free.  Canvases are RGBA (gray/GA/RGB expanded).

The encoder half emits conformant RGBA-frame APNGs for byte-real
fixtures.  Reference parity: the reference repo has no image surface;
this extends the multimodal matrix (SURVEY §8).  Scale: decode is
per-payload executor work, O(frames x pixels), no shuffle.
"""

from __future__ import annotations

import struct
import zlib

from .png import PngError, decode_png, is_png

__all__ = [
    "ApngError",
    "is_apng",
    "apng_frames",
    "encode_apng",
]


class ApngError(ValueError):
    """Malformed APNG structure."""


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ApngError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ApngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ApngError("missing IEND")


def is_apng(data: bytes) -> bool:
    """PNG signature + an acTL chunk before the first IDAT."""
    data = bytes(data)
    if not is_png(data):
        return False
    try:
        for ctype, _ in _chunks(data):
            if ctype == b"acTL":
                return True
            if ctype == b"IDAT":
                return False
    except (ApngError, PngError):
        return False
    return False


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _to_rgba(w: int, h: int, ch: int, px: bytes) -> bytearray:
    out = bytearray(w * h * 4)
    for i in range(w * h):
        o = 4 * i
        if ch == 1:
            v = px[i]
            out[o : o + 4] = bytes((v, v, v, 255))
        elif ch == 2:
            v, a = px[2 * i], px[2 * i + 1]
            out[o : o + 4] = bytes((v, v, v, a))
        elif ch == 3:
            out[o : o + 3] = px[3 * i : 3 * i + 3]
            out[o + 3] = 255
        else:
            out[o : o + 4] = px[4 * i : 4 * i + 4]
    return out


def apng_frames(data: bytes) -> tuple[int, int, list[dict]]:
    """Demux + composite.  Returns ``(width, height, frames)`` where each
    frame is ``{"frame_idx", "delay_ms", "rgba"}`` — the full composited
    RGBA canvas after rendering that frame."""
    data = bytes(data)
    if not is_png(data):
        raise ApngError("not a PNG (bad signature)")
    ihdr = None
    shared: list[bytes] = []  # PLTE/tRNS chunks, re-emitted per frame
    actl = None
    seq_expect = 0
    fctls: list[dict] = []  # each with its data chunks
    idat_in_anim = False
    saw_idat = False
    cur: dict | None = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"acTL":
            if saw_idat:
                raise ApngError("acTL after IDAT")
            nf, np_ = struct.unpack(">II", body)
            actl = (nf, np_)
        elif ctype in (b"PLTE", b"tRNS"):
            shared.append(_chunk(ctype, body))
        elif ctype == b"fcTL":
            (seq, fw, fh, x0, y0, dnum, dden, dop, bop) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if seq != seq_expect:
                raise ApngError(
                    f"fcTL sequence {seq}, expected {seq_expect}"
                )
            seq_expect += 1
            cur = {
                "w": fw, "h": fh, "x": x0, "y": y0,
                "dnum": dnum, "dden": dden or 100,
                "dispose": dop, "blend": bop, "data": [],
            }
            fctls.append(cur)
            if not saw_idat:
                idat_in_anim = True  # first fcTL precedes IDAT
        elif ctype == b"IDAT":
            saw_idat = True
            if cur is not None and idat_in_anim and len(fctls) == 1:
                cur["data"].append(body)
            # else: default image, not part of the animation
        elif ctype == b"fdAT":
            if len(body) < 4:
                raise ApngError("short fdAT")
            (seq,) = struct.unpack_from(">I", body)
            if seq != seq_expect:
                raise ApngError(
                    f"fdAT sequence {seq}, expected {seq_expect}"
                )
            seq_expect += 1
            if cur is None:
                raise ApngError("fdAT before any fcTL")
            cur["data"].append(body[4:])
    if ihdr is None:
        raise ApngError("missing IHDR")
    if actl is None:
        raise ApngError("not an APNG (no acTL)")
    W, H = struct.unpack_from(">II", ihdr)
    if actl[0] != len(fctls):
        raise ApngError(
            f"acTL declares {actl[0]} frames, found {len(fctls)}"
        )
    if not fctls:
        raise ApngError("APNG with zero frames")

    canvas = bytearray(W * H * 4)  # fully transparent black
    frames: list[dict] = []
    for fi, fc in enumerate(fctls):
        fw, fh, x0, y0 = fc["w"], fc["h"], fc["x"], fc["y"]
        if fw == 0 or fh == 0 or x0 + fw > W or y0 + fh > H:
            raise ApngError(
                f"frame {fi} region {fw}x{fh}+{x0}+{y0} outside "
                f"{W}x{H} canvas"
            )
        if not fc["data"]:
            raise ApngError(f"frame {fi} has no data chunks")
        sub_ihdr = struct.pack(">II", fw, fh) + ihdr[8:]
        sub_png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", sub_ihdr)
            + b"".join(shared)
            + b"".join(_chunk(b"IDAT", d) for d in fc["data"])
            + _chunk(b"IEND", b"")
        )
        try:
            dw, dh, dch, dpx = decode_png(sub_png)
        except PngError as e:
            raise ApngError(f"frame {fi} decode failed: {e}") from None
        if (dw, dh) != (fw, fh):
            raise ApngError(f"frame {fi} dims desync")
        rgba = _to_rgba(fw, fh, dch, dpx)

        dispose = fc["dispose"]
        if dispose not in (0, 1, 2):
            raise ApngError(f"frame {fi} dispose_op {dispose}")
        if fc["blend"] not in (0, 1):
            raise ApngError(f"frame {fi} blend_op {fc['blend']}")
        if dispose == 2 and fi == 0:
            dispose = 1  # spec: PREVIOUS on frame 0 -> BACKGROUND
        saved = (
            bytes(canvas) if dispose == 2 else None
        )
        for r in range(fh):
            for cx in range(fw):
                so = 4 * (r * fw + cx)
                do = 4 * ((y0 + r) * W + (x0 + cx))
                if fc["blend"] == 0:
                    canvas[do : do + 4] = rgba[so : so + 4]
                else:
                    sa = rgba[so + 3]
                    if sa == 255:
                        canvas[do : do + 4] = rgba[so : so + 4]
                    elif sa != 0:
                        da = canvas[do + 3]
                        oa255 = sa * 255 + da * (255 - sa)
                        out_a = (oa255 + 127) // 255
                        for c in range(3):
                            sc = rgba[so + c]
                            dc = canvas[do + c]
                            num = sc * sa * 255 + dc * da * (255 - sa)
                            canvas[do + c] = (
                                (num + oa255 // 2) // oa255
                                if oa255
                                else 0
                            )
                        canvas[do + 3] = out_a
        frames.append(
            {
                "frame_idx": fi,
                "delay_ms": 1000 * fc["dnum"] // fc["dden"],
                "rgba": bytes(canvas),
            }
        )
        if dispose == 1:
            for r in range(fh):
                do = 4 * ((y0 + r) * W + x0)
                canvas[do : do + 4 * fw] = bytes(4 * fw)
        elif dispose == 2:
            for r in range(fh):
                do = 4 * ((y0 + r) * W + x0)
                canvas[do : do + 4 * fw] = saved[do : do + 4 * fw]
    return W, H, frames


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _idat_rgba(w: int, h: int, rgba: bytes) -> bytes:
    raw = bytearray()
    stride = 4 * w
    for y in range(h):
        raw += b"\x00" + rgba[y * stride : (y + 1) * stride]
    return zlib.compress(bytes(raw))


def encode_apng(
    w: int,
    h: int,
    frames: list[dict],
    *,
    num_plays: int = 0,
    default_image: bytes | None = None,
) -> bytes:
    """Conformant RGBA-8 APNG.  Each frame dict: ``rgba`` (region
    pixels), optional ``x``/``y``/``w``/``h`` (default full canvas),
    ``delay`` (num, den) default (4, 100), ``dispose`` 0/1/2,
    ``blend`` 0/1.  With ``default_image`` (full-canvas RGBA) the IDAT
    is a standalone default image and every frame rides in fdAT;
    otherwise frame 0 is the IDAT."""
    if not frames:
        raise ApngError("encoder: need at least one frame")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    if default_image is not None:
        if len(default_image) != w * h * 4:
            raise ApngError("encoder: bad default image")
        # an IDAT not preceded by any fcTL = standalone default image
        out += _chunk(b"IDAT", _idat_rgba(w, h, default_image))
    seq = 0
    for fi, fr in enumerate(frames):
        fw = fr.get("w", w)
        fh = fr.get("h", h)
        x0 = fr.get("x", 0)
        y0 = fr.get("y", 0)
        dnum, dden = fr.get("delay", (4, 100))
        rgba = fr["rgba"]
        if len(rgba) != fw * fh * 4:
            raise ApngError(f"encoder: frame {fi} plane size mismatch")
        out += _chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, fw, fh, x0, y0, dnum, dden,
                fr.get("dispose", 0), fr.get("blend", 0),
            ),
        )
        seq += 1
        payload = _idat_rgba(fw, fh, rgba)
        if fi == 0 and default_image is None:
            if (fw, fh, x0, y0) != (w, h, 0, 0):
                raise ApngError(
                    "encoder: IDAT frame 0 must be full-canvas"
                )
            out += _chunk(b"IDAT", payload)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + payload)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)
