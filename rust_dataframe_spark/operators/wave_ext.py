"""Extended RIFF/WAVE decode — the non-PCM / wide-PCM formats the stdlib
``wave`` module refuses, closing most of the remaining "non-PCM audio"
fallback in the multimodal decode policy.

Formats (all public: RIFF/WAVE format registry + ITU-T G.711):

* tag 1  PCM       — 8 (unsigned->signed), 16, 24 (3-byte LE), 32 bit
* tag 3  IEEE float — float32
* tag 6  G.711 A-law — expanded to 13-bit-magnitude linear (16-bit carrier)
* tag 7  G.711 u-law — expanded to 14-bit-magnitude linear (16-bit carrier)
* tag 0x11 IMA/DVI ADPCM — block-header predictor + table-driven 4-bit
  state machine, pure integer (RFC 3551 section 4.5.1); mono AND
  multichannel (round 8: per-channel headers, 4-byte channel word
  interleave per the Microsoft/IMA layout)
* tag 0x02 MS-ADPCM — 7 fixed predictor pairs + adaptive delta, pure
  integer (Microsoft WAVE_FORMAT_ADPCM spec / RFC 2361 registry); mono
  AND multichannel (round 8: per-channel header fields, nibbles rotate
  across channels)
* tag 0xFFFE EXTENSIBLE — SubFormat GUID's leading tag, same matrix

The G.711 expansions are closed-form (u-law: complement, then
``((mant*8 + 0x84) << exp) - 0x84`` with bit-7 sign; A-law: XOR 0x55,
``mant*16 + 8`` at exp 0 else ``(mant*16 + 0x108) << (exp-1)``, bit 7
POSITIVE) — verified byte-for-byte against the stdlib ``audioop`` ITU
tables in tests, and simple enough that a SQL oracle replays them exactly
(q399).  MP3/OGG (true DSP codecs) remain the only documented gates.

Container parsing reuses the fail-loud RIFF chunk walker from
:mod:`operators.avi` — WAVE and AVI are the same chunk grammar.
"""

from __future__ import annotations

import struct

from .avi import AviError, _iter_chunks

__all__ = [
    "WaveExtError",
    "ULAW_TO_LIN",
    "ALAW_TO_LIN",
    "encode_wav_raw",
    "decode_wav_ext",
    "ima_adpcm_step",
    "IMA_STEP_TABLE",
    "IMA_INDEX_TABLE",
    "msadpcm_step",
    "MSADPCM_COEFS",
    "MSADPCM_ADAPT",
]


class WaveExtError(ValueError):
    """Malformed or unsupported WAVE container."""


def _ulaw(b: int) -> int:
    c = (~b) & 0xFF
    exp = (c >> 4) & 7
    mant = c & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return -mag if (c & 0x80) else mag


def _alaw(b: int) -> int:
    a = b ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
    return mag if (a & 0x80) else -mag


ULAW_TO_LIN = tuple(_ulaw(b) for b in range(256))
ALAW_TO_LIN = tuple(_alaw(b) for b in range(256))

_PCM, _FLOAT, _ALAW_TAG, _ULAW_TAG, _EXT = 1, 3, 6, 7, 0xFFFE
_IMA_ADPCM = 0x11
_MS_ADPCM = 0x02

# IMA/DVI ADPCM tables (public IMA "Recommended Practices for Enhancing
# Digital Audio Compatibility", also RFC 3551 section 4.5.1)
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_step(predictor: int, index: int, nibble: int):
    """One IMA ADPCM decode step: ``(new_predictor, new_index)``.

    Pure integer arithmetic (shift-and-add diff, table-driven step
    adaptation, clamps) — the exact update a SQL recursive CTE replays in
    the q400 oracle."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble & 7]))
    return predictor, index


def _decode_ima(frames: bytes, block_align: int, channels: int) -> list[int]:
    """Decode IMA ADPCM WAV blocks, mono or MULTICHANNEL (round 8,
    VERDICT r7 #2).  Per block: one 4-byte header PER CHANNEL in channel
    order (int16 initial predictor — emitted as that channel's first
    sample — uint8 step index, reserved), then data interleaved as
    4-BYTE WORDS PER CHANNEL: 4 bytes (8 low-nibble-first samples) for
    channel 0, 4 bytes for channel 1, ..., repeating — the layout the
    Microsoft/IMA multichannel spec mandates.  Output is interleaved by
    sample time across channels (the WAV frame convention every caller
    and the channel-mix in multimodal.decode_wav expect).  Mono keeps
    the plain byte stream (no word-group requirement — headers aside,
    every byte is channel 0)."""
    if channels < 1:
        raise WaveExtError(f"IMA ADPCM channels {channels} < 1")
    hdr = 4 * channels
    if block_align < hdr:
        raise WaveExtError(
            f"IMA ADPCM block_align {block_align} < {hdr} "
            f"({channels}-channel header)"
        )
    group = 4 * channels
    if channels > 1 and (block_align - hdr) % group:
        raise WaveExtError(
            f"IMA ADPCM {channels}-channel data region "
            f"{block_align - hdr} not a multiple of the {group}-byte "
            f"channel word group"
        )
    out: list[int] = []
    for bs in range(0, len(frames) - len(frames) % block_align, block_align):
        block = frames[bs:bs + block_align]
        preds: list[int] = []
        idxs: list[int] = []
        for c in range(channels):
            p = struct.unpack_from("<h", block, 4 * c)[0]
            ix = block[4 * c + 2]
            if ix > 88:
                raise WaveExtError(f"IMA ADPCM step index {ix} > 88")
            preds.append(p)
            idxs.append(ix)
        if channels == 1:
            out.append(preds[0])
            for byte in block[hdr:]:
                for nibble in (byte & 0x0F, byte >> 4):  # low nibble first
                    preds[0], idxs[0] = ima_adpcm_step(
                        preds[0], idxs[0], nibble
                    )
                    out.append(preds[0])
            continue
        chans: list[list[int]] = [[p] for p in preds]
        for pos in range(hdr, block_align, group):
            for c in range(channels):
                for byte in block[pos + 4 * c:pos + 4 * c + 4]:
                    for nibble in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = ima_adpcm_step(
                            preds[c], idxs[c], nibble
                        )
                        chans[c].append(preds[c])
        for i in range(len(chans[0])):
            for c in range(channels):
                out.append(chans[c][i])
    return out


# MS-ADPCM fixed tables (public Microsoft WAVE_FORMAT_ADPCM spec / RFC 2361
# registry; the 7 standard predictor coefficient pairs + nibble adaptation)
MSADPCM_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)
MSADPCM_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def msadpcm_step(s1: int, s2: int, delta: int, c1: int, c2: int, nibble: int):
    """One MS-ADPCM decode step: ``(new_sample, new_delta)``.

    ``predicted = (s1*c1 + s2*c2) >> 8`` (arithmetic shift = floor),
    ``new = clamp(predicted + signed_nibble * delta)``,
    ``delta' = clamp(16, (adapt[nibble] * delta) >> 8, 2^23 - 1)`` — pure
    integer, so a SQL recursive CTE replays it exactly (q402 oracle).

    The upper delta clamp is a documented deviation the SPEC leaves
    undefined: the adaptation recurrence has no ceiling, so an
    adversarial (non-encoder-produced) nibble stream grows delta
    geometrically — measured 1.7e20 on an analytic fixture — which is
    undefined-behavior territory for every int32-carrying C
    implementation.  Encoder-produced streams keep delta near the 16-bit
    residue scale (< 2^17), so 2^23 - 1 is unreachable in legitimate
    data; clamping there makes the decoder total on all inputs instead
    of silently wrapping."""
    signed = nibble - 16 if nibble >= 8 else nibble
    predicted = (s1 * c1 + s2 * c2) >> 8
    new = max(-32768, min(32767, predicted + signed * delta))
    return new, max(16, min(0x7FFFFF, (MSADPCM_ADAPT[nibble] * delta) >> 8))


def _decode_msadpcm(
    frames: bytes, block_align: int, channels: int
) -> list[int]:
    """Decode MS-ADPCM blocks, mono or MULTICHANNEL (round 8, VERDICT r7
    #2).  Per block the header carries each field FOR ALL CHANNELS in
    channel order (the Microsoft WAVE_FORMAT_ADPCM layout): predictor
    index per channel (1 byte each), int16 initial delta per channel,
    int16 sample1 per channel, int16 sample2 per channel — 7*channels
    header bytes.  Samples emit oldest-first (every channel's sample2,
    then every channel's sample1), and data nibbles (high nibble first
    within each byte) ROTATE across channels: nibble k belongs to
    channel k % channels, each channel carrying its own (s1, s2, delta)
    state — so the decoded stream is already interleaved by time.  For
    channels=1 this is exactly the mono state machine."""
    if channels < 1:
        raise WaveExtError(f"MS-ADPCM channels {channels} < 1")
    hdr = 7 * channels
    if block_align < hdr:
        raise WaveExtError(
            f"MS-ADPCM block_align {block_align} < {hdr} "
            f"({channels}-channel header)"
        )
    out: list[int] = []
    for bs in range(0, len(frames) - len(frames) % block_align, block_align):
        block = frames[bs:bs + block_align]
        c1s: list[int] = []
        c2s: list[int] = []
        for c in range(channels):
            pred_idx = block[c]
            if pred_idx >= len(MSADPCM_COEFS):
                raise WaveExtError(f"MS-ADPCM predictor index {pred_idx} > 6")
            c1s.append(MSADPCM_COEFS[pred_idx][0])
            c2s.append(MSADPCM_COEFS[pred_idx][1])
        deltas = [
            max(16, struct.unpack_from("<h", block, channels + 2 * c)[0])
            for c in range(channels)
        ]
        s1s = [
            struct.unpack_from("<h", block, 3 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        s2s = [
            struct.unpack_from("<h", block, 5 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        out.extend(s2s)
        out.extend(s1s)
        k = 0
        for byte in block[hdr:]:
            for nibble in (byte >> 4, byte & 0x0F):  # high nibble first
                c = k % channels
                new, deltas[c] = msadpcm_step(
                    s1s[c], s2s[c], deltas[c], c1s[c], c2s[c], nibble
                )
                s2s[c], s1s[c] = s1s[c], new
                out.append(new)
                k += 1
    return out


def encode_wav_raw(
    fmt_tag: int,
    bits: int,
    sample_rate: int,
    channels: int,
    frames: bytes,
    *,
    block_align: int | None = None,
) -> bytes:
    """Wrap pre-encoded sample bytes in a RIFF/WAVE container (fixture
    builder — the byte stream itself is the caller's, e.g. analytic
    G.711 bytes or packed PCM frames).  ``block_align`` overrides the
    per-sample default for block codecs (IMA ADPCM: header + data bytes
    per block)."""
    from .avi import _chunk  # same even-padded RIFF chunk grammar as AVI

    block = block_align or channels * ((bits + 7) // 8)
    fmt = struct.pack(
        "<HHIIHH",
        fmt_tag, channels, sample_rate, sample_rate * block, block, bits,
    )
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_ext(payload: bytes):
    """Decode a RIFF/WAVE payload across the extended format matrix.

    Returns ``(sample_rate, channels, fmt_name, samples)`` with
    ``samples`` interleaved: ints at native scale for PCM (8-bit rebased
    to signed) and for G.711 (expanded 16-bit linear), Python floats for
    float32.  Fail-loud on malformed containers; NotImplementedError on
    format tags outside the matrix (MP3-in-WAV, GSM...).
    """
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WaveExtError("not a RIFF/WAVE payload")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    fmt = frames = None
    try:
        for ckid, ps, sz in _iter_chunks(data, 12, end):
            if ckid == b"fmt " and fmt is None:
                if sz < 16:
                    raise WaveExtError("fmt chunk too short")
                fmt = struct.unpack_from("<HHIIHH", data, ps)
                if fmt[0] == _EXT:
                    if sz < 26:
                        raise WaveExtError("EXTENSIBLE fmt missing SubFormat")
                    sub = struct.unpack_from("<H", data, ps + 24)[0]
                    fmt = (sub,) + fmt[1:]
            elif ckid == b"data" and frames is None:
                frames = data[ps:ps + sz]
    except AviError as e:
        raise WaveExtError(str(e)) from None
    if fmt is None or frames is None:
        raise WaveExtError("missing fmt or data chunk")
    tag, channels, rate, _bps, _block, bits = fmt
    if tag == _PCM:
        if bits == 8:
            name, samples = "pcm8", [b - 128 for b in frames]
        elif bits == 16:
            name = "pcm16"
            samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
        elif bits == 24:
            name = "pcm24"
            samples = [
                int.from_bytes(frames[i:i + 3], "little", signed=True)
                for i in range(0, len(frames) - len(frames) % 3, 3)
            ]
        elif bits == 32:
            name = "pcm32"
            samples = list(struct.unpack(f"<{len(frames) // 4}i", frames))
        else:
            raise NotImplementedError(f"{bits}-bit PCM")
    elif tag == _FLOAT:
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit float WAV (32 only)")
        name = "float32"
        samples = list(struct.unpack(f"<{len(frames) // 4}f", frames))
    elif tag == _ULAW_TAG:
        name, samples = "ulaw", [ULAW_TO_LIN[b] for b in frames]
    elif tag == _ALAW_TAG:
        name, samples = "alaw", [ALAW_TO_LIN[b] for b in frames]
    elif tag == _IMA_ADPCM:
        name, samples = "ima_adpcm", _decode_ima(frames, _block, channels)
    elif tag == _MS_ADPCM:
        name, samples = "ms_adpcm", _decode_msadpcm(frames, _block, channels)
    else:
        raise NotImplementedError(
            f"WAVE format tag {tag} (MP3-in-WAV, GSM...) needs ffmpeg"
        )
    return rate, channels, name, samples
