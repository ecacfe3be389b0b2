"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to a typed metadata struct (mime, dims, duration...),
partition by a content-addressable key, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched Pandas UDFs over ``mapInPandas`` —
the bytes never round-trip through Python row objects, only Arrow buffers.

Decode policy (updated round 7): PNGs decode FOR REAL across the FULL
format matrix (all five color types incl. palette+tRNS, bit depths
1/2/4/8/16, Adam7 interlace) via the pure-stdlib codec in
:mod:`operators.png`, and JPEGs — baseline sequential (SOF0) AND
progressive (SOF2, round 7), 8-bit, gray/YCbCr, 4:4:4/4:2:2/4:2:0 —
via :mod:`operators.jpeg`: ``decode_image``,
``resize_images(fake_decode=False)``, and ``extract_dhash`` all run on
actual pixels with no PIL.  PCM audio (RIFF/WAVE) decodes via the
stdlib ``wave`` module plus the round-7 extended matrix in
:mod:`operators.wave_ext` — 24/32-bit PCM, float32 (rescaled to the
16-bit linear carrier), ITU G.711 u-law/A-law, and both mono ADPCMs
(IMA/DVI and MS — :func:`decode_wav`) — and VIDEO decodes for real
on two containers: animated GIFs via the pure-stdlib LZW codec in
:mod:`operators.gif`, and (round 7) AVI wrapping MJPEG or
uncompressed-DIB streams via :mod:`operators.avi` — independent frame
chunks mean ``sample_frames(fake_decode=False)`` decodes ONLY the
sampled frames.  Formats that genuinely need
media libraries absent from this container (hierarchical
JPEG, MP3/OGG audio decode, non-MJPEG MP4/WebM codecs) keep the
documented stub: raise
NotImplementedError, or with ``fake=True`` a clearly-marked deterministic
fake derives "features" from the bytes.  Everything around the decode —
schema, batch iteration, UDF signature, partitioning — is identical on
both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_payload",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "extract_features",
    "decode_image",
    "DHASH_SCHEMA",
    "extract_dhash",
    "resize_images",
    "sample_frames",
    "decode_image_pixels",
    "transcode_to_png",
    "decode_wav",
    "decode_audio",
    "segment_audio",
]

# Output schema of the feature-extraction stage — fixed and explicit, because
# mapInPandas cannot infer it.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: binary payload + metadata struct.

    In production the payload column comes straight from the source (parquet
    BYTE_ARRAY / a blob store manifest); here we derive it from text so the
    pipeline is runnable on the synthetic tables.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("size"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    REAL paths: PNGs across the full format matrix (round 7 — all five
    color types incl. palette+tRNS, depths 1/2/4/8/16, Adam7 interlace)
    via the pure-stdlib codec in :mod:`operators.png`, and sequential
    (SOF0), progressive (SOF2), arithmetic-coded (SOF9, round 8),
    12-bit extended-sequential (SOF1) and LOSSLESS (SOF3, round 8)
    JPEGs via :mod:`operators.jpeg` + :mod:`operators.jpeg_arith` +
    :mod:`operators.jpeg_lossless`, baseline TIFF (round 9 — both byte
    orders, strips, PackBits/LZW+predictor, palette/gray/RGB/bilevel,
    multi-page) via :mod:`operators.tiff`, and BMP (round 9 — 1/4/8-bit
    palette, 24/32-bit, RLE8, top-down/bottom-up) via
    :mod:`operators.bmp` — no PIL needed.  Payloads outside those
    subsets (hierarchical JPEG, tiled TIFF, or the synthetic
    text-derived payloads the test tables use) fall back to the
    documented deterministic fake when ``fake=True``, else raise.
    """
    from .bmp import BmpError, decode_bmp, is_bmp
    from .jpeg import JpegError, decode_jpeg_ext, is_jpeg
    from .png import PngError, decode_png, is_png
    from .pnm import PnmError, decode_pnm, is_pnm
    from .tiff import TiffError, decode_tiff, is_tiff

    if is_png(bytes(payload[:8])):
        try:
            w, h, _ch, _px = decode_png(payload)
            return w, h
        except PngError:
            if not fake:
                raise
    elif is_jpeg(bytes(payload[:2])):
        try:
            w, h, _ch, _depth, _px = decode_jpeg_ext(payload)
            return w, h
        except JpegError:
            if not fake:
                raise
    elif is_tiff(bytes(payload[:4])):
        try:
            w, h, _ch, _px = decode_tiff(payload)
            return w, h
        except TiffError:
            if not fake:
                raise
    elif is_bmp(bytes(payload[:2])):
        try:
            w, h, _ch, _px = decode_bmp(payload)
            return w, h
        except BmpError:
            if not fake:
                raise
    elif is_pnm(bytes(payload[:2])):
        try:
            w, h, _ch, _px = decode_pnm(payload)
            return w, h
        except PnmError:
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "image decoding beyond PNG/JPEG/TIFF/BMP/PNM requires "
            "PIL/opencv; not available in this environment"
        )
    n = len(payload)
    return (n % 1920) + 1, (n % 1080) + 1


def extract_features(mm_df: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each batch arrives as a pandas DataFrame; bytes stay in
    Arrow buffers between JVM and Python.  Output schema is FEATURE_SCHEMA.
    """

    def _extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            dims = [decode_image(p, fake=fake_decode) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return mm_df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_images(
    mm_df: DataFrame, *, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Resize every image payload to (width, height) — Arrow-batched, 1:1.

    REAL path (``fake_decode=False``): baseline PNG and baseline JPEG
    payloads decode, nearest-neighbor resample, and re-encode in their own
    container via the pure-stdlib codecs (operators/png, operators/jpeg);
    anything else raises (PngError/JpegError/NotImplementedError).  The
    fake emits a deterministic payload (md5 of input ++ target dims) so
    tests can assert the plumbing: schema preserved, meta dims updated,
    payload replaced, row count unchanged.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def _resize_real(p: bytes) -> bytes:
        # nearest-neighbor resample + re-encode, all stdlib — dispatch on
        # container magic (PNG stays PNG, JPEG stays JPEG at quant=1)
        from rust_dataframe_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            is_jpeg,
        )
        from rust_dataframe_spark.operators.png import decode_png, encode_png

        if is_jpeg(p[:2]):
            w0, h0, ch, px = decode_jpeg(p)
        else:
            w0, h0, ch, px = decode_png(p)
        out = bytearray(width * height * ch)
        for y in range(height):
            sy = min(h0 - 1, y * h0 // height)
            for x in range(width):
                sx = min(w0 - 1, x * w0 // width)
                src = (sy * w0 + sx) * ch
                dst = (y * width + x) * ch
                out[dst : dst + ch] = px[src : src + ch]
        if is_jpeg(p[:2]):
            if ch not in (1, 3):  # gray+alpha/RGBA never come from JPEG
                raise NotImplementedError("unexpected JPEG channel count")
            return encode_jpeg(width, height, bytes(out), channels=ch)
        return encode_png(width, height, bytes(out), channels=ch)

    def _resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake_decode:
                # REAL path: baseline-PNG payloads resize for real; any
                # other format raises (PngError/NotImplementedError) — the
                # fake below is the documented fallback for those
                payloads = [_resize_real(bytes(p)) for p in pdf["payload"]]
            else:
                payloads = [
                    hashlib.md5(bytes(p) + f"|{width}x{height}".encode()).digest()
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return mm_df.mapInPandas(_resize, out_schema)


DHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"d{b}", IntegerType()) for b in range(4)]
)


def extract_dhash(mm_df: DataFrame) -> DataFrame:
    """REAL perceptual dHash over PNG *or JPEG* payloads — Arrow-batched
    mapInPandas dispatching per payload on container magic to the
    pure-stdlib decoder (operators/png or operators/jpeg), emitting the
    same four 16-bit bands as the codegen stand-in :func:`dhash_bands`,
    so the banded-candidate + Hamming-verify pipeline (q225's shape) runs
    unchanged on real pixels of either container.  Decoding happens on
    executors; the driver never sees a pixel."""

    def _dh(batches: Iterator) -> Iterator:
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import decode_jpeg, is_jpeg
        from rust_dataframe_spark.operators.png import (
            dhash_bands_real,
            gray_9x8,
            pack_dhash_bands,
        )

        def one(p: bytes):
            if is_jpeg(p[:2]):
                return pack_dhash_bands(gray_9x8(*decode_jpeg(p)))
            return dhash_bands_real(p)

        for pdf in batches:
            bands = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{f"d{b}": [t[b] for t in bands] for b in range(4)},
                }
            )

    return mm_df.mapInPandas(_dh, DHASH_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    mm_df: DataFrame, *, n_frames: int = 4, fps_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Sample ``n_frames`` frames from each video payload — the 1->N batch
    shape (one input row yields several output rows inside one Arrow batch).

    REAL paths (``fake_decode=False``): animated GIFs decode via the
    pure-stdlib LZW codec in :mod:`operators.gif` (round 5), and AVI
    containers wrapping MJPEG or uncompressed-DIB streams via
    :mod:`operators.avi` + :mod:`operators.jpeg` (round 7) — frames are
    sampled evenly across the clip (source index ``floor(i * total /
    n)``), ``frame`` is the full decoded pixel plane, and ``frame_ts_ms``
    replays the container's timing (GIF: Graphic Control Extension delay
    accumulation; AVI: ``src * usec_per_frame / 1000``).  The AVI path is
    the scale-relevant one: frames are independent chunks behind an
    index, so only the SAMPLED frames are decoded — O(sampled), where
    GIF's sequential LZW is O(total).  Round 9 adds MP4/ISO-BMFF via
    :mod:`operators.mp4` — full box-tree demux (stts/stsc/stsz/stco →
    per-sample byte ranges, same O(sampled) property as AVI) with pixel
    decode for Motion-JPEG (``jpeg``/``mjpa``) sample entries;
    H.264/HEVC/AV1 tracks demux fine but fail LOUD at pixel decode —
    and Matroska/WebM via :mod:`operators.mkv` (EBML element walk,
    cluster-relative block timestamps, V_MJPEG pixels; VP8/VP9/AV1 gate
    loud at pixels, laced blocks refused).  Payloads that genuinely
    need pyav/ffmpeg (VP8/VP9/H.264 bitstreams) still raise, per the
    module decode policy.
    The fake derives each frame deterministically from (payload,
    frame_idx).  The partitioning story is identical on all paths: output
    inherits the input's partitioning, so a downstream per-frame feature
    stage needs no extra shuffle.
    """

    def _sample(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        from .avi import decode_avi, decode_avi_frame, is_avi
        from .gif import decode_gif, is_gif
        from .mkv import decode_mkv, decode_mkv_frame, is_mkv
        from .mp4 import decode_mp4, decode_mp4_frame, is_mp4

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if fake_decode:
                    for i in range(n_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        tss.append(i * fps_ms)
                        frames.append(
                            hashlib.md5(bytes(p) + f"|f{i}".encode()).digest()
                        )
                    continue
                if is_avi(bytes(p[:12])):
                    w, h, usec, comp, raw = decode_avi(p)
                    total = len(raw)
                    take = min(n_frames, total)
                    for i in range(take):
                        src = (i * total) // take
                        _ch, plane = decode_avi_frame(comp, w, h, raw[src])
                        ids.append(doc_id)
                        idxs.append(i)
                        tss.append((src * usec) // 1000)
                        frames.append(plane)
                    continue
                if is_mp4(bytes(p[:12])):
                    _w, _h, tscale, codec, raw, ts_units = decode_mp4(p)
                    total = len(raw)
                    take = min(n_frames, total)
                    for i in range(take):
                        src = (i * total) // take
                        _ch, plane = decode_mp4_frame(codec, raw[src])
                        ids.append(doc_id)
                        idxs.append(i)
                        tss.append((ts_units[src] * 1000) // tscale)
                        frames.append(plane)
                    continue
                if is_mkv(bytes(p[:4])):
                    _w, _h, codec, raw, tms = decode_mkv(p)
                    total = len(raw)
                    take = min(n_frames, total)
                    for i in range(take):
                        src = (i * total) // take
                        _ch, plane = decode_mkv_frame(codec, raw[src])
                        ids.append(doc_id)
                        idxs.append(i)
                        tss.append(tms[src])
                        frames.append(plane)
                    continue
                if not is_gif(bytes(p[:6])):
                    raise NotImplementedError(
                        "non-GIF/AVI/MP4/MKV frame sampling requires "
                        "pyav/ffmpeg"
                    )
                _w, _h, decoded = decode_gif(p)
                total = len(decoded)
                take = min(n_frames, total)
                cum = 0
                cum_ms = []
                for delay, _rgb in decoded:
                    cum_ms.append(cum)
                    cum += delay
                for i in range(take):
                    src = (i * total) // take
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(cum_ms[src])
                    frames.append(decoded[src][1])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return mm_df.mapInPandas(_sample, FRAME_SCHEMA)


def dhash_bands(payload_col):
    """Perceptual difference-hash (dHash) of an image payload as four 16-bit
    band integers — the image analog of SimHash banding: visually-similar
    images share bands, so near-dup candidates come from band equi-joins and
    Hamming distance verifies (sum of per-band ``bit_count(xor)``).

    DECODE STUB (the multimodal policy, see decode_image): real dHash
    grayscales and 9x8-downsamples via PIL, absent in this container.  The
    deterministic stand-in derives the 72 "pixels" from an md5 chain over
    the payload bytes (pixel k = byte k%16 of md5^(1+k//16)(payload)) — the
    SPARK-SIDE SHAPE (pure codegen expressions, banding, Hamming verify) is
    the real thing, and the md5 chain is replayable bit-for-bit by the SQL
    oracle, which a PIL decode could never be.  Identical payloads get
    identical hashes; the downstream plumbing doesn't change when the fake
    decode is swapped for the real one behind the same 72-byte contract.

    dHash bit (r, c) = pixel(r, c) > pixel(r, c+1) over a 9-wide, 8-tall
    grid; band b packs rows 2b..2b+1 (16 bits, little-endian by local bit).
    """
    # md5 chain: 5 hex digests cover 80 bytes >= 72 pixels
    chain = [F.md5(payload_col)]
    for _ in range(4):
        chain.append(F.md5(chain[-1]))

    def px(k: int):
        h = chain[k // 16]
        j = k % 16
        return F.conv(F.substring(h, 2 * j + 1, 2), 16, 10).cast("int")

    bands = []
    for b in range(4):
        val = F.lit(0)
        for l in range(16):
            r = 2 * b + l // 8
            c = l % 8
            bit = F.when(px(r * 9 + c) > px(r * 9 + c + 1), F.lit(1 << l)).otherwise(
                F.lit(0)
            )
            val = val + bit
        bands.append(val.cast("int").alias(f"d{b}"))
    return bands


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL audio decode for RIFF/WAVE PCM payloads — pure stdlib (the
    ``wave`` module + struct), the audio analog of the PNG codec: no
    ffmpeg/soundfile needed for the overwhelmingly common container.

    Returns ``(sample_rate, n_channels, sample_width, samples)`` where
    ``samples`` are SIGNED INTEGER mono amplitudes (channels averaged) at
    the scale ``2^(8*sample_width - 1)`` — the invariant every caller's
    energy/rescale math relies on: 8/16-bit PCM via the stdlib ``wave``
    module, and (round 7, :mod:`operators.wave_ext`) 24/32-bit PCM at
    native scale, ITU G.711 u-law/A-law and IMA/DVI + MS ADPCM (mono and,
    round 8, multichannel) expanded to 16-bit linear (``sample_width``
    2), and IEEE float32
    RESCALED to the 16-bit linear carrier (``round(v * 32767)``,
    ``sample_width`` 2) so the scale invariant holds — returning |v|<=1.0
    floats with sw=4 would silently zero downstream energies.  Only
    MP3/OGG-in-WAV (true DSP codecs) still raise NotImplementedError and
    fall to the documented fake; malformed containers raise the same way
    (fail-loud contract is NotImplementedError on both branches)."""
    import io
    import struct
    import wave

    from .wave_ext import WaveExtError, decode_wav_ext

    def _ext(reason: Exception | None):
        try:
            sr, nch, name, samples = decode_wav_ext(payload)
        except WaveExtError as we:
            raise NotImplementedError(
                f"not a decodable WAV payload: {reason or we}"
            ) from None
        if name == "float32":
            samples = [
                max(-32767, min(32767, int(round(v * 32767)))) for v in samples
            ]
        sw = {"pcm8": 1, "pcm16": 2, "pcm24": 3, "pcm32": 4,
              "float32": 2, "ulaw": 2, "alaw": 2, "ima_adpcm": 2,
              "ms_adpcm": 2}[name]
        if nch > 1:
            samples = [
                sum(samples[i:i + nch]) // nch
                for i in range(0, len(samples), nch)
            ]
        return sr, nch, sw, samples

    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            sw, nch, sr = w.getsampwidth(), w.getnchannels(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        return _ext(e)
    if sw == 1:
        samples = [b - 128 for b in raw]
    elif sw == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        return _ext(None)  # 24/32-bit: same guarded extended path
    if nch > 1:
        samples = [
            sum(samples[i : i + nch]) // nch for i in range(0, len(samples), nch)
        ]
    return sr, nch, sw, samples


def decode_audio(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Container-dispatching audio decode: RIFF/WAVE via
    :func:`decode_wav`, FLAC (round 8, :mod:`operators.flac` — Rice-
    coded LPC, CRC-8/16 + MD5 enforced, EXACT) and Ogg (round 9,
    :mod:`operators.ogg` — RFC 3533 page demux with the Ogg CRC-32
    enforced; FLAC-in-Ogg payloads decode for real through the same
    FLAC codec, VORBIS decodes for real since round 10 through
    :mod:`operators.vorbis` — stream-described codebooks, floor1,
    residue, IMDCT — quantized to 16-bit; Opus gates loud) by magic.  Same contract as
    decode_wav: ``(sample_rate, n_channels, sample_width, samples)``
    with mono-mixed signed samples at scale ``2^(8*sample_width - 1)``
    — FLAC depths that are not byte multiples (12/20-bit) are shifted
    left to the next byte width so the dyadic energy rescale in
    ``segment_audio`` stays exact.  MP3 (round 9, :mod:`operators.mp3`)
    dispatches too: the frame layer parses for real and digital silence
    decodes EXACT; nonzero spectral data raises (the ISO Huffman/window
    tables are unverifiable in-sandbox), as do Opus payloads
    (SILK/CELT; documented gate)."""
    from .aiff_au import decode_aiff, decode_au, is_aiff, is_au
    from .flac import decode_flac, is_flac
    from .mp3 import decode_mp3, is_mp3
    from .ogg import decode_ogg_audio, is_ogg

    if is_aiff(bytes(payload[:12])) or is_au(bytes(payload[:4])):
        fn = decode_aiff if is_aiff(bytes(payload[:12])) else decode_au
        sr, nch, sw, inter = fn(payload)
        if nch > 1:
            inter = [
                sum(inter[i : i + nch]) // nch
                for i in range(0, len(inter), nch)
            ]
        return sr, nch, sw, inter
    if is_mp3(bytes(payload[:4])):
        sr, nch, samples = decode_mp3(payload)
        if nch > 1:
            samples = [
                sum(samples[i : i + nch]) // nch
                for i in range(0, len(samples), nch)
            ]
        return sr, nch, 2, samples
    if is_ogg(bytes(payload[:4])):
        _sr, nch, bps, inter = decode_ogg_audio(payload)
        sw = (bps + 7) // 8
        shift = 8 * sw - bps
        if shift:
            inter = [v << shift for v in inter]
        if nch > 1:
            inter = [
                sum(inter[i : i + nch]) // nch
                for i in range(0, len(inter), nch)
            ]
        return _sr, nch, sw, inter
    if is_flac(bytes(payload[:4])):
        _sr, nch, bps, inter = decode_flac(payload)
        sw = (bps + 7) // 8
        shift = 8 * sw - bps
        if shift:
            inter = [v << shift for v in inter]
        if nch > 1:
            inter = [
                sum(inter[i : i + nch]) // nch
                for i in range(0, len(inter), nch)
            ]
        return _sr, nch, sw, inter
    return decode_wav(payload)


def segment_audio(
    mm_df: DataFrame,
    *,
    frame_bytes: int = 16,
    energy_threshold: int = 128,
    min_frames: int = 2,
    fake_decode: bool = True,
) -> DataFrame:
    """Energy-based audio segmentation (the VAD shape): decode the payload
    to PCM frames, compute per-frame energy, emit the contiguous runs of
    frames above the threshold as (doc_id, seg_id, start_frame, n_frames,
    mean_energy) — the speech/music region extraction step before an audio
    corpus is transcribed or embedded.

    REAL path (round 5): RIFF/WAVE PCM payloads decode for real via the
    stdlib ``wave`` module (:func:`decode_wav` — 8/16-bit, mono-mixed),
    and round 8 adds FLAC via :func:`decode_audio`'s magic dispatch,
    with ``fake_decode=False``; ``frame_bytes`` then counts SAMPLES per
    frame and energy is mean |amplitude| rescaled to 0..256 by a dyadic
    factor (see ``_energies_real``).  Lossy DSP formats (mp3/ogg) would
    need ffmpeg and keep the documented fake: payload BYTES as 8-bit
    samples, frame energy = mean byte value per ``frame_bytes`` window —
    identical Arrow-batched mapInPandas shape, per-row fan-out (one row
    per SEGMENT), and run-length logic on both paths.  Segments shorter
    than ``min_frames`` drop (the VAD hangover rule).
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("seg_id", IntegerType()),
            StructField("start_frame", IntegerType()),
            StructField("n_frames", IntegerType()),
            StructField("mean_energy", DoubleType()),
        ]
    )

    def _energies_real(data: bytes) -> list[float]:
        # REAL path (stdlib WAV decode): frames of ``frame_bytes`` SAMPLES;
        # energy = mean |amplitude| rescaled to the fake's 0..256 domain by
        # the dyadic factor 256 / 2^(bits-1) (so 16-bit divides by 128 and
        # 8-bit multiplies by 2 — powers of two keep the value an exact
        # dyadic double, which makes segment means order-independent and
        # bit-replayable by the SQL oracle)
        _sr, _nch, sw, samples = decode_audio(data)
        scale = 256.0 / float(1 << (8 * sw - 1))
        return [
            sum(abs(v) for v in samples[i : i + frame_bytes])
            / max(1, len(samples[i : i + frame_bytes]))
            * scale
            for i in range(0, len(samples), frame_bytes)
        ]

    def _segment(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "seg_id", "start_frame", "n_frames", "mean_energy")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if not fake_decode:
                    # RIFF/WAVE decodes for real; other formats raise (the
                    # fake below remains the documented stand-in for them)
                    energies = _energies_real(data)
                else:
                    energies = [
                        sum(data[i : i + frame_bytes]) / max(1, len(data[i : i + frame_bytes]))
                        for i in range(0, len(data), frame_bytes)
                    ]
                seg_id, start, acc = 0, None, []
                for idx, e in enumerate(energies + [-1.0]):  # sentinel flushes
                    if e >= energy_threshold:
                        if start is None:
                            start = idx
                        acc.append(e)
                    elif start is not None:
                        if len(acc) >= min_frames:
                            import math

                            rows["doc_id"].append(doc_id)
                            rows["seg_id"].append(seg_id)
                            rows["start_frame"].append(start)
                            rows["n_frames"].append(len(acc))
                            # floor-at-6: engine-stable (round() tie-breaks
                            # differ across engines — the repo convention)
                            rows["mean_energy"].append(
                                math.floor(sum(acc) / len(acc) * 1e6) / 1e6
                            )
                            seg_id += 1
                        start, acc = None, []
            yield pd.DataFrame(rows)

    return mm_df.select("doc_id", "payload").mapInPandas(_segment, schema=out_schema)


def decode_image_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full-pixel unified image decode by magic: PNG / JPEG (all five
    real SOF modes incl. hierarchical) / TIFF / BMP / PNM -> ``(w, h,
    channels, pixels)`` top-down interleaved 8-bit.  The shared
    contract every per-format codec already honors; unknown magic
    raises (round 9)."""
    from .bmp import decode_bmp, is_bmp
    from .jpeg import decode_jpeg, is_jpeg
    from .png import decode_png, is_png
    from .pnm import decode_pnm, is_pnm
    from .tiff import decode_tiff, is_tiff

    head = bytes(payload[:8])
    if is_png(head):
        return decode_png(payload)
    if is_jpeg(head[:2]):
        return decode_jpeg(payload)
    if is_tiff(head[:4]):
        return decode_tiff(payload)
    if is_bmp(head[:2]):
        return decode_bmp(payload)
    if is_pnm(head[:2]):
        return decode_pnm(payload)
    raise NotImplementedError(
        "image transcode beyond PNG/JPEG/TIFF/BMP/PNM requires PIL"
    )


def transcode_to_png(mm_df: DataFrame) -> DataFrame:
    """Normalize every image payload to canonical PNG (round 9) — the
    corpus-homogenization step before perceptual hashing / packing:
    decode by magic through :func:`decode_image_pixels`, re-encode with
    the repo's own PNG encoder.  Output carries the source format tag,
    dims/channels, the PNG bytes, and a decoded-back byte checksum so
    a round-trip drift in ANY of the five decoders or the PNG encoder
    is visible in-plan.  Arrow-batched on executors; lossless for every
    supported source except general (non-block-constant) JPEG, which is
    decoded pixels re-encoded losslessly (the decode itself is the only
    lossy step, as with any JPEG consumer)."""

    def _transcode(batches: Iterator) -> Iterator:
        import pandas as pd

        from .png import decode_png, encode_png

        for pdf in batches:
            rows = {"doc_id": [], "src_format": [], "width": [],
                    "height": [], "channels": [], "png": [],
                    "px_sum": [], "px_wsum": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                fmt = (
                    "png" if p[:8].startswith(b"\x89PNG") else
                    "jpeg" if p[:2] == b"\xff\xd8" else
                    "tiff" if p[:4] in (b"II*\x00", b"MM\x00*") else
                    "bmp" if p[:2] == b"BM" else
                    "pnm"
                )
                w, h, ch, px = decode_image_pixels(p)
                png = encode_png(w, h, px, channels=ch)
                w2, h2, c2, px2 = decode_png(png)
                if (w2, h2, c2, bytes(px2)) != (w, h, ch, bytes(px)):
                    raise ValueError(
                        "PNG transcode round-trip drift (fail-loud)"
                    )
                rows["doc_id"].append(doc_id)
                rows["src_format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["png"].append(png)
                rows["px_sum"].append(sum(px2))
                rows["px_wsum"].append(
                    sum((1 + k) * v for k, v in enumerate(px2))
                )
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(
        _transcode,
        "doc_id bigint, src_format string, width int, height int, "
        "channels int, png binary, px_sum bigint, px_wsum bigint",
    )
