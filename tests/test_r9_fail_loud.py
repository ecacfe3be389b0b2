"""Round-9 fail-loud certification sweep: every new parser, fed random
bytes and truncations/corruptions of ITS OWN valid fixtures, must raise
its documented error type (or NotImplementedError at a codec gate) —
never hang, never return success on garbage.  This is the property the
ingestion layer's docstrings promise; here it is mechanically swept."""

import random

import pytest

from rust_dataframe_spark.operators import (
    archive,
    bitext,
    bmp,
    chat,
    crawl,
    exif,
    jpeg_hier,
    mail,
    mkv,
    mp3,
    mp4,
    ogg,
    pdf,
    pnm,
    subtitles,
    tiff,
    warc,
    wikitext,
)
from rust_dataframe_spark.operators.jpeg import JpegError, encode_jpeg


def _fixtures():
    """(name, valid_payload, decode_fn, allowed_exception_types)."""
    frames = [encode_jpeg(16, 8, bytes(128), channels=1) for _ in range(3)]
    gray = bytes(range(48))
    inter = [((i * 37) % 4001) - 2000 for i in range(300)]
    half = [100] * (8 * 8)
    diff = [5] * (16 * 16)
    return [
        ("mp4", mp4.encode_mp4(16, 8, frames),
         lambda b: mp4.decode_mp4(b), (mp4.Mp4Error,)),
        ("mkv", mkv.encode_mkv(16, 8, frames),
         lambda b: mkv.decode_mkv(b), (mkv.MkvError,)),
        ("ogg", ogg.encode_ogg_flac(8000, 1, 16, inter, block_size=192),
         lambda b: ogg.decode_ogg_audio(b),
         (ogg.OggError, NotImplementedError)),
        # mp3 is genuinely concatenative: a cut at a frame boundary IS a
        # valid shorter stream, so it gets an off-boundary frame count
        ("mp3", mp3.encode_mp3_silence(44100, 1, 5),
         lambda b: mp3.mp3_frames(b), (mp3.Mp3Error,)),
        ("tiff", tiff.encode_tiff(8, 6, 1, gray, compression=5),
         lambda b: tiff.decode_tiff(b), (tiff.TiffError,)),
        ("bmp", bmp.encode_bmp8(8, 6, gray, [(i, i, i) for i in range(256)]),
         lambda b: bmp.decode_bmp(b), (bmp.BmpError,)),
        ("pnm", pnm.encode_pnm(8, 6, 1, gray),
         lambda b: pnm.decode_pnm(b), (pnm.PnmError,)),
        ("jpeg_hier", jpeg_hier.encode_jpeg_hier(16, 16, half, diff),
         lambda b: jpeg_hier.decode_jpeg_hier(b), (JpegError,)),
        ("warc", warc.encode_warc(
            [("warcinfo", "", b"x\r\n"), ("request", "u", b"GET /\r\n\r\n")]
         ),
         lambda b: warc.parse_warc(
             b"".join(m for _, m in warc.split_gzip_members(b))
         ),
         (warc.WarcError,)),
        ("pdf", pdf.encode_pdf([["hello world"]]),
         lambda b: pdf.extract_pdf_text(b), (pdf.PdfError,)),
        ("pdf_xs", pdf.encode_pdf([["hello world"]], xref_stream=True),
         lambda b: pdf.extract_pdf_text(b), (pdf.PdfError,)),
    ]


class TestFailLoudSweep:
    def test_valid_fixtures_decode(self):
        for name, blob, fn, _exc in _fixtures():
            fn(blob)  # sanity: the sweep inputs are genuinely valid

    def test_truncations_raise_typed(self):
        for name, blob, fn, exc in _fixtures():
            for frac in (0.25, 0.5, 0.9):
                cut = blob[: int(len(blob) * frac)]
                try:
                    fn(cut)
                except exc:
                    continue
                except Exception as e:  # noqa: BLE001
                    pytest.fail(
                        f"{name} truncated@{frac}: undocumented "
                        f"{type(e).__name__}: {e}"
                    )
                else:
                    # a prefix that still parses completely must be a
                    # genuinely self-delimiting format; none of these are
                    pytest.fail(f"{name} truncated@{frac}: silent success")

    def test_single_byte_corruptions_never_undocumented(self):
        rng = random.Random(99)
        for name, blob, fn, exc in _fixtures():
            for _ in range(6):
                i = rng.randrange(len(blob))
                mutated = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
                try:
                    fn(mutated)
                except exc:
                    pass  # documented failure type
                except Exception as e:  # noqa: BLE001
                    pytest.fail(
                        f"{name} flip@{i}: undocumented "
                        f"{type(e).__name__}: {e}"
                    )
                # silent success IS allowed here: flips in payload bytes
                # legitimately decode to different content (checksummed
                # formats catch what their spec checksums cover)

    def test_random_bytes_raise_typed(self):
        rng = random.Random(7)
        junk = bytes(rng.randrange(256) for _ in range(400))
        for name, _blob, fn, exc in _fixtures():
            with pytest.raises(exc):
                fn(junk)

    def test_text_parsers_reject_garbage(self):
        for fn, exc in [
            (lambda: subtitles.parse_srt("garbage"), subtitles.SubtitleError),
            (lambda: subtitles.parse_vtt("garbage"), subtitles.SubtitleError),
            (lambda: wikitext.parse_wiki_dump(b"garbage"),
             wikitext.WikiError),
            (lambda: mail.split_mbox(b"garbage"), mail.MailError),
            (lambda: crawl.parse_robots("no colon line"), crawl.RobotsError),
            (lambda: crawl.canonicalize_url("not a url"), crawl.RobotsError),
            (lambda: archive.archive_members(b"garbage" + bytes(300)),
             archive.ArchiveError),
            (lambda: chat.validate_conversation("garbage"), chat.ChatError),
            (lambda: bitext.gale_church_align([], []), bitext.BitextError),
            (lambda: exif.parse_exif(b"garbage"), tiff.TiffError),
        ]:
            with pytest.raises(exc):
                fn()
