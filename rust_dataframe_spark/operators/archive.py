"""Archive-corpus front door: tar / zip / gzip / bz2 / xz member
explode and EPUB chapter text extraction — all stdlib, all fail-loud.

Document dumps arrive as archives: arXiv as ``.tar``, Wikipedia as
``.bz2``, books as ``.zip``/``.epub`` (EPUB IS a zip with an OPF
manifest), code corpora as ``.tar.gz``/``.tar.xz``.  Before any LID /
quality / dedup stage can run, members must be exploded into rows.

- :func:`detect_archive` sniffs by magic: zip (``PK\\x03\\x04`` /
  empty-archive ``PK\\x05\\x06``), POSIX ustar (magic at offset 257),
  gzip, bz2, xz — not by filename (crawled payloads lie about names).
- :func:`archive_members` returns ``(path, bytes)`` per member, peeling
  ONE outer stream layer (gzip/bz2/xz) when it wraps a tar/zip —
  ``.tar.gz`` works without pretending gzip is itself an archive: a
  bare compressed NON-archive payload comes back as a single member
  with path "" (the decompress-only case).  Directory entries are
  skipped; symlinks/devices in tars are skipped (content-less).
- :func:`epub_chapters` walks the EPUB structure for real: the
  ``META-INF/container.xml`` rootfile pointer, the OPF package manifest
  + SPINE (reading order is the spine, not the zip order), then
  extracts each chapter's text via :func:`operators.warc.
  extract_text_html` — returns ``(chapter_idx, href, title, text)``.
  Missing container/OPF/spine entries raise :class:`ArchiveError`.

Spark operators are 1->N ``mapInPandas`` explodes, partition-
preserving, executor-side.  Scale: one archive = one row's work,
O(bytes); the 100 TB sharding axis is the archive count.

Reference parity: the reference reads CSV/JSON/Parquet files only
(io/datasource.rs); archives extend the ingestion surface (SURVEY §8).
"""

from __future__ import annotations

import io

__all__ = [
    "ArchiveError",
    "detect_archive",
    "archive_members",
    "epub_chapters",
    "explode_archive",
    "ARCHIVE_MEMBER_SCHEMA",
]


class ArchiveError(ValueError):
    """Malformed or unsupported archive structure."""


def detect_archive(head: bytes, *, at257: bytes = b"") -> str | None:
    """Magic-sniff: 'zip' | 'tar' | 'gzip' | 'bz2' | 'xz' | 'zstd' |
    'lz4' | None."""
    if head[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if head[:2] == b"\x1f\x8b":
        return "gzip"
    if head[:3] == b"BZh" and len(head) > 3 and 0x31 <= head[3] <= 0x39:
        return "bz2"
    if head[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if head[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if head[:4] == b"\x04\x22\x4d\x18":
        return "lz4"
    if at257[:5] == b"ustar":
        return "tar"
    return None


def _decompress(kind: str, data: bytes) -> bytes:
    try:
        if kind == "gzip":
            # multi-member safe: reuse the WARC splitter
            from .warc import split_gzip_members

            return b"".join(m for _, m in split_gzip_members(data))
        if kind == "bz2":
            import bz2

            return bz2.decompress(data)
        if kind == "zstd":
            from .zstd import zstd_decompress

            return zstd_decompress(data)
        if kind == "lz4":
            from .lz4 import lz4_frame_decompress

            return lz4_frame_decompress(data)
        import lzma

        return lzma.decompress(data)
    except Exception as e:
        raise ArchiveError(f"corrupt {kind} stream: {e}") from e


def archive_members(data: bytes) -> list[tuple[str, bytes]]:
    """Explode one archive payload into ``(path, bytes)`` members."""
    data = bytes(data)
    kind = detect_archive(data[:8], at257=data[257:262])
    if kind is None:
        raise ArchiveError("unknown archive magic")
    if kind in ("gzip", "bz2", "xz", "zstd", "lz4"):
        inner = _decompress(kind, data)
        ik = detect_archive(inner[:8], at257=inner[257:262])
        if ik in ("zip", "tar"):
            data, kind = inner, ik
        else:
            return [("", inner)]  # compressed single document
    if kind == "zip":
        import zipfile

        try:
            zf = zipfile.ZipFile(io.BytesIO(data))
            bad = zf.testzip()
        except zipfile.BadZipFile as e:
            raise ArchiveError(f"corrupt zip: {e}") from e
        if bad is not None:
            raise ArchiveError(f"zip member CRC mismatch: {bad}")
        out = []
        for zi in zf.infolist():
            if zi.is_dir():
                continue
            out.append((zi.filename, zf.read(zi)))
        return out
    import tarfile

    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
        out = []
        for ti in tf:
            if not ti.isfile():
                continue  # dirs/symlinks/devices carry no content
            f = tf.extractfile(ti)
            out.append((ti.name, f.read() if f else b""))
        return out
    except tarfile.TarError as e:
        raise ArchiveError(f"corrupt tar: {e}") from e


# ---------------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------------

_CNS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_ONS = "{http://www.idpf.org/2007/opf}"


def epub_chapters(data: bytes) -> list[tuple[int, str, str, str]]:
    """Spine-ordered chapter extraction from an EPUB payload:
    ``[(chapter_idx, href, title, text), ...]``."""
    import posixpath
    import xml.etree.ElementTree as ET

    members = dict(archive_members(data))
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ArchiveError("EPUB missing META-INF/container.xml")
    try:
        root = ET.fromstring(container)
    except ET.ParseError as e:
        raise ArchiveError(f"bad container.xml: {e}") from e
    rf = root.find(f".//{_CNS}rootfile")
    if rf is None or not rf.get("full-path"):
        raise ArchiveError("container.xml lacks a rootfile")
    opf_path = rf.get("full-path")
    opf = members.get(opf_path)
    if opf is None:
        raise ArchiveError(f"EPUB missing OPF package {opf_path!r}")
    try:
        pkg = ET.fromstring(opf)
    except ET.ParseError as e:
        raise ArchiveError(f"bad OPF: {e}") from e
    manifest = {
        it.get("id"): it.get("href")
        for it in pkg.findall(f".//{_ONS}manifest/{_ONS}item")
    }
    spine = [
        ref.get("idref")
        for ref in pkg.findall(f".//{_ONS}spine/{_ONS}itemref")
    ]
    if not spine:
        raise ArchiveError("OPF has an empty spine")
    base = posixpath.dirname(opf_path)
    from .warc import extract_text_html

    out = []
    for ci, idref in enumerate(spine):
        href = manifest.get(idref)
        if href is None:
            raise ArchiveError(f"spine idref {idref!r} not in manifest")
        path = posixpath.normpath(posixpath.join(base, href)) if base else href
        body = members.get(path)
        if body is None:
            raise ArchiveError(f"spine chapter {path!r} missing from zip")
        title, text = extract_text_html(body.decode("utf-8", "replace"))
        out.append((ci, href, title, text))
    return out


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

ARCHIVE_MEMBER_SCHEMA = (
    "doc_id bigint, member_idx int, path string, n_bytes bigint, "
    "member binary"
)


def explode_archive(mm_df, id_col: str = "doc_id",
                    payload_col: str = "payload"):
    """1->N member explode; output inherits input partitioning so the
    downstream per-member stage needs no extra shuffle."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "member_idx": [], "path": [],
                    "n_bytes": [], "member": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for mi, (path, body) in enumerate(archive_members(bytes(p))):
                    rows["doc_id"].append(doc_id)
                    rows["member_idx"].append(mi)
                    rows["path"].append(path)
                    rows["n_bytes"].append(len(body))
                    rows["member"].append(body)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, ARCHIVE_MEMBER_SCHEMA)
