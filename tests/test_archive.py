"""Round-9 archive-ingestion tests (operators/archive.py) behind
q421/q422: magic sniffing, member explode across the container matrix,
outer-compression peel, EPUB container/OPF/spine walk."""

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile

import pytest

from rust_dataframe_spark.operators.archive import (
    ArchiveError,
    archive_members,
    detect_archive,
    epub_chapters,
    explode_archive,
)


def _tar(members, outer=None):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            tf.addfile(ti, io.BytesIO(body))
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
    raw = buf.getvalue()
    if outer == "gz":
        return gzip.compress(raw, mtime=0)
    if outer == "xz":
        return lzma.compress(raw)
    return raw


def _zip(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, body in members:
            zf.writestr(name, body)
    return buf.getvalue()


def _epub(spine_order, chapters):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container xmlns="urn:oasis:names:tc:'
            'opendocument:xmlns:container"><rootfiles><rootfile full-path='
            '"OEBPS/content.opf" media-type="application/oebps-package+xml"'
            "/></rootfiles></container>",
        )
        manifest = "".join(
            f'<item id="c{k}" href="ch{k}.xhtml"/>' for k in range(len(chapters))
        )
        spine = "".join(f'<itemref idref="c{k}"/>' for k in spine_order)
        zf.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/'
            f'opf"><manifest>{manifest}</manifest><spine>{spine}</spine>'
            "</package>",
        )
        for k, (title, body) in enumerate(chapters):
            zf.writestr(
                f"OEBPS/ch{k}.xhtml",
                f"<html><head><title>{title}</title></head><body><p>{body}"
                "</p></body></html>",
            )
    return buf.getvalue()


MEMBERS = [("a.txt", b"hello"), ("sub/b.txt", b"world!!")]


class TestArchiveMembers:
    def test_container_matrix(self):
        assert archive_members(_tar(MEMBERS)) == MEMBERS
        assert archive_members(_tar(MEMBERS, outer="gz")) == MEMBERS
        assert archive_members(_tar(MEMBERS, outer="xz")) == MEMBERS
        assert archive_members(_zip(MEMBERS)) == MEMBERS

    def test_detection_is_magic_not_name(self):
        assert detect_archive(b"PK\x03\x04") == "zip"
        assert detect_archive(b"\x1f\x8b\x08\x00") == "gzip"
        assert detect_archive(b"BZh9") == "bz2"
        assert detect_archive(b"\xfd7zXZ\x00") == "xz"
        assert detect_archive(b"", at257=b"ustar") == "tar"
        assert detect_archive(b"plain") is None

    def test_bare_compressed_document(self):
        assert archive_members(bz2.compress(b"doc")) == [("", b"doc")]
        assert archive_members(gzip.compress(b"doc", mtime=0)) == [
            ("", b"doc")
        ]

    def test_multimember_gzip_outer(self):
        # two gzip members concatenated around one tar (gnu zcat style)
        raw = _tar(MEMBERS)
        split = len(raw) // 2
        blob = gzip.compress(raw[:split], mtime=0) + gzip.compress(
            raw[split:], mtime=0
        )
        assert archive_members(blob) == MEMBERS

    def test_corrupt_fails_loud(self):
        with pytest.raises(ArchiveError, match="magic"):
            archive_members(b"not an archive" + bytes(300))
        z = bytearray(_zip(MEMBERS))
        z[-10] ^= 0xFF
        with pytest.raises(ArchiveError, match="zip"):
            archive_members(bytes(z))
        with pytest.raises(ArchiveError, match="gzip|corrupt"):
            archive_members(b"\x1f\x8b" + b"junk" * 4)


class TestEpub:
    def test_spine_order_wins_over_zip_order(self):
        chapters = [("A", "one"), ("B", "two two"), ("C", "three")]
        out = epub_chapters(_epub([2, 0, 1], chapters))
        assert [(c[0], c[1], c[2], c[3]) for c in out] == [
            (0, "ch2.xhtml", "C", "three"),
            (1, "ch0.xhtml", "A", "one"),
            (2, "ch1.xhtml", "B", "two two"),
        ]

    def test_missing_pieces_fail_loud(self):
        with pytest.raises(ArchiveError, match="container.xml"):
            epub_chapters(_zip(MEMBERS))
        # spine pointing at an absent idref
        blob = _epub([1], [("A", "x")])  # idref c1 not in manifest
        with pytest.raises(ArchiveError, match="not in manifest"):
            epub_chapters(blob)


class TestArchiveSpark:
    def test_explode_archive(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([
            Row(doc_id=1, payload=bytearray(_tar(MEMBERS, outer="gz"))),
            Row(doc_id=2, payload=bytearray(_zip(MEMBERS))),
        ])
        out = explode_archive(df).orderBy("doc_id", "member_idx").collect()
        assert [(r.doc_id, r.path, r.n_bytes) for r in out] == [
            (1, "a.txt", 5), (1, "sub/b.txt", 7),
            (2, "a.txt", 5), (2, "sub/b.txt", 7),
        ]
        assert bytes(out[0].member) == b"hello"
