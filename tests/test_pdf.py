"""Round-9 PDF tests (operators/pdf.py) behind q436: both file
layouts, tokenizer escapes, line heuristics, gates."""

import zlib

import pytest

from rust_dataframe_spark.operators.pdf import (
    PdfError,
    encode_pdf,
    extract_pdf_text,
    is_pdf,
    pdf_pages,
)

PAGES = [["Hello world (test)", "Second line here"], ["Page two text"]]


class TestPdf:
    def test_classic_and_stream_layouts_agree(self):
        a = extract_pdf_text(encode_pdf(PAGES, xref_stream=False))
        b = extract_pdf_text(encode_pdf(PAGES, xref_stream=True))
        assert a == b == [
            "Hello world (test)\nSecond line here", "Page two text",
        ]

    def test_string_escapes(self):
        pages = [[r"back\slash and (parens) and more"]]
        out = extract_pdf_text(encode_pdf(pages))
        assert out == ["back\\slash and (parens) and more"]

    def test_tj_kerning_word_gap(self):
        from rust_dataframe_spark.operators.pdf import _page_text

        assert _page_text(b"BT [(Hel) -60 (lo) -300 (world)] TJ ET") == (
            "Hello world"
        )

    def test_quote_operators_break_lines(self):
        from rust_dataframe_spark.operators.pdf import _page_text

        assert _page_text(b"BT (one) Tj (two) ' ET") == "one\ntwo"

    def test_gates(self):
        with pytest.raises(PdfError, match="startxref"):
            extract_pdf_text(b"%PDF-1.4\njunk")
        with pytest.raises(PdfError, match="%PDF"):
            extract_pdf_text(b"nope")
        blob = encode_pdf(PAGES)
        i = blob.index(b"stream\n") + 10
        with pytest.raises(PdfError, match="Flate"):
            extract_pdf_text(
                blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
            )
        from rust_dataframe_spark.operators.pdf import _page_text

        with pytest.raises(PdfError, match="CID"):
            _page_text(b"BT (\x00A\x00B\x00C) Tj ET")

    def test_page_count_validated(self):
        blob = bytearray(encode_pdf(PAGES))
        at = bytes(blob).index(b"/Count 2")
        blob[at + 7] = ord("3")
        with pytest.raises(PdfError, match="Count"):
            extract_pdf_text(bytes(blob))

    def test_spark_explode(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([
            Row(doc_id=1, payload=bytearray(encode_pdf(PAGES))),
        ])
        out = pdf_pages(df).orderBy("page_idx").collect()
        assert [(r.page_idx, r.n_tokens) for r in out] == [(0, 6), (1, 3)]
        assert is_pdf(b"%PDF-1.7")
