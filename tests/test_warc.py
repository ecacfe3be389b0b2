"""Round-9 WARC ingestion tests (operators/warc.py) behind q420: gzip
member splitting, ISO 28500 record framing, HTTP split, HTML text
extraction, and the Spark 1->N explode."""

import pytest

from rust_dataframe_spark.operators.warc import (
    WarcError,
    encode_warc,
    extract_text_html,
    parse_warc,
    split_gzip_members,
    split_http_response,
    warc_records,
)


def _page(title="T", words=("a", "b"), status=200):
    html = (
        f"<html><head><title>{title}</title><style>a{{}}</style></head>"
        f"<body><h1>H</h1><p>{' '.join(words)}</p>"
        f"<script>var x;</script></body></html>"
    )
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
    ).encode() + html.encode()


class TestWarcFraming:
    def test_gzip_member_split_per_record(self):
        recs = [("warcinfo", "", b"x\r\n"),
                ("response", "http://a/", _page()),
                ("response", "http://b/", _page("U"))]
        gz = encode_warc(recs)
        members = split_gzip_members(gz)
        assert len(members) == 3  # one member PER RECORD, not one stream
        assert members[0][0] == 0
        assert all(
            gz[off : off + 2] == b"\x1f\x8b" for off, _ in members
        )
        # each member is itself a complete WARC record
        for _, m in members:
            assert len(parse_warc(m)) == 1

    def test_flat_gzip_is_not_assumed(self):
        # a single-member stream (naive writer) still parses
        recs = [("warcinfo", "", b"x\r\n"), ("response", "u", _page())]
        import gzip

        flat = gzip.compress(encode_warc(recs, compress=False), mtime=0)
        members = split_gzip_members(flat)
        assert len(members) == 1
        assert len(parse_warc(members[0][1])) == 2

    def test_framing_fail_loud(self):
        raw = encode_warc([("warcinfo", "", b"x\r\n")], compress=False)
        with pytest.raises(WarcError, match="terminator"):
            parse_warc(raw[:-2])
        with pytest.raises(WarcError, match="version"):
            parse_warc(raw.replace(b"WARC/1.0", b"HTTP/1.1"))
        with pytest.raises(WarcError, match="Content-Length"):
            parse_warc(raw.replace(b"Content-Length", b"Content-Lies"))
        with pytest.raises(WarcError, match="overruns"):
            parse_warc(raw.replace(b"Content-Length: 3", b"Content-Length: 9"))
        with pytest.raises(WarcError, match="gzip"):
            split_gzip_members(b"plain text")

    def test_http_split(self):
        st, hh, body = split_http_response(_page(status=404))
        assert st == 404 and hh["content-type"] == "text/html"
        assert body.startswith(b"<html>")
        with pytest.raises(WarcError, match="status line"):
            split_http_response(b"garbage\r\n\r\nbody")


class TestHtmlExtract:
    def test_drops_script_style_breaks_blocks(self):
        title, text = extract_text_html(
            "<html><head><title>T &amp; t</title><style>a{}</style></head>"
            "<body><h1>Head</h1><p>w0 w1  w2</p><script>var x=1;</script>"
            "<div>tail</div></body></html>"
        )
        assert title == "T & t"
        assert text == "Head\nw0 w1 w2\ntail"

    def test_nested_drop_and_inline_flow(self):
        _t, text = extract_text_html(
            "<body>a<span>b</span><noscript><p>no</p></noscript>c</body>"
        )
        assert text == "abc"

    def test_entities_and_whitespace(self):
        _t, text = extract_text_html("<p>&lt;x&gt;   &amp;\n\n y</p>")
        assert text == "<x> & y"


class TestWarcSpark:
    def test_explode_shapes_and_nulls(self, spark):
        from pyspark.sql import Row

        recs = [
            ("warcinfo", "", b"software: t\r\n"),
            ("request", "http://a/", b"GET / HTTP/1.1\r\n\r\n"),
            ("response", "http://a/", _page("A", ("x", "y", "z"))),
            ("response", "http://b/",
             b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\nPDF"),
        ]
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(encode_warc(recs)))]
        )
        out = warc_records(df).orderBy("rec_idx").collect()
        assert [r.warc_type for r in out] == [
            "warcinfo", "request", "response", "response",
        ]
        assert out[0].http_status is None and out[0].text is None
        assert out[2].title == "A" and out[2].n_tokens == 4  # H + x y z
        assert out[2].http_status == 200
        # non-HTML response: status parsed, no text extraction
        assert out[3].http_status == 200 and out[3].text is None
        assert out[3].content_type == "application/pdf"
