"""Pure-stdlib WARC (ISO 28500) web-archive ingestion — the on-disk
format 100 TB crawl corpora (Common Crawl lineage) actually arrive in —
plus the two layers under and over it: per-record gzip member splitting
and HTTP/HTML payload extraction.

Three REAL layers, each fail-loud:

1. **Gzip member split** (:func:`split_gzip_members`): ``.warc.gz``
   files compress EVERY RECORD AS ITS OWN GZIP MEMBER so records are
   independently seekable — naive ``gzip.decompress`` flattens the
   boundaries and loses the record index.  The splitter replays the
   member framing via ``zlib``'s ``unused_data`` walk and returns one
   ``(compressed_offset, bytes)`` per member — exactly the random-access
   index a distributed reader shards on at 100 TB.
2. **WARC record framing** (:func:`parse_warc`): ``WARC/1.0|1.1``
   version line, CRLF header block, ``Content-Length``-delimited body,
   mandatory CRLF CRLF record terminator.  Truncated bodies, missing
   terminators, and unparseable lengths raise :class:`WarcError` —
   a silently-resynced crawl reader yields garbage documents, the worst
   possible corpus defect.
3. **HTTP + HTML extraction** (:func:`split_http_response`,
   :func:`extract_text_html`): status line + header split on the
   ``response`` records, then text extraction through Python's stdlib
   ``html.parser`` — ``script``/``style``/``noscript``/``template``
   subtrees dropped, block elements emit newlines, entities unescaped,
   whitespace normalized; returns ``(title, text)``.  This is the
   CCNet/RefinedWeb first step (WARC -> clean text) that everything
   else in the package (LID, quality, dedup, tokenize) consumes.

The Spark operator (:func:`warc_records`) is a 1->N ``mapInPandas``
explode: one archive payload row yields one row per contained record
with its type, target URI, HTTP status, content type, title, extracted
text and token count — partition-preserving, executor-side, the driver
never sees archive bytes.  The encoder half (:func:`encode_warc`)
emits conformant single-member-per-record ``.warc.gz`` fixtures.

Reference parity: the reference repo reads CSV/JSON/Parquet only; this
extends the corpus-ingestion surface (SURVEY §8).
"""

from __future__ import annotations

import io
import zlib

__all__ = [
    "WarcError",
    "split_gzip_members",
    "parse_warc",
    "split_http_response",
    "extract_text_html",
    "encode_warc",
    "warc_records",
    "WARC_RECORD_SCHEMA",
]


class WarcError(ValueError):
    """Malformed WARC / gzip-member / HTTP framing."""


def split_gzip_members(data: bytes) -> list[tuple[int, bytes]]:
    """Split a multi-member gzip stream into ``(offset, decompressed)``
    per member.  Offsets are byte positions of each member's header in
    the COMPRESSED stream (the shard index).  Non-gzip input raises."""
    data = bytes(data)
    if data[:2] != b"\x1f\x8b":
        raise WarcError("not a gzip stream")
    out: list[tuple[int, bytes]] = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise WarcError(f"gzip member boundary lost at {pos}")
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as e:
            raise WarcError(f"corrupt gzip member at {pos}: {e}") from e
        if not d.eof:
            raise WarcError(f"truncated gzip member at {pos}")
        out.append((pos, chunk))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member consumed no bytes")
        pos += consumed
    return out


def parse_warc(data: bytes) -> list[dict]:
    """Parse an UNCOMPRESSED WARC stream into records:
    ``{"headers": {lower-name: value}, "type", "target_uri", "body"}``.
    Enforces the version line, Content-Length body framing and the
    CRLF CRLF record terminator."""
    data = bytes(data)
    records: list[dict] = []
    pos = 0
    while pos < len(data):
        # tolerate extra blank lines between records (some writers pad)
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise WarcError(f"no version line terminator at {pos}")
        version = data[pos:eol]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise WarcError(f"bad WARC version line {version!r} at {pos}")
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in data[eol + 2 : hdr_end].split(b"\r\n"):
            if not line:
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                raise WarcError(f"malformed WARC header line {line!r}")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcError("missing/invalid Content-Length") from e
        body_at = hdr_end + 4
        if body_at + clen > len(data):
            raise WarcError("record body overruns stream")
        body = data[body_at : body_at + clen]
        term = data[body_at + clen : body_at + clen + 4]
        if term != b"\r\n\r\n":
            raise WarcError("missing CRLF CRLF record terminator")
        records.append({
            "headers": headers,
            "type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "body": body,
        })
        pos = body_at + clen + 4
    if not records:
        raise WarcError("empty WARC stream")
    return records


def split_http_response(body: bytes) -> tuple[int, dict, bytes]:
    """Split a WARC ``response`` body into (status, headers, payload)."""
    hdr_end = body.find(b"\r\n\r\n")
    if hdr_end < 0:
        raise WarcError("HTTP response without header terminator")
    lines = body[:hdr_end].split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {lines[0]!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise WarcError(f"bad HTTP status {parts[1]!r}") from e
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return status, headers, body[hdr_end + 4 :]


_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "td", "th", "table", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "nav", "aside", "figure",
}
_DROP_TAGS = {"script", "style", "noscript", "template"}


def extract_text_html(html: str) -> tuple[str, str]:
    """stdlib-``html.parser`` text extraction: returns ``(title,
    text)`` — ``script``/``style``/``noscript``/``template`` subtrees
    dropped, block tags break lines, entities unescaped (the parser
    does it), whitespace normalized to single spaces within lines and
    single newlines between non-empty lines."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.chunks: list[str] = []
            self.title: list[str] = []
            self.drop = 0
            self.in_title = False

        def handle_starttag(self, tag, attrs):
            if tag in _DROP_TAGS:
                self.drop += 1
            elif self.drop:
                return  # block tags inside dropped subtrees emit nothing
            elif tag == "title":
                self.in_title = True
            elif tag in _BLOCK_TAGS:
                self.chunks.append("\x00")

        def handle_endtag(self, tag):
            if tag in _DROP_TAGS:
                if self.drop:
                    self.drop -= 1
            elif self.drop:
                return
            elif tag == "title":
                self.in_title = False
            elif tag in _BLOCK_TAGS:
                self.chunks.append("\x00")

        def handle_data(self, d):
            if self.drop:
                return
            if self.in_title:
                self.title.append(d)
            else:
                self.chunks.append(d)

    p = _X()
    p.feed(html)
    p.close()
    # source newlines are plain whitespace in HTML flow; only BLOCK tag
    # boundaries (the \x00 sentinel) break lines
    lines = []
    for seg in "".join(p.chunks).split("\x00"):
        line = " ".join(seg.split())
        if line:
            lines.append(line)
    return " ".join("".join(p.title).split()), "\n".join(lines)


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _gzip_member(payload: bytes) -> bytes:
    import gzip as _gz

    buf = io.BytesIO()
    # mtime=0 keeps fixtures byte-deterministic
    with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(payload)
    return buf.getvalue()


def encode_warc(
    records: list[tuple[str, str, bytes]], *, compress: bool = True
) -> bytes:
    """Build a conformant WARC stream from ``(warc_type, target_uri,
    body)`` tuples — one gzip member per record when ``compress`` (the
    ``.warc.gz`` convention that keeps records seekable)."""
    out = bytearray()
    for i, (wtype, uri, body) in enumerate(records):
        hdrs = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode("latin-1"),
            b"WARC-Record-ID: <urn:uuid:%08d>" % i,
            b"WARC-Date: 2026-01-01T00:00:00Z",
        ]
        if uri:
            hdrs.append(b"WARC-Target-URI: " + uri.encode("latin-1"))
        if wtype == "response":
            hdrs.append(b"Content-Type: application/http; msgtype=response")
        hdrs.append(b"Content-Length: %d" % len(body))
        rec = b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"
        out += _gzip_member(rec) if compress else rec
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

WARC_RECORD_SCHEMA = (
    "doc_id bigint, rec_idx int, warc_type string, target_uri string, "
    "http_status int, content_type string, title string, text string, "
    "n_tokens int"
)


def warc_records(mm_df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Explode ``.warc.gz`` (or plain ``.warc``) payloads into one row
    per record (1->N inside one Arrow batch).  ``response`` records with
    an HTML content type get title/text extraction + whitespace token
    count; other record types (warcinfo/request/metadata) carry their
    type with NULL text — the downstream filter is a plain ``WHERE``.
    Output inherits the input partitioning: the next pipeline stage
    (LID, quality, dedup) needs no extra shuffle."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "rec_idx", "warc_type", "target_uri",
                "http_status", "content_type", "title", "text", "n_tokens",
            )}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                if p[:2] == b"\x1f\x8b":
                    raw = b"".join(m for _, m in split_gzip_members(p))
                else:
                    raw = p
                for ri, rec in enumerate(parse_warc(raw)):
                    status = ctype = title = text = ntok = None
                    if rec["type"] == "response":
                        status, hh, payload = split_http_response(rec["body"])
                        ctype = hh.get("content-type", "")
                        if "html" in ctype:
                            title, text = extract_text_html(
                                payload.decode("utf-8", "replace")
                            )
                            ntok = len(text.split())
                    rows["doc_id"].append(doc_id)
                    rows["rec_idx"].append(ri)
                    rows["warc_type"].append(rec["type"])
                    rows["target_uri"].append(rec["target_uri"] or None)
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["title"].append(title)
                    rows["text"].append(text)
                    rows["n_tokens"].append(ntok)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, WARC_RECORD_SCHEMA)
