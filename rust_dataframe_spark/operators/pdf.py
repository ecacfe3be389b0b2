"""Pure-stdlib PDF text extraction — the papers-corpus front door.

Scientific/legal corpora are PDFs; before LID/quality/dedup they need
text out.  This module implements the honest core of that path from
the public PDF 1.7 spec (ISO 32000-1):

- **Object layer**: classic cross-reference TABLES with ``/Prev``
  chains AND cross-reference STREAMS (``/Type /XRef``, ``/W`` field
  widths, PNG predictor 12 un-filtering) plus ``/ObjStm`` compressed
  object streams — i.e. both the pre-1.5 and modern file layouts
  parse for real.  Indirect references resolve lazily; dictionaries,
  arrays, names, strings (literal with all escapes + octal, and hex),
  numbers and streams all tokenize per §7.3.
- **Document layer**: trailer ``/Root`` -> ``/Pages`` tree walk
  (``/Kids`` recursion, ``/Count`` validated), per-page ``/Contents``
  (single stream or array, concatenated), ``FlateDecode`` via zlib
  (``/DecodeParms`` predictors supported); other filters
  (DCT/LZW/ASCII85...) gate loud.
- **Text layer**: content-stream scan of text objects (``BT .. ET``):
  ``Tj``, ``'``, ``"`` and ``TJ`` show operators; strings decode with
  simple-font byte semantics (PDFDocEncoding ~ latin-1 for the
  printable range).  CID/Type0 two-byte text is DETECTED (NUL-heavy
  strings) and gates loud rather than emitting mojibake.  Line
  heuristic: ``Td``/``TD``/``T*`` with a negative y translation and
  ``ET`` both end a line; within a line, show operations join with
  nothing and TJ kerning offsets beyond -150 milliunits insert a
  space (the standard word-gap heuristic, documented as such).

The fixture encoder (:func:`encode_pdf`) emits conformant multi-page
PDFs — classic-xref or xref-stream+ObjStm layout — with Flate-
compressed content streams, so byte-real fixtures cover both eras.

Scale: per-payload executor work, O(bytes); a PDF is one row.
Reference parity: no document surface in the reference; extends the
ingestion layer (SURVEY §8).
"""

from __future__ import annotations

import re
import struct
import zlib

__all__ = ["PdfError", "is_pdf", "extract_pdf_text", "pdf_pages",
           "encode_pdf"]


class PdfError(ValueError):
    """Malformed or unsupported PDF structure."""


def is_pdf(head: bytes) -> bool:
    return head[:5] == b"%PDF-"


# ---------------------------------------------------------------------------
# tokenizer (§7.3)
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos

    def _skip_ws(self) -> None:
        while self.pos < len(self.d):
            c = self.d[self.pos : self.pos + 1]
            if c in b"%":
                nl = self.d.find(b"\n", self.pos)
                self.pos = len(self.d) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def token(self):
        """Next object: dict/list/bytes(name prefixed '/')/int/float/
        str-keyword/bytes string/('R', num, gen) handled by caller."""
        self._skip_ws()
        if self.pos >= len(self.d):
            raise PdfError("unexpected end of objects")
        c = self.d[self.pos]
        if self.d[self.pos : self.pos + 2] == b"<<":
            return self._dict()
        if c == ord("<"):
            return self._hex_string()
        if c == ord("("):
            return self._lit_string()
        if c == ord("["):
            return self._array()
        if c == ord("/"):
            return self._name()
        if c in b"+-.0123456789":
            return self._number()
        # keyword
        end = self.pos
        while end < len(self.d) and self.d[end] not in _WS + _DELIM:
            end += 1
        kw = self.d[self.pos : end]
        self.pos = end
        if not kw:
            raise PdfError(f"lex error at {self.pos}")
        return kw.decode("latin-1")

    def _name(self):
        self.pos += 1
        end = self.pos
        out = bytearray(b"/")
        while end < len(self.d) and self.d[end] not in _WS + _DELIM:
            if self.d[end] == ord("#") and end + 2 < len(self.d):
                out.append(int(self.d[end + 1 : end + 3], 16))
                end += 3
            else:
                out.append(self.d[end])
                end += 1
        self.pos = end
        return out.decode("latin-1")

    def _number(self):
        m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", self.d[self.pos :])
        if not m:
            raise PdfError(f"bad number at {self.pos}")
        s = m.group(0)
        self.pos += len(s)
        return float(s) if b"." in s else int(s)

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.d[self.pos] == ord("]"):
                self.pos += 1
                return self._fold_refs(out)
            out.append(self.token())

    def _dict(self):
        self.pos += 2
        items = []
        while True:
            self._skip_ws()
            if self.d[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                items = self._fold_refs(items)
                if len(items) % 2:
                    raise PdfError("odd dictionary item count")
                return {
                    items[i]: items[i + 1] for i in range(0, len(items), 2)
                }
            items.append(self.token())

    @staticmethod
    def _fold_refs(items):
        """Collapse 'num gen R' triples into ('ref', num)."""
        out = []
        for it in items:
            out.append(it)
            if (
                it == "R"
                and len(out) >= 3
                and isinstance(out[-3], int)
                and isinstance(out[-2], int)
            ):
                num = out[-3]
                del out[-3:]
                out.append(("ref", num))
        return out

    def _hex_string(self):
        end = self.d.index(b">", self.pos)
        hexs = re.sub(rb"\s", b"", self.d[self.pos + 1 : end])
        if len(hexs) % 2:
            hexs += b"0"
        self.pos = end + 1
        return bytes.fromhex(hexs.decode("ascii"))

    def _lit_string(self):
        out = bytearray()
        depth = 1
        i = self.pos + 1
        d = self.d
        while i < len(d):
            c = d[i]
            if c == ord("\\"):
                nxt = d[i + 1]
                esc = {ord("n"): 10, ord("r"): 13, ord("t"): 9,
                       ord("b"): 8, ord("f"): 12, ord("("): 40,
                       ord(")"): 41, ord("\\"): 92}
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif 0x30 <= nxt <= 0x37:
                    j = i + 1
                    oct_s = bytearray()
                    while j < len(d) and len(oct_s) < 3 and 0x30 <= d[j] <= 0x37:
                        oct_s.append(d[j])
                        j += 1
                    out.append(int(oct_s.decode(), 8) & 0xFF)
                    i = j
                elif nxt == 10:
                    i += 2  # line continuation
                else:
                    out.append(nxt)
                    i += 2
            elif c == ord("("):
                depth += 1
                out.append(c)
                i += 1
            elif c == ord(")"):
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise PdfError("unterminated literal string")


# ---------------------------------------------------------------------------
# document parsing
# ---------------------------------------------------------------------------


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """PNG Up/Sub/Paeth... — xref streams use predictor 2 (Up) almost
    exclusively; implement the full per-row filter set anyway."""
    row = columns
    out = bytearray()
    prev = bytearray(row)
    pos = 0
    while pos < len(data):
        ft = data[pos]
        cur = bytearray(data[pos + 1 : pos + 1 + row])
        if len(cur) < row:
            raise PdfError("truncated predictor row")
        if ft == 1:
            for i in range(1, row):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif ft == 2:
            for i in range(row):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(row):
                a = cur[i - 1] if i else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(row):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        elif ft != 0:
            raise PdfError(f"unknown PNG filter {ft}")
        out += cur
        prev = cur
        pos += 1 + row
    return bytes(out)


class _Pdf:
    def __init__(self, data: bytes):
        self.d = bytes(data)
        if not is_pdf(self.d):
            raise PdfError("missing %PDF header")
        self.offsets: dict[int, int] = {}        # obj num -> byte offset
        self.in_stm: dict[int, tuple[int, int]] = {}  # num -> (stm, idx)
        self.cache: dict[int, object] = {}
        self.trailer: dict = {}
        self._load_xref()

    # -- xref ---------------------------------------------------------
    def _load_xref(self) -> None:
        at = self.d.rfind(b"startxref")
        if at < 0:
            raise PdfError("missing startxref")
        m = re.match(rb"\s*(\d+)", self.d[at + 9 :])
        if not m:
            raise PdfError("bad startxref offset")
        pos = int(m.group(1))
        seen = set()
        while pos and pos not in seen:
            seen.add(pos)
            if self.d[pos : pos + 4] == b"xref":
                pos = self._classic_xref(pos)
            else:
                pos = self._xref_stream(pos)

    def _classic_xref(self, pos: int) -> int:
        lx = _Lexer(self.d, pos + 4)
        while True:
            lx._skip_ws()
            if self.d[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                tr = lx.token()
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                prev = tr.get("/Prev")
                return int(prev) if prev is not None else 0
            first = lx.token()
            count = lx.token()
            if not isinstance(first, int) or not isinstance(count, int):
                raise PdfError("bad xref subsection header")
            for k in range(count):
                lx._skip_ws()
                ent = self.d[lx.pos : lx.pos + 18]
                off, _gen, typ = ent[:10], ent[11:16], ent[17:18]
                lx.pos += 18
                if typ not in (b"n", b"f"):
                    raise PdfError(f"bad xref entry type {typ!r}")
                if typ == b"n":
                    if not off.isdigit():
                        raise PdfError(f"non-numeric xref offset {off!r}")
                    self.offsets.setdefault(first + k, int(off))

    def _xref_stream(self, pos: int) -> int:
        num, obj = self._parse_obj_at(pos)
        d, raw = obj
        if d.get("/Type") != "/XRef":
            raise PdfError("startxref points at a non-XRef object")
        data = self._decode_stream(d, raw)
        w = d.get("/W")
        if not isinstance(w, list) or len(w) != 3 or not all(
            isinstance(x, int) for x in w
        ):
            raise PdfError("bad /W in xref stream")
        w0, w1, w2 = (int(x) for x in w)
        if "/Size" not in d or not isinstance(d["/Size"], int):
            raise PdfError("xref stream missing integer /Size")
        size = int(d["/Size"])
        index = d.get("/Index", [0, size])
        rw = w0 + w1 + w2
        rows = [data[i : i + rw] for i in range(0, len(data), rw)]
        ri = 0
        for s in range(0, len(index), 2):
            start, cnt = int(index[s]), int(index[s + 1])
            for k in range(cnt):
                row = rows[ri]
                ri += 1
                ft = int.from_bytes(row[:w0], "big") if w0 else 1
                f2 = int.from_bytes(row[w0 : w0 + w1], "big")
                f3 = int.from_bytes(row[w0 + w1 :], "big")
                objn = start + k
                if ft == 1:
                    self.offsets.setdefault(objn, f2)
                elif ft == 2:
                    self.in_stm.setdefault(objn, (f2, f3))
        for k, v in d.items():
            if k in ("/Root", "/Size", "/Info", "/ID"):
                self.trailer.setdefault(k, v)
        prev = d.get("/Prev")
        return int(prev) if prev is not None else 0

    # -- objects ------------------------------------------------------
    def _parse_obj_at(self, pos: int):
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.d[pos:])
        if not m:
            raise PdfError(f"no object at offset {pos}")
        num = int(m.group(1))
        lx = _Lexer(self.d, pos + m.end())
        val = lx.token()
        lx._skip_ws()
        if self.d[lx.pos : lx.pos + 6] == b"stream":
            if not isinstance(val, dict):
                raise PdfError("stream without a dictionary")
            p = lx.pos + 6
            if self.d[p : p + 2] == b"\r\n":
                p += 2
            elif self.d[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(val.get("/Length"))
            raw = self.d[p : p + int(length)]
            return num, (val, raw)
        return num, val

    def resolve(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v = self.get_object(v[1])
        return v

    def get_object(self, num: int):
        if num in self.cache:
            return self.cache[num]
        if num in self.offsets:
            _n, val = self._parse_obj_at(self.offsets[num])
        elif num in self.in_stm:
            val = self._from_objstm(num)
        else:
            raise PdfError(f"object {num} not in xref")
        self.cache[num] = val
        return val

    def _from_objstm(self, num: int):
        stm_num, idx = self.in_stm[num]
        _n, obj = self._parse_obj_at(self.offsets[stm_num])
        d, raw = obj
        if d.get("/Type") != "/ObjStm":
            raise PdfError(f"object {num} points at a non-ObjStm")
        data = self._decode_stream(d, raw)
        n = int(self.resolve(d["/N"]))
        first = int(self.resolve(d["/First"]))
        lx = _Lexer(data, 0)
        pairs = []
        for _ in range(n):
            pairs.append((lx.token(), lx.token()))
        if idx >= n:
            raise PdfError("ObjStm index out of range")
        onum, ooff = pairs[idx]
        if int(onum) != num:
            raise PdfError("ObjStm object-number mismatch")
        return _Lexer(data, first + int(ooff)).token()

    def _decode_stream(self, d: dict, raw: bytes) -> bytes:
        filt = self.resolve(d.get("/Filter"))
        if filt is None:
            return raw
        filts = filt if isinstance(filt, list) else [filt]
        parms = self.resolve(d.get("/DecodeParms"))
        parms = parms if isinstance(parms, list) else [parms]
        out = raw
        for i, f in enumerate(filts):
            if f != "/FlateDecode":
                raise PdfError(
                    f"stream filter {f} unsupported (DCT/LZW/A85 gate)"
                )
            try:
                out = zlib.decompress(out)
            except zlib.error as e:
                raise PdfError(f"corrupt Flate stream: {e}") from e
            pp = self.resolve(parms[i]) if i < len(parms) else None
            if isinstance(pp, dict):
                pred = int(self.resolve(pp.get("/Predictor", 1)))
                if pred >= 10:
                    cols = int(self.resolve(pp.get("/Columns", 1)))
                    out = _png_unpredict(out, cols)
                elif pred != 1:
                    raise PdfError(f"predictor {pred} unsupported")
        return out

    # -- pages --------------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            raise PdfError("trailer without /Root catalog")
        tree = self.resolve(root.get("/Pages"))
        out: list[dict] = []

        def walk(node):
            node = self.resolve(node)
            if not isinstance(node, dict):
                raise PdfError("malformed page tree node")
            t = node.get("/Type")
            if t == "/Pages":
                for kid in self.resolve(node.get("/Kids", [])):
                    walk(kid)
            elif t == "/Page":
                out.append(node)
            else:
                raise PdfError(f"unexpected page-tree type {t!r}")

        walk(tree)
        want = self.resolve(tree.get("/Count")) if isinstance(
            tree, dict
        ) else None
        if want is not None and int(want) != len(out):
            raise PdfError(
                f"page tree /Count {want} != walked {len(out)} pages"
            )
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("/Contents"))
        if c is None:
            return b""
        streams = c if isinstance(c, list) else [c]
        out = bytearray()
        for s in streams:
            s = self.resolve(s)
            if not (isinstance(s, tuple) and len(s) == 2):
                raise PdfError("page /Contents is not a stream")
            d, raw = s
            out += self._decode_stream(d, raw)
            out += b"\n"
        return bytes(out)


# ---------------------------------------------------------------------------
# text extraction
# ---------------------------------------------------------------------------


def _decode_text_bytes(b: bytes) -> str:
    if len(b) >= 2 and b.count(0) * 2 >= len(b):
        raise PdfError(
            "NUL-heavy show string: CID/Type0 two-byte text is not "
            "decodable with simple-font semantics (fail-loud)"
        )
    return b.decode("latin-1")


def _page_text(content: bytes) -> str:
    lx = _Lexer(content, 0)
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []

    def endline():
        s = "".join(cur).strip()
        if s:
            lines.append(" ".join(s.split()))
        cur.clear()

    while True:
        lx._skip_ws()
        if lx.pos >= len(content):
            break
        tok = lx.token()
        if isinstance(tok, str) and not tok.startswith("/"):
            if tok == "Tj":
                if stack and isinstance(stack[-1], bytes):
                    cur.append(_decode_text_bytes(stack[-1]))
            elif tok in ("'", '"'):
                endline()
                for it in reversed(stack):
                    if isinstance(it, bytes):
                        cur.append(_decode_text_bytes(it))
                        break
            elif tok == "TJ":
                if stack and isinstance(stack[-1], list):
                    for it in stack[-1]:
                        if isinstance(it, bytes):
                            cur.append(_decode_text_bytes(it))
                        elif isinstance(it, (int, float)) and it < -150:
                            cur.append(" ")
            elif tok in ("Td", "TD"):
                if (
                    len(stack) >= 1
                    and isinstance(stack[-1], (int, float))
                    and stack[-1] < 0
                ):
                    endline()
            elif tok in ("T*", "ET"):
                endline()
            stack.clear()
        else:
            stack.append(tok)
    endline()
    return "\n".join(lines)


def extract_pdf_text(data: bytes) -> list[str]:
    """Per-page extracted text for one PDF payload."""
    pdf = _Pdf(data)
    return [_page_text(pdf.page_content(p)) for p in pdf.pages()]


def pdf_pages(mm_df, id_col: str = "doc_id", payload_col: str = "payload"):
    """1->N page explode: (doc_id, page_idx, n_tokens, text)."""

    def _explode(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = {"doc_id": [], "page_idx": [], "n_tokens": [],
                    "text": []}
            for doc_id, p in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                for pi, text in enumerate(extract_pdf_text(bytes(p))):
                    rows["doc_id"].append(doc_id)
                    rows["page_idx"].append(pi)
                    rows["n_tokens"].append(len(text.split()))
                    rows["text"].append(text)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(
        _explode, "doc_id bigint, page_idx int, n_tokens int, text string"
    )


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_pdf(
    pages: list[list[str]], *, xref_stream: bool = False
) -> bytes:
    """Minimal conformant PDF: one Helvetica text object per page, one
    line per list entry, Flate-compressed content streams.  Classic
    xref table by default; ``xref_stream=True`` emits the modern layout
    (catalog+pages+page objects inside an /ObjStm, xref as a /XRef
    stream with PNG Up predictor) so both decode paths get byte-real
    fixtures."""
    if not pages:
        raise PdfError("need at least one page")
    npages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..2+n page objs,
    # 3+n..2+2n content streams, 3+2n font
    cat_num, pages_num = 1, 2
    page_nums = [3 + i for i in range(npages)]
    cont_nums = [3 + npages + i for i in range(npages)]
    font_num = 3 + 2 * npages
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objs[cat_num] = f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode()
    objs[pages_num] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode()
    )
    for i, pn in enumerate(page_nums):
        objs[pn] = (
            f"<< /Type /Page /Parent {pages_num} 0 R "
            f"/MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {cont_nums[i]} 0 R >>"
        ).encode()
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    streams: dict[int, bytes] = {}
    for i, cn in enumerate(cont_nums):
        body = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(pages[i]):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(
                ")", r"\)"
            )
            if j:
                body.append("0 -14 Td")
            body.append(f"({esc}) Tj")
        body.append("ET")
        streams[cn] = zlib.compress(" ".join(body).encode("latin-1"))

    def stream_obj(d: bytes, raw: bytes) -> bytes:
        return d + b"\nstream\n" + raw + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    if not xref_stream:
        for num in sorted(objs) :
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
        for num in sorted(streams):
            offsets[num] = len(out)
            d = f"<< /Length {len(streams[num])} /Filter /FlateDecode >>"
            out += (
                f"{num} 0 obj\n".encode()
                + stream_obj(d.encode(), streams[num])
                + b"\nendobj\n"
            )
        size = max(list(objs) + list(streams)) + 1
        xref_at = len(out)
        out += f"xref\n0 {size}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {size} /Root {cat_num} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF"
        ).encode()
        return bytes(out)

    # modern layout: non-stream objects into one ObjStm
    stm_num = font_num + 1
    xref_num = stm_num + 1
    inner = sorted(objs)
    header = []
    body = bytearray()
    for num in inner:
        header.append(f"{num} {len(body)}")
        body += objs[num] + b" "
    payload = (" ".join(header) + "\n").encode() + bytes(body)
    first = len((" ".join(header) + "\n").encode())
    objstm_raw = zlib.compress(payload)
    for num in sorted(streams):
        offsets[num] = len(out)
        d = f"<< /Length {len(streams[num])} /Filter /FlateDecode >>"
        out += (
            f"{num} 0 obj\n".encode()
            + stream_obj(d.encode(), streams[num])
            + b"\nendobj\n"
        )
    offsets[stm_num] = len(out)
    d = (
        f"<< /Type /ObjStm /N {len(inner)} /First {first} "
        f"/Length {len(objstm_raw)} /Filter /FlateDecode >>"
    )
    out += (
        f"{stm_num} 0 obj\n".encode() + stream_obj(d.encode(), objstm_raw)
        + b"\nendobj\n"
    )
    size = xref_num + 1
    # xref stream rows, W = [1 4 2], PNG Up predictor
    rows = []
    for num in range(size):
        if num == 0:
            rows.append(struct.pack(">BIH", 0, 0, 0xFFFF))
        elif num in offsets or num == xref_num:
            off = len(out) if num == xref_num else offsets[num]
            rows.append(struct.pack(">BIH", 1, off, 0))
        elif num in inner:
            rows.append(struct.pack(">BIH", 2, stm_num, inner.index(num)))
        else:
            raise PdfError("encoder xref hole")
    cols = 7
    filtered = bytearray()
    prev = bytes(cols)
    for r in rows:
        filtered.append(2)  # Up
        filtered += bytes((r[i] - prev[i]) & 0xFF for i in range(cols))
        prev = r
    xref_raw = zlib.compress(bytes(filtered))
    xref_at = len(out)
    d = (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root {cat_num} 0 R "
        f"/Length {len(xref_raw)} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns {cols} >> >>"
    )
    out += (
        f"{xref_num} 0 obj\n".encode() + stream_obj(d.encode(), xref_raw)
        + b"\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF".encode()
    return bytes(out)
