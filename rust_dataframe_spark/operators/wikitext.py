"""MediaWiki XML dump extraction + wikitext cleaning — the Wikipedia
ingest step (Wiki40B/CCNet lineage): every LLM corpus carries Wikipedia,
and it arrives as a ``<mediawiki>`` XML export full of wiki markup.

- :func:`parse_wiki_dump` walks the export with stdlib
  ``xml.etree.ElementTree`` (namespace-agnostic tag matching — dumps
  carry a versioned default namespace): per ``<page>`` returns
  ``(title, ns, redirect_target, text)``; pages without a revision
  text raise (a silently empty article is a corpus defect).
- :func:`clean_wikitext` normalizes markup to plain text with
  deterministic, closed-form rules, applied in documented order:
  HTML comments and ``<ref>``/``<references/>`` dropped; ``{{...}}``
  templates removed INNERMOST-FIRST (so nesting terminates without
  recursion); ``[[File:...]]``/``[[Image:...]]`` dropped whole
  (display text in media links is caption, not prose);
  ``[[target|label]]`` -> label, ``[[target]]`` -> target;
  ``[url label]`` -> label, bare ``[url]`` dropped; bold/italic
  quote runs stripped; ``== Heading ==`` -> Heading; table markup
  (``{| ... |}``) dropped line-wise; leading list bullets
  (``*#:;``) stripped; whitespace normalized (single spaces, single
  newlines between non-empty lines).

Both halves are pure functions, so the Spark layer is a vectorized
1->N ``mapInPandas`` explode and the DuckDB oracle replays token
counts closed-form.  Scale: per-page string work, no shuffle; dump
shards are the 100 TB parallel axis.

Reference parity: no XML/corpus surface in the reference; extends the
ingestion layer (SURVEY §8).
"""

from __future__ import annotations

import re

__all__ = ["WikiError", "parse_wiki_dump", "clean_wikitext",
           "wiki_pages", "WIKI_PAGE_SCHEMA"]


class WikiError(ValueError):
    """Malformed MediaWiki export structure."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_wiki_dump(xml_bytes: bytes) -> list[tuple[str, int, str | None,
                                                    str]]:
    """Parse a MediaWiki XML export: ``[(title, ns, redirect_target,
    text), ...]`` in document order."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        raise WikiError(f"bad export XML: {e}") from e
    if _local(root.tag) != "mediawiki":
        raise WikiError(f"root element {root.tag!r} is not <mediawiki>")
    out = []
    for page in root:
        if _local(page.tag) != "page":
            continue
        title = ns = None
        redirect = None
        text = None
        for el in page:
            t = _local(el.tag)
            if t == "title":
                title = el.text or ""
            elif t == "ns":
                try:
                    ns = int(el.text or "0")
                except ValueError as e:
                    raise WikiError(f"bad <ns> {el.text!r}") from e
            elif t == "redirect":
                redirect = el.get("title") or ""
            elif t == "revision":
                for sub in el:
                    if _local(sub.tag) == "text":
                        text = sub.text or ""
        if title is None:
            raise WikiError("page without <title>")
        if text is None:
            raise WikiError(f"page {title!r} without revision text")
        out.append((title, ns or 0, redirect, text))
    if not out:
        raise WikiError("export carries no pages")
    return out


_COMMENT = re.compile(r"<!--.*?-->", re.S)
_REF = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>|<references\s*/>",
                  re.S)
_TEMPLATE = re.compile(r"\{\{[^{}]*\}\}")
_MEDIA = re.compile(r"\[\[(?:File|Image):[^\[\]]*\]\]", re.I)
_LINK = re.compile(r"\[\[([^\[\]|]*)(?:\|([^\[\]]*))?\]\]")
_EXTLINK = re.compile(r"\[(\S+)(?:\s+([^\]]*))?\]")
_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$", re.M)
_QUOTES = re.compile(r"'{2,5}")


def clean_wikitext(text: str) -> str:
    """Markup -> plain text (rule order in the module docstring)."""
    text = _COMMENT.sub("", text)
    text = _REF.sub("", text)
    # innermost-first template removal; bounded by the template count
    for _ in range(64):
        new = _TEMPLATE.sub("", text)
        if new == text:
            break
        text = new
    else:
        raise WikiError("template nesting beyond 64 levels (fail-loud)")
    text = _MEDIA.sub("", text)
    text = _LINK.sub(lambda m: m.group(2) if m.group(2) is not None
                     else m.group(1), text)
    text = _EXTLINK.sub(lambda m: m.group(2) or "", text)
    text = _HEADING.sub(lambda m: m.group(2), text)
    text = _QUOTES.sub("", text)
    lines = []
    in_table = 0
    for raw in text.split("\n"):
        s = raw.strip()
        if s.startswith("{|"):
            in_table += 1
            continue
        if s.startswith("|}"):
            in_table = max(0, in_table - 1)
            continue
        if in_table or s.startswith(("|", "!")):
            continue
        s = s.lstrip("*#:; ").strip()
        s = " ".join(s.split())
        if s:
            lines.append(s)
    return "\n".join(lines)


WIKI_PAGE_SCHEMA = (
    "doc_id bigint, page_idx int, title string, ns int, "
    "is_redirect int, n_tokens int, text string"
)


def wiki_pages(mm_df, id_col: str = "doc_id", payload_col: str = "payload"):
    """1->N page explode over dump payloads: parse the export, clean
    the wikitext, count whitespace tokens.  Redirect pages keep their
    target as the cleaned text's single token source of truth is the
    flag — downstream filters drop them with a plain ``WHERE``."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "page_idx": [], "title": [], "ns": [],
                    "is_redirect": [], "n_tokens": [], "text": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for pi, (title, ns, redir, text) in enumerate(
                    parse_wiki_dump(bytes(p))
                ):
                    clean = clean_wikitext(text)
                    rows["doc_id"].append(doc_id)
                    rows["page_idx"].append(pi)
                    rows["title"].append(title)
                    rows["ns"].append(ns)
                    rows["is_redirect"].append(int(redir is not None))
                    rows["n_tokens"].append(len(clean.split()))
                    rows["text"].append(clean)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, WIKI_PAGE_SCHEMA)
