"""Web-feed ingestion: sitemap.xml and RSS/Atom parsing — the crawl
frontier's discovery half, completing the policy layer next to
``operators/crawl.py`` (RFC 9309 robots.txt + URL canonicalization).

Surface (all public specs):

* **Sitemaps** (sitemaps.org protocol): ``<urlset>`` entries with
  ``loc`` / ``lastmod`` (W3C datetime, date-only and full timestamp
  forms) / ``changefreq`` / ``priority``; ``<sitemapindex>`` recursion
  handled by RETURNING the child sitemap URLs with a kind marker (the
  caller fans the fetches out — a parser that fetched would hide the
  distribution point); gzip-wrapped payloads peeled by magic; the
  50k-entries/50MB spec ceilings enforced loudly; entries outside the
  sitemap's own directory scope flagged per the cross-submission rule.
* **RSS 2.0**: ``<channel><item>`` title/link/guid/pubDate
  (RFC 822 dates with 2-digit-year tolerance), description fallback.
* **Atom** (RFC 4287): ``<feed><entry>`` id/title/updated
  (RFC 3339), ``<link rel="alternate">`` (or the only link), content/
  summary fallback; namespace-qualified tags resolved properly.

Everything is stdlib ``xml.etree`` with the parser's entity expansion
left OFF (no DTD processing — billion-laughs payloads raise).
Malformed XML, wrong root elements, entries without a location and
oversized payloads raise :class:`FeedError`.

Scale: per-payload executor work (one feed document per row), no
shuffle; discovery output feeds the q426 canonicalization + q425
robots filter — the full frontier pipeline is sitemap/feed -> dedup
key -> policy gate.
"""

from __future__ import annotations

import email.utils
import gzip
import io
import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

__all__ = [
    "FeedError",
    "parse_sitemap",
    "parse_feed",
]


class FeedError(ValueError):
    """Malformed sitemap / feed payload."""


_MAX_BYTES = 50 * 1024 * 1024
_MAX_ENTRIES = 50_000


def _text(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read(
                _MAX_BYTES + 1
            )
        except OSError as e:
            raise FeedError(f"corrupt gzip sitemap: {e}") from None
    if len(data) > _MAX_BYTES:
        raise FeedError("payload exceeds the 50 MB sitemap ceiling")
    return data


def _parse_xml(data: bytes) -> ET.Element:
    # Full-payload scan (not a prefix): a >4 KB comment before the
    # DOCTYPE would bypass a prefix-only check.  The payload is
    # already fully in memory and capped at _MAX_BYTES, so this is
    # one linear pass, not a fetch.
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise FeedError(
            "DTD/entity declarations refused (entity-expansion guard)"
        )
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise FeedError(f"malformed XML: {e}") from None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _w3c_datetime(s: str) -> int | None:
    """W3C datetime (sitemaps) / RFC 3339 (Atom) -> epoch ms."""
    s = s.strip()
    if not s:
        return None
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        dt = datetime.strptime(s, "%Y-%m-%d").replace(
            tzinfo=timezone.utc
        )
        return int(dt.timestamp() * 1000)
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        raise FeedError(f"bad W3C/RFC3339 datetime {s!r}") from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def parse_sitemap(data: bytes, *, base_url: str | None = None) -> list[dict]:
    """Parse one sitemap document.  Returns dicts with ``kind`` =
    ``"url"`` (page entries: url, lastmod_ms, changefreq, priority,
    in_scope) or ``"sitemap"`` (child sitemaps from an index: url,
    lastmod_ms) — the caller fans out child fetches."""
    root = _parse_xml(_text(bytes(data)))
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise FeedError(f"root element {kind!r} is not a sitemap")
    scope = None
    if base_url:
        scope = base_url.rsplit("/", 1)[0] + "/"
    out: list[dict] = []
    for child in root:
        ctag = _local(child.tag)
        if kind == "urlset" and ctag != "url":
            continue
        if kind == "sitemapindex" and ctag != "sitemap":
            continue
        fields = {_local(f.tag): (f.text or "").strip() for f in child}
        loc = fields.get("loc")
        if not loc:
            raise FeedError(f"<{ctag}> entry without <loc>")
        lastmod = (
            _w3c_datetime(fields["lastmod"])
            if "lastmod" in fields and fields["lastmod"]
            else None
        )
        if kind == "sitemapindex":
            out.append({"kind": "sitemap", "url": loc,
                        "lastmod_ms": lastmod})
        else:
            prio = fields.get("priority")
            if prio is not None and prio != "":
                try:
                    prio = float(prio)
                except ValueError:
                    raise FeedError(
                        f"bad priority {prio!r}"
                    ) from None
                if not 0.0 <= prio <= 1.0:
                    raise FeedError(f"priority {prio} outside [0, 1]")
            else:
                prio = None
            out.append({
                "kind": "url", "url": loc, "lastmod_ms": lastmod,
                "changefreq": fields.get("changefreq") or None,
                "priority": prio,
                "in_scope": (
                    loc.startswith(scope) if scope is not None else None
                ),
            })
        if len(out) > _MAX_ENTRIES:
            raise FeedError(
                "sitemap exceeds the 50,000-entry protocol ceiling"
            )
    return out


def _rfc822_ms(s: str) -> int | None:
    s = s.strip()
    if not s:
        return None
    dt = email.utils.parsedate_to_datetime(s)
    if dt is None:
        raise FeedError(f"bad RFC 822 date {s!r}")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def parse_feed(data: bytes) -> dict:
    """Parse one RSS 2.0 or Atom document.  Returns ``{"format",
    "title", "entries": [{entry_id, url, title, published_ms,
    body}]}``."""
    root = _parse_xml(_text(bytes(data)))
    tag = _local(root.tag)
    if tag == "rss":
        channel = next(
            (c for c in root if _local(c.tag) == "channel"), None
        )
        if channel is None:
            raise FeedError("RSS document without <channel>")
        title = ""
        entries = []
        for c in channel:
            ct = _local(c.tag)
            if ct == "title":
                title = (c.text or "").strip()
            elif ct == "item":
                f = {_local(x.tag): (x.text or "").strip() for x in c}
                link = f.get("link") or None
                guid = f.get("guid") or link
                if not guid:
                    raise FeedError("<item> without guid or link")
                entries.append({
                    "entry_id": guid,
                    "url": link,
                    "title": f.get("title") or "",
                    "published_ms": _rfc822_ms(f["pubDate"])
                    if f.get("pubDate") else None,
                    "body": f.get("description") or "",
                })
        return {"format": "rss", "title": title, "entries": entries}
    if tag == "feed":
        title = ""
        entries = []
        for c in root:
            ct = _local(c.tag)
            if ct == "title":
                title = (c.text or "").strip()
            elif ct == "entry":
                eid = None
                etitle = ""
                updated = None
                body = ""
                alt = None
                only_link = None
                for x in c:
                    xt = _local(x.tag)
                    if xt == "id":
                        eid = (x.text or "").strip()
                    elif xt == "title":
                        etitle = (x.text or "").strip()
                    elif xt == "updated" and (x.text or "").strip():
                        updated = _w3c_datetime(x.text)
                    elif xt == "link":
                        href = x.get("href")
                        if x.get("rel", "alternate") == "alternate":
                            alt = href
                        if only_link is None:
                            only_link = href
                    elif xt in ("content", "summary") and not body:
                        body = (x.text or "").strip()
                if not eid:
                    raise FeedError("<entry> without <id> (RFC 4287)")
                entries.append({
                    "entry_id": eid,
                    "url": alt or only_link,
                    "title": etitle,
                    "published_ms": updated,
                    "body": body,
                })
        return {"format": "atom", "title": title, "entries": entries}
    raise FeedError(f"root element {tag!r} is neither rss nor feed")
