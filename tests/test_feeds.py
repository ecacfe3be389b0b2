"""Sitemap / RSS / Atom feed tests (operators/feeds.py) behind q454."""

import gzip

import pytest

from rust_dataframe_spark.operators.feeds import (
    FeedError,
    parse_feed,
    parse_sitemap,
)


class TestSitemap:
    def test_urlset_fields_and_scope(self):
        sm = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a/1</loc><lastmod>2024-03-01</lastmod>
    <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://ex.com/a/2</loc>
    <lastmod>2024-03-01T10:30:00+02:00</lastmod></url>
  <url><loc>https://other.com/x</loc></url>
</urlset>"""
        rows = parse_sitemap(sm, base_url="https://ex.com/a/sitemap.xml")
        assert [r["in_scope"] for r in rows] == [True, True, False]
        assert rows[0]["lastmod_ms"] == 1709251200000  # date-only form
        assert rows[1]["lastmod_ms"] == 1709281800000  # tz-offset form
        assert rows[0]["priority"] == 0.8
        assert rows[2]["lastmod_ms"] is None

    def test_index_recursion_is_returned_not_fetched(self):
        idx = b"""<sitemapindex
 xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://ex.com/s1.xml.gz</loc>
    <lastmod>2024-01-02</lastmod></sitemap>
</sitemapindex>"""
        rows = parse_sitemap(gzip.compress(idx))
        assert rows == [{"kind": "sitemap",
                         "url": "https://ex.com/s1.xml.gz",
                         "lastmod_ms": 1704153600000}]

    def test_gates(self):
        with pytest.raises(FeedError, match="not a sitemap"):
            parse_sitemap(b"<html></html>")
        with pytest.raises(FeedError, match="without <loc>"):
            parse_sitemap(b"<urlset><url></url></urlset>")
        with pytest.raises(FeedError, match="priority"):
            parse_sitemap(
                b"<urlset><url><loc>u</loc>"
                b"<priority>1.5</priority></url></urlset>"
            )
        with pytest.raises(FeedError, match="entity"):
            parse_sitemap(
                b"<!DOCTYPE x [<!ENTITY a 'b'>]><urlset></urlset>"
            )
        with pytest.raises(FeedError, match="malformed"):
            parse_feed(b"not xml at all")


class TestFeeds:
    def test_rss_items(self):
        rss = b"""<rss version="2.0"><channel><title>T</title>
<item><title>A</title><link>https://ex.com/p1</link><guid>g1</guid>
<pubDate>Mon, 04 Mar 2024 10:00:00 GMT</pubDate>
<description>d1</description></item>
<item><link>https://ex.com/p2</link></item>
</channel></rss>"""
        f = parse_feed(rss)
        assert f["format"] == "rss" and f["title"] == "T"
        assert f["entries"][0]["published_ms"] == 1709546400000
        # guid falls back to link
        assert f["entries"][1]["entry_id"] == "https://ex.com/p2"

    def test_atom_entries(self):
        atom = b"""<feed xmlns="http://www.w3.org/2005/Atom">
<title>AT</title>
<entry><id>e1</id><title>E</title>
<updated>2024-03-04T10:00:00Z</updated>
<link rel="self" href="https://ex.com/self"/>
<link rel="alternate" href="https://ex.com/e1"/>
<summary>s</summary></entry></feed>"""
        f = parse_feed(atom)
        assert f["format"] == "atom"
        e = f["entries"][0]
        assert e["url"] == "https://ex.com/e1"  # alternate wins
        assert e["published_ms"] == 1709546400000

    def test_atom_entry_requires_id(self):
        with pytest.raises(FeedError, match="without <id>"):
            parse_feed(
                b'<feed xmlns="http://www.w3.org/2005/Atom">'
                b"<entry><title>x</title></entry></feed>"
            )

    def test_rss_item_requires_guid_or_link(self):
        with pytest.raises(FeedError, match="guid or link"):
            parse_feed(
                b"<rss><channel><item><title>x</title></item>"
                b"</channel></rss>"
            )

    def test_doctype_after_big_comment_refused(self):
        # a >4 KB comment before <!DOCTYPE> must not bypass the
        # entity-expansion guard (full-payload scan, not a prefix)
        payload = (
            b"<?xml version='1.0'?><!-- " + b"x" * 8192 + b" -->\n"
            b"<!DOCTYPE urlset [<!ENTITY a 'b'>]>\n"
            b"<urlset xmlns='http://www.sitemaps.org/schemas/"
            b"sitemap/0.9'><url><loc>http://e.com/&a;</loc></url>"
            b"</urlset>"
        )
        with pytest.raises(FeedError, match="entity-expansion"):
            parse_sitemap(payload)
