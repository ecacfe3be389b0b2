"""Round-9 MediaWiki ingestion tests (operators/wikitext.py) behind
q429: export parse, rule-ordered wikitext cleaning, fail-loud gates."""

import pytest

from rust_dataframe_spark.operators.wikitext import (
    WikiError,
    clean_wikitext,
    parse_wiki_dump,
    wiki_pages,
)


class TestCleanWikitext:
    def test_kitchen_sink(self):
        wt = (
            "{{Infobox person|name=X{{nested|y}}|birth=1900}}\n"
            "'''Alpha''' is a [[Greek alphabet|letter]].<ref name=\"a\">s"
            "</ref>\n== History ==\nIt came from [[Phoenicia]]."
            "<!-- cmt -->\n* first item\n{| class=\"wikitable\"\n! h\n"
            "| cell\n|}\nSee [http://ex.org/x the site].\n"
            "[[File:Alpha.svg|thumb|The letter]]\n''italic'' text"
        )
        assert clean_wikitext(wt) == (
            "Alpha is a letter.\nHistory\nIt came from Phoenicia.\n"
            "first item\nSee the site.\nitalic text"
        )

    def test_nested_templates_innermost_first(self):
        assert clean_wikitext("a {{x{{y{{z}}}}}} b") == "a b"

    def test_template_bomb_fails_loud(self):
        with pytest.raises(WikiError, match="nesting"):
            clean_wikitext("{{a" * 80 + "}}" * 80)

    def test_links(self):
        assert clean_wikitext("[[a|b]] [[c]] [http://u lbl] [http://u]") == (
            "b c lbl"
        )
        assert clean_wikitext("[[File:x.png|thumb|cap]]rest") == "rest"

    def test_headings_and_lists(self):
        assert clean_wikitext("=== Deep ===\n# one\n:: indent") == (
            "Deep\none\nindent"
        )


class TestParseDump:
    XML = (
        b'<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">'
        b"<siteinfo><sitename>W</sitename></siteinfo>"
        b"<page><title>A</title><ns>0</ns>"
        b"<revision><text>'''A''' [[b|l]]</text></revision></page>"
        b'<page><title>R</title><ns>0</ns><redirect title="A"/>'
        b"<revision><text>#REDIRECT [[A]]</text></revision></page>"
        b"<page><title>Talk:A</title><ns>1</ns>"
        b"<revision><text>talk</text></revision></page>"
        b"</mediawiki>"
    )

    def test_parse_namespaced_export(self):
        pages = parse_wiki_dump(self.XML)
        assert [(t, n, r is not None) for t, n, r, _ in pages] == [
            ("A", 0, False), ("R", 0, True), ("Talk:A", 1, False),
        ]
        assert clean_wikitext(pages[0][3]) == "A l"

    def test_fail_loud(self):
        with pytest.raises(WikiError, match="mediawiki"):
            parse_wiki_dump(b"<foo/>")
        with pytest.raises(WikiError, match="revision text"):
            parse_wiki_dump(
                b"<mediawiki><page><title>x</title></page></mediawiki>"
            )
        with pytest.raises(WikiError, match="XML"):
            parse_wiki_dump(b"<mediawiki><page>")

    def test_spark_explode(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(self.XML))])
        out = wiki_pages(df).orderBy("page_idx").collect()
        assert [(r.title, r.ns, r.is_redirect, r.n_tokens) for r in out] == [
            ("A", 0, 0, 2), ("R", 0, 1, 2), ("Talk:A", 1, 0, 1),
        ]
