"""Round-9 crawl-policy tests (operators/crawl.py) behind q425/q426:
RFC 9309 group selection + longest-match rules + wildcards/anchors,
and URL canonicalization edge cases."""

import pytest

from rust_dataframe_spark.operators.crawl import (
    RobotsError,
    canonicalize_url,
    parse_robots,
    robots_allowed,
)

ROBOTS = """
# policy file
User-agent: trainbot
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5

User-agent: *
Disallow: /p1
Disallow: /*.pdf$
Allow: /p1/open
"""


class TestRobots:
    def test_group_selection_longest_agent_prefix(self):
        g = parse_robots(ROBOTS)
        # product token "trainbot-xl/1.0" prefix-matches the trainbot group
        assert robots_allowed(g, "TrainBot-XL/1.0", "/private/x") == (
            False, 2.5,
        )
        # a different bot falls back to '*' (no trainbot rules apply)
        assert robots_allowed(g, "otherbot", "/private/x") == (True, None)

    def test_longest_rule_wins_allow_ties(self):
        g = parse_robots(ROBOTS)
        assert robots_allowed(g, "otherbot", "/p1/file")[0] is False
        assert robots_allowed(g, "otherbot", "/p1/open/z")[0] is True
        g2 = parse_robots("User-agent: *\nDisallow: /abc\nAllow: /abc")
        assert robots_allowed(g2, "x", "/abcd")[0] is True  # tie -> allow

    def test_wildcard_and_anchor(self):
        g = parse_robots(ROBOTS)
        assert robots_allowed(g, "otherbot", "/doc/x.pdf")[0] is False
        assert robots_allowed(g, "otherbot", "/doc/x.pdfz")[0] is True
        g3 = parse_robots("User-agent: *\nDisallow: /a*/b")
        assert robots_allowed(g3, "x", "/aXYZ/b/c")[0] is False
        assert robots_allowed(g3, "x", "/aXYZ/c")[0] is True

    def test_defaults(self):
        assert robots_allowed([], "any", "/x") == (True, None)
        g = parse_robots("User-agent: *\nDisallow:")
        assert robots_allowed(g, "x", "/anything")[0] is True  # empty = none

    def test_multiple_agents_one_group(self):
        g = parse_robots(
            "User-agent: a\nUser-agent: b\nDisallow: /x"
        )
        assert len(g) == 1 and g[0]["agents"] == ["a", "b"]
        assert robots_allowed(g, "b/2.0", "/x/y")[0] is False

    def test_fail_loud(self):
        with pytest.raises(RobotsError, match="before any user-agent"):
            parse_robots("Disallow: /x")
        with pytest.raises(RobotsError, match="malformed"):
            parse_robots("User-agent *")
        with pytest.raises(RobotsError, match="crawl-delay"):
            parse_robots("User-agent: *\nCrawl-delay: soon")


class TestCanonicalUrl:
    def test_scheme_host_port_fragment(self):
        assert canonicalize_url(
            "HTTP://ExAmple.COM.:80/a/../b/./c?z=2&a=1#frag"
        ) == "http://example.com/b/c?a=1&z=2"
        assert canonicalize_url("https://Host.NET:443/x") == (
            "https://host.net/x"
        )
        assert canonicalize_url("https://h:8443/x") == "https://h:8443/x"

    def test_percent_normalization(self):
        # unreserved decodes, reserved stays encoded but uppercased
        assert canonicalize_url("https://h/%7Euser/%2fx/%e2%82%ac") == (
            "https://h/~user/%2Fx/%E2%82%AC"
        )
        assert canonicalize_url("http://h/a%41/100%") == "http://h/aA/100%25"

    def test_empty_path_and_dot_segments(self):
        assert canonicalize_url("https://h") == "https://h/"
        assert canonicalize_url("https://h/a/b/../../c/") == "https://h/c/"

    def test_query_sort_is_a_knob(self):
        assert canonicalize_url("http://h/p?b=2&a=1&c=%33") == (
            "http://h/p?a=1&b=2&c=3"
        )
        assert canonicalize_url("http://h/p?b=2&a=1", sort_query=False) == (
            "http://h/p?b=2&a=1"
        )

    def test_fail_loud(self):
        with pytest.raises(RobotsError, match="scheme/host"):
            canonicalize_url("/relative/only")
