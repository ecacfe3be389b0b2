"""Crawl-policy operators: RFC 9309 robots.txt evaluation and
dedup-grade URL canonicalization — the policy layer between a WARC
dump (operators/warc.py) and a training corpus.

- :func:`parse_robots` / :func:`robots_allowed` implement the Robots
  Exclusion Protocol as RFC 9309 specifies it (not Python's
  ``urllib.robotparser``, whose pre-RFC semantics differ on the two
  load-bearing points): **group selection** picks the group whose
  user-agent token is the longest case-insensitive prefix match of the
  product token, falling back to ``*``; **rule matching** picks the
  longest matching rule path, ``Allow`` winning length ties; ``*``
  wildcards and the ``$`` end anchor are supported; empty Disallow
  means allow-all; unmatched paths are allowed.  Crawl-delay (a de
  facto extension) is surfaced per group.
- :func:`canonicalize_url` builds THE dedup key for crawl frontiers:
  lowercase scheme/host, default-port strip, RFC 3986 dot-segment
  resolution, percent-encoding normalization (decode unreserved
  characters, uppercase remaining hex), empty-path -> ``/``, fragment
  strip, ``+``-preserving query with optional parameter sort
  (``sort_query=True``, the common frontier-dedup choice, documented
  as a policy knob because it changes semantics for order-sensitive
  endpoints).

Everything is a pure function over strings, so the Spark layer is a
plain vectorized ``mapInPandas``/``pandas_udf`` application and the
DuckDB oracles replay the laws closed-form.  Scale: per-row string
work, no shuffle; the robots ruleset rides along as a payload column
(in a real frontier it is a broadcast dimension keyed by host).

Reference parity: no crawl surface in the reference; extends the
ingestion layer (SURVEY §8).
"""

from __future__ import annotations

import re

__all__ = [
    "RobotsError",
    "parse_robots",
    "robots_allowed",
    "canonicalize_url",
]


class RobotsError(ValueError):
    """Malformed robots.txt structure."""


def parse_robots(text: str) -> list[dict]:
    """Parse robots.txt into groups: ``[{"agents": [tokens...],
    "rules": [(is_allow, path), ...], "crawl_delay": float|None}]``.
    Lines are ``field: value`` with ``#`` comments; unknown fields are
    ignored per RFC 9309 §2.2.4; a rule line before any user-agent
    line raises (the spec makes it undefined — fail loud)."""
    groups: list[dict] = []
    cur: dict | None = None
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            raise RobotsError(f"malformed robots line {raw!r}")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not collecting_agents:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                collecting_agents = True
            cur["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            if cur is None:
                raise RobotsError(
                    f"{field} before any user-agent line (undefined per "
                    "RFC 9309; fail-loud)"
                )
            collecting_agents = False
            cur["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            if cur is None:
                raise RobotsError("crawl-delay before any user-agent line")
            collecting_agents = False
            try:
                cur["crawl_delay"] = float(value)
            except ValueError as e:
                raise RobotsError(f"bad crawl-delay {value!r}") from e
        # sitemap/host/other fields: ignored (non-group records)
    return groups


def _select_group(groups: list[dict], agent: str) -> dict | None:
    """RFC 9309 §2.2.1: the group whose agent token is the longest
    prefix match of the product token; '*' as fallback."""
    agent = agent.lower()
    best = None
    best_len = -1
    star = None
    for g in groups:
        for tok in g["agents"]:
            if tok == "*":
                star = star or g
            elif agent.startswith(tok) and len(tok) > best_len:
                best, best_len = g, len(tok)
    return best if best is not None else star


def _rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path matching: literal prefix with ``*`` wildcards and
    an optional ``$`` end anchor."""
    if not pattern:
        return False  # empty Disallow = no restriction
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "".join(
        ".*" if c == "*" else re.escape(c) for c in pattern
    )
    rx = "^" + rx + ("$" if anchored else "")
    return re.match(rx, path) is not None


def robots_allowed(
    groups: list[dict], agent: str, path: str
) -> tuple[bool, float | None]:
    """Evaluate ``(allowed, crawl_delay)`` for an agent + URL path:
    longest matching rule wins, Allow wins length ties, no match =
    allowed, no applicable group = allowed."""
    g = _select_group(groups, agent)
    if g is None:
        return True, None
    best_len = -1
    allowed = True
    for is_allow, pat in g["rules"]:
        if not _rule_matches(pat, path):
            continue
        # effective specificity = pattern length ('$' already counted
        # into intent; use raw length, the RFC's octet-count rule)
        plen = len(pat)
        if plen > best_len or (plen == best_len and is_allow):
            best_len = plen
            allowed = is_allow
    return allowed, g["crawl_delay"]


_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def _norm_pct(s: str) -> str:
    """Normalize percent-encoding: decode unreserved octets, uppercase
    the hex of everything else (reserved delimiters like %2F MUST stay
    encoded — decoding them would change the URL structure); stray '%'
    not followed by hex is encoded as %25 (the lenient-but-deterministic
    choice)."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 2 < len(s) + 1 and re.match(
            r"%[0-9a-fA-F]{2}", s[i : i + 3]
        ):
            octet = int(s[i + 1 : i + 3], 16)
            ch = chr(octet)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        elif c == "%":
            out.append("%25")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    # preserve leading/trailing slash structure
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    if path.endswith(("/.", "/..", "/")) and not norm.endswith("/"):
        norm += "/"
    return norm


def canonicalize_url(url: str, *, sort_query: bool = True) -> str:
    """Dedup-key canonicalization (see module docstring)."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url.strip())
    except ValueError as e:
        raise RobotsError(f"unparseable URL {url!r}") from e
    scheme = parts.scheme.lower()
    if not scheme or not parts.netloc:
        raise RobotsError(f"URL without scheme/host: {url!r}")
    host = parts.hostname or ""
    host = host.rstrip(".").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc += f":{port}"
    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    query = ""
    if parts.query:
        pairs = parts.query.split("&")
        pairs = [_norm_pct(p) for p in pairs if p]
        if sort_query:
            pairs.sort()
        query = "&".join(pairs)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out  # fragment always dropped
