"""URL canonicalization — the cheap dedup key ahead of content dedup.

Crawl pipelines dedup by canonical URL before any content pass (same
page fetched as http/https, with/without default port, tracking params,
fragments, or trailing slashes). Everything here is a chain of Catalyst
expressions (regexp_replace / lower / parse_url) — whole-stage codegen,
zero Python, zero shuffle — so canonicalization is free inside the
ingest scan at any scale.

Rules (the conservative, safe-everywhere subset):
- scheme and host lowercase; scheme-relative "//host/.." left intact;
- default ports drop (":80" for http, ":443" for https);
- the fragment (#...) drops;
- known tracking params drop (utm_*, gclid, fbclid, ref);
  a now-empty query string drops its "?";
- a trailing "/" on a non-root path drops;
- percent-encoding normalizes per RFC 3986 §6.2.2: hex digits
  uppercase ("%2f" -> "%2F") and encoded UNRESERVED octets decode
  ("%7E" -> "~", "%41" -> "A"); reserved/other octets stay encoded,
  malformed escapes pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return _canonical_chain(c)


def _normalize_pct(c: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure codegen:
    split on a lookahead so each part starts with one escape, uppercase
    the hex pair, decode it when the octet is unreserved
    ([A-Za-z0-9._~-]). Guarded by contains('%') so the common
    escape-free URL skips the whole expression."""

    def fix(p: Column) -> Column:
        hex2 = F.upper(F.substring(p, 2, 2))
        rest = F.substring(p, 4, 2147483647)
        ch = F.char(F.conv(hex2, 16, 10).cast("int"))
        return F.when(
            p.startswith("%") & hex2.rlike("^[0-9A-F]{2}$"),
            F.when(
                ch.rlike("^[A-Za-z0-9._~-]$"), F.concat(ch, rest)
            ).otherwise(F.concat(F.lit("%"), hex2, rest)),
        ).otherwise(p)

    return F.when(
        c.contains("%"),
        F.array_join(F.transform(F.split(c, r"(?=%)"), fix), ""),
    ).otherwise(c)


def _canonical_chain(c: Column) -> Column:
    # 0. normalize percent-encoding (before any other comparison-
    # sensitive step so equivalent escapes dedup together)
    c = _normalize_pct(c)
    # 1. drop fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # 2. drop tracking params, then tidy. Lookbehind keeps the ? / &
    # delimiter unconsumed so ADJACENT tracking params both match in
    # one pass ("?fbclid=f&ref=r" -> "?")
    c = F.regexp_replace(c, r"(?<=[?&])" + _TRACKING + r"&?", "")
    c = F.regexp_replace(c, r"[?&]+$", "")  # trailing ? / & left behind
    c = F.regexp_replace(c, r"\?&", "?")  # "?&a=b" -> "?a=b"
    # 3. lowercase scheme://host (authority ends at /, ? or end)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(
            c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
        ),
    )
    # 4. drop default ports
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443(?=[/?#]|$)", r"$1")
    # 5. drop trailing slash on a non-root path (no query present):
    # requires authority + '/' + at least one path char before the
    # final '/', so the root slash itself is preserved
    c = F.regexp_replace(
        c, r"^([a-z][a-z0-9+.-]*://[^/?#]+/[^?#]*[^/?#])/$", r"$1"
    )
    return c


_PCT_RE = None  # compiled lazily (module import stays cheap)


def normalize_pct_str(s: str) -> str:
    """Driver-side Python mirror of :func:`_normalize_pct` — byte-for-
    byte the same RFC 3986 §6.2.2 normalization (uppercase hex, decode
    unreserved), for tiny broadcast-side tables (robots rule prefixes)
    that must compare octet-consistently against paths canonicalized
    by the Spark chain. Kept trivially in sync by the equivalence test
    in ``tests/test_url.py``."""
    global _PCT_RE
    if "%" not in s:
        return s
    if _PCT_RE is None:
        import re

        _PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")

    def fix(m):
        h = m.group(1).upper()
        ch = chr(int(h, 16))
        if (
            "A" <= ch <= "Z"
            or "a" <= ch <= "z"
            or "0" <= ch <= "9"
            or ch in "-._~"
        ):
            return ch
        return "%" + h

    return _PCT_RE.sub(fix, s)


def sitemap_urls(xml: Column | str) -> Column:
    """``array<string>`` of ``<loc>`` URLs from a sitemap / sitemap-
    index XML body — the step after `sources.robots` surfaces the
    ``Sitemap:`` lines: fetched sitemaps expand into the URL frontier.
    Pure codegen (``regexp_extract_all``); tolerant of whitespace
    inside the element. CDATA and entity-escaped URLs pass through
    verbatim (decode with `canonicalize_url`'s chain downstream)."""
    c = F.col(xml) if isinstance(xml, str) else xml
    return F.regexp_extract_all(
        c, F.lit(r"<loc>\s*([^<]+?)\s*</loc>"), 1
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (port stripped) — the dedup / grouping key."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(
        c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1
    )


# ---------------------------------------------------------------------
# Anchor extraction + reference resolution (link graph / URL frontier)
# ---------------------------------------------------------------------

#: href attribute of an <a> tag, one pattern per quote style so a
#: double-quoted value may contain ' and vice versa (a single combined
#: ["']...["'] pair would let a "-opened href close at a ' and truncate
#: the URL). href must follow whitespace — `<a\s(?:[^>]*?\s)?href` —
#: so attributes merely ENDING in href (data-href) never match (a \b
#: boundary alone would: '-h' is a word boundary).
_ANCHOR_DQ_RE = r"""(?i)<a\s(?:[^>]*?\s)?href\s*=\s*"([^"]+)\""""
_ANCHOR_SQ_RE = r"""(?i)<a\s(?:[^>]*?\s)?href\s*=\s*'([^']+)'"""

#: any URI scheme prefix (RFC 3986 §3.1)
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def anchor_hrefs(html: Column | str) -> Column:
    """``array<string>`` of raw href values from ``<a>`` tags — two
    codegen ``regexp_extract_all`` passes (one per quote style,
    concatenated: double-quoted hrefs first), the same shape as
    :func:`sitemap_urls`. Unquoted hrefs (rare, invalid-ish HTML) are
    out of scope, like the documented exclusions above."""
    c = F.col(html) if isinstance(html, str) else html
    return F.concat(
        F.regexp_extract_all(c, F.lit(_ANCHOR_DQ_RE), 1),
        F.regexp_extract_all(c, F.lit(_ANCHOR_SQ_RE), 1),
    )


def resolve_href(href: Column, base: Column) -> Column:
    """Resolve an href against its page URL (RFC 3986 §5 reference
    resolution, the cases crawl frontiers need): absolute and
    protocol-relative pass through with the scheme filled in;
    root-relative joins the base origin; query-only references
    (``?page=2``) keep the base's FULL path and swap the query
    (RFC 3986 §5.3's merge for an empty reference path);
    path-relative joins the base directory. Non-fetchable references
    (``javascript:``, ``mailto:``, any non-http(s) scheme —
    ``ftp://``/``ws://``/app links included, bare fragments, empty)
    resolve to NULL — filter them out. Dot-segment collapsing
    (``../``) is out of scope (documented, like the canonicalizer's
    exclusions).
    """
    origin = F.regexp_extract(
        base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
    )
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    # greedy [^?#]* then a required '/' backtracks to the LAST slash of
    # the path — the base directory; '' when the path has no slash
    base_dir = F.regexp_extract(
        base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^?#]*/)", 1
    )
    return (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.rlike(_SCHEME_RE), F.lit(None))  # mailto:, ftp://, …
        .when(
            href.startswith("//"), F.concat(scheme, F.lit(":"), href)
        )
        .when(href.startswith("/"), F.concat(origin, href))
        .when(
            href.startswith("?"),
            # base path + new query (§5.3, empty reference path): strip
            # the base's own query/fragment, keep its full path
            F.concat(F.regexp_extract(base, r"^([^?#]*)", 1), href),
        )
        .when(
            href.startswith("#") | (href == ""), F.lit(None)
        )
        .otherwise(
            F.concat(
                F.when(base_dir != "", base_dir).otherwise(
                    F.concat(origin, F.lit("/"))
                ),
                href,
            )
        )
    )


def extract_links(
    html: Column | str, base_url: Column | str
) -> Column:
    """Resolved out-links of a page as ``array<string>`` — anchor
    extraction + reference resolution, nulls (non-fetchable schemes)
    filtered. The edge-building step of a link graph: explode this
    against :func:`url_host` for host-level edges, feed
    ``operators/graph.py::pagerank`` downstream. Pure expressions —
    zero Python, zero shuffle; the explode that follows is a generator,
    not an exchange."""
    h = F.col(html) if isinstance(html, str) else html
    b = F.col(base_url) if isinstance(base_url, str) else base_url
    resolved = F.transform(anchor_hrefs(h), lambda u: resolve_href(u, b))
    return F.filter(resolved, lambda x: x.isNotNull())
