"""Sitemap parsing → seed/frontier URL injection.

Companion to ``functions/robots.py``: real crawls bootstrap their frontier
from sitemaps (sitemaps.org protocol — public spec). Supports both
``<urlset>`` (leaf sitemaps: ``<url><loc>…</loc></url>``) and
``<sitemapindex>`` (``<sitemap><loc>…</loc></sitemap>`` pointing at child
sitemaps), plus the plain-text one-URL-per-line format.

``parse_sitemap`` is the pure kernel; ``urls_from_sitemaps`` parses a
DataFrame of fetched sitemap bodies ``(url, body)`` distributed and
returns discovered page URLs (canonicalized, with host) ready to merge
into the frontier, and child sitemap URLs for the next fetch wave —
sitemap recursion is a driver-side loop of fetch→parse rounds, exactly
like the crawl itself.

Parsing is regex-based over ``<loc>`` elements (namespace-agnostic,
tolerant of malformed XML — real-world sitemaps often are); entity
unescaping covers the five XML built-ins the spec requires.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from crawler_spark.functions.urls import get_hostname, normalize_url

_LOC_RE = re.compile(r"<(?:[A-Za-z0-9_]+:)?loc\s*>\s*(.*?)\s*</(?:[A-Za-z0-9_]+:)?loc\s*>",
                     re.IGNORECASE | re.DOTALL)
_SITEMAPINDEX_RE = re.compile(r"<(?:[A-Za-z0-9_]+:)?sitemapindex[\s>]", re.IGNORECASE)
_URLSET_RE = re.compile(r"<(?:[A-Za-z0-9_]+:)?urlset[\s>]", re.IGNORECASE)

# &amp; MUST be replaced last: doing it first would create new entity
# sequences out of escaped ampersands ("&amp;lt;" → "&lt;" → "<",
# double-unescaping a URL that literally contains "&lt;")
_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&amp;", "&"),
)


def _unescape(s: str) -> str:
    for k, v in _ENTITIES:
        s = s.replace(k, v)
    return s


def parse_sitemap(body: str) -> tuple[list[str], list[str]]:
    """(page_urls, child_sitemap_urls) from one sitemap body.

    XML bodies are classified by root element; anything without a
    ``<urlset>``/``<sitemapindex>`` root is treated as the plain-text
    format (one URL per line, ``#`` comments tolerated). Thin wrapper
    over :func:`parse_sitemap_entries` (one parsing kernel) dropping
    the lastmod column.
    """
    entries, children = parse_sitemap_entries(body)
    return [u for u, _ in entries], children


_URL_BLOCK_RE = re.compile(
    r"<(?:[A-Za-z0-9_]+:)?url(?:\s[^>]*)?>(.*?)</(?:[A-Za-z0-9_]+:)?url\s*>",
    re.IGNORECASE | re.DOTALL,
)
_LASTMOD_RE = re.compile(
    r"<(?:[A-Za-z0-9_]+:)?lastmod\s*>\s*(.*?)\s*</(?:[A-Za-z0-9_]+:)?lastmod\s*>",
    re.IGNORECASE | re.DOTALL,
)


def parse_sitemap_entries(
    body: str,
) -> tuple[list[tuple[str, str | None]], list[str]]:
    """Like :func:`parse_sitemap` but pages come back as
    ``(loc, lastmod|None)`` pairs — ``<lastmod>`` matched WITHIN its
    ``<url>`` block so entries can't steal a neighbor's date. The raw
    W3C-datetime string is returned untouched (date-only and full
    datetime forms both occur in the wild); timestamp parsing is the
    relational layer's job (``operators.freshness.sitemap_refetch``).
    ``<loc>`` elements OUTSIDE any ``<url>`` block (malformed-but-
    common generator output, or a final block truncated by a fetch
    limit) are still kept as lastmod-less entries after the blocked
    ones — the same URL set the pre-lastmod parser returned; the
    plain-text format has no lastmod by definition.
    """
    if not body:
        return [], []
    if _SITEMAPINDEX_RE.search(body):
        return [], [_unescape(m.group(1)) for m in _LOC_RE.finditer(body)]
    if _URLSET_RE.search(body):
        entries: list[tuple[str, str | None]] = []
        spans: list[tuple[int, int]] = []
        for bm in _URL_BLOCK_RE.finditer(body):
            spans.append(bm.span())
            blk = bm.group(1)
            locm = _LOC_RE.search(blk)
            if not locm:
                continue
            lm = _LASTMOD_RE.search(blk)
            entries.append(
                (
                    _unescape(locm.group(1)),
                    _unescape(lm.group(1)) if lm else None,
                )
            )
        # stragglers: locs outside every matched block
        for m in _LOC_RE.finditer(body):
            if not any(a <= m.start() < b for a, b in spans):
                entries.append((_unescape(m.group(1)), None))
        return entries, []
    urls = []
    for line in body.splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            urls.append((line, None))
    return urls, []


SITEMAP_URL_SCHEMA = "url string, host string, source_sitemap string, kind string"


def urls_from_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, body) sitemap fetches → (url, host, source_sitemap, kind)
    where kind ∈ {page, sitemap}. Page URLs are canonicalized (the same
    kernel as link discovery) and parse failures dropped; child sitemap
    URLs are resolved against the parent sitemap URL. Delegates to
    :func:`entries_from_sitemaps` (one parsing kernel) minus the
    lastmod column."""
    return entries_from_sitemaps(sitemaps, url_col, body_col).drop(
        "lastmod"
    )


SITEMAP_ENTRY_SCHEMA = (
    "url string, host string, source_sitemap string, kind string, "
    "lastmod string"
)


def entries_from_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, body) sitemap fetches → (url, host, source_sitemap, kind,
    lastmod) — :func:`urls_from_sitemaps` plus each page entry's raw
    ``<lastmod>`` string (null when absent; always null for child
    sitemap rows and the plain-text format). Same canonicalization and
    distribution shape (one ``mapInPandas`` pass, no shuffle)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "host": [], "source_sitemap": [],
                "kind": [], "lastmod": [],
            }
            for src, body in zip(pdf[url_col], pdf[body_col]):
                entries, children = parse_sitemap_entries(body or "")
                for u, lm in entries:
                    canon = normalize_url(u, src or "")
                    if not canon:
                        continue
                    rows["url"].append(canon)
                    rows["host"].append(get_hostname(canon))
                    rows["source_sitemap"].append(src)
                    rows["kind"].append("page")
                    rows["lastmod"].append(lm)
                for u in children:
                    canon = normalize_url(u, src or "")
                    if not canon:
                        continue
                    rows["url"].append(canon)
                    rows["host"].append(get_hostname(canon))
                    rows["source_sitemap"].append(src)
                    rows["kind"].append("sitemap")
                    rows["lastmod"].append(None)
            yield pd.DataFrame(rows)

    return sitemaps.select(url_col, body_col).mapInPandas(
        parse, SITEMAP_ENTRY_SCHEMA
    )
