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
    format (one URL per line, ``#`` comments tolerated).
    """
    if not body:
        return [], []
    is_index = bool(_SITEMAPINDEX_RE.search(body))
    is_urlset = bool(_URLSET_RE.search(body))
    if is_index or is_urlset:
        locs = [_unescape(m.group(1)) for m in _LOC_RE.finditer(body)]
        return ([], locs) if is_index else (locs, [])
    urls = []
    for line in body.splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            urls.append(line)
    return urls, []


SITEMAP_URL_SCHEMA = "url string, host string, source_sitemap string, kind string"


def urls_from_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, body) sitemap fetches → (url, host, source_sitemap, kind)
    where kind ∈ {page, sitemap}. Page URLs are canonicalized (the same
    kernel as link discovery) and parse failures dropped; child sitemap
    URLs are resolved against the parent sitemap URL."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "host": [], "source_sitemap": [], "kind": []}
            for src, body in zip(pdf[url_col], pdf[body_col]):
                pages, children = parse_sitemap(body or "")
                for u in pages:
                    canon = normalize_url(u, src or "")
                    if not canon:
                        continue
                    rows["url"].append(canon)
                    rows["host"].append(get_hostname(canon))
                    rows["source_sitemap"].append(src)
                    rows["kind"].append("page")
                for u in children:
                    canon = normalize_url(u, src or "")
                    if not canon:
                        continue
                    rows["url"].append(canon)
                    rows["host"].append(get_hostname(canon))
                    rows["source_sitemap"].append(src)
                    rows["kind"].append("sitemap")
            yield pd.DataFrame(rows)

    return sitemaps.select(url_col, body_col).mapInPandas(
        parse, SITEMAP_URL_SCHEMA
    )
