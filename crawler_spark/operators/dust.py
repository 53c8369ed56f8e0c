"""DUST rule mining: learn site-specific URL rewrite rules from
"Different URLs with Similar Text" (Bar-Yossef, Keidar & Schonfeld,
WWW 2007), and canonicalize frontiers with them.

Mirror pages waste crawl budget twice: the duplicate fetch itself, and
every downstream dedup stage that has to re-discover the equality. The
URL-seen anti-join (``operators/seen.py``, SURVEY §2 J1) only blocks
*exact* URL repeats; DUST twins (``/story/123/print`` vs
``/story/123``, ``index.htm`` vs ``index.html``, ``/b/…`` vs ``/a/…``
mirror trees) sail through it. The DUST insight is that such twins are
*rule-shaped* per site: mine the rules once from observed content-equal
pairs, then rewrite candidate URLs to their canonical form BEFORE the
seen-join, so the duplicate is never fetched at all.

This module implements the token-level core of the algorithm:

- :func:`mine_dust_rules` — from pages ``(url, host, content_key)``
  where ``content_key`` is any content-equality key (the exact-dedup
  hash from ``operators/dedup.py`` is the natural feed), find
  same-host URL pairs with equal content whose slash-split paths
  differ in EXACTLY one segment, and emit
  ``(host, seg_from, seg_to, support)`` — the single-segment
  substitution rules, directed toward the canonical twin (smaller by
  ``(length, lexicographic)``, the paper's shorter-URL preference),
  with ``support`` = number of observed content-equal pairs. Rules
  below ``min_support`` are noise (one accidental collision) and are
  dropped, as in the paper's support-threshold filtering.
- :func:`apply_dust_rules` — rewrite a URL table with a mined rule
  set: for each URL, the lexicographically-first matching rule (by
  ``(seg_from, seg_to)``) is applied once to every occurrence of its
  ``seg_from`` segment. One deterministic pass, not a fixpoint — the
  caller re-applies per crawl round if chains matter, and the
  seen-join downstream makes over-rewriting safe (worst case: one
  extra fetch, the pre-DUST status quo).

Scale shape (the 100 TB contract):

- duplicate groups are found by a ``(host, content_key)``
  aggregation — an 8-byte-hash + host-key shuffle, no text;
- pair generation is a *guarded* self-equi-join inside those groups:
  groups larger than ``max_group`` URLs (calendars, session-id
  explosions — the pathological mirrors) are excluded up front, the
  same mega-bucket guard as MinHash banding (``operators/dedup.py``),
  so the join is O(Σ bounded-group²), never O(n²);
- segment comparison is JVM column algebra over short arrays
  (``zip_with`` + ``filter``) — no Python;
- the mined rule table is tiny by construction (rules per site, not
  per page) and is **broadcast** for application — canonicalizing a
  frontier costs one map-side join, zero shuffles.

Reference tie-in: the reference crawler canonicalizes lexically only
(``src/lib/url.ts`` WHATWG normalize, mirrored in
``functions/urls.py``); DUST is the learned, site-adaptive layer on
top, per SURVEY §7's crawl-ecosystem scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "path_segments",
    "mine_dust_rules",
    "mine_dust_rules_from_pages",
    "prepare_dust_rules",
    "apply_dust_rules",
]

# ONE copy of the scheme://authority prefix pattern: the rewrite must
# recompose exactly what path_segments decomposed, and the serial
# oracle (CrawlConfig.dust_canonical) hand-mirrors the same literal —
# two in-module copies already drifted once (the suffix-extraction
# parity bug this constant's introduction fixed).
SCHEME_AUTHORITY_RE = r"(?i)^([a-z][a-z0-9+.-]*://[^/]*)"


def path_segments(url):
    """Slash-split path segments of ``url`` as an array column.

    Pure-regex decomposition — scheme://authority prefix, then the
    rest up to the first ``?`` or ``#`` — the SAME split the serial
    oracle (``CrawlConfig.dust_canonical``) uses. ``parse_url`` is
    deliberately avoided: Java's URL parser returns NULL for inputs it
    rejects (unencoded spaces, malformed authority), which would make
    this side silently pass a URL through while the oracle's regex
    split rewrites it. One leading ``/`` is stripped so the root path
    yields ``[]``, not ``['']``.
    """
    prefix = F.regexp_extract(url, SCHEME_AUTHORITY_RE, 1)
    rest = F.substr(url, F.length(prefix) + F.lit(1))
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    trimmed = F.regexp_replace(path, r"^/", "")
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "/")
    )


def mine_dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    key_col: str = "content_key",
    min_support: int = 2,
    max_group: int = 50,
) -> DataFrame:
    """Mine single-segment URL substitution rules from content-equal
    same-host page pairs. Returns ``(host, seg_from, seg_to,
    support)`` with ``support >= min_support``.

    A pair contributes a rule iff its paths have the same segment
    count and differ in exactly one segment; the rule points from the
    non-canonical twin's segment to the canonical one's (canonical =
    smaller by ``(length(url), url)``). Duplicate groups with more
    than ``max_group`` URLs are excluded (mega-group guard — see
    module docstring).
    """
    u, h, k = F.col(url_col), F.col(host_col), F.col(key_col)
    base = pages.select(
        h.alias("host"), k.alias("_ck"), u.alias("url")
    ).dropDuplicates(["host", "_ck", "url"])

    sizes = (
        base.groupBy("host", "_ck")
        .count()
        .where((F.col("count") >= 2) & (F.col("count") <= max_group))
        .select("host", "_ck")
    )
    grp = base.join(sizes, ["host", "_ck"])

    a = grp.select("host", "_ck", F.col("url").alias("_u1"))
    b = grp.select("host", "_ck", F.col("url").alias("_u2"))
    pairs = a.join(b, ["host", "_ck"]).where(F.col("_u1") < F.col("_u2"))

    s1 = path_segments(F.col("_u1"))
    s2 = path_segments(F.col("_u2"))
    diffs = F.filter(
        F.zip_with(s1, s2, lambda x, y: F.struct(x.alias("a"), y.alias("b"))),
        lambda p: p["a"] != p["b"],
    )
    one = (
        pairs.select("host", "_u1", "_u2", diffs.alias("_d"), s1.alias("_s1"), s2.alias("_s2"))
        .where((F.size("_s1") == F.size("_s2")) & (F.size("_d") == 1))
        .select("host", "_u1", "_u2", F.element_at("_d", 1).alias("_d1"))
    )

    len1, len2 = F.length("_u1"), F.length("_u2")
    u1_canon = (len1 < len2) | ((len1 == len2) & (F.col("_u1") < F.col("_u2")))
    rules = one.select(
        "host",
        F.when(u1_canon, F.col("_d1")["b"]).otherwise(F.col("_d1")["a"]).alias("seg_from"),
        F.when(u1_canon, F.col("_d1")["a"]).otherwise(F.col("_d1")["b"]).alias("seg_to"),
    )
    return (
        rules.groupBy("host", "seg_from", "seg_to")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= F.lit(min_support))
    )


def mine_dust_rules_from_pages(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
    min_support: int = 2,
    max_group: int = 50,
) -> DataFrame:
    """Mine DUST rules from a crawled pages table: content equality is
    ``xxhash64`` of the EXTRACTED TEXT (the right DUST signal — twin
    templates differ in chrome, not content; the engine's pages rows
    already carry the text, ``crawl/store.py`` PAGES_SCHEMA). Null or
    empty text never pairs (each such page gets a unique key), so error
    rows and blank pages cannot form one giant duplicate group."""
    p = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.when(
            F.col(text_col).isNull() | (F.col(text_col) == ""),
            F.concat(F.lit("empty:"), F.col(url_col)),
        )
        .otherwise(F.xxhash64(text_col).cast("string"))
        .alias("content_key"),
    )
    return mine_dust_rules(
        p, min_support=min_support, max_group=max_group
    )


def prepare_dust_rules(rules: DataFrame) -> DataFrame:
    """Fold a ``(host, seg_from, seg_to[, support])`` rule table into
    one row per host: ``(_rhost, _rules)`` with the rules sorted by
    ``(seg_from, seg_to)`` — the broadcast-ready form
    :func:`apply_dust_rules` consumes. The per-host rule count is small
    by construction (rules per site, not per page); callers applying
    rules every crawl round should ``persist()`` this once instead of
    re-aggregating per round."""
    return rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("seg_from").alias("f"), F.col("seg_to").alias("t")
                )
            )
        ).alias("_rules")
    )


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Rewrite ``urls`` with a mined rule table: per URL, pick the
    first matching same-host rule by ``(seg_from, seg_to)`` order and
    substitute every path segment equal to ``seg_from`` with
    ``seg_to``; URLs with no matching rule pass through unchanged.

    Adds ``out_col`` (and ``dust_applied``) to the input columns. The
    rule table is broadcast — zero shuffle on the URL side.
    """
    u = F.col(url_col)
    with_segs = urls.withColumn("_segs", path_segments(u))

    per_host = (
        rules
        if set(rules.columns) == {"_rhost", "_rules"}
        else prepare_dust_rules(rules)
    )
    matched = with_segs.join(
        F.broadcast(per_host),
        F.col(host_col) == F.col("_rhost"),
        "left",
    )
    # first matching rule per URL, deterministically
    # F.get (not element_at): null on out-of-bounds under ANSI mode
    rule = F.get(
        F.filter(
            F.coalesce(
                F.col("_rules"),
                F.array().cast("array<struct<f:string,t:string>>"),
            ),
            lambda x: F.array_contains(F.col("_segs"), x["f"]),
        ),
        0,
    )
    pick = matched.withColumn("_rule", rule)
    rule = F.col("_rule")
    # scheme://authority + rewritten path + untouched ?query/#fragment.
    # Scheme matching is case-insensitive (schemes are; frontier URLs
    # are normally pre-canonicalized lowercase, but this operator takes
    # arbitrary tables) and the original spelling is preserved — the
    # serial mirror (CrawlConfig.dust_canonical) does the same.
    # the suffix must be cut from the POST-AUTHORITY remainder (the
    # same `rest` path_segments splits on), not the full URL: a '?' or
    # '#' inside the authority — 'http://h#frag/x', userinfo with '?' —
    # would otherwise be extracted AND kept in the prefix, duplicating
    # it into the rewrite and diverging from the serial oracle
    _prefix = F.regexp_extract(u, SCHEME_AUTHORITY_RE, 1)
    _rest = F.substr(u, F.length(_prefix) + F.lit(1))
    rewritten = F.concat(
        _prefix,
        F.lit("/"),
        F.array_join(
            F.transform(
                F.col("_segs"),
                lambda s: F.when(s == rule["f"], rule["t"]).otherwise(s),
            ),
            "/",
        ),
        F.regexp_extract(_rest, r"([?#].*)$", 1),
    )
    return pick.select(
        *urls.columns,
        F.when(rule.isNotNull(), rewritten).otherwise(u).alias(out_col),
        rule.isNotNull().alias("dust_applied"),
    )
