"""Recrawl/freshness scheduling from capture history.

The reference crawler visits each URL exactly once (membership in
``pages`` is permanent, ``storage.ts:94-101``); the engine's retraction
path (``crawl/store.retract``) already re-opens individual URLs. This
module supplies the *policy* half of incremental crawling: estimate each
page's change rate from its capture history (e.g. the CDX index built by
``sources/cdx.py`` — consecutive captures with differing digests) and
derive a revisit interval, per Cho & Garcia-Molina, "Estimating
Frequency of Change" (ACM TOIT 2003, public): for a Poisson change
process observed at n roughly-regular intervals of mean length Δ with X
observed changes, the bias-corrected rate estimate is

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ

(the naive X/(nΔ) underestimates because multiple changes inside one
interval are observed as one). Revisit interval = 1/λ̂, clamped to a
configurable band; never-observed-to-change pages get the band maximum.

Scale shape: ONE url-keyed shuffle — the lag window and the per-url
aggregate share the same partitioning key, so Catalyst plans a single
Exchange (asserted in tests). Output is frontier-shaped: feed the due
set to ``retract_urls`` to schedule the recrawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _capture_ut(df: DataFrame, ts_col: str) -> Column:
    """Unix seconds of a capture timestamp, tolerant of the STRING
    timestamp shapes this module documents as inputs: ISO strings and
    the CDX index's 14-digit ``yyyyMMddHHmmss`` (``sources/cdx.py``).
    A bare ``unix_timestamp(str)`` throws CANNOT_PARSE_TIMESTAMP under
    ANSI for the CDX form; ``try_to_timestamp`` yields NULL instead
    (skipped by the min/max aggregates)."""
    t = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "string":
        t = F.coalesce(
            F.try_to_timestamp(t),
            F.try_to_timestamp(t, F.lit("yyyyMMddHHmmss")),
        )
    return F.unix_timestamp(t)


def change_rates(
    captures: DataFrame,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    min_revisit_seconds: float = 3600.0,
    max_revisit_seconds: float = 30 * 86400.0,
    tiebreak_col: str | None = None,
    include_last_capture: bool = False,
) -> DataFrame:
    """Per-page change statistics + revisit schedule from captures.

    Returns one row per page with ≥2 captures spanning >0 seconds:
    ``(id, n_captures, n_changes, rate_per_day, revisit_seconds)``.
    ``n_changes`` counts consecutive-capture digest transitions;
    ``rate_per_day`` is λ̂ scaled to changes/day; ``revisit_seconds`` is
    1/λ̂ clamped to [min, max] (λ̂ = 0 ⇒ max — an unchanging page is
    still revisited at the band ceiling, the standard staleness bound).
    ``include_last_capture=True`` appends ``last_capture_ut`` (unix
    seconds of the newest capture) — it rides the same aggregate, which
    is what keeps :func:`due_for_recrawl` a single pass.
    """
    # the capture order must be TOTAL per page or the lag() transition
    # flags are partition-order-dependent — pass tiebreak_col whenever
    # timestamps can tie (e.g. a capture id)
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(id_col).orderBy(*order)
    flags = captures.select(
        F.col(id_col),
        _capture_ut(captures, ts_col).alias("_ut"),
        F.col(digest_col).alias("_d"),
        F.lag(digest_col).over(w).alias("_prev"),
    )
    agg = flags.groupBy(id_col).agg(
        F.count("*").alias("n_captures"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull() & (F.col("_d") != F.col("_prev")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        (F.max("_ut") - F.min("_ut")).cast("double").alias("_span"),
        F.max("_ut").alias("last_capture_ut"),
    )
    n_obs = (F.col("n_captures") - 1).cast("double")
    # the estimator needs ≥ 2 captures over > 0 seconds; pages outside
    # that (single capture — the most common state in a growing crawl —
    # or same-instant captures) used to be FILTERED OUT entirely, so
    # due_for_recrawl could never schedule them again: a permanent
    # staleness trap. They now get the defensible degenerate answers
    # below instead of vanishing.
    est_ok = (n_obs > 0) & (F.col("_span") > 0)
    avg_int = F.col("_span") / n_obs
    lam = (
        -F.log(
            (n_obs - F.col("n_changes") + F.lit(0.5)) / (n_obs + F.lit(0.5))
        )
        / avg_int
    )
    revisit = F.when(
        F.col("n_changes") == 0, F.lit(float(max_revisit_seconds))
    ).otherwise(
        F.when(
            est_ok,
            F.least(
                F.greatest(1.0 / lam, F.lit(float(min_revisit_seconds))),
                F.lit(float(max_revisit_seconds)),
            ),
        # changes observed over a zero span: rate unknown-but-high —
        # revisit at the band floor
        ).otherwise(F.lit(float(min_revisit_seconds)))
    )
    return agg.select(
        id_col,
        "n_captures",
        F.col("n_changes").cast("long").alias("n_changes"),
        # explicit 0.0 — -ln(1) is IEEE -0.0, which would leak a
        # sign into 6-dp-rounded comparisons; NULL when the rate is
        # genuinely inestimable (changes over zero span)
        F.when(F.col("n_changes") == 0, F.lit(0.0))
        .otherwise(F.when(est_ok, lam * F.lit(86400.0)))
        .alias("rate_per_day"),
        revisit.alias("revisit_seconds"),
        *(["last_capture_ut"] if include_last_capture else []),
    )


def due_for_recrawl(
    captures: DataFrame,
    as_of,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    **rate_kwargs,
) -> DataFrame:
    """Pages whose revisit interval has elapsed by ``as_of``.

    Composes :func:`change_rates` with the last capture time:
    due ⇔ last_capture + revisit_seconds ≤ as_of. The returned id frame
    feeds ``crawl.driver.retract_urls`` directly — retract, then
    ``run_crawl(resume=True)`` refetches exactly the due set (the
    retraction e2e contract).
    """
    rates = change_rates(
        captures, id_col=id_col, ts_col=ts_col, digest_col=digest_col,
        include_last_capture=True, **rate_kwargs,
    )
    if isinstance(as_of, Column):
        as_of_ut = F.unix_timestamp(as_of)
    else:
        # same tolerant parse as the capture timestamps: a string
        # as_of in a non-default format must not ANSI-abort
        c = F.lit(as_of)
        as_of_ut = F.unix_timestamp(
            F.coalesce(
                F.try_to_timestamp(c),
                F.try_to_timestamp(c, F.lit("yyyyMMddHHmmss")),
            )
        )
    return rates.where(
        (F.col("last_capture_ut") + F.col("revisit_seconds")) <= as_of_ut
    ).select(id_col, "revisit_seconds")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    content_cols: tuple[str, ...] = ("text",),
    portable: bool = False,
) -> DataFrame:
    """Change-data-capture between two crawl snapshots: one row per id
    present in either, with ``status`` ∈ added / removed / changed /
    unchanged — the diff that feeds incremental downstream work (re-run
    extraction/curation only on added+changed; retract removed).

    Content identity is a hash of ``content_cols`` — ``xxhash64`` in
    production so the full-outer join exchanges (id, 8-byte hash), never
    page text; ``portable=True`` uses md5 (the engine-portable family)
    so the DuckDB oracle can mirror the comparison byte-for-byte. One
    shuffle per side on the uniform id key, then a full-outer equi-join.
    """
    def keyed(df: DataFrame, out: str) -> DataFrame:
        # NULL content columns hash as '' — coalesced EXPLICITLY,
        # because concat_ws would otherwise drop a NULL column together
        # with its separator and ('x', NULL) would collide with
        # (NULL, 'x'). Presence is carried by an explicit flag, not by
        # hash nullability — a null-text row must not read as absent.
        joined = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in content_cols]
        )
        h = (
            F.md5(joined) if portable else F.xxhash64(joined).cast("string")
        )
        return df.select(
            F.col(id_col),
            F.lit(True).alias(f"_in{out}"),
            h.alias(f"_h{out}"),
        )

    j = keyed(old, "_old").join(keyed(new, "_new"), id_col, "full_outer")
    return j.select(
        id_col,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def sitemap_refetch(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    fetched_col: str = "fetched_ts",
) -> DataFrame:
    """Sitemap-declared freshness: join a sitemap's page entries
    (``functions.sitemaps.entries_from_sitemaps``) against the crawl
    state and decide, per sitemap URL, whether to refetch:

    - ``new``       — never crawled → refetch;
    - ``stale``     — declared lastmod strictly after our fetch time →
      refetch;
    - ``fresh``     — lastmod at or before the fetch → skip;
    - ``no_lastmod`` — crawled, nothing declared → skip here (the
      Cho–Garcia-Molina estimator, :func:`due_for_recrawl`, owns those).

    lastmod strings are W3C datetime; the NAIVE forms parse
    relationally — date-only and full datetimes, with a trailing ``Z``
    treated as naive UTC (the engine's store convention). Anything
    else — unparseable strings AND explicit zone offsets, which would
    otherwise be read relative to the session timezone and disagree
    with the equivalent Z spelling — degrades to ``no_lastmod``:
    sitemap hints are advisory and a wrong "stale" costs a fetch, so
    never guess. Returns ``(url, lastmod_ts, fetched_ts, refetch,
    reason)`` one row per DISTINCT sitemap page entry, keeping the max
    lastmod of duplicate declarations and judging against the LATEST
    fetch of each url (a recrawl store naturally holds one row per
    fetch per round).

    Shape: one equi-join on url (both sides pre-reduced by max, both
    shuffle on the uniform url key) — no wide payloads, safe at any
    corpus size.
    """
    lm = F.col(lastmod_col)
    naive = (
        r"^\d{4}-\d{2}-\d{2}"
        r"([Tt ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?[Zz]?)?$"
    )
    lastmod_ts = F.when(
        lm.rlike(naive),
        F.try_to_timestamp(F.regexp_replace(lm, r"[Zz]$", "")),
    )
    e = (
        entries.select(F.col(url_col).alias("url"), lastmod_ts.alias("_lm"))
        .groupBy("url")
        .agg(F.max("_lm").alias("lastmod_ts"))
    )
    c = (
        crawled.select(
            F.col(url_col).alias("url"),
            F.col(fetched_col).alias("_ft"),
        )
        .groupBy("url")
        .agg(F.max("_ft").alias("fetched_ts"))
    )
    j = e.join(c, "url", "left")
    reason = (
        F.when(F.col("fetched_ts").isNull(), F.lit("new"))
        .when(F.col("lastmod_ts").isNull(), F.lit("no_lastmod"))
        .when(F.col("lastmod_ts") > F.col("fetched_ts"), F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        "url",
        "lastmod_ts",
        "fetched_ts",
        reason.alias("reason"),
        reason.isin("new", "stale").alias("refetch"),
    )
