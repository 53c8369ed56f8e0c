"""Post-crawl learn tier — the reference CLI's analytics phases over a
completed crawl store.

The reference runs its text analytics as separate CLI entry points over
the pages collection written by ``crawl`` (``index.ts:18-52``:
``collectText``, ``summarizeText``, ``addSentiment``,
``addTermFrequencies``, ``addPageTags``, ``splitTerms``, ``createSites``,
plus ``linkCount`` in ``reconfigure.ts:55-62``). This module is that
surface for the Spark engine: one composition over ``CrawlStore`` + the
fetch corpus that yields every phase as a DataFrame, so a single
spark-submit job (``scripts/run_learn.py``) replaces the reference's
phase-per-process loop and Catalyst fuses what can be fused.

Input contract: block-level phases re-extract from the corpus ``html``
(the same Arrow-batched UDF the crawl used — the store's fused ``text``
column is those blocks newline-joined, so re-extraction is the lossless
authority, asserted by tests/test_learn.py); host/link phases read the
store tables directly and never touch html.

Scale shape: the only corpus-sized operation is the ``url`` semi-join
selecting fetched pages. On a bucketed corpus (``crawl/corpus.py``) that
join is one-sided — the corpus side has NO exchange; only the
(crawl-sized) url list shuffles. Everything downstream is keyed by url,
the natural partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.analytics.text_tier import (
    block_sentiment,
    link_counts,
    page_blocks,
    page_summaries,
    page_tags,
    page_term_scores,
    sites,
)
from crawler_spark.crawl.store import CrawlStore

#: phase name -> reference entry point it reproduces
PHASES = {
    "text": "collectText (learn.ts:140-222)",
    "sentiment": "addSentiment (learn.ts:224-320 path)",
    "summaries": "summarizeText (learn.ts:140-222 summary leg)",
    "terms": "addTermFrequencies (learn.ts:322-385)",
    "tags": "addPageTags (learn.ts:387-426)",
    "sites": "createSites (learn.ts:538-554)",
    "links": "linkCount (reconfigure.ts:55-62)",
    # north-rule extension — the reference has no canonical handling
    # (page.ts extracts anchors only): per-page rel=canonical
    # declarations extracted from the fetched html, chains/cycles
    # resolved by operators.redirects.canonical_collapse
    "canonicals": "rel=canonical collapse (extension; no reference phase)",
}

_BLOCK_PHASES = frozenset(("text", "sentiment", "summaries", "terms", "tags"))


def fetched_pages_html(store: CrawlStore, corpus: DataFrame) -> DataFrame:
    """(url, html) for every page the crawl fetched as html.

    Semi-join keeps the corpus side prunable (column-pruned to two
    columns; zero exchange when the corpus is bucketed by url).
    """
    urls = (
        store.read_pages()
        .where(F.col("type") == "html")
        .select("url")
        .distinct()
    )
    return corpus.select("url", "html").join(urls, "url", "left_semi")


def learn_outputs(
    store: CrawlStore,
    corpus: DataFrame,
    phases: list[str] | tuple[str, ...] = tuple(PHASES),
    use_trigrams: bool = True,
) -> dict[str, DataFrame]:
    """Every requested phase as a DataFrame, computed over ONE shared
    block extraction (cached iff >1 block-level phase asks for it).

    ``use_trigrams`` mirrors ``addTermFrequencies``'s trigram path;
    ``False`` gives ``splitTerms``-style flat-token TF.
    """
    unknown = sorted(set(phases) - set(PHASES))
    if unknown:
        raise ValueError(f"unknown learn phase(s): {unknown}")
    want = [p for p in PHASES if p in set(phases)]  # canonical order
    out: dict[str, DataFrame] = {}

    block_want = [p for p in want if p in _BLOCK_PHASES]
    html = None
    if block_want or "canonicals" in want:
        html = fetched_pages_html(store, corpus)
    if block_want:
        blocks = page_blocks(html)
        if len(block_want) > 1:
            # one html extraction feeds every block phase; without this
            # each sink re-runs the pandas UDF over the full corpus slice
            blocks = blocks.cache()
        if "text" in want:
            out["text"] = blocks
        if "sentiment" in want:
            out["sentiment"] = block_sentiment(blocks)
        if "summaries" in want:
            out["summaries"] = page_summaries(
                blocks, all_urls=html.select("url")
            )
        if "terms" in want or "tags" in want:
            terms = page_term_scores(blocks, use_trigrams=use_trigrams)
            if "terms" in want:
                out["terms"] = terms.select("url", "term", "score")
            if "tags" in want:
                out["tags"] = page_tags(terms)
    if "canonicals" in want:
        from crawler_spark.functions.html import extract_canonical_udf
        from crawler_spark.operators.redirects import canonical_collapse

        decl = html.select(
            "url",
            extract_canonical_udf("html", "url").alias("canonical"),
        )
        out["canonicals"] = canonical_collapse(decl).select(
            "url", "target", "canonical_hops", "canonical_cycle"
        )
    if "sites" in want:
        out["sites"] = sites(store.read_pages())
    if "links" in want:
        out["links"] = link_counts(store.read_links())
    return out
