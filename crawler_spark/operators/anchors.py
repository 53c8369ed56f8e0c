"""Anchor-text aggregation — per-target link-text descriptors.

Anchor text is the classic off-page document descriptor (Brin & Page
1998 §2.2 treat it as page text for the TARGET; Common Crawl's WAT
sidecars ship it for the same reason): what the web *calls* a page is a
ranking signal, a retrieval field, and — in a training-data pipeline —
free weak supervision (titles/labels for the fetched document). The
reference crawler discards it (``prepareLinks`` keeps hrefs only,
``page.ts:121-128``); ``functions.html.extract_anchors_from`` restores
it without touching the byte-parity link extraction.

Spark-first shape of the aggregation:

  * anchor normalization (trim / lower / whitespace-collapse) is pure
    column algebra inside whole-stage codegen;
  * spam resistance: with a ``src`` column, each (source, target,
    anchor) pair votes ONCE — a link farm repeating "best casino" a
    million times from one host contributes one vote. That distinct is
    the operator's one full-width shuffle, keyed by the uniform
    (dst, anchor, src) triple;
  * the per-target top-k runs AFTER aggregation, so the window's
    partition (one row per distinct anchor per target) is orders of
    magnitude smaller than the raw edge table; hot targets (a homepage
    with 10^8 in-links) are already collapsed to their distinct anchor
    vocabulary by the partial-agg (map-side combine) before anything
    skews a reducer.

At 100 TB the edge table is the crawl's link output (~10^11 rows); the
aggregated (dst, anchor) table is bounded by target-vocabulary size,
and the final top-k shuffles only that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_anchor(c) -> object:
    """Anchor-text normalization: collapse internal whitespace, trim,
    lower-case. One definition shared with the oracle SQL."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def anchor_topk(
    edges: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
    src: str | None = "src",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` anchor texts per link target.

    ``edges`` is one row per discovered link (the crawl store's links
    schema joined with ``extract_anchors_udf`` output, or any
    (src, dst, anchor) relation). Empty anchors (image links, styled
    buttons) are dropped after normalization.

    Votes: with ``src`` (the recommended, spam-resistant mode) an
    anchor's vote count is the number of DISTINCT sources that used it
    for that target; with ``src=None`` it is the raw occurrence count.
    Ties break on anchor text ascending — a total order, so re-runs and
    engines agree.

    Returns ``(dst, anchor, votes, rank)`` with ``rank`` 1-based and
    ``rank <= k``.
    """
    e = edges.select(
        F.col(dst).alias("dst"),
        normalize_anchor(anchor).alias("anchor"),
        *([F.col(src).alias("src")] if src is not None else []),
    ).where(F.col("anchor") != "")
    if src is not None:
        votes = (
            e.distinct()
            .groupBy("dst", "anchor")
            .agg(F.count("*").alias("votes"))
        )
    else:
        votes = e.groupBy("dst", "anchor").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("dst").orderBy(
        F.col("votes").desc(), F.col("anchor").asc()
    )
    return (
        votes.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "dst",
            "anchor",
            F.col("votes").cast("long").alias("votes"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
