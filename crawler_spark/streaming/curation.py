"""Streaming document curation — continuous corpus ingestion for the
training-data tier.

The batch curation chain (``corpus_curation``: quality gate → exact dedup
→ downstream) assumes the corpus is at rest. A live crawl produces
documents continuously; this operator is the streaming twin of its first
two stages:

  readStream(documents) → quality components (pure column algebra, the
  SAME expressions as batch ``operators/quality.quality_scores``) → score
  gate → content-hash ``dropDuplicatesWithinWatermark`` → append sink.

State shape at scale: dedup state is keyed by the content HASH (8-64
bytes), never the text, and each entry expires one watermark delay after
its event time — bounded state for an unbounded stream. Duplicates that
arrive farther apart than the watermark re-admit; the batch exact-dedup
stage downstream catches them (same trade, documented and tested, as the
frontier's ``streamed_frontier_ingest``).

Hash family mirrors the engine-wide dual-path convention
(``operators/dedup.minhash_signatures``): ``xxhash64`` in production,
md5 when ``portable_hash=True`` so the DuckDB oracle can value-check the
gate + first-arrival-dedup semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawler_spark.operators.quality import (
    quality_component_cols,
    quality_score_col,
    ws_token_count,
)

DOC_STREAM_SCHEMA = (
    "doc_id bigint, fetch_ts timestamp, lang string, text string"
)


def streamed_doc_curation(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    min_score: float = 0.25,
    portable_hash: bool = False,
    available_now: bool = True,
):
    """Start the curation stream; returns the StreamingQuery.

    Output rows: (doc_id, fetch_ts, lang, content_hash, n_tokens, score)
    — one per FIRST in-watermark arrival of each gated content hash, in
    arrival order. ``content_hash`` is bigint (xxhash64) or md5 hex
    string under ``portable_hash``.
    """
    src = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(docs_dir)
    )
    hash_col = (
        F.md5(F.col("text")) if portable_hash else F.xxhash64(F.col("text"))
    )
    comps = quality_component_cols(F.col("text"))
    gated = (
        src.withColumn("content_hash", hash_col)
        .withColumns(comps)
        .withColumn("score", quality_score_col())
        .where(F.col("score") >= F.lit(min_score))
        .withWatermark("fetch_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select(
            "doc_id", "fetch_ts", "lang", "content_hash",
            "n_tokens", "score",
        )
    )
    writer = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streamed_near_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming NEAR-dup suppression — the hamming-0 rung: each
    arriving document gets a simhash signature (per-bit majority vote
    over token hashes — word-order insensitive, multiplicity-weighted),
    and only the FIRST in-watermark arrival per signature survives.
    Re-crawled pages whose bytes differ but whose token multiset is
    unchanged (reordered boilerplate, whitespace churn, fragment
    reshuffles) collapse to one signature, strictly more suppression
    than ``streamed_doc_curation``'s exact content hash; hamming 1-3
    neighbors are the BATCH operator's job (``dedup.simhash_near_dups``
    pigeonhole banding — banding needs a self-join, which streaming
    state cannot express bounded).

    The signature is the SQL-portable column-algebra simhash
    (``dedup.with_portable_simhash`` — zero UDF, so the whole stream
    stays in codegen and the DuckDB oracle can mirror it); state is one
    64-bit key per distinct signature inside the watermark, evicted by
    ``dropDuplicatesWithinWatermark`` exactly like the exact-hash gate.

    Output rows: (doc_id, fetch_ts, lang, simhash, n_tokens), first
    arrival per signature in arrival order.
    """
    from crawler_spark.operators.dedup import with_portable_simhash

    src = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(docs_dir)
    )
    deduped = (
        with_portable_simhash(src)
        .withColumn("n_tokens", ws_token_count(F.col("text")))
        .withWatermark("fetch_ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("doc_id", "fetch_ts", "lang", "simhash", "n_tokens")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
