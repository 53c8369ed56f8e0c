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

import os

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


def _watermark_seconds(watermark: str) -> int:
    """Parse the tiny interval grammar the curation streams use
    ('N second[s]|minute[s]|hour[s]|day[s]') to seconds — the hamming
    rung manages its own state eviction, so the delay must be a number
    there, not a Spark interval string."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", watermark.lower()
    )
    if not m:
        raise ValueError(
            f"unsupported watermark {watermark!r}; use "
            f"'N seconds|minutes|hours|days'"
        )
    n = int(m.group(1))
    return n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        m.group(2)
    ]


def streamed_near_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
    max_hamming: int = 0,
    max_bucket_size: int | None = 10_000,
    max_files_per_trigger: int = 16,
):
    """Streaming NEAR-dup suppression, two rungs.

    **Hamming 0 (default)**: each arriving document gets a simhash
    signature (per-bit majority vote over token hashes — word-order
    insensitive, multiplicity-weighted), and only the FIRST
    in-watermark arrival per signature survives. Re-crawled pages whose
    bytes differ but whose token multiset is unchanged (reordered
    boilerplate, whitespace churn, fragment reshuffles) collapse to one
    signature, strictly more suppression than
    ``streamed_doc_curation``'s exact content hash. State is one 64-bit
    key per distinct in-watermark signature, evicted by
    ``dropDuplicatesWithinWatermark`` exactly like the exact-hash gate.

    **Hamming 1-3** (``max_hamming`` in 1..3): a document is suppressed
    when ANY previously seen in-watermark document's signature is
    within ``max_hamming`` bits — the batch
    ``dedup.simhash_near_dups`` contract replayed causally.
    Checking against all SEEN docs (not just survivors) gives
    chain-collapse: a→b→c chains where only adjacent links are near
    collapse to the first arrival, exactly what batch
    connected-components collapse produces for causally ordered
    fixtures (a late edge joining two already-emitted components is the
    one case streaming cannot retract — same re-admission trade as the
    watermark itself, documented and tested). Built on ``foreachBatch``
    rather than a keyed-state UDF because banding needs TWO stateful
    shapes at once — per-band candidate buckets and a per-doc verdict —
    which chained streaming state cannot express bounded, while a
    per-micro-batch join against a versioned signature table keeps the
    whole thing Catalyst-planned: candidates come from an equi-join on
    pigeonhole chunks (``dedup.simhash_chunks`` — the SAME banding as
    batch), verified with JVM-side ``bit_count(xor)``; the state table
    holds one (simhash, fetch_ts) row per seen doc inside the
    watermark, evicted when ``max(event time seen) - delay`` passes,
    and is versioned per micro-batch id so failure-replay is
    idempotent (re-running batch N rewrites ``state/batch=N`` and
    ``out/batch=N`` deterministically from ``state/batch=N-1``).
    ``max_bucket_size`` guards the chunk join like the batch operator
    (identical-signature cliques belong to the hamming-0 rung / exact
    dedup, not the banding join).

    Output rows: (doc_id, fetch_ts, lang, simhash, n_tokens), first
    arrival per signature (h0) / per near-dup chain (h1-3) in arrival
    order; the hamming rung's output lands under ``out/batch=N/``
    (read the root with ``spark.read.parquet(out_dir)``).
    """
    from crawler_spark.operators.dedup import with_portable_simhash

    src = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    if not 0 <= max_hamming <= 3:
        raise ValueError("max_hamming must be in [0, 3]")
    if max_hamming == 0:
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

    delay_s = _watermark_seconds(watermark)
    state_root = os.path.join(checkpoint_dir, "neardup_state")
    sigs = with_portable_simhash(src).withColumn(
        "n_tokens", ws_token_count(F.col("text"))
    )

    def _process(batch_df, batch_id):
        _near_dedup_batch(
            batch_df, batch_id, out_dir, state_root,
            max_hamming=max_hamming, delay_s=delay_s,
            max_bucket_size=max_bucket_size,
        )

    writer = (
        sigs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _state_versions(
    spark: SparkSession, state_root: str, committed_only: bool = True
) -> list[int]:
    """Batch versions present under ``state_root``, via the Hadoop
    FileSystem API so hdfs:// and s3a:// checkpoint dirs work — a
    driver-local ``glob`` would silently see nothing on a remote
    checkpoint and restart every micro-batch from empty state (no
    error, just no cross-batch suppression). ``committed_only`` keeps
    versions with a ``_SUCCESS`` marker (read path); GC clears
    uncommitted leftovers too."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_root)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return []
    vers = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch=")):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if committed_only and not fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        ):
            continue
        vers.append(v)
    return sorted(vers)


def _delete_state_version(
    spark: SparkSession, state_root: str, version: int
) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(
        os.path.join(state_root, f"batch={version}")
    )
    fs = p.getFileSystem(conf)
    fs.delete(p, True)  # recursive; best-effort like the old rmtree


def _latest_state(spark: SparkSession, state_root: str, before: int):
    """Newest committed state version strictly below ``before`` (the
    micro-batch being (re)computed must read its PREDECESSOR's state,
    even on failure replay)."""
    vers = [
        v for v in _state_versions(spark, state_root) if v < before
    ]
    if not vers:
        return None
    return os.path.join(state_root, f"batch={max(vers)}")


def _near_dedup_batch(
    batch_df,
    batch_id: int,
    out_dir: str,
    state_root: str,
    max_hamming: int,
    delay_s: int,
    max_bucket_size: int | None,
) -> None:
    """One micro-batch of the hamming 1-3 rung (see
    :func:`streamed_near_dedup`). Pure function of (predecessor state,
    batch rows) — idempotent under Structured Streaming's
    failure-replay of a batch id."""
    from pyspark.sql import Window

    from crawler_spark.operators.dedup import simhash_chunks

    spark = batch_df.sparkSession
    rows = batch_df.select(
        "doc_id", "fetch_ts", "lang", "simhash", "n_tokens"
    ).localCheckpoint()  # one materialization; joined three ways below

    prev_path = _latest_state(spark, state_root, batch_id)
    # state keeps doc_id so "earlier" is ONE total order — (fetch_ts,
    # doc_id), the batch simhash_near_dups / oracle tie-break — applied
    # uniformly to state and batch rows. Erasing doc_id here would make
    # every state row precede every equal-fetch_ts batch row, silently
    # diverging from the pinned contract whenever equal event times
    # straddle a micro-batch boundary.
    state_schema = "doc_id bigint, simhash bigint, fetch_ts timestamp"
    state = (
        spark.read.schema(state_schema).parquet(prev_path)
        if prev_path is not None
        else spark.createDataFrame([], state_schema)
    )

    # watermark: max event time ever seen (state carries its own high
    # water) minus the delay; state entries below it evict NOW, so the
    # comparison set is exactly the in-watermark seen set
    hi = rows.agg(F.max("fetch_ts").alias("m")).collect()[0]["m"]
    shi = state.agg(F.max("fetch_ts").alias("m")).collect()[0]["m"]
    high = max(t for t in (hi, shi) if t is not None) if (hi or shi) else None
    if high is not None:
        cut = F.lit(high) - F.expr(f"INTERVAL {delay_s} SECONDS")
        state = state.where(F.col("fetch_ts") >= cut)

    # candidate generation: equi-join on pigeonhole chunks — batch rows
    # vs (prior state ∪ strictly-earlier rows of this batch)
    def chunked(df, cols):
        return df.select(
            *cols, F.explode(simhash_chunks(max_hamming)).alias("c")
        ).select(*cols, "c.chunk", "c.val")

    probe = chunked(rows, ["doc_id", "fetch_ts", "simhash"])
    prior = chunked(
        state, ["doc_id", "fetch_ts", "simhash"]
    ).unionByName(probe)
    if max_bucket_size is not None:
        w_b = Window.partitionBy("chunk", "val")
        prior = (
            prior.withColumn("_bsz", F.count("*").over(w_b))
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    a, b = prior.alias("a"), probe.alias("b")
    # the batch-contract total order; an already-emitted state row that
    # this order places LATER than a new equal-fetch_ts arrival cannot
    # be retracted (both rows emit — the downstream batch dedup stage
    # catches it), the same trade as watermark re-admission
    earlier = (F.col("a.fetch_ts") < F.col("b.fetch_ts")) | (
        (F.col("a.fetch_ts") == F.col("b.fetch_ts"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    dup_ids = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & earlier,
        )
        .where(ham <= max_hamming)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    survivors = rows.join(dup_ids, "doc_id", "left_anti")
    survivors.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}")
    )
    # seen-semantics state: every batch row's signature joins the set
    # (writes to batch=N while reading batch=N-1 — never in-place)
    state.unionByName(
        rows.select("doc_id", "simhash", "fetch_ts")
    ).write.mode("overwrite").parquet(
        os.path.join(state_root, f"batch={batch_id}")
    )
    # GC superseded state versions (best-effort; only versions BELOW
    # the predecessor — a replay of batch N still needs N-1). Hadoop FS
    # delete, not shutil: the checkpoint dir may be hdfs:// or s3a://.
    for v in _state_versions(spark, state_root, committed_only=False):
        if v < batch_id - 1:
            _delete_state_version(spark, state_root, v)
