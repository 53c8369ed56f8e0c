"""Structured-Streaming variant of the frontier ingest.

The reference's queue is a poll loop (``crawl.ts:41-71``); the batch
engine re-expresses it as round-synchronous BFS (SURVEY §2.9 T1). This
module adds the streaming-native shape for deployments where link
discoveries arrive continuously (e.g. a fetcher fleet appending parquet
files):

- ``streamed_frontier_ingest`` — exactly-once, checkpointed URL dedup:
  readStream over the discoveries directory → watermark → global
  ``dropDuplicates`` on canonical url (state pruned by the watermark) →
  parquet sink. The streaming twin of the bloom/anti-join seen-set (J1):
  re-running with the same checkpoint never re-admits a url.
- ``round_metrics_stream`` — tumbling-window per-host discovery counts
  (the streaming twin of the per-round metrics manifest, T3).
- ``host_budget_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-host cumulative admission budget (the
  politeness budget T2 with state that survives across micro-batches).
  Rows beyond the host's lifetime budget are dropped; state is one long
  per host.

All queries default to ``trigger(availableNow=True)`` so the same code
runs as a drain-the-backlog batch job (how the tests drive it) or as a
continuous micro-batch stream (omit the trigger).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DISC_STREAM_SCHEMA = "url string, host string, disc_ts timestamp"


def streamed_frontier_ingest(
    spark: SparkSession,
    links_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Start the dedup ingest; returns the StreamingQuery.

    Dedup state is keyed by url and pruned past the watermark — bounded
    state for an unbounded stream, which is what makes this viable at
    10^10-URL scale (the full-history exact set stays in the batch table;
    the stream only needs the in-watermark window to be exactly-once).

    ``dropDuplicatesWithinWatermark`` is load-bearing: plain
    ``dropDuplicates(["url"])`` only evicts state when the event-time
    column is PART of the dedup key, so url-only state would grow without
    bound. The within-watermark variant keys state by url and expires
    each entry one watermark delay after its event time — duplicates
    farther apart than the watermark re-admit (and the batch-side exact
    seen set catches them), which is the documented trade."""
    src = (
        spark.readStream.schema(DISC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(links_dir)
    )
    deduped = (
        src.withWatermark("disc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
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


def round_metrics_stream(
    spark: SparkSession,
    links_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Tumbling-window (streaming 'round') per-host discovery counts."""
    src = spark.readStream.schema(DISC_STREAM_SCHEMA).parquet(links_dir)
    agg = (
        src.withWatermark("disc_ts", watermark)
        .groupBy(F.window("disc_ts", window).alias("round"), "host")
        .agg(F.count("*").alias("n_discovered"))
        .select(
            F.col("round.start").alias("round_start"),
            "host",
            "n_discovered",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_session_stream(
    spark: SparkSession,
    links_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Per-host SESSION windows over the discovery stream: bursts of
    discoveries separated by ≥ ``gap`` of silence become one session row
    (host, sess_start, sess_end, n_discovered). The native
    ``session_window`` operator keeps per-(host, open-session) state and
    the watermark closes/evicts sessions — the streaming twin of the
    batch ``session_windows`` query (same operator, same semantics)."""
    src = spark.readStream.schema(DISC_STREAM_SCHEMA).parquet(links_dir)
    agg = (
        src.withWatermark("disc_ts", watermark)
        .groupBy("host", F.session_window("disc_ts", gap).alias("w"))
        .agg(F.count("*").alias("n_discovered"))
        .select(
            "host",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_discovered",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


BUDGET_OUT_SCHEMA = "url string, host string, disc_ts timestamp, admit_seq long"
BUDGET_STATE_SCHEMA = "emitted long"


def _budget_fn(budget: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (emitted,) = state.get if state.exists else (0,)
        if emitted < budget:
            # the group arrives as an ITERATOR of Arrow chunks — a
            # per-chunk sort would admit the earliest rows of whichever
            # chunk streams in first, not the globally earliest
            # (disc_ts, url) rows, and a task retry could admit a
            # different subset. Concatenate first: memory is bounded by
            # this host's slice of the micro-batch, which the task
            # already holds.
            pdf = pd.concat(list(pdfs), ignore_index=True)
            pdf = pdf.sort_values(["disc_ts", "url"], kind="mergesort")
            take = pdf.head(budget - emitted).copy()
            take["admit_seq"] = range(emitted, emitted + len(take))
            emitted += len(take)
            yield take[["url", "host", "disc_ts", "admit_seq"]]
        state.update((emitted,))

    return fn


def host_budget_stream(
    spark: SparkSession,
    links_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    budget_per_host: int,
    available_now: bool = True,
):
    """Custom stateful operator: admit at most ``budget_per_host`` urls
    per host over the stream's lifetime (state = one counter per host,
    maintained by ``applyInPandasWithState``)."""
    src = spark.readStream.schema(DISC_STREAM_SCHEMA).parquet(links_dir)
    admitted = src.groupBy("host").applyInPandasWithState(
        _budget_fn(budget_per_host),
        BUDGET_OUT_SCHEMA,
        BUDGET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        admitted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
