"""Streaming document curation: quality gate + content-hash
first-arrival dedup, with watermark-bounded state (re-admission past the
watermark is the documented trade, same as the frontier ingest)."""

import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.streaming.curation import streamed_doc_curation

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "with many of the other animals that live in the forest today"
)
GOOD2 = (
    "a second perfectly ordinary document that is long enough to pass "
    "the length factor and contains the usual mix of common words"
)
JUNK = "!!! ??? ***"  # punct-saturated → score 0


def _write_docs(path, rows, fname):
    pdf = pd.DataFrame(rows, columns=["doc_id", "fetch_ts", "lang", "text"])
    pdf["fetch_ts"] = pd.to_datetime(pdf["fetch_ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(path, f"{fname}.parquet"), index=False)


def test_gate_and_first_arrival_dedup(spark, tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    _write_docs(d, [
        (1, t(0), "en", GOOD),
        (2, t(1), "en", JUNK),        # gated out
        (3, t(2), "en", GOOD),        # dup of 1 → dropped
        (4, t(3), "en", GOOD2),
    ], "b0")
    q = streamed_doc_curation(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        watermark="1 hour", min_score=0.25,
    )
    q.awaitTermination()
    out = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("doc_id").toPandas()
    )
    assert out["doc_id"].tolist() == [1, 4]
    assert (out["score"] >= 0.25).all()


def test_state_is_watermark_bounded(spark, tmp_path):
    """A duplicate arriving beyond the watermark re-admits — the state
    eviction that keeps the operator viable on an unbounded stream."""
    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    # each run is one micro-batch; the watermark produced by a batch only
    # takes effect (and evicts state) from the NEXT batch on, so the
    # duplicate needs an intervening batch to advance the clock past
    # doc 1's expiry before it can re-admit
    def run():
        q = streamed_doc_curation(
            spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            watermark="10 seconds", min_score=0.25,
        )
        q.awaitTermination()

    _write_docs(d, [(1, t(0), "en", GOOD)], "b0")
    run()
    _write_docs(d, [(3, t(3600), "en", GOOD2)], "b1")  # advances watermark
    run()
    _write_docs(d, [(2, t(3601), "en", GOOD)], "b2")  # dup, 1 h later
    run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]


def test_portable_hash_matches_batch_md5(spark, tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write_docs(d, [(1, TS0, "en", GOOD), (2, TS0, "en", GOOD2)], "b0")
    q = streamed_doc_curation(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        portable_hash=True,
    )
    q.awaitTermination()
    got = {
        r.doc_id: r.content_hash
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        r.doc_id: r.h
        for r in spark.read.parquet(d)
        .select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert got == want


def test_stream_near_dedup_collapses_reordered_text(spark, tmp_path):
    """The simhash-keyed stream drops a later arrival whose BYTES differ
    but whose token multiset is identical (reversed order, doubled
    whitespace) — the case the exact content-hash gate passes — while
    genuinely different docs survive."""
    from crawler_spark.streaming.curation import streamed_near_dedup

    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    reordered = "  ".join(reversed(GOOD.split(" ")))
    assert reordered != GOOD  # different bytes
    _write_docs(d, [
        (1, t(0), "en", GOOD),
        (2, t(1), "en", GOOD2),
        (3, t(2), "en", reordered),   # near-dup of 1 → dropped
        (4, t(3), "en", GOOD + " extrasignalword"),  # real change → kept
    ], "b0")
    q = streamed_near_dedup(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ck"),
        watermark="1 hour",
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 4]
    # the survivor carries the shared signature doc 3 collided with
    sig = {r.doc_id: r.simhash for r in out.collect()}
    assert sig[1] != sig[4]
