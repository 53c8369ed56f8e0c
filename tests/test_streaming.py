"""Structured-Streaming ingest: exactly-once dedup across restarts,
windowed round metrics, and the stateful per-host budget operator."""

import datetime as dt
import os

import pytest

from crawler_spark.streaming.ingest import (
    host_budget_stream,
    round_metrics_stream,
    streamed_frontier_ingest,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_links(spark, path, rows, fname):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["url", "host", "disc_ts"])
    pdf["disc_ts"] = pd.to_datetime(pdf["disc_ts"]).astype("datetime64[us]")
    # one flat .parquet file — the file-stream source lists files, not
    # nested batch-output directories
    pdf.to_parquet(os.path.join(path, f"{fname}.parquet"), index=False)


def _links_dir(spark, tmp_path, batches):
    d = str(tmp_path / "links")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        _write_links(spark, d, rows, f"batch{i}")
    return d


def test_stream_dedup_exactly_once_across_restarts(spark, tmp_path):
    d = str(tmp_path / "links")
    os.makedirs(d)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        ("http://a.test/1", "a.test", TS0),
        ("http://a.test/1", "a.test", TS0),  # in-batch dup
        ("http://b.test/1", "b.test", TS0),
    ]
    _write_links(spark, d, rows1, "b0")
    q = streamed_frontier_ingest(spark, d, out, ckpt)
    q.awaitTermination()
    got1 = {r.url for r in spark.read.parquet(out).collect()}
    assert got1 == {"http://a.test/1", "http://b.test/1"}

    # restart with new files: an already-seen url must NOT be re-admitted
    rows2 = [
        ("http://a.test/1", "a.test", TS0 + dt.timedelta(minutes=5)),
        ("http://c.test/1", "c.test", TS0 + dt.timedelta(minutes=5)),
    ]
    _write_links(spark, d, rows2, "b1")
    q = streamed_frontier_ingest(spark, d, out, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # a/1 deduped across the restart via checkpoint
    assert {r.url for r in rows} == {
        "http://a.test/1", "http://b.test/1", "http://c.test/1"
    }


def test_round_metrics_windows(spark, tmp_path):
    # append-mode windowed aggs emit a window only once the watermark has
    # passed its end: the sentinel at +3h closes the first two windows;
    # its own window stays open and must NOT be emitted.
    d = _links_dir(spark, tmp_path, [[
        ("http://a.test/1", "a.test", TS0),
        ("http://a.test/2", "a.test", TS0 + dt.timedelta(minutes=10)),
        ("http://a.test/3", "a.test", TS0 + dt.timedelta(hours=1)),
        ("http://b.test/1", "b.test", TS0),
        ("http://z.test/sentinel", "z.test", TS0 + dt.timedelta(hours=3)),
    ]])
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = round_metrics_stream(spark, d, out, ckpt, watermark="0 seconds")
    q.awaitTermination()
    got = {
        (r.round_start, r.host): r.n_discovered
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (TS0, "a.test"): 2,
        (TS0 + dt.timedelta(hours=1), "a.test"): 1,
        (TS0, "b.test"): 1,
    }


def test_host_budget_state_survives_batches(spark, tmp_path):
    d = str(tmp_path / "links")
    os.makedirs(d)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    _write_links(spark, d, [
        ("http://h.test/%d" % i, "h.test", TS0 + dt.timedelta(seconds=i))
        for i in range(4)
    ], "b0")
    q = host_budget_stream(spark, d, out, ckpt, budget_per_host=5)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 4

    # second run: budget state (4 emitted) persists via checkpoint →
    # only 1 of the next 3 urls admitted
    _write_links(spark, d, [
        ("http://h.test/x%d" % i, "h.test",
         TS0 + dt.timedelta(minutes=1, seconds=i))
        for i in range(3)
    ], "b1")
    q = host_budget_stream(spark, d, out, ckpt, budget_per_host=5)
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    assert sorted(r.admit_seq for r in rows) == [0, 1, 2, 3, 4]
    assert all(r.host == "h.test" for r in rows)


def test_host_session_stream_matches_batch_sessions(spark, tmp_path):
    from crawler_spark.streaming.ingest import host_session_stream

    rows = [
        # burst 1 on a.test: 3 events within 10 min
        ("http://a.test/1", "a.test", TS0),
        ("http://a.test/2", "a.test", TS0 + dt.timedelta(minutes=5)),
        ("http://a.test/3", "a.test", TS0 + dt.timedelta(minutes=10)),
        # 45-min silence → new session
        ("http://a.test/4", "a.test", TS0 + dt.timedelta(minutes=55)),
        # b.test single-event session
        ("http://b.test/1", "b.test", TS0 + dt.timedelta(minutes=2)),
        # far-future sentinel pushes the watermark past all sessions so
        # append mode emits them in the availableNow drain
        ("http://z.test/1", "z.test", TS0 + dt.timedelta(days=2)),
    ]
    d = _links_dir(spark, tmp_path, [rows])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = host_session_stream(spark, d, out, ckpt, gap="30 minutes",
                            watermark="1 hour")
    q.awaitTermination()
    got = {
        (r.host, r.sess_start, r.sess_end): r.n_discovered
        for r in spark.read.parquet(out).collect()
    }
    assert got[("a.test", TS0, TS0 + dt.timedelta(minutes=40))] == 3
    assert got[
        ("a.test", TS0 + dt.timedelta(minutes=55),
         TS0 + dt.timedelta(minutes=85))
    ] == 1
    assert got[
        ("b.test", TS0 + dt.timedelta(minutes=2),
         TS0 + dt.timedelta(minutes=32))
    ] == 1
