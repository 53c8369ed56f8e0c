"""Checkpoint/resume: interrupt after k rounds, resume, byte-equal result.

SURVEY.md §5.4 + north rule "resumable from checkpoint with per-partition
lineage". The interrupted run is simulated by capping ``max_rounds``; a
crashed (uncommitted) round is simulated by writing orphan table dirs with
no manifest — ``resume_round`` must discard them.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from crawler_spark.crawl.driver import run_crawl
from crawler_spark.crawl.store import CrawlStore
from crawler_spark.fixtures.webgen import generate
from crawler_spark.oracle.crawloracle import CrawlConfig
from tests.test_crawl_golden import _to_spark_corpus


@pytest.fixture(scope="module")
def web():
    return generate(seed=11, n_pages=80)


def _cfg(w, max_rounds=60):
    return CrawlConfig(
        budgets={r.host: int(r.budget_per_round) for r in w.politeness.itertuples()},
        robots=[(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()],
        max_rounds=max_rounds,
    )


def _final_state(store):
    pages = sorted(
        map(
            tuple,
            store.read_pages()
            .toPandas()[["round", "seq", "url", "host", "status", "type"]]
            .itertuples(index=False),
        )
    )
    text = sorted(
        map(tuple, store.read_page_text().toPandas()[["url", "text"]].itertuples(index=False))
    )
    return pages, text


def test_interrupt_resume_byte_equal(spark, web, tmp_path):
    corpus = _to_spark_corpus(spark, web.pages)
    seeds = web.seeds.url.tolist()

    # uninterrupted run
    root_a = str(tmp_path / "full")
    run_crawl(spark, corpus, seeds, _cfg(web), root_a, bloom_buckets=4,
              bloom_bits=1 << 15)
    store_a = CrawlStore(spark, root_a)

    # interrupted after 4 rounds …
    root_b = str(tmp_path / "resumed")
    run_crawl(spark, corpus, seeds, _cfg(web, max_rounds=4), root_b,
              bloom_buckets=4, bloom_bits=1 << 15)
    store_b = CrawlStore(spark, root_b)
    assert store_b.committed_rounds() == [0, 1, 2, 3]

    # … plus a crashed round 4: orphan dirs, NO manifest
    orphan = os.path.join(root_b, "pages", "round=4")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
        f.write("corrupt")

    # resume to completion
    run_crawl(spark, corpus, seeds, _cfg(web), root_b, bloom_buckets=4,
              bloom_bits=1 << 15, resume=True)

    assert _final_state(store_b) == _final_state(store_a)
    assert store_b.committed_rounds() == store_a.committed_rounds()


def test_merge_on_read_frontier_equals_snapshot(spark, web, tmp_path):
    """The scale-path frontier reconstruction (discoveries ⟕̸ pages) equals
    the per-round snapshot."""
    corpus = _to_spark_corpus(spark, web.pages)
    root = str(tmp_path / "mor")
    run_crawl(spark, corpus, web.seeds.url.tolist(), _cfg(web, max_rounds=5),
              root, bloom_buckets=4, bloom_bits=1 << 15)
    store = CrawlStore(spark, root)
    last = store.committed_rounds()[-1]
    from crawler_spark.crawl.store import DISC_SCHEMA

    snap = store.read_snapshot("frontier", last, DISC_SCHEMA).toPandas()
    mor = store.rebuild_frontier(last).toPandas()
    key = ["disc_round", "disc_seq", "url", "host"]
    assert sorted(map(tuple, snap[key].itertuples(index=False))) == sorted(
        map(tuple, mor[key].itertuples(index=False))
    )


def test_frontier_snapshot_interval_equal_and_resumable(spark, web, tmp_path):
    """frontier_snapshot_every=3: identical crawl result, and resuming
    from a round WITHOUT a frontier snapshot rebuilds it from the logs."""
    corpus = _to_spark_corpus(spark, web.pages)
    seeds = web.seeds.url.tolist()

    root_a = str(tmp_path / "every1")
    run_crawl(spark, corpus, seeds, _cfg(web), root_a, bloom_buckets=4,
              bloom_bits=1 << 15)
    store_a = CrawlStore(spark, root_a)

    root_b = str(tmp_path / "every3")
    run_crawl(spark, corpus, seeds, _cfg(web, max_rounds=5), root_b,
              bloom_buckets=4, bloom_bits=1 << 15,
              frontier_snapshot_every=3)
    store_b = CrawlStore(spark, root_b)
    # round 4 committed without a frontier snapshot (only rounds 0, 3)
    assert not os.path.isdir(store_b.table_round_path("frontier", 4))
    assert store_b.read_manifest(4)["lineage"]["frontier"] == []

    run_crawl(spark, corpus, seeds, _cfg(web), root_b, bloom_buckets=4,
              bloom_bits=1 << 15, resume=True, frontier_snapshot_every=3)
    assert _final_state(store_b) == _final_state(store_a)


def test_round_commit_abort_drains_writers_no_manifest(spark, tmp_path):
    """A round-body failure between begin() and finish() must DRAIN the
    in-flight fetch-side writers before the exception unwinds (otherwise
    a same-session resume races its orphan cleanup against live writers)
    — and must leave no manifest, so the round stays invisible."""
    import os

    from crawler_spark.crawl.driver import (
        _RoundCommit,
        _empty_links,
        _empty_pages,
    )
    from crawler_spark.crawl.store import CrawlStore

    store = CrawlStore(spark, str(tmp_path))
    rc = _RoundCommit(store, 0, spark, 8)
    rc.begin(_empty_pages(spark), _empty_links(spark))
    rc.abort()
    assert all(f.done() for f in rc._f.values())
    assert rc._pool._shutdown
    assert os.listdir(os.path.join(str(tmp_path), "manifests")) == []
