"""Change-rate estimator (Cho–Garcia-Molina) + plan shape."""

import math

import pytest
from pyspark.sql import functions as F


def _caps(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, ts_s string, digest string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_change_rate_estimator_values(spark):
    from crawler_spark.operators.freshness import change_rates

    rows = [
        # page A: 5 captures, hourly, 2 changes
        ("a", "2024-01-01 00:00:00", "d1"),
        ("a", "2024-01-01 01:00:00", "d1"),
        ("a", "2024-01-01 02:00:00", "d2"),
        ("a", "2024-01-01 03:00:00", "d2"),
        ("a", "2024-01-01 04:00:00", "d3"),
        # page B: never changes -> rate 0, revisit = band max
        ("b", "2024-01-01 00:00:00", "x"),
        ("b", "2024-01-02 00:00:00", "x"),
        # page C: single capture -> rate unknown, revisit at band max
        # (it must still appear, or due_for_recrawl never refetches it)
        ("c", "2024-01-01 00:00:00", "y"),
        # page D: changes every capture, 1-minute spacing -> clamped to min
        ("d", "2024-01-01 00:00:00", "1"),
        ("d", "2024-01-01 00:01:00", "2"),
        ("d", "2024-01-01 00:02:00", "3"),
    ]
    out = change_rates(_caps(spark, rows))
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"a", "b", "c", "d"}

    n, x, avg = 4, 2, 3600.0
    lam = -math.log((n - x + 0.5) / (n + 0.5)) / avg
    assert got["a"].n_captures == 5 and got["a"].n_changes == 2
    assert got["a"].rate_per_day == pytest.approx(lam * 86400, rel=1e-12)
    assert got["a"].revisit_seconds == pytest.approx(1 / lam, rel=1e-12)

    assert got["b"].rate_per_day == 0.0
    assert got["b"].revisit_seconds == 30 * 86400.0
    assert got["c"].n_captures == 1
    assert got["c"].rate_per_day == 0.0
    assert got["c"].revisit_seconds == 30 * 86400.0
    assert got["d"].revisit_seconds == 3600.0  # clamped to the floor

    # one url-keyed Exchange serves both the window and the aggregate
    # (AQE's toString repeats the plan under "== Initial Plan ==" — count
    # only the final section)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1


def test_change_rate_tiebreak_total_order(spark):
    """Equal timestamps: the tiebreak column decides the transition
    count deterministically."""
    from crawler_spark.operators.freshness import change_rates

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", "d1", 2),
            ("a", "2024-01-01 00:00:00", "d2", 1),
            ("a", "2024-01-02 00:00:00", "d2", 3),
        ],
        "url string, ts_s string, digest string, cap_id int",
    ).withColumn("warc_ts", F.to_timestamp("ts_s"))
    out = change_rates(df, tiebreak_col="cap_id").collect()[0]
    # order d2, d1, d2 -> 2 transitions
    assert out.n_changes == 2


def test_due_for_recrawl(spark):
    from crawler_spark.operators.freshness import due_for_recrawl

    rows = [
        # fast-changing page, last seen 01-02; revisit clamps to 1h
        ("fast", "2024-01-01 00:00:00", "1"),
        ("fast", "2024-01-01 12:00:00", "2"),
        ("fast", "2024-01-02 00:00:00", "3"),
        # unchanged page -> 30-day ceiling, not due
        ("slow", "2024-01-01 00:00:00", "x"),
        ("slow", "2024-01-02 00:00:00", "x"),
    ]
    caps = _caps(spark, rows)
    due = due_for_recrawl(caps, "2024-01-03 00:00:00")
    assert [r.url for r in due.collect()] == ["fast"]
    # a month later the unchanged page comes due too
    due2 = due_for_recrawl(caps, "2024-02-05 00:00:00")
    assert sorted(r.url for r in due2.collect()) == ["fast", "slow"]


def test_due_set_feeds_retraction_e2e(spark, tmp_path):
    """The documented composition end-to-end: crawl → capture history →
    due_for_recrawl → retract_urls → resume refetches exactly the due
    set (changed pages come due at their fast revisit interval,
    unchanged pages sit at the 30-day ceiling)."""
    from crawler_spark import (
        CrawlConfig,
        CrawlStore,
        due_for_recrawl,
        retract_urls,
        run_crawl,
    )
    from crawler_spark.fixtures.doccorpus import corpus_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = corpus_from_documents(docs).cache()
    seeds = [
        r.url for r in corpus.select("url").orderBy("url").limit(2).collect()
    ]
    root = str(tmp_path / "store")
    run_crawl(
        spark, corpus, seeds, CrawlConfig(budgets={"*": 50}, max_rounds=2),
        root, bloom_buckets=8, bloom_bits=1 << 16,
    )
    store = CrawlStore(spark, root)
    pages = store.read_pages().select("url").distinct().cache()
    victims = sorted(r.url for r in pages.orderBy("url").limit(2).collect())

    # two captures a day apart; only the victims changed digests
    c1 = pages.select(
        "url",
        F.lit("2024-01-01 00:00:00").alias("ts_s"),
        F.lit("d1").alias("digest"),
    )
    c2 = pages.select(
        "url",
        F.lit("2024-01-02 00:00:00").alias("ts_s"),
        F.when(F.col("url").isin(victims), F.lit("d2"))
        .otherwise(F.lit("d1"))
        .alias("digest"),
    )
    caps = c1.union(c2).withColumn("warc_ts", F.to_timestamp("ts_s"))
    due = due_for_recrawl(caps, "2024-01-05 00:00:00")
    due_urls = sorted(r.url for r in due.collect())
    assert due_urls == victims

    retract_urls(spark, root, due_urls)
    run_crawl(
        spark, corpus, seeds, CrawlConfig(budgets={"*": 50}, max_rounds=4),
        root, bloom_buckets=8, bloom_bits=1 << 16, resume=True,
    )
    counts = (
        store.read_pages().groupBy("url").count().toPandas()
        .set_index("url")["count"].to_dict()
    )
    for u, n in counts.items():
        assert n == (2 if u in due_urls else 1), (u, n)


def test_snapshot_diff_statuses_and_hash_paths_agree(spark):
    """CDC statuses are exact on a crafted old/new pair, and the
    production xxhash64 path agrees with the portable md5 path."""
    from crawler_spark.operators.freshness import snapshot_diff

    old = spark.createDataFrame(
        [("a", "same"), ("b", "will change"), ("c", "goes away"),
         ("e", None), ("f", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("a", "same"), ("b", "changed now"), ("d", "brand new"),
         ("e", "filled in"), ("f", None)],
        "url string, text string",
    )
    want = {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
        "e": "changed",  # null -> text is a CHANGE, not an add
        "f": "unchanged",  # null on both sides
    }
    got = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert got == want
    portable = {
        r.url: r.status
        for r in snapshot_diff(old, new, portable=True).collect()
    }
    assert portable == want
