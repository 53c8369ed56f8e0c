"""Golden end-to-end crawl tests: Spark engine ≡ pure-Python oracle.

Implements the north-rule correctness gate: same crawl ordering, same
URL-seen set, same cooldown behavior, and byte-identical extracted text per
url, under an identical seed list + politeness budget (SURVEY.md §5.2).
"""

import pandas as pd
import pytest
from pyspark.sql import types as T

from crawler_spark.crawl.driver import run_crawl
from crawler_spark.crawl.store import CrawlStore
from crawler_spark.fixtures.webgen import generate
from crawler_spark.oracle.crawloracle import (
    CrawlConfig,
    crawl_oracle,
    fifo_reference_oracle,
)

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("retry_after", T.IntegerType()),
    ]
)


def _to_spark_corpus(spark, pages: pd.DataFrame):
    pdf = pages.copy()
    pdf["retry_after"] = pdf["retry_after"].astype(object).where(
        pdf["retry_after"].notna(), None
    )
    return spark.createDataFrame(pdf, CORPUS_SCHEMA)


@pytest.fixture(scope="module")
def small_web():
    return generate(seed=7, n_pages=120)


@pytest.fixture(scope="module")
def crawl_outputs(spark, small_web, tmp_path_factory):
    w = small_web
    cfg = CrawlConfig(
        budgets={r.host: int(r.budget_per_round) for r in w.politeness.itertuples()},
        robots=[(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()],
        max_rounds=60,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, cfg)

    root = str(tmp_path_factory.mktemp("crawlstore"))
    corpus = _to_spark_corpus(spark, w.pages)
    stats = run_crawl(spark, corpus, seeds, cfg, root, bloom_buckets=8,
                      bloom_bits=1 << 16)
    store = CrawlStore(spark, root)
    return w, cfg, oracle, store, stats


def test_crawl_order_exact(crawl_outputs):
    _w, _cfg, oracle, store, _stats = crawl_outputs
    got = (
        store.read_pages()
        .toPandas()
        .sort_values(["round", "seq"])
        .reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(["round", "seq"]).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    cols = ["round", "seq", "url", "host", "status", "type"]
    got_t = list(map(tuple, got[cols].itertuples(index=False)))
    want_t = list(map(tuple, want[cols].itertuples(index=False)))
    assert got_t == want_t


def test_seen_set_exact(crawl_outputs):
    _w, _cfg, oracle, store, _stats = crawl_outputs
    got = sorted(r["url"] for r in store.read_pages().select("url").collect())
    assert got == oracle.seen.canon_url.tolist()


def test_links_table_exact(crawl_outputs):
    _w, _cfg, oracle, store, _stats = crawl_outputs
    got = store.read_links().toPandas()
    cols = ["round", "source", "source_host", "url", "host", "link_pos"]
    got_set = sorted(map(tuple, got[cols].itertuples(index=False)))
    want_set = sorted(map(tuple, oracle.links[cols].itertuples(index=False)))
    assert got_set == want_set


def test_cooldown_events_exact(crawl_outputs):
    _w, _cfg, oracle, store, _stats = crawl_outputs
    got = []
    for rnd in store.committed_rounds():
        m = store.read_manifest(rnd)
        for h, e in m["metrics"]["cooldown_events"]:
            got.append((rnd, h, e))
    want = sorted(map(tuple, oracle.cooldown_events.itertuples(index=False)))
    assert sorted(got) == want


def test_extracted_text_byte_identical(crawl_outputs):
    """The per-row invariant from BASELINE.json:input_hint."""
    w, _cfg, oracle, store, _stats = crawl_outputs
    got = {
        r["url"]: r["text"] for r in store.read_page_text().collect()
    }
    # vs oracle (engine pipeline parity)
    want = dict(zip(oracle.text.url, oracle.text.text))
    assert got == want
    # vs the corpus golden text column (generator-time extraction parity)
    golden = dict(zip(w.pages.url, w.pages.text))
    for url, text in got.items():
        assert text == golden[url], url


def test_round_model_equals_reference_fifo_order(spark, small_web):
    """Unlimited budget + no cooldowns ⇒ the round model visits URLs in
    exactly the reference's serial FIFO ``_id`` order (storage.ts:179)."""
    w = small_web
    corpus = w.pages[~w.pages.url.str.contains("slow-")].reset_index(drop=True)
    seeds = w.seeds.url.tolist()
    cfg = CrawlConfig(budgets={}, robots=[], max_rounds=60)
    rr = crawl_oracle(corpus, seeds, cfg)
    fifo = fifo_reference_oracle(corpus, seeds)
    assert (
        rr.crawl_order.sort_values(["round", "seq"]).url.tolist() == fifo
    )


def test_manifest_lineage_present(crawl_outputs):
    _w, _cfg, _oracle, store, stats = crawl_outputs
    rounds = store.committed_rounds()
    assert rounds == list(range(len(rounds)))  # contiguous
    for rnd in rounds:
        m = store.read_manifest(rnd)
        assert set(m["lineage"]) >= {"pages", "links", "discoveries",
                                     "frontier", "cooldown"}
        assert "scheduled" in m["metrics"]
    assert stats.pages == sum(
        store.read_manifest(r)["metrics"]["scheduled"] for r in rounds
    )


def test_priority_queue_with_capacity_golden(spark, small_web, tmp_path_factory):
    """North-rule priority queue: host-priority order + global round
    capacity, driver ≡ serial oracle on (round, seq, url) exactly; the
    priority config provably changes the schedule vs pure BFS."""
    from crawler_spark.functions.urls import get_hostname

    w = small_web
    hosts = sorted({get_hostname(u) for u in w.pages.url})
    # distinct scores AND deliberate ties (i % 3) so the BFS tie-break
    # inside equal-priority groups is exercised too
    prio = {h: float(i % 3) for i, h in enumerate(hosts)}
    cfg = CrawlConfig(
        budgets={
            r.host: int(r.budget_per_round)
            for r in w.politeness.itertuples()
        },
        robots=[(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()],
        max_rounds=18,
        priority=prio,
        round_capacity=9,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, cfg)

    # the feature must actually bite: same config minus priority/capacity
    # yields a different visit order
    bfs_cfg = CrawlConfig(
        budgets=cfg.budgets, robots=cfg.robots, max_rounds=18
    )
    bfs = crawl_oracle(w.pages, seeds, bfs_cfg)
    key = ["round", "seq"]
    assert (
        oracle.crawl_order.sort_values(key).url.tolist()
        != bfs.crawl_order.sort_values(key).url.tolist()
    )
    # capacity is a hard per-round cap
    assert (oracle.crawl_order.groupby("round").size() <= 9).all()

    root = str(tmp_path_factory.mktemp("priostore"))
    corpus = _to_spark_corpus(spark, w.pages)
    run_crawl(spark, corpus, seeds, cfg, root, bloom_buckets=8,
              bloom_bits=1 << 16)
    store = CrawlStore(spark, root)
    got = (
        store.read_pages()
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )


def test_global_budget_fair_share_golden(spark, small_web, tmp_path_factory):
    """Fair-share scheduler mode: one global round budget apportioned
    across hosts by Hamilton largest remainder (CrawlConfig.global_budget
    → operators.allocate.allocate_budget in the driver, hamilton_grants
    in the serial oracle). Driver ≡ oracle on (round, seq, url) exactly;
    the mode provably schedules differently from the strict-priority
    round_capacity cut at the same total."""
    w = small_web
    cfg = CrawlConfig(
        budgets={
            r.host: int(r.budget_per_round)
            for r in w.politeness.itertuples()
        },
        robots=[(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()],
        max_rounds=18,
        global_budget=9,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, cfg)

    # the global budget is a hard per-round page cap
    assert (oracle.crawl_order.groupby("round").size() <= 9).all()
    # fair share ≠ strict-priority capacity cut at the same total
    cap_cfg = CrawlConfig(
        budgets=cfg.budgets, robots=cfg.robots, max_rounds=18,
        round_capacity=9,
    )
    capped = crawl_oracle(w.pages, seeds, cap_cfg)
    key = ["round", "seq"]
    assert (
        oracle.crawl_order.sort_values(key).url.tolist()
        != capped.crawl_order.sort_values(key).url.tolist()
    )

    root = str(tmp_path_factory.mktemp("gbstore"))
    corpus = _to_spark_corpus(spark, w.pages)
    run_crawl(spark, corpus, seeds, cfg, root, bloom_buckets=8,
              bloom_bits=1 << 16)
    store = CrawlStore(spark, root)
    got = (
        store.read_pages()
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )


def test_hamilton_grants_match_allocate_budget(spark):
    """The serial and distributed apportionments are the same function:
    identical grants on a demand table with remainder ties."""
    from crawler_spark.operators.allocate import allocate_budget
    from crawler_spark.oracle.crawloracle import hamilton_grants

    demand = {f"h{i}": (i * 7) % 11 for i in range(16)}  # includes zeros
    for budget in (1, 5, 23, 60, 500):
        want = hamilton_grants(demand, budget)
        pend = spark.createDataFrame(
            sorted(demand.items()), "host string, n_pending long"
        )
        got = {
            r.host: r.granted
            for r in allocate_budget(pend, budget).collect()
        }
        assert got == want, (budget, got, want)


def test_global_budget_composes_with_priority_golden(
    spark, small_web, tmp_path_factory
):
    """Fair-share grants + host-priority ordering together: the grant
    bounds WHICH urls each host contributes (BFS within host), priority
    orders the granted set. Driver ≡ serial oracle row-for-row."""
    from crawler_spark.functions.urls import get_hostname

    w = small_web
    hosts = sorted({get_hostname(u) for u in w.pages.url})
    cfg = CrawlConfig(
        budgets={
            r.host: int(r.budget_per_round)
            for r in w.politeness.itertuples()
        },
        robots=[(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()],
        max_rounds=15,
        priority={h: float(i % 4) for i, h in enumerate(hosts)},
        global_budget=8,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, cfg)
    assert (oracle.crawl_order.groupby("round").size() <= 8).all()

    root = str(tmp_path_factory.mktemp("gbprio"))
    corpus = _to_spark_corpus(spark, w.pages)
    run_crawl(spark, corpus, seeds, cfg, root, bloom_buckets=8,
              bloom_bits=1 << 16)
    store = CrawlStore(spark, root)
    key = ["round", "seq"]
    got = store.read_pages().toPandas().sort_values(key).reset_index(drop=True)
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )


def test_priority_fusion_golden(spark, small_web, tmp_path_factory):
    """--priority-fusion wiring (operators.graphrank.fused_host_priority):
    RRF-fused (pagerank, trust, reputation) host priorities drive the
    crawl; driver ≡ serial oracle row-for-row under the fused dict, and
    the fused order differs from BFS and from the pagerank-only order
    (the fusion actually bites)."""
    from crawler_spark.functions.urls import get_hostname
    from crawler_spark.operators.graphrank import (
        fused_host_priority,
        host_ranks_from_links,
    )

    w = small_web
    seeds = w.seeds.url.tolist()
    budgets = {
        r.host: int(r.budget_per_round) for r in w.politeness.itertuples()
    }
    robots = [(r.host, r.rule, bool(r.allow)) for r in w.robots.itertuples()]
    # session 1 (BFS) supplies the link graph + text the signals feed on
    first = crawl_oracle(
        w.pages, seeds, CrawlConfig(budgets=budgets, robots=robots,
                                    max_rounds=20)
    )
    links_sdf = spark.createDataFrame(first.links)
    text_pdf = first.text.copy()
    text_pdf["host"] = [get_hostname(u) for u in text_pdf.url]
    pages_text = spark.createDataFrame(text_pdf[["host", "url", "text"]])
    seed_hosts = sorted({get_hostname(u) for u in seeds})

    fused = fused_host_priority(
        links_sdf,
        ["pagerank", "trust", "reputation"],
        seed_hosts=seed_hosts,
        pages_text=pages_text,
    )
    assert fused, "fusion produced no hosts"
    pr_only = host_ranks_from_links(links_sdf)

    def oracle_order(prio):
        cfg = CrawlConfig(budgets=budgets, robots=robots, max_rounds=20,
                          priority=prio)
        res = crawl_oracle(w.pages, seeds, cfg)
        return res.crawl_order.sort_values(["round", "seq"]).url.tolist()

    fused_order = oracle_order(fused)
    assert fused_order != oracle_order({}), "fusion must change BFS order"
    assert fused_order != oracle_order(pr_only), (
        "fusion must differ from the single-signal pagerank order"
    )

    cfg = CrawlConfig(budgets=budgets, robots=robots, max_rounds=20,
                      priority=fused)
    want = crawl_oracle(w.pages, seeds, cfg)
    root = str(tmp_path_factory.mktemp("fusedprio"))
    run_crawl(spark, _to_spark_corpus(spark, w.pages), seeds, cfg, root,
              bloom_buckets=8, bloom_bits=1 << 16)
    key = ["round", "seq"]
    got = (
        CrawlStore(spark, root).read_pages().toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    w_order = want.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, w_order[cols].itertuples(index=False))
    )


def test_fused_host_priority_validates_inputs(spark):
    from crawler_spark.operators.graphrank import fused_host_priority

    links = spark.createDataFrame(
        [("a.test", "b.test")], "source_host string, host string"
    )
    with pytest.raises(ValueError, match="unknown priority signals"):
        fused_host_priority(links, ["pagerank", "bogus"])
    with pytest.raises(ValueError, match="at least one"):
        fused_host_priority(links, [])
    with pytest.raises(ValueError, match="seed_hosts"):
        fused_host_priority(links, ["trust"])
    with pytest.raises(ValueError, match="pages_text"):
        fused_host_priority(links, ["reputation"])


def _skew_web(n_hot=200, n_cold_hosts=3, fanout=3):
    """Shared fixture — one definition for the golden test AND the
    skew-crawl bench (crawler_spark.fixtures.webgen.skew_web)."""
    from crawler_spark.fixtures.webgen import skew_web

    return skew_web(n_hot, n_cold_hosts, fanout)


def test_global_budget_skew_fills_rounds_golden(
    spark, tmp_path_factory
):
    """Adversarial skew for fair-share mode: a frontier that is ~99% one
    host must still FILL every round — granted = least(alloc, pending)
    may roll cold-host units forward, but demand-weighted apportionment
    re-grants them to the hot host next round, so every round schedules
    min(global_budget, frontier). Driver ≡ serial oracle row-for-row on
    the same fixture."""
    pages, seeds = _skew_web()
    budget = 40
    cfg = CrawlConfig(
        budgets={}, robots=[], max_rounds=30, global_budget=budget
    )
    oracle = crawl_oracle(pages, seeds, cfg)

    root = str(tmp_path_factory.mktemp("skewstore"))
    run_crawl(spark, _to_spark_corpus(spark, pages), seeds, cfg, root,
              bloom_buckets=8, bloom_bits=1 << 16)
    store = CrawlStore(spark, root)
    key = ["round", "seq"]
    got = (
        store.read_pages().toPandas().sort_values(key)
        .reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )
    # every committed round fills: scheduled == min(budget, frontier at
    # round start). Round r's start frontier is round r-1's manifest
    # frontier_size; round 0 starts from the seed list.
    rounds = store.committed_rounds()
    frontier_start = len(seeds)
    fills = []
    for r in rounds:
        m = store.read_manifest(r)["metrics"]
        assert m["scheduled"] == min(budget, frontier_start), (
            f"round {r} under-filled: scheduled {m['scheduled']} vs "
            f"min({budget}, frontier {frontier_start})"
        )
        fills.append(m["scheduled"])
        frontier_start = m["frontier_size"]
    # the skew shape really bit: some middle round hit the full budget
    assert max(fills) == budget
    # and the whole web was crawled exactly once
    assert sum(fills) == len(pages)


def test_priority_df_parquet_feed_golden(spark, small_web, tmp_path_factory):
    """The DISTRIBUTED priority feed (run_crawl(priority_df=...), round-5
    item 1): the rank table is loaded from parquet and joined
    executor-side — the driver never holds a host-universe dict — and
    the crawl is byte-identical to (a) the serial oracle with the same
    scores as a config dict and (b) the dict-fed driver run."""
    from crawler_spark.functions.urls import get_hostname

    w = small_web
    hosts = sorted({get_hostname(u) for u in w.pages.url})
    prio = {h: float(i % 3) for i, h in enumerate(hosts)}
    base = dict(
        budgets={
            r.host: int(r.budget_per_round)
            for r in w.politeness.itertuples()
        },
        robots=[(r.host, r.rule, bool(r.allow))
                for r in w.robots.itertuples()],
        max_rounds=18,
        round_capacity=9,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, CrawlConfig(priority=prio, **base))

    pq = str(tmp_path_factory.mktemp("prio") / "ranks.parquet")
    spark.createDataFrame(
        sorted(prio.items()), "host string, priority double"
    ).write.parquet(pq)

    corpus = _to_spark_corpus(spark, w.pages)
    key = ["round", "seq"]
    cols = ["round", "seq", "url", "host", "status", "type"]

    # parquet-path feed; config carries NO dict
    root = str(tmp_path_factory.mktemp("priodf"))
    run_crawl(spark, corpus, seeds, CrawlConfig(**base), root,
              bloom_buckets=8, bloom_bits=1 << 16, priority_df=pq)
    got = (
        CrawlStore(spark, root).read_pages().toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )

    # DataFrame feed (what the mined graphrank *_df functions return)
    root2 = str(tmp_path_factory.mktemp("priodf2"))
    run_crawl(spark, corpus, seeds, CrawlConfig(**base), root2,
              bloom_buckets=8, bloom_bits=1 << 16,
              priority_df=spark.read.parquet(pq))
    got2 = (
        CrawlStore(spark, root2).read_pages().toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    assert list(map(tuple, got2[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )


def test_priority_df_duplicate_hosts_dedupe_max(
    spark, small_web, tmp_path_factory
):
    """A parquet feed carrying a host TWICE (e.g. a union of two signal
    exports) must not row-multiply the scheduler's left join — the
    driver aggregates max(priority) per host at crawl start, so the
    crawl equals the oracle fed the max-per-host dict and every url is
    fetched exactly once."""
    from crawler_spark.functions.urls import get_hostname

    w = small_web
    hosts = sorted({get_hostname(u) for u in w.pages.url})
    prio = {h: float(i % 3) for i, h in enumerate(hosts)}
    base = dict(
        budgets={
            r.host: int(r.budget_per_round)
            for r in w.politeness.itertuples()
        },
        robots=[(r.host, r.rule, bool(r.allow))
                for r in w.robots.itertuples()],
        max_rounds=18,
        round_capacity=9,
    )
    seeds = w.seeds.url.tolist()
    oracle = crawl_oracle(w.pages, seeds, CrawlConfig(priority=prio, **base))

    # every host twice: the true score plus a LOWER decoy — max wins
    dup_rows = sorted(prio.items()) + [
        (h, p - 1.0) for h, p in sorted(prio.items())
    ]
    pq = str(tmp_path_factory.mktemp("priodup") / "ranks.parquet")
    spark.createDataFrame(
        dup_rows, "host string, priority double"
    ).write.parquet(pq)

    corpus = _to_spark_corpus(spark, w.pages)
    root = str(tmp_path_factory.mktemp("priodupw"))
    run_crawl(spark, corpus, seeds, CrawlConfig(**base), root,
              bloom_buckets=8, bloom_bits=1 << 16, priority_df=pq)
    got = (
        CrawlStore(spark, root).read_pages().toPandas()
        .sort_values(["round", "seq"]).reset_index(drop=True)
    )
    assert got.url.is_unique  # no double-fetch from the duplicate key
    cols = ["round", "seq", "url", "host", "status", "type"]
    want = oracle.crawl_order.sort_values(["round", "seq"]).reset_index(
        drop=True
    )
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )


def test_priority_df_rejects_wrong_schema(spark, small_web, tmp_path_factory):
    import pytest as _pytest

    w = small_web
    corpus = _to_spark_corpus(spark, w.pages)
    bad = spark.createDataFrame([("h", 1.0)], "host string, rank double")
    with _pytest.raises(ValueError, match="priority"):
        run_crawl(spark, corpus, w.seeds.url.tolist(), CrawlConfig(),
                  str(tmp_path_factory.mktemp("priobad")),
                  priority_df=bad)
