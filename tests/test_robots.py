"""robots.txt parser: RFC 9309 group selection, prefix compilation, and
end-to-end equivalence with hand-written rule tuples in a crawl."""

import tempfile

from crawler_spark.functions.robots import (
    budgets_from_delays,
    delays_from_bodies,
    parse_crawl_delay,
    parse_robots_txt,
    rules_from_bodies,
)
from crawler_spark.oracle.crawloracle import CrawlConfig

BODY = """
# comments everywhere
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*/junk
Disallow:
Allow: /

Sitemap: https://x.test/sitemap.xml

User-agent: mybot
User-agent: otherbot
Disallow: /
Allow: /public/
"""


def test_group_selection_star():
    rules = parse_robots_txt("x.test", BODY, user_agent="*")
    assert ("x.test", "/private/", False) in rules
    assert ("x.test", "/private/ok/", True) in rules
    # wildcard truncated at '*': /tmp*/junk -> /tmp
    assert ("x.test", "/tmp", False) in rules
    # empty Disallow emits nothing; google-only group not selected
    assert not any(r[1].startswith("/google-only") for r in rules)


def test_group_selection_specific_ua_beats_star():
    rules = parse_robots_txt("x.test", BODY, user_agent="MyBot/1.0")
    assert ("x.test", "/", False) in rules
    assert ("x.test", "/public/", True) in rules
    assert not any(r[1] == "/private/" for r in rules)


def test_stacked_user_agents_share_group():
    rules = parse_robots_txt("x.test", BODY, user_agent="otherbot")
    assert ("x.test", "/public/", True) in rules


def test_semantics_through_crawlconfig():
    cfg = CrawlConfig(robots=parse_robots_txt("x.test", BODY))
    assert cfg.robots_allowed("x.test", "/anything")
    assert not cfg.robots_allowed("x.test", "/private/secret")
    assert cfg.robots_allowed("x.test", "/private/ok/page")  # longest wins
    assert not cfg.robots_allowed("x.test", "/tmpfoo/junk")
    assert cfg.robots_allowed("other.test", "/private/secret")  # host-scoped


def test_crlf_and_case_insensitive_fields():
    body = "USER-AGENT: *\r\nDISALLOW: /A/\r\nallow: /A/b\r\n"
    assert parse_robots_txt("h", body) == [
        ("h", "/A/", False), ("h", "/A/b", True)
    ]


def test_no_matching_group_allows_all():
    body = "User-agent: somebot\nDisallow: /\n"
    assert parse_robots_txt("h", body, user_agent="mybot") == []


def test_distributed_parse_matches_kernel(spark):
    df = spark.createDataFrame(
        [("a.test", BODY), ("b.test", "User-agent: *\nDisallow: /x\n"),
         ("c.test", None)],
        "host string, body string",
    )
    got = {
        (r.host, r.rule, r.allow)
        for r in rules_from_bodies(df).collect()
    }
    want = set(parse_robots_txt("a.test", BODY)) | {("b.test", "/x", False)}
    assert got == want


def test_crawl_with_parsed_robots_matches_tuples(spark):
    """Crawl driven by parsed robots.txt == crawl driven by equivalent
    hand-written tuples (end-to-end through run_crawl)."""
    from crawler_spark.crawl.driver import run_crawl
    from crawler_spark.crawl.store import CrawlStore
    from crawler_spark.fixtures.doccorpus import corpus_from_documents, seed_urls
    from crawler_spark.functions.robots import parse_robots_txt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = corpus_from_documents(docs).cache()
    body = "User-agent: *\nDisallow: /doc/1\nAllow: /doc/12\n"
    parsed = parse_robots_txt("hot.docs.test", body)
    assert parsed == [
        ("hot.docs.test", "/doc/1", False), ("hot.docs.test", "/doc/12", True)
    ]

    outs = []
    for robots in (parsed, list(parsed)):
        cfg = CrawlConfig(budgets={"*": 8}, robots=robots, max_rounds=3)
        root = tempfile.mkdtemp(prefix="robots_crawl_")
        run_crawl(spark, corpus, seed_urls(2), cfg, root, bloom_buckets=4,
                  bloom_bits=1 << 14)
        outs.append(
            [tuple(r) for r in CrawlStore(spark, root)
             .read_pages().orderBy("round", "seq").collect()]
        )
    assert outs[0] == outs[1]
    urls = {r[2] for r in outs[0]}
    # /doc/1* blocked except /doc/12* re-allowed
    assert not any(u.endswith("/doc/16") for u in urls)
    blocked = [u for u in urls
               if "hot.docs.test/doc/1" in u and "/doc/12" not in u]
    assert blocked == []


DELAY_BODY = """
User-agent: googlebot
Crawl-delay: 1

User-agent: *
Disallow: /private/
Crawl-delay: 2.5

User-agent: mybot
Disallow: /
"""


def test_crawl_delay_group_selection():
    assert parse_crawl_delay(DELAY_BODY, "*") == 2.5
    assert parse_crawl_delay(DELAY_BODY, "googlebot") == 1.0
    assert parse_crawl_delay(DELAY_BODY, "mybot") is None  # group has none
    assert parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None
    # malformed value: line ignored, group (and its rules) kept
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: fast\n") is None
    assert parse_robots_txt("h.test",
                            "User-agent: *\nCrawl-delay: fast\n"
                            "Disallow: /x\n") == [("h.test", "/x", False)]
    # a crawl-delay line must not detach following rules from the group
    rules = parse_robots_txt("h.test", DELAY_BODY, "*")
    assert ("h.test", "/private/", False) in rules


def test_delays_to_budgets(spark):
    df = spark.createDataFrame(
        [("slow.test", DELAY_BODY),
         ("fast.test", "User-agent: *\nDisallow: /x\n"),
         ("zero.test", "User-agent: *\nCrawl-delay: 0\n")],
        "host string, body string",
    )
    delays = [(r.host, r.crawl_delay)
              for r in delays_from_bodies(df).collect()]
    assert delays == [("slow.test", 2.5)]
    budgets, periods = budgets_from_delays(delays, round_seconds=60,
                                           default_budget=1000)
    # 60 s / 2.5 s-per-fetch = 24 URLs per round for the slow host
    assert budgets == {"*": 1000, "slow.test": 24}
    assert periods == {}
    # delay longer than the round ⇒ periodic: 1 URL every ceil(d/round)
    b, p = budgets_from_delays([("s.test", 150.0)], 60, 1000)
    assert b["s.test"] == 1 and p["s.test"] == 3
    b, p = budgets_from_delays([("s.test", 0.001)], 60, 1000)
    assert b["s.test"] == 1000 and "s.test" not in p
    # hostile values never become budgets
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nan\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: inf\n") is None


def test_crawl_delay_budget_throttles_host(spark, tmp_path):
    """End-to-end: a crawl-delay-derived budget caps that host's
    scheduled URLs per round while other hosts run at the default."""
    from crawler_spark.crawl.driver import run_crawl
    from crawler_spark.crawl.store import CrawlStore
    from crawler_spark.fixtures.webgen import generate
    from tests.test_crawl_golden import _to_spark_corpus

    web = generate(seed=31, n_pages=80)
    hosts = web.pages.url.str.extract(r"http://([^/]+)/")[0]
    host = hosts.mode()[0]  # the busiest host
    budgets, periods = budgets_from_delays(
        [(host, 30.0)], round_seconds=60, default_budget=50
    )
    assert budgets[host] == 2 and periods == {}
    cfg = CrawlConfig(budgets=budgets, max_rounds=8)
    root = str(tmp_path / "delay_crawl")
    run_crawl(spark, _to_spark_corpus(spark, web.pages),
              web.seeds.url.tolist(), cfg, root, bloom_buckets=4,
              bloom_bits=1 << 15)
    pages = CrawlStore(spark, root).read_pages().toPandas()
    per_round = pages[pages.host == host].groupby("round").size()
    assert (per_round <= 2).all()
    assert len(per_round) >= 2  # actually throttled across rounds


def test_periodic_budget_matches_oracle(spark, tmp_path):
    """A Crawl-delay longer than the round ⇒ 1 URL every N rounds: the
    distributed driver and the serial oracle must produce the identical
    crawl order, and the periodic host's fetch rounds must follow the
    rnd % N == 0 cadence."""
    from crawler_spark.crawl.driver import run_crawl
    from crawler_spark.crawl.store import CrawlStore
    from crawler_spark.fixtures.webgen import generate
    from crawler_spark.oracle.crawloracle import crawl_oracle
    from tests.test_crawl_golden import _to_spark_corpus

    web = generate(seed=37, n_pages=60)
    hosts = web.pages.url.str.extract(r"http://([^/]+)/")[0]
    host = hosts.mode()[0]
    budgets, periods = budgets_from_delays(
        [(host, 150.0)], round_seconds=60, default_budget=20
    )
    assert budgets[host] == 1 and periods[host] == 3
    cfg = CrawlConfig(budgets=budgets, budget_periods=periods,
                      max_rounds=30)
    seeds = web.seeds.url.tolist()
    oracle = crawl_oracle(web.pages, seeds, cfg)

    root = str(tmp_path / "periodic")
    run_crawl(spark, _to_spark_corpus(spark, web.pages), seeds, cfg, root,
              bloom_buckets=4, bloom_bits=1 << 15)
    got = (
        CrawlStore(spark, root).read_pages().toPandas()
        .sort_values(["round", "seq"]).reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(
        ["round", "seq"]).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )
    hot_rounds = sorted(got[got.host == host]["round"].unique())
    assert hot_rounds and all(r % 3 == 0 for r in hot_rounds)
    per_round = got[got.host == host].groupby("round").size()
    assert (per_round == 1).all()


def test_periodic_wait_bounded_by_max_period():
    """With periods configured, an unschedulable remainder (budget-0
    host) must terminate the crawl within max(period) extra rounds —
    not spin empty rounds to max_rounds."""
    import pandas as pd

    from crawler_spark.oracle.crawloracle import crawl_oracle

    corpus = pd.DataFrame(
        {
            "url": [f"http://a.test/p{i}" for i in range(3)]
            + ["http://dead.test/x"],
            "html": [b"<html><body><p>tok one two</p></body></html>"] * 4,
            "content_type": ["text/html"] * 4,
            "status": [200] * 4,
            "retry_after": [None] * 4,
        }
    )
    cfg = CrawlConfig(
        budgets={"a.test": 1, "dead.test": 0, "*": 5},
        budget_periods={"a.test": 2},
        max_rounds=1000,
    )
    out = crawl_oracle(
        corpus, ["http://a.test/p0", "http://a.test/p1",
                 "http://a.test/p2", "http://dead.test/x"], cfg
    )
    # a.test fetches on rounds 0, 2, 4 (period 2); dead.test never; the
    # crawl must end within max(period)=2 rounds after round 4 — far
    # below max_rounds
    assert sorted(out.crawl_order["round"].tolist()) == [0, 2, 4]
    assert out.crawl_order["round"].max() == 4


def test_wildcard_allow_dropped_never_overrides_disallow():
    """Allow patterns with wildcards/anchors are dropped (truncation would
    WIDEN them past RFC 9309 and override plain Disallows on ties)."""
    body = "User-agent: *\nDisallow: /ab\nAllow: /ab*z\nAllow: /x$\n"
    rules = parse_robots_txt("h", body)
    assert rules == [("h", "/ab", False)]
    cfg = CrawlConfig(robots=rules)
    assert not cfg.robots_allowed("h", "/abc")  # RFC: denied; stays denied


def test_exact_wildcards_rfc9309_matching():
    """wildcards="exact" keeps * / $ patterns and matches them per RFC
    9309 §2.2.2 (Google reference-matcher examples): * spans any octets,
    trailing $ anchors the end, precedence = pattern octet length."""
    body = (
        "User-agent: *\n"
        "Disallow: /fish*\n"
        "Disallow: /*.php$\n"
        "Allow: /fish/free\n"
        "Disallow: /no-$\n"
    )
    rules = parse_robots_txt("h", body, wildcards="exact")
    assert ("h", "/fish*", False) in rules
    assert ("h", "/*.php$", False) in rules
    cfg = CrawlConfig(robots=rules)
    assert not cfg.robots_allowed("h", "/fishheads/yummy.html")
    assert not cfg.robots_allowed("h", "/fish.php")
    assert cfg.robots_allowed("h", "/Fish.asp")  # case-sensitive
    assert not cfg.robots_allowed("h", "/folder/filename.php")
    assert cfg.robots_allowed("h", "/filename.php5")  # $ anchors end
    # longest-pattern precedence: Allow /fish/free (10) > /fish* (6)
    assert cfg.robots_allowed("h", "/fish/free/recipes.html")
    # literal-$ corner: '/no-$' anchors after '/no-'
    assert not cfg.robots_allowed("h", "/no-")
    assert cfg.robots_allowed("h", "/no-thing")


def test_exact_wildcards_conservative_is_subset():
    """Exact mode can only fetch a subset of what conservative mode
    blocks-to-be-safe: anything conservative allows AND a Disallow
    wildcard would catch, exact must deny; anything exact allows that
    conservative denied is an over-block recovered."""
    body = (
        "User-agent: *\n"
        "Disallow: /a/*/secret\n"
        "Allow: /a/b*\n"
    )
    cons = CrawlConfig(robots=parse_robots_txt("h", body))
    exact = CrawlConfig(
        robots=parse_robots_txt("h", body, wildcards="exact")
    )
    # conservative truncates the Disallow to /a/ -> everything under /a/
    # is blocked; exact recovers the non-secret subtree
    assert not cons.robots_allowed("h", "/a/b/page")
    assert exact.robots_allowed("h", "/a/b/page")
    # both deny the actual secret path
    assert not cons.robots_allowed("h", "/a/b/secret")
    assert not exact.robots_allowed("h", "/a/x/secret")


def test_exact_wildcards_redos_guard_and_mode_validation():
    """A star-stuffed pattern (hostile robots.txt) falls back to
    conservative handling even in exact mode — never compiled into a
    backtracking-prone regex — and unknown modes raise instead of
    silently selecting conservative."""
    import pytest as _pytest

    stuffed = "/" + "*a" * 12  # 12 stars > MAX_EXACT_WILDCARDS
    body = f"User-agent: *\nDisallow: {stuffed}\nAllow: {stuffed}z\n"
    rules = parse_robots_txt("h", body, wildcards="exact")
    # Disallow truncated at its first star (conservative over-block);
    # the wildcarded Allow is dropped entirely
    assert rules == [("h", "/", False)]
    # sane star counts still match exactly in the same parse
    body2 = "User-agent: *\nDisallow: /a/*/b\n"
    assert parse_robots_txt("h", body2, wildcards="exact") == [
        ("h", "/a/*/b", False)
    ]
    with _pytest.raises(ValueError, match="wildcards"):
        parse_robots_txt("h", body2, wildcards="Exact")


def test_vectorized_robots_udf_matches_serial_spec_wildcards(spark):
    """UDF ≡ serial spec parity with RFC 9309 wildcard patterns mixed
    into the rule table (exact mode)."""
    import random

    from crawler_spark.crawl.driver import _robots_filter_udf
    from crawler_spark.oracle.crawloracle import _url_path

    rng = random.Random(11)
    hosts = [f"w{i}.test" for i in range(4)]
    patterns = [
        "/", "/a/", "/a/*/c", "/*.php$", "/fish*", "/x$", "/a/b",
        "*/tail", "/q*z$",
    ]
    rules = [
        (rng.choice(hosts + ["*"]), rng.choice(patterns), rng.random() < 0.5)
        for _ in range(50)
    ]
    cfg = CrawlConfig(robots=rules)
    paths = [
        "", "/", "/a/b/c", "/a/zz/c", "/file.php", "/file.php5",
        "/fishheads", "/x", "/x/", "/one/tail", "/qmiddlez", "/q?k=v",
    ]
    rows = [
        (
            rng.choice(hosts + ["unruled.test"]),
            f"http://{'%s' % rng.choice(hosts)}{rng.choice(paths)}",
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "host string, url string")
    udf = _robots_filter_udf(spark, cfg)
    got = df.withColumn("ok", udf("host", "url")).toPandas()
    for r in got.itertuples(index=False):
        want = cfg.robots_allowed(r.host or "", _url_path(r.url or ""))
        assert bool(r.ok) == want, (r.host, r.url, r.ok, want)


def test_vectorized_robots_udf_matches_serial_spec(spark):
    """The driver's grouped/vectorized robots filter must agree with the
    serial CrawlConfig.robots_allowed spec on randomized rules + URLs."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from crawler_spark.crawl.driver import _robots_filter_udf
    from crawler_spark.oracle.crawloracle import _url_path

    rng = random.Random(7)
    hosts = [f"h{i}.test" for i in range(6)]
    prefixes = ["/", "/a/", "/a/b", "/priv/", "/priv/ok", "/x", "/x/y/"]
    rules = [
        (rng.choice(hosts + ["*"]), rng.choice(prefixes), rng.random() < 0.5)
        for _ in range(40)
    ]
    cfg = CrawlConfig(robots=rules)

    paths = ["", "/", "/a/b/c", "/priv/ok/z", "/priv/no", "/x/y/z", "/q?k=v"]
    rows = []
    for i in range(300):
        h = rng.choice(hosts + ["unruled.test"])
        rows.append((h, f"http://{h}{rng.choice(paths)}"))
    rows.append((None, None))
    rows.append(("h0.test", "no-proto-at-all"))

    df = spark.createDataFrame(rows, "host string, url string")
    udf = _robots_filter_udf(spark, cfg)
    got = df.withColumn("ok", udf("host", "url")).toPandas()
    for r in got.itertuples(index=False):
        want = cfg.robots_allowed(r.host or "", _url_path(r.url or ""))
        assert bool(r.ok) == want, (r.host, r.url, r.ok, want)


def test_sitemaps_from_bodies(spark):
    """Sitemap: directives are group-independent, case-blind, and
    comment-tolerant; non-directive lines never match."""
    from crawler_spark.functions.robots import sitemaps_from_bodies

    body = (
        "User-agent: *\nDisallow: /p/\n"
        "Sitemap: http://a.test/s1.xml\n"
        "  sitemap:\thttp://a.test/s2.xml  # comment\n"
        "SITEMAP:http://a.test/s3.xml\r\n"
        "NotASitemap: http://a.test/no.xml\n"
        "Sitemap: # only a comment\n"
    )
    df = spark.createDataFrame(
        [("a.test", body), ("b.test", None)], "host string, body string"
    )
    got = sorted(
        (r.host, r.sitemap_url) for r in sitemaps_from_bodies(df).collect()
    )
    assert got == [
        ("a.test", "http://a.test/s1.xml"),
        ("a.test", "http://a.test/s2.xml"),
        ("a.test", "http://a.test/s3.xml"),
    ]
