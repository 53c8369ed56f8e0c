"""DUST rule mining + application (operators/dust.py)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dust import (
    apply_dust_rules,
    mine_dust_rules,
    path_segments,
)


@pytest.fixture(scope="module")
def pages(spark):
    # two hosts; content key k marks content-equal groups
    rows = [
        # h1 / k1: classic index.html <-> index.htm twins
        ("h1.test", "k1", "http://h1.test/a/1/index.html"),
        ("h1.test", "k1", "http://h1.test/a/1/index.htm"),
        ("h1.test", "k2", "http://h1.test/a/2/index.html"),
        ("h1.test", "k2", "http://h1.test/a/2/index.htm"),
        # h1 / k3: print twin (different segment count -> NO rule)
        ("h1.test", "k3", "http://h1.test/a/3/x/index.html"),
        ("h1.test", "k3", "http://h1.test/a/3/print"),
        # h1 / k4: two segments differ -> NO rule
        ("h1.test", "k4", "http://h1.test/a/4/view"),
        ("h1.test", "k4", "http://h1.test/b/4/show"),
        # h2: mirror tree /b/... == /a/...   (same rule twice -> support 2)
        ("h2.test", "k5", "http://h2.test/a/5/page"),
        ("h2.test", "k5", "http://h2.test/b/5/page"),
        ("h2.test", "k6", "http://h2.test/a/6/page"),
        ("h2.test", "k6", "http://h2.test/b/6/page"),
        # h2 / k7: singleton group -> no pair
        ("h2.test", "k7", "http://h2.test/only/one"),
    ]
    return rows


def _mine(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["host", "content_key", "url"])
    return {
        (r["host"], r["seg_from"], r["seg_to"]): r["support"]
        for r in mine_dust_rules(df, **kw).collect()
    }


def test_mine_rules(spark, pages):
    rules = _mine(spark, pages, min_support=2)
    # canonical twin is the shorter URL: index.htm
    assert rules == {
        ("h1.test", "index.html", "index.htm"): 2,
        ("h2.test", "b", "a"): 2,
    }


def test_min_support_filters_noise(spark, pages):
    rules = _mine(spark, pages, min_support=3)
    assert rules == {}


def test_max_group_guard_excludes_mega_groups(spark, pages):
    # a pathological group: 30 content-equal URLs on one host
    mega = [
        ("h3.test", "km", f"http://h3.test/cal/{i}/index.html")
        for i in range(30)
    ] + [("h3.test", "km", f"http://h3.test/cal/{i}/index.htm") for i in range(30)]
    rules = _mine(spark, pages + mega, min_support=2, max_group=20)
    assert ("h3.test", "index.html", "index.htm") not in rules
    # ungated, the same rule surfaces with support = 30
    rules2 = _mine(spark, pages + mega, min_support=2, max_group=100)
    assert rules2[("h3.test", "index.html", "index.htm")] == 30


def test_cross_host_pairs_never_pair(spark):
    rows = [
        ("h1.test", "k1", "http://h1.test/a/index.html"),
        ("h2.test", "k1", "http://h2.test/a/index.htm"),
    ]
    assert _mine(spark, rows, min_support=1) == {}


def test_apply_rewrites_and_passthrough(spark, pages):
    df = spark.createDataFrame(pages, ["host", "content_key", "url"])
    rules = mine_dust_rules(df, min_support=2)
    frontier = spark.createDataFrame(
        [
            ("h1.test", "http://h1.test/a/9/index.html"),   # rewritten
            ("h1.test", "http://h1.test/a/9/other"),        # no match
            ("h2.test", "http://h2.test/b/9/b"),            # both segs swap
            ("h9.test", "http://h9.test/a/index.html"),     # host w/o rules
        ],
        ["host", "url"],
    )
    out = {
        r["url"]: (r["canonical_url"], r["dust_applied"])
        for r in apply_dust_rules(frontier, rules).collect()
    }
    assert out["http://h1.test/a/9/index.html"] == (
        "http://h1.test/a/9/index.htm",
        True,
    )
    assert out["http://h1.test/a/9/other"] == (
        "http://h1.test/a/9/other",
        False,
    )
    # every occurrence of the matched segment is substituted
    assert out["http://h2.test/b/9/b"] == ("http://h2.test/a/9/a", True)
    assert out["http://h9.test/a/index.html"] == (
        "http://h9.test/a/index.html",
        False,
    )


def test_apply_preserves_row_multiplicity(spark, pages):
    df = spark.createDataFrame(pages, ["host", "content_key", "url"])
    rules = mine_dust_rules(df, min_support=2)
    frontier = spark.createDataFrame(
        [("h1.test", "http://h1.test/a/9/index.html")] * 3, ["host", "url"]
    )
    assert apply_dust_rules(frontier, rules).count() == 3


def test_apply_rule_pick_is_lexicographic_first_match(spark):
    rules = spark.createDataFrame(
        [
            ("h1.test", "z", "y", 5),
            ("h1.test", "index.html", "index.htm", 5),
        ],
        ["host", "seg_from", "seg_to", "support"],
    )
    frontier = spark.createDataFrame(
        [("h1.test", "http://h1.test/z/index.html")], ["host", "url"]
    )
    (row,) = apply_dust_rules(frontier, rules).collect()
    # ("index.html","index.htm") < ("z","y") -> that rule wins
    assert row["canonical_url"] == "http://h1.test/z/index.htm"


def test_apply_plan_broadcasts_rules_and_never_shuffles_urls(spark):
    from crawler_spark.plans.inspect import exchange_count, has_broadcast_join

    rules = spark.createDataFrame(
        [("h1.test", "index.html", "index.htm", 5)],
        ["host", "seg_from", "seg_to", "support"],
    )
    frontier = spark.createDataFrame(
        [("h1.test", "http://h1.test/a/9/index.html")], ["host", "url"]
    )
    from crawler_spark.plans.inspect import (
        exchange_partition_keys,
        exchange_payload_columns,
    )

    out = apply_dust_rules(frontier, rules)
    assert has_broadcast_join(out)
    # the only shuffle is the per-host rule aggregation on the tiny
    # broadcast side; the URL side is a pure map — no exchange ever
    # keys on or carries the url column
    assert exchange_count(out) <= 1
    for keys in exchange_partition_keys(out):
        assert keys <= {"host"}
    for cols in exchange_payload_columns(out):
        assert "url" not in cols


def test_mine_plan_no_cartesian_and_urls_never_key_exchanges(spark, pages):
    from crawler_spark.plans.inspect import (
        exchange_partition_keys,
        has_cartesian,
    )

    df = spark.createDataFrame(pages, ["host", "content_key", "url"])
    out = mine_dust_rules(df, min_support=2)
    assert not has_cartesian(out)
    # the pair generation is an equi-join partitioned on (host, _ck);
    # the other exchanges are the input dedup (host,_ck,url — urls are
    # short and near-unique, fine) and the rule rollup. Every exchange
    # in the plan is host-prefixed: the whole mine is host-local work.
    keysets = exchange_partition_keys(out)
    assert {"host", "_ck"} in keysets
    for keys in keysets:
        assert "host" in keys


def test_path_segments_edges(spark):
    df = spark.createDataFrame(
        [
            ("http://h.test/",),
            ("http://h.test",),
            ("http://h.test/a//b",),
        ],
        ["url"],
    )
    out = [r[0] for r in df.select(path_segments(F.col("url"))).collect()]
    assert out[0] == []
    assert out[1] == []
    assert out[2] == ["a", "", "b"]


def test_apply_preserves_uppercase_scheme(spark):
    rules = spark.createDataFrame(
        [("h.test", "index.html", "index.htm", 5)],
        ["host", "seg_from", "seg_to", "support"],
    )
    frontier = spark.createDataFrame(
        [("h.test", "HTTP://h.test/a/index.html")], ["host", "url"]
    )
    (row,) = apply_dust_rules(frontier, rules).collect()
    # scheme spelling preserved, never silently dropped
    assert row["canonical_url"] == "HTTP://h.test/a/index.htm"
    # and the serial mirror agrees
    from crawler_spark.oracle.crawloracle import CrawlConfig

    cfg = CrawlConfig(dust_rules=[("h.test", "index.html", "index.htm")])
    assert (
        cfg.dust_canonical("HTTP://h.test/a/index.html", "h.test")
        == "HTTP://h.test/a/index.htm"
    )
    assert (
        cfg.dust_canonical("http://h.test/a/index.html?q=1#f", "h.test")
        == "http://h.test/a/index.htm?q=1#f"
    )


def test_malformed_urls_match_serial_oracle(spark):
    """URLs Java's URL parser rejects (unencoded space, bare-word
    authority junk) must take the SAME path as the serial oracle's
    pure-regex split: both rewrite, or both pass through — never a
    silent one-sided passthrough (ADVICE r4: parse_url returned NULL
    for these, diverging from dust_canonical)."""
    from crawler_spark.oracle.crawloracle import CrawlConfig

    rules = spark.createDataFrame(
        [("h.test", "b", "a", 2)],
        ["host", "seg_from", "seg_to", "support"],
    )
    cases = [
        "http://h.test/b/has space/page",   # unencoded space in path
        "http://h.test/b/%zz/bad-escape",   # invalid percent escape
        "http://h.test/b/é/unicode",   # raw non-ASCII segment
        "not a url at all/b/x",             # no scheme, junk + space
        "http://h.test/a/clean",            # control: no rewrite
        # '?'/'#' INSIDE the authority: the rewrite's suffix must come
        # from the post-authority remainder, not the full URL (a whole-
        # URL extract duplicated the authority's '#frag' into the
        # output and diverged from the oracle)
        "http://h.test#frag/b/x",
        "http://u?p@h.test/b/x",
        "http://h.test/b/x?q=1#frag",       # control: real suffix kept
    ]
    frontier = spark.createDataFrame(
        [("h.test", u) for u in cases], ["host", "url"]
    )
    got = {
        r["url"]: r["canonical_url"]
        for r in apply_dust_rules(frontier, rules).collect()
    }
    cfg = CrawlConfig(dust_rules=[("h.test", "b", "a")])
    for u in cases:
        assert got[u] == cfg.dust_canonical(u, "h.test"), u


def test_oracle_dust_cache_invalidates_on_rule_change(spark):
    """Mutating config.dust_rules after the first dust_canonical call
    must not keep applying the stale rule index (ADVICE r4)."""
    from crawler_spark.oracle.crawloracle import CrawlConfig

    cfg = CrawlConfig(dust_rules=[("h.test", "b", "a")])
    assert cfg.dust_canonical("http://h.test/b/x", "h.test") == (
        "http://h.test/a/x"
    )
    cfg.dust_rules = [("h.test", "b", "c")]
    assert cfg.dust_canonical("http://h.test/b/x", "h.test") == (
        "http://h.test/c/x"
    )
    cfg.dust_rules = []
    assert cfg.dust_canonical("http://h.test/b/x", "h.test") == (
        "http://h.test/b/x"
    )
