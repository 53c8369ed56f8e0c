"""PageRank operator vs an independent numpy power-iteration oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _np_pagerank(edges, nodes, n_iter=8, damping=0.85):
    """Dense power iteration — independent of the Spark implementation."""
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {nd: r[idx[nd]] for nd in nodes}


@pytest.fixture(scope="module")
def graph():
    # deterministic graph with parallel edges, a self-loop, and two
    # dangling nodes (5 and 6); node 6 is sink-only (dst never src)
    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0),
        (4, 5), (4, 6), (1, 1), (3, 4),  # self-loop + parallel edge
    ]
    nodes = sorted({x for e in edges for x in e})
    return edges, nodes


def test_pagerank_matches_numpy(spark, graph):
    from crawler_spark.operators.graphrank import pagerank

    edges, nodes = graph
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    want = _np_pagerank(edges, nodes, n_iter=8)
    assert set(got) == set(want)
    for n in nodes:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # total mass is conserved by the dangling redistribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_only_graph(spark):
    """All mass dangling: every node converges to uniform rank."""
    from crawler_spark.operators.graphrank import pagerank

    df = spark.createDataFrame([(1, 2), (3, 2)], "src: long, dst: long")
    # node 2 is dangling; graph still well-defined
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    want = _np_pagerank([(1, 2), (3, 2)], [1, 2, 3], n_iter=4)
    for n in (1, 2, 3):
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_host_ranks_from_links(spark):
    """Host collapse drops self-loops/empties and returns a plain dict."""
    from crawler_spark.operators.graphrank import host_ranks_from_links

    links = spark.createDataFrame(
        [
            ("a.com", "b.com"),
            ("a.com", "a.com"),   # self-loop dropped
            ("b.com", "c.com"),
            ("c.com", "a.com"),
            ("", "b.com"),        # empty host dropped
        ],
        "source_host: string, host: string",
    )
    ranks = host_ranks_from_links(links, n_iter=6)
    assert set(ranks) == {"a.com", "b.com", "c.com"}
    want = _np_pagerank(
        [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com")],
        ["a.com", "b.com", "c.com"],
        n_iter=6,
    )
    for h, v in want.items():
        assert ranks[h] == pytest.approx(v, abs=1e-12)


def _np_hits(edges, nodes, n_iter=6):
    """Independent dense HITS with L1 normalization, hub init 1.0."""
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for s, d in edges:
            a[idx[d]] += h[idx[s]]
        a /= a.sum()
        h = np.zeros(n)
        for s, d in edges:
            h[idx[s]] += a[idx[d]]
        h /= h.sum()
    return (
        {nd: h[idx[nd]] for nd in nodes},
        {nd: a[idx[nd]] for nd in nodes},
    )


def test_hits_matches_numpy(spark, graph):
    from crawler_spark.operators.graphrank import hits

    edges, nodes = graph
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = hits(df, n_iter=6).collect()
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["auth"] for r in rows}
    want_h, want_a = _np_hits(edges, nodes, n_iter=6)
    assert set(got_h) == set(nodes)
    for n in nodes:
        assert got_h[n] == pytest.approx(want_h[n], abs=1e-12)
        assert got_a[n] == pytest.approx(want_a[n], abs=1e-12)
    # L1 normalization: both score vectors sum to 1
    assert sum(got_h.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(got_a.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_sink_and_source_roles(spark):
    """A pure directory node is all hub / zero auth; its targets are
    the reverse. Parallel edges weigh double."""
    from crawler_spark.operators.graphrank import hits

    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 2)], "src: long, dst: long"
    )
    rows = {r["node"]: r for r in hits(df, n_iter=3).collect()}
    assert rows[0]["hub"] == pytest.approx(1.0)
    assert rows[0]["auth"] == 0.0
    assert rows[1]["hub"] == 0.0
    assert rows[2]["hub"] == 0.0
    # node 2 receives two of the three unit edges
    assert rows[2]["auth"] == pytest.approx(2.0 / 3.0)
    assert rows[1]["auth"] == pytest.approx(1.0 / 3.0)


def test_hits_rejects_zero_iterations(spark):
    from crawler_spark.operators.graphrank import hits

    df = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)


def test_trustrank_demotes_spam_island(spark):
    """TrustRank vs PageRank on a graph with a link-farm island: the
    farm inflates its PageRank via the uniform teleport, but earns
    ZERO trust because no path from the trusted seed reaches it."""
    import numpy as np

    from crawler_spark.operators.graphrank import pagerank, trustrank

    # trusted chain 0→1→2 ; spam clique {10,11,12} linking to itself
    edges = [(0, 1), (1, 2), (2, 0),
             (10, 11), (11, 12), (12, 10),
             (10, 12), (12, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    seeds = spark.createDataFrame([(0,)], "node: long")

    trust = {r["node"]: r["trust"] for r in trustrank(e, seeds, n_iter=20).collect()}
    rank = {r["node"]: r["rank"] for r in pagerank(e, n_iter=20).collect()}

    # mass conservation
    assert sum(trust.values()) == pytest.approx(1.0, abs=1e-9)
    # the clique farms plain PageRank...
    assert sum(rank[n] for n in (10, 11, 12)) > 0.4
    # ...but gets exactly zero trust (unreachable from the seed)
    assert all(trust[n] == 0.0 for n in (10, 11, 12))
    assert all(trust[n] > 0.2 for n in (0, 1, 2))

    # numpy cross-check of the trusted component's stationary shares
    a, n_it = 0.85, 20
    tv = np.array([1.0, 0.0, 0.0])
    m = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=float).T
    r = tv.copy()
    for _ in range(n_it):
        r = (1 - a) * tv + a * (m @ r)  # no dangling in the 3-cycle
    for i, node in enumerate((0, 1, 2)):
        assert trust[node] == pytest.approx(r[i], abs=1e-9)


def test_trustrank_requires_live_seed(spark):
    from crawler_spark.operators.graphrank import trustrank

    e = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    ghost = spark.createDataFrame([(99,)], "node: long")
    with pytest.raises(ValueError):
        trustrank(e, ghost, n_iter=2)


def test_host_trust_from_links(spark):
    """Trust propagates only from the seed host; a spam pair linking
    only to each other gets exactly 0 and sorts last in the priority."""
    from crawler_spark.operators.graphrank import host_trust_from_links

    links = spark.createDataFrame(
        [
            ("good.com", "blog.com"),
            ("blog.com", "good.com"),
            ("good.com", "good.com"),   # self-loop dropped
            ("spam1.biz", "spam2.biz"),
            ("spam2.biz", "spam1.biz"),
            ("", "blog.com"),           # empty host dropped
        ],
        "source_host: string, host: string",
    )
    trust = host_trust_from_links(
        links, ["good.com", "not-in-graph.org"], n_iter=10
    )
    assert set(trust) == {"good.com", "blog.com", "spam1.biz", "spam2.biz"}
    assert trust["spam1.biz"] == 0.0 and trust["spam2.biz"] == 0.0
    assert trust["good.com"] > trust["blog.com"] > 0.0
    assert sum(trust.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_deep_run_valve_renormalizes(spark, graph):
    """Past depth 8 the lineage valve also renormalizes (ADVICE r4):
    magnitudes are bounded per 8-iteration segment and — linearity —
    the final scores still match the per-iteration-normalized numpy
    reference."""
    from crawler_spark.operators.graphrank import hits

    edges, nodes = graph
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = hits(df, n_iter=9).collect()
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["auth"] for r in rows}
    want_h, want_a = _np_hits(edges, nodes, n_iter=9)
    for n in nodes:
        assert got_h[n] == pytest.approx(want_h[n], abs=1e-9)
        assert got_a[n] == pytest.approx(want_a[n], abs=1e-9)
    assert sum(got_h.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(got_a.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_exact_warn_flags_dense_graphs(spark):
    """exact_warn measures mean degree and warns when the exact-
    integer-double bound for a segment is exceeded (ADVICE r4: the
    docstring's old degree^12 claim was wrong for mean degree >= ~21
    at default depth)."""
    import warnings

    from crawler_spark.operators.graphrank import hits

    # dense clique: 8 nodes, all ordered pairs -> mean degree 7, and
    # 7^12 ~ 1.4e10 < 2^53 -> NO warning at depth 6
    small = [(s, d) for s in range(8) for d in range(8) if s != d]
    df = spark.createDataFrame(small, "src: long, dst: long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        hits(df, n_iter=6, exact_warn=True).collect()

    # 30 nodes, complete digraph -> mean degree 29; 29^12 > 2^53
    big = [(s, d) for s in range(30) for d in range(30) if s != d]
    df2 = spark.createDataFrame(big, "src: long, dst: long")
    with pytest.warns(UserWarning, match="exact-integer-double"):
        hits(df2, n_iter=6, exact_warn=True).collect()


def test_priority_df_variants_match_dict_wrappers(spark):
    """The distributed (host, priority) DataFrame feeds are the source
    of truth; the dict wrappers are collect()s of them — equal values,
    and the DF schema is exactly what run_crawl(priority_df=) expects."""
    from pyspark.sql import DataFrame

    from crawler_spark.operators.graphrank import (
        fused_host_priority,
        fused_host_priority_df,
        host_ranks_df,
        host_ranks_from_links,
        host_trust_df,
        host_trust_from_links,
    )

    links = spark.createDataFrame(
        [
            ("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
            ("a.com", "c.com"), ("spam.com", "spam2.com"),
            ("spam2.com", "spam.com"),
        ],
        "source_host: string, host: string",
    )
    for df_fn, dict_fn, kw in [
        (host_ranks_df, host_ranks_from_links, {}),
        (host_trust_df, host_trust_from_links,
         {"seed_hosts": ["a.com"]}),
        (fused_host_priority_df, fused_host_priority,
         {"signals": ["pagerank", "trust"], "seed_hosts": ["a.com"]}),
    ]:
        if "signals" in kw:
            df = df_fn(links, kw.pop("signals2", kw["signals"]),
                       seed_hosts=kw["seed_hosts"])
            d = dict_fn(links, kw["signals"], seed_hosts=kw["seed_hosts"])
        else:
            df = df_fn(links, **kw)
            d = dict_fn(links, **kw)
        assert isinstance(df, DataFrame)
        assert df.columns == ["host", "priority"]
        got = {r["host"]: r["priority"] for r in df.collect()}
        assert got.keys() == d.keys()
        for h in d:
            assert got[h] == pytest.approx(d[h], abs=1e-12)
