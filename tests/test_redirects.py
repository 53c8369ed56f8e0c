"""Redirect-chain resolution vs a pure-Python walk oracle."""

import random

import pytest


def _py_resolve(edges, max_hops=32):
    """Sequential walk — independent of the pointer-jumping plan."""
    nxt = dict(edges)
    out = {}
    for src in nxt:
        cur, hops = src, 0
        while cur in nxt and hops <= max_hops:
            cur = nxt[cur]
            hops += 1
        if hops > max_hops or cur in nxt:
            out[src] = (None, None, True)
        else:
            out[src] = (cur, hops, False)
    return out


def _run(spark, edges, max_hops=32):
    from crawler_spark.operators.redirects import resolve_redirects

    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        r["src_id"]: (r["final_id"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }


def test_chains_cycles_and_self_loop(spark):
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain 1→2→3→4 (4 terminal)
        (10, 11), (11, 10),              # 2-cycle
        (20, 20),                        # self-loop
        (30, 10),                        # chain INTO a cycle
        (40, 50),                        # 1-hop
    ]
    got = _run(spark, edges)
    assert got == _py_resolve(edges)
    assert got[1] == (4, 3, False)
    assert got[10] == (None, None, True)
    assert got[20] == (None, None, True)
    assert got[30] == (None, None, True)
    assert got[40] == (50, 1, False)


def test_max_hops_gives_up_like_a_client(spark):
    # a 10-hop chain resolved with max_hops=4 is treated as a trap
    edges = [(i, i + 1) for i in range(10)]
    got = _run(spark, edges, max_hops=4)
    want = _py_resolve(edges, max_hops=4)
    assert got == want
    assert got[9] == (10, 1, False)
    assert got[0] == (None, None, True)


def test_random_functional_graph(spark):
    """200-node random functional graph (chains + cycles mixed) must
    match the sequential walk exactly — hops included."""
    rng = random.Random(7)
    edges = [
        (i, rng.randrange(220)) for i in range(200) if rng.random() < 0.8
    ]
    got = _run(spark, edges)
    assert got == _py_resolve(edges)


def test_hop_counts_are_exact_powers_boundary(spark):
    """Chain lengths around the doubling boundaries (2^k ± 1)."""
    edges = [(i, i + 1) for i in range(17)]  # hops 1..17 from src 16..0
    got = _run(spark, edges, max_hops=32)
    for src in range(17):
        assert got[src] == (17, 17 - src, False)
