"""Budget apportionment (operators/allocate.py) and soft dedup weights
(operators/dedup.py: soft_dedup_weights).

The reference caps per-host work with fixed budgets (crawl.ts:12, the
5-worker pool); allocate_budget is the cluster-scale complement — one
global round budget split across hosts by the Hamilton largest-remainder
method. Soft dedup is the down-weighting alternative to dropping
near-dup cluster members.
"""

import pyspark.sql.functions as F
import pytest


def _pending(spark, rows):
    return spark.createDataFrame(rows, "host string, n_pending long")


def test_alloc_sums_to_budget_exactly(spark):
    from crawler_spark.operators.allocate import allocate_budget

    pend = _pending(
        spark, [("a", 100), ("b", 50), ("c", 17), ("d", 3), ("e", 1)]
    )
    out = allocate_budget(pend, total_budget=101).collect()
    assert sum(r.alloc for r in out) == 101
    by_host = {r.host: r for r in out}
    # proportionality: each alloc is floor or ceil of its exact quota
    total_w = 171.0
    for h, n in [("a", 100), ("b", 50), ("c", 17), ("d", 3), ("e", 1)]:
        quota = 101.0 * n / total_w
        assert by_host[h].alloc in (int(quota), int(quota) + 1)
    # granted never exceeds pending
    assert all(r.granted <= r.n_pending for r in out)
    assert all(r.granted <= r.alloc for r in out)


def test_driver_side_fast_path_matches_distributed(spark):
    """small_hint short-circuit: one-collect Hamilton ≡ the distributed
    three-job path, row for row — including zero/dead weights, remainder
    ties (equal counts break on host ascending), and grant caps."""
    from crawler_spark.operators.allocate import allocate_budget

    rows = (
        [(f"h{i:03d}", (i * 7919) % 97) for i in range(60)]
        + [("tie_a", 13), ("tie_b", 13), ("dead_a", 0)]
    )
    pend = _pending(spark, rows)
    for budget in (0, 1, 17, 101, 100_000):
        fast = sorted(
            allocate_budget(pend, budget, small_hint=len(rows)).collect()
        )
        dist = sorted(allocate_budget(pend, budget).collect())
        assert fast == dist, f"fast/distributed diverge at budget={budget}"


def test_fast_path_respects_weight_col(spark):
    from crawler_spark.operators.allocate import allocate_budget

    pend = spark.createDataFrame(
        [("a", 10, 1.0), ("b", 10, 3.0), ("c", 2, 0.0)],
        "host string, n_pending long, rep double",
    )
    fast = sorted(
        allocate_budget(
            pend, 8, weight_col="rep", small_hint=3
        ).collect()
    )
    dist = sorted(allocate_budget(pend, 8, weight_col="rep").collect())
    assert fast == dist
    by_host = {r.host: r for r in fast}
    assert by_host["b"].alloc == 6 and by_host["a"].alloc == 2
    assert by_host["c"].alloc == 0


def test_budget_larger_than_pending_caps_granted(spark):
    from crawler_spark.operators.allocate import allocate_budget

    pend = _pending(spark, [("a", 2), ("b", 1)])
    out = {r.host: r for r in allocate_budget(pend, 100).collect()}
    assert sum(r.alloc for r in out.values()) == 100
    assert out["a"].granted == 2 and out["b"].granted == 1


def test_zero_weight_hosts_get_nothing(spark):
    from crawler_spark.operators.allocate import allocate_budget

    pend = _pending(spark, [("a", 10), ("empty", 0)])
    out = {r.host: r for r in allocate_budget(pend, 7).collect()}
    assert out["empty"].alloc == 0 and out["empty"].granted == 0
    assert out["a"].alloc == 7


def test_all_zero_weights_allocates_nothing(spark):
    from crawler_spark.operators.allocate import allocate_budget

    pend = _pending(spark, [("a", 0), ("b", 0)])
    out = allocate_budget(pend, 10).collect()
    assert all(r.alloc == 0 and r.granted == 0 for r in out)


def test_weight_col_override_and_tie_break(spark):
    from crawler_spark.operators.allocate import allocate_budget

    # equal weights, budget not divisible: remainder ties break by host
    # ascending, so exactly the lexicographically-first hosts get +1
    pend = spark.createDataFrame(
        [("d", 5, 1.0), ("c", 5, 1.0), ("b", 5, 1.0), ("a", 5, 1.0)],
        "host string, n_pending long, rep double",
    )
    out = {
        r.host: r.alloc
        for r in allocate_budget(pend, 6, weight_col="rep").collect()
    }
    assert out == {"a": 2, "b": 2, "c": 1, "d": 1}


@pytest.mark.parametrize("budget", [1, 7, 171, 1000])
def test_alloc_total_invariant_property(spark, budget):
    from crawler_spark.operators.allocate import allocate_budget

    pend = _pending(
        spark, [(f"h{i}", (i * 13) % 29 + 1) for i in range(23)]
    )
    out = allocate_budget(pend, budget).collect()
    assert sum(r.alloc for r in out) == budget


def test_soft_dedup_weights_cluster_mass(spark):
    from crawler_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    # one 3-cluster {0,1,2} and one 2-cluster {5,6}; rest singletons
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)],
        "node long, canon_id long",
    )
    out = {
        r.doc_id: r.weight
        for r in soft_dedup_weights(docs, clusters).collect()
    }
    assert out[0] == out[1] == out[2] == pytest.approx(1 / 3, abs=1e-6)
    assert out[5] == out[6] == 0.5
    assert all(out[i] == 1.0 for i in (3, 4, 7, 8, 9))
    # each cluster contributes ~1 unit of training mass, singletons 1 each
    assert sum(out.values()) == pytest.approx(7.0, abs=1e-5)


# ---------------------------------------------------------------------------
# LSH band planning (operators/dedup.py: plan_lsh_bands)
# ---------------------------------------------------------------------------


def test_plan_lsh_bands_factorization_and_midpoint():
    from crawler_spark.operators.dedup import plan_lsh_bands

    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = plan_lsh_bands(t, n_hashes=64)
        assert b * r == 64
        # the S-curve midpoint (1/b)^(1/r) lands near the target
        assert abs((1.0 / b) ** (1.0 / r) - t) < 0.25


def test_plan_lsh_bands_threshold_monotonic():
    from crawler_spark.operators.dedup import plan_lsh_bands

    # a higher threshold needs LONGER bands (more rows per band) so
    # low-similarity pairs stop colliding: r is non-decreasing in t
    rows = [plan_lsh_bands(t, n_hashes=128)[1] for t in (0.2, 0.5, 0.8)]
    assert rows == sorted(rows)


def test_plan_lsh_bands_fp_weight_bites():
    from crawler_spark.operators.dedup import plan_lsh_bands

    # caring only about false positives pushes toward longer bands
    # (fewer accidental candidates) than caring only about recall
    b_fp, r_fp = plan_lsh_bands(0.5, 64, fp_weight=0.99)
    b_fn, r_fn = plan_lsh_bands(0.5, 64, fp_weight=0.01)
    assert r_fp >= r_fn
    assert b_fp * r_fp == b_fn * r_fn == 64


def test_plan_lsh_bands_default_matches_shipped_config():
    from crawler_spark.operators.dedup import plan_lsh_bands

    # the repo's long-standing 16x4 default for threshold ~0.5 corpora
    # is what the planner derives from first principles
    assert plan_lsh_bands(0.5, 64) == (16, 4)


def test_plan_lsh_bands_validates():
    import pytest as _pytest

    from crawler_spark.operators.dedup import plan_lsh_bands

    with _pytest.raises(ValueError):
        plan_lsh_bands(0.0)
    with _pytest.raises(ValueError):
        plan_lsh_bands(0.5, n_hashes=1)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (operators/topk.py: rrf_fuse)
# ---------------------------------------------------------------------------


def test_rrf_fuse_known_values(spark):
    from crawler_spark.operators.topk import rrf_fuse

    s1 = spark.createDataFrame(
        [(1, 30.0), (2, 20.0), (3, 10.0)], "doc_id long, score double"
    )
    s2 = spark.createDataFrame(
        [(3, 9.0), (2, 5.0)], "doc_id long, score double"  # 1 missing
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse([s1, s2], k=60).collect()}
    assert got[1] == pytest.approx(1 / 61, abs=1e-12)  # rank1 + missing
    assert got[2] == pytest.approx(1 / 62 + 1 / 62, abs=1e-12)
    assert got[3] == pytest.approx(1 / 63 + 1 / 61, abs=1e-12)
    # an outlier score cannot dominate: fusing is rank-wise, so doc 3's
    # s2 win only moves it one reciprocal step, not proportionally
    assert got[3] > got[2] > got[1]


def test_rrf_fuse_tie_break_deterministic(spark):
    from crawler_spark.operators.topk import rrf_fuse

    s = spark.createDataFrame(
        [(5, 1.0), (2, 1.0), (9, 1.0)], "doc_id long, score double"
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse([s], k=0).collect()}
    # equal scores rank by key ascending: 2 -> 1, 5 -> 2, 9 -> 3
    assert got == {2: pytest.approx(1.0), 5: pytest.approx(0.5),
                   9: pytest.approx(1 / 3)}


def test_null_weight_and_pending_identical_on_both_paths(spark):
    """Null weight → dead host (alloc 0), null pending → grants 0 — and
    the driver-side fast path must return the SAME row set as the
    distributed path (regression: ~(NULL > 0) silently dropped the host
    distributed-side while the fast path kept it, and int(None) crashed
    the fast path)."""
    from crawler_spark.operators.allocate import allocate_budget

    pend = spark.createDataFrame(
        [("a", 10, 2.0), ("b", 5, None), ("c", 3, 1.0), ("d", None, 4.0)],
        "host string, n_pending long, rep double",
    )
    fast = sorted(
        allocate_budget(pend, 6, weight_col="rep", small_hint=4).collect()
    )
    dist = sorted(allocate_budget(pend, 6, weight_col="rep").collect())
    assert fast == dist
    by_host = {r.host: r for r in fast}
    assert by_host["b"].alloc == 0 and by_host["b"].granted == 0
    assert by_host["d"].n_pending == 0 and by_host["d"].granted == 0
    assert sum(r.alloc for r in fast) == 6
