"""Data-selection operators vs pure-Python oracles (DSIR importance
log-weights, CCNet head/middle/tail buckets)."""

import hashlib
import math

import pytest


def _bucket(g, buckets):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets


def _feats(text, buckets):
    ws = text.lower().split()
    grams = ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
    return [_bucket(g, buckets) for g in grams]


def _py_dsir(texts, target_ids, buckets, alpha):
    from collections import Counter

    raw_c, tgt_c = Counter(), Counter()
    per_doc = {}
    for d, t in texts.items():
        fs = _feats(t, buckets)
        per_doc[d] = fs
        raw_c.update(fs)
        if d in target_ids:
            tgt_c.update(fs)
    n_raw, n_tgt = sum(raw_c.values()), sum(tgt_c.values())
    out = {}
    for d, fs in per_doc.items():
        logw = sum(
            math.log((tgt_c.get(b, 0) + alpha) / (n_tgt + alpha * buckets))
            - math.log((raw_c[b] + alpha) / (n_raw + alpha * buckets))
            for b in fs
        )
        out[d] = (len(fs), round(logw, 6))
    return out


def test_dsir_logweights_matches_bruteforce(spark):
    """Log-weights equal the python reference, and documents that look
    like the target score strictly higher than off-target documents."""
    from crawler_spark.operators.selection import dsir_logweights

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox naps near the lazy dog",
        2: "stock market prices fell sharply on tuesday morning",
        3: "quick brown foxes and lazy dogs again and again",
        4: "bond yields and market futures drifted lower today",
    }
    target_ids = {0, 1}  # "fox" domain is the target
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (r["n_feats"], round(r["logw"], 6))
        for r in dsir_logweights(
            df,
            df.where("doc_id in (0, 1)"),
            buckets=1000,
            alpha=1.0,
            portable=True,
        ).collect()
    }
    want = _py_dsir(texts, target_ids, 1000, 1.0)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6)
    # target-domain docs outrank the finance docs per feature
    # (doc 3's plural forms share no hashed feature with the target,
    # so it scores with the off-domain docs — hashed n-grams, not
    # semantics)
    per_feat = {d: got[d][1] / got[d][0] for d in got}
    assert min(per_feat[0], per_feat[1]) > max(
        per_feat[2], per_feat[3], per_feat[4]
    )


def test_dsir_production_hash_same_ordering(spark):
    """xxhash64 buckets are a different feature hash but must induce
    the same domain ranking on a collision-light corpus."""
    from crawler_spark.operators.selection import dsir_logweights

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta iota kappa lam mu",
        2: "one two three four five six seven eight",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    tgt = df.where("doc_id = 0")
    for portable in (True, False):
        got = {
            r["doc_id"]: r["logw"]
            for r in dsir_logweights(
                df, tgt, buckets=4096, portable=portable
            ).collect()
        }
        assert got[1] > got[2]  # shares half the target vocabulary


def test_ccnet_buckets_terciles(spark):
    """Nine same-lang docs with strictly ordered xent → exactly 3 per
    bucket, ordered head < middle < tail by xent."""
    from crawler_spark.operators.selection import ccnet_buckets

    # doc i repeats a private token i times + shares one common token:
    # higher repeat count => more probable tokens => lower xent
    rows = []
    for i in range(9):
        rows.append(
            (i, ("tok%d " % i) * (i + 1) + "common", "en")
        )
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    got = {r["doc_id"]: r for r in ccnet_buckets(df).collect()}
    assert len(got) == 9
    by_bucket = {}
    for r in got.values():
        by_bucket.setdefault(r["bucket"], []).append(r["xent"])
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3,
    }
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_ccnet_buckets_per_language_cutoffs(spark):
    """Cutoffs are PER LANGUAGE: an xent that is 'tail' in a fluent
    language can be 'head' in a noisier one."""
    from crawler_spark.operators.selection import ccnet_buckets

    rows = []
    # lang a: 3 docs of identical fluency profile except doc 2
    for i in range(3):
        rows.append((i, ("w%d " % i) * (3 * i + 1) + "shared", "a"))
    for i in range(3):
        rows.append((10 + i, ("v%d " % i) * (3 * i + 1) + "joint", "b"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    # each language independently spans head/middle/tail
    assert {got[0], got[1], got[2]} == {"head", "middle", "tail"}
    assert {got[10], got[11], got[12]} == {"head", "middle", "tail"}
