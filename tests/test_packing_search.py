"""Shard packing (two-phase weighted prefix sum) and TF-IDF retrieval
vs pure-Python oracles, including the skew and determinism contracts."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _py_pack(rows, budget):
    """rows: (doc_id, lang, n_tokens) — sequential per-lang cumsum."""
    out = {}
    acc = {}
    for doc_id, lang, n in sorted(rows, key=lambda r: (r[1], r[0])):
        start = acc.get(lang, 0)
        out[doc_id] = start // budget
        acc[lang] = start + n
    return out


def test_pack_shards_matches_sequential(spark):
    from crawler_spark.operators.packing import pack_shards

    rng = random.Random(3)
    rows = [
        (i, ["en", "de", "fr"][rng.randrange(3)], rng.randrange(5, 80))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        [(i, lang, "w " * n) for i, lang, n in rows],
        "doc_id: long, lang: string, text: string",
    ).withColumn("text", F.rtrim("text"))
    got = {
        r["doc_id"]: (r["shard_id"], r["n_tokens"])
        for r in pack_shards(df, budget=100).collect()
    }
    want = _py_pack(rows, 100)
    assert len(got) == 400
    for doc_id, lang, n in rows:
        assert got[doc_id] == (want[doc_id], n)


def test_pack_shards_skewed_language(spark):
    """95% of docs in ONE language — the per-lang-window anti-plan's
    worst case; the two-phase plan must still pack correctly and shard
    ids must be dense from 0."""
    from crawler_spark.operators.packing import pack_shards

    rows = [(i, "en" if i % 20 else "zh", 10) for i in range(1000)]
    df = spark.createDataFrame(
        [(i, lang, "t " * n) for i, lang, n in rows],
        "doc_id: long, lang: string, text: string",
    ).withColumn("text", F.rtrim("text"))
    got = pack_shards(df, budget=95, num_partitions=16).collect()
    want = _py_pack(rows, 95)
    for r in got:
        assert r["shard_id"] == want[r["doc_id"]]
    # dense shards: 950 docs * 10 tokens / 95 budget = 100 en shards
    en_shards = sorted({r["shard_id"] for r in got if r["lang"] == "en"})
    assert en_shards == list(range(100))


def test_pack_shards_invariant_to_input_partitioning(spark):
    """Shard membership depends only on the total order, never on how
    the input happened to be partitioned (the resume/re-run contract)."""
    from crawler_spark.operators.packing import pack_shards

    rows = [(i, "en", 7 + (i * 13) % 31) for i in range(300)]
    df = spark.createDataFrame(
        [(i, lang, "x " * n) for i, lang, n in rows],
        "doc_id: long, lang: string, text: string",
    ).withColumn("text", F.rtrim("text"))
    a = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(df, budget=200, num_partitions=4).collect()
    }
    b = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(
            df.repartition(13), budget=200, num_partitions=16
        ).collect()
    }
    assert a == b


def test_shards_overflow_bounded_by_one_doc(spark):
    """A shard's token total may exceed budget only by the tail of its
    LAST document (documents are never split)."""
    from crawler_spark.operators.packing import pack_shards

    rows = [(i, "en", 60) for i in range(50)]
    df = spark.createDataFrame(
        [(i, lang, "y " * n) for i, lang, n in rows],
        "doc_id: long, lang: string, text: string",
    ).withColumn("text", F.rtrim("text"))
    got = pack_shards(df, budget=100).collect()
    per_shard = {}
    for r in got:
        per_shard.setdefault(r["shard_id"], []).append(r["n_tokens"])
    for shard, toks in per_shard.items():
        # removing the last-started doc brings the shard under budget
        assert sum(toks) - max(toks) < 100


def _py_tfidf(docs, terms, k):
    n = len(docs)
    tf = {}
    for doc_id, text in docs:
        words = text.split(" ")
        for t in set(words) & set(terms):
            tf[(doc_id, t)] = (words.count(t), len(words))
    df = {}
    for (doc_id, t), _ in tf.items():
        df[t] = df.get(t, 0) + 1
    scores = {}
    hits = {}
    for (doc_id, t), (c, dl) in tf.items():
        idf = math.log((n + 1) / (df[t] + 1)) + 1
        scores[doc_id] = scores.get(doc_id, 0.0) + (c / dl) * idf
        hits[doc_id] = hits.get(doc_id, 0) + 1
    ranked = sorted(
        scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:k]
    return [
        (doc_id, hits[doc_id], round(s, 6)) for doc_id, s in ranked
    ]


def test_tfidf_topk_matches_python(spark):
    from crawler_spark.analytics.search import tfidf_topk

    rng = random.Random(11)
    vocab = ["spark", "join", "scan", "row", "table", "agg", "key"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = [
        (r["doc_id"], r["n_hits"], r["score"])
        for r in tfidf_topk(df, ["spark", "join"], k=10).collect()
    ]
    assert got == _py_tfidf(docs, ["spark", "join"], 10)


def test_tfidf_topk_no_match_terms(spark):
    from crawler_spark.analytics.search import tfidf_topk

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c d e")], "doc_id: long, text: string"
    )
    assert tfidf_topk(df, ["zzz"], k=5).count() == 0
    # partial overlap: only matching docs returned, n_hits counts terms
    rows = tfidf_topk(df, ["a", "e", "zzz"], k=5).collect()
    got = {r["doc_id"]: r["n_hits"] for r in rows}
    assert got == {0: 1, 1: 1}


def test_export_shards_layout_and_determinism(spark, tmp_path):
    """Export writes lang=/shard_id= parquet, re-export reproduces the
    exact same shard contents, and every shard respects the budget up
    to its last document's tail."""
    import os
    import random

    from crawler_spark.operators.packing import export_shards

    rng = random.Random(9)
    rows = [
        (i, ["en", "de"][rng.randrange(2)],
         "w " * rng.randrange(5, 60))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, lang: string, text: string"
    ).withColumn("text", F.rtrim("text"))

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_shards(df, p1, budget=200)
    m2 = export_shards(df, p2, budget=200)
    assert m1 == m2
    assert m1["n_docs"] == 300

    # hive layout exists
    langs = {d for d in os.listdir(p1) if d.startswith("lang=")}
    assert langs == {"lang=en", "lang=de"}
    shard_dirs = os.listdir(os.path.join(p1, "lang=en"))
    assert all(d.startswith("shard_id=") for d in shard_dirs)

    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    key = lambda r: (r["lang"], r["shard_id"], r["doc_id"])  # noqa: E731
    ra, rb = sorted(a.collect(), key=key), sorted(b.collect(), key=key)
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb]
    assert m1["n_shards"] == a.select("lang", "shard_id").distinct().count()

    # budget: shard total minus its largest doc is under budget
    per = {}
    for r in ra:
        per.setdefault((r["lang"], r["shard_id"]), []).append(r["n_tokens"])
    for toks in per.values():
        assert sum(toks) - max(toks) < 200


def test_export_jsonl_roundtrip_matches_parquet_sink(spark, tmp_path):
    """The JSONL sink writes the SAME shard membership and document
    content as the parquet sink (read back via spark.read.json), in the
    same lang=/shard_id= layout, with byte-deterministic re-export."""
    import json
    import os
    import random

    from crawler_spark.operators.packing import export_jsonl, export_shards

    rng = random.Random(13)
    rows = [
        (i, ["en", "de"][rng.randrange(2)], "w " * rng.randrange(5, 60))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, lang: string, text: string"
    ).withColumn("text", F.rtrim("text"))

    pq, j1, j2 = (str(tmp_path / d) for d in ("pq", "j1", "j2"))
    mp = export_shards(df, pq, budget=150)
    m1 = export_jsonl(df, j1, budget=150)
    m2 = export_jsonl(df, j2, budget=150)
    assert mp == m1 == m2

    back = spark.read.json(f"{j1}/lang=*/shard_id=*/*", )
    # partition dirs aren't parsed by the glob read — reattach from the
    # parquet sink via doc_id to compare membership + content
    pqr = {
        r["doc_id"]: (r["lang"], r["shard_id"], r["text"], r["n_tokens"])
        for r in spark.read.parquet(pq).collect()
    }
    jr = {r["doc_id"]: (r["text"], r["n_tokens"]) for r in back.collect()}
    assert set(jr) == set(pqr)
    for did, (lang, shard, text, ntok) in pqr.items():
        assert jr[did] == (text, ntok)

    # byte determinism: concatenated sorted lines identical across runs
    def all_lines(root):
        out = []
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                if f.endswith(".txt"):
                    with open(os.path.join(dirpath, f)) as fh:
                        out.extend(fh.read().splitlines())
        return sorted(out)

    l1, l2 = all_lines(j1), all_lines(j2)
    assert l1 == l2 and l1
    # every line is a json object with sorted keys present
    obj = json.loads(l1[0])
    assert set(obj) == {"doc_id", "n_tokens", "text"}


def test_bm25_empty_corpus_returns_empty(spark):
    """Degenerate input parity with tfidf_topk: an empty corpus returns
    an empty top-k (regression: avg() → NULL → float(None) TypeError at
    plan-build time)."""
    from crawler_spark.analytics.search import bm25_topk

    empty = spark.createDataFrame([], "doc_id int, text string")
    assert bm25_topk(empty, ["x"], k=5).collect() == []
