"""Tests for the training-data ops over the driver-provided testdata."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from crawler_spark.operators.multimodal import (
    attach_media_meta,
    decode_features,
    frame_sample,
    real_decoder,
    stub_decoder,
)
from crawler_spark.operators.quality import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)
from crawler_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_join,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# -- dedup ------------------------------------------------------------------


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "x y"), (5, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.canon_id, r.is_dup) for r in exact_duplicates(df).collect()}
    assert got == {1: (1, False), 2: (1, True), 3: (3, False), 4: (3, True),
                   5: (5, False)}
    assert sorted(r.doc_id for r in dedup_exact(df).collect()) == [1, 3, 5]


def test_minhash_finds_near_dups(spark, docs):
    # append a near-duplicate of doc 0 (one word changed)
    base = docs.where("doc_id = 0").collect()[0]
    words = base.text.split()
    words[len(words) // 2] = "zzzaltered"
    near = spark.createDataFrame(
        [(9001, " ".join(words))], "doc_id long, text string"
    )
    corpus = docs.select("doc_id", "text").unionByName(near)
    pairs = minhash_dedup(corpus, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 9001) in found
    # jaccard estimate should be high but < 1
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}[(0, 9001)]
    assert 0.5 <= est <= 1.0


def test_incremental_minhash_equals_full_run_restriction(spark, docs):
    """minhash_dedup_incremental(new, corpus_sigs) must produce exactly
    the full minhash_dedup(old ∪ new) pair set restricted to pairs
    touching a new doc (orientation normalized), plus signatures for the
    new docs identical to the full run's — the contract that lets a
    recurring crawl dedup per-round without re-pairing the corpus."""
    from crawler_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_signatures_from_hashes,
        word_shingle_hashes,
    )

    base = docs.select("doc_id", "text").where("doc_id < 80")
    # make cross-set near-dups: clone some 'old' docs into 'new' ids
    clones = base.where("doc_id % 7 = 0").select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" tailword")).alias("text"),
    )
    full = base.unionByName(clones)
    new_ids = {r.doc_id for r in clones.select("doc_id").collect()}

    want = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): round(r.est_jaccard, 9)
        for r in minhash_dedup(full, threshold=0.3).collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }

    old_sigs = minhash_signatures_from_hashes(word_shingle_hashes(base))
    pairs, new_sigs = minhash_dedup_incremental(
        clones, old_sigs, threshold=0.3
    )
    got_rows = pairs.collect()
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): round(r.est_jaccard, 9)
        for r in got_rows
    }
    assert want == got and want, (len(want), len(got))
    # id_b is always new; vs_corpus marks corpus-side id_a
    for r in got_rows:
        assert r.id_b in new_ids
        assert r.vs_corpus == (r.id_a not in new_ids)
    # the returned signatures are the full run's signatures for new docs
    full_sigs = {
        r.doc_id: tuple(r.sig)
        for r in minhash_signatures_from_hashes(
            word_shingle_hashes(clones)
        ).collect()
    }
    inc_sigs = {r.doc_id: tuple(r.sig) for r in new_sigs.collect()}
    assert full_sigs == inc_sigs


def test_cluster_survivors_quality_pick(spark):
    """Exactly one keep per cluster: highest score wins, ties break to
    the lowest node id (the min-id canonical is NOT automatically the
    survivor)."""
    from crawler_spark.operators.dedup import cluster_survivors

    clusters = spark.createDataFrame(
        [(1, 1, False), (2, 1, True), (3, 1, True),
         (7, 7, False), (9, 7, True)],
        "node long, canon_id long, is_dup boolean",
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (9, 4.0)],
        "doc_id long, score double",
    )
    out = {
        r.node: r.keep
        for r in cluster_survivors(clusters, scores).collect()
    }
    assert out == {1: False, 2: True, 3: False, 7: False, 9: True}

    # members missing from the score table still get a decision (nulls
    # sort last), and a wholly-unscored cluster keeps its lowest id
    partial = spark.createDataFrame(
        [(1, 9.0)], "doc_id long, score double"
    )
    out2 = {
        r.node: r.keep
        for r in cluster_survivors(clusters, partial).collect()
    }
    assert out2 == {1: True, 2: False, 3: False, 7: True, 9: False}


def test_host_disjoint_split(spark, docs):
    """Every host lands wholly on one side; the split is deterministic,
    host-keyed (doc ids don't matter), and roughly sized by eval_bps."""
    from crawler_spark.operators.scrub import host_disjoint_split

    d = docs.select("doc_id", F.col("source").alias("host"))
    out = host_disjoint_split(d, eval_bps=2500, salt="t").collect()
    sides: dict[str, set] = {}
    for r in out:
        sides.setdefault(r.host, set()).add(r.is_eval)
    assert all(len(s) == 1 for s in sides.values()), "host straddles split"
    n_eval_hosts = sum(1 for s in sides.values() if s == {True})
    assert 0 < n_eval_hosts < len(sides)
    # deterministic: re-run (different partitioning) → same assignment
    again = {
        r.host: r.is_eval
        for r in host_disjoint_split(
            d.repartition(7), eval_bps=2500, salt="t"
        ).collect()
    }
    assert again == {h: next(iter(s)) for h, s in sides.items()}
    # a different salt draws an independent split
    other = {
        r.host: r.is_eval
        for r in host_disjoint_split(d, eval_bps=2500, salt="u").collect()
    }
    assert other != again


def test_minhash_no_pair_for_distinct_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    assert minhash_dedup(df, threshold=0.3).count() == 0


def test_simhash_near_dups(spark, docs):
    # deterministic 60-token doc whose 1-word variant has hamming 3
    # (scanned offline: seed 2 → hamming 3, 3 of 4 chunks equal)
    import random

    rng = random.Random(2)
    vocab = [f"word{i}" for i in range(500)]
    words = [rng.choice(vocab) for _ in range(60)]
    variant = list(words)
    variant[30] = "altered"
    extra = spark.createDataFrame(
        [(9002, " ".join(words)), (9003, " ".join(variant))],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").where("doc_id < 50").unionByName(extra)
    pairs = simhash_near_dups(corpus, max_hamming=3)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert found.get((9002, 9003)) == 3
    # identical text ⇒ identical signature
    sig = simhash_signatures(
        extra.unionByName(
            spark.createDataFrame([(9004, " ".join(words))],
                                  "doc_id long, text string")
        )
    )
    s = {r.doc_id: r.simhash for r in sig.collect()}
    assert s[9002] == s[9004]


def test_simhash_hamming_zero_is_equality_join(spark):
    df = spark.createDataFrame(
        [
            (1, "same words in this doc entirely"),
            (2, "same words in this doc entirely"),
            (3, "completely different other content here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_dups(df, max_hamming=0).collect()}
    assert pairs == {(1, 2): 0}


def test_simhash_mega_clique_guard_bounds_join(spark):
    """An identical-doc clique bigger than the bucket cap must be skipped
    by the chunk join (quadratic blowup guard), yielding zero pairs —
    exact dedup, run first, owns identical docs."""
    n = 3000
    df = spark.createDataFrame(
        [(i, "the exact same boilerplate text in every single row")
         for i in range(n)],
        "doc_id long, text string",
    )
    assert simhash_near_dups(df, max_hamming=3, max_bucket_size=100).count() == 0
    # and with the guard disabled a small clique still pairs fully
    small = df.where("doc_id < 10")
    assert simhash_near_dups(small, max_hamming=3,
                             max_bucket_size=None).count() == 45


def test_guarded_near_dup_curation_bounded_mega_clique(spark):
    """The COMPOSED guarded chain (dedup_exact → capped-bucket minhash →
    dedup_clusters → survivors) must complete bounded on a 20k-doc
    boilerplate-template family — whose shared shingles put thousands of
    docs into single LSH band buckets (a ~10^9-pair join unguarded) —
    while still collapsing a byte-identical clique (exact dedup's job)
    and a genuine rare-vocabulary near-dup pair (small buckets survive
    the cap)."""
    from crawler_spark.operators.dedup import near_dup_curation

    n = 20000
    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank today with boilerplate navigation footer text")
    template = spark.range(n).selectExpr(
        "id AS doc_id", f"concat('{base} user ', id) AS text"
    )
    pair = spark.createDataFrame(
        [(n + 1, "zanzibar quokka meringue acrobatics filament twelve "
                 "umbrellas dancing gleefully through october onward"),
         (n + 2, "zanzibar quokka meringue acrobatics filament twelve "
                 "umbrellas dancing gleefully through october backward")],
        "doc_id long, text string",
    )
    clique = spark.range(n + 10, n + 40).selectExpr(
        "id AS doc_id",
        "'identical identical boilerplate clique text body' AS text",
    )
    docs = template.unionByName(pair).unionByName(clique)
    out = near_dup_curation(docs, threshold=0.5, max_bucket_size=100)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # byte-identical clique → exactly its min id survives
    assert {i for i in ids if n + 10 <= i < n + 40} == {n + 10}
    # rare-vocab near-dup pair → min id survives, twin collapsed
    assert n + 1 in ids and n + 2 not in ids


def test_ngram_jaccard_df_cap_bounds_posting_lists(spark):
    """A boilerplate shingle shared by every doc must not explode the
    inverted-index join: with the df cap it contributes no candidate
    pairs, and scores for surviving pairs are a lower bound."""
    boiler = "click here to accept all cookies"
    rows = [(i, f"{boiler} unique{i} one{i} two{i} three{i}")
            for i in range(500)]
    # two genuinely similar docs on top of the boilerplate corpus
    rows += [(9001, "alpha beta gamma delta epsilon zeta"),
             (9002, "alpha beta gamma delta epsilon zeta eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(df, n=3, threshold=0.3,
                                          max_doc_freq=50).collect()}
    # the 500 boilerplate docs share only capped shingles → no pairs
    assert all(a == 9001 for a, _ in pairs)
    assert (9001, 9002) in pairs


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),  # shares most trigrams with 1
            (3, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()}
    assert (1, 2) in pairs
    # doc1: grams {abc,bcd,cde,def,efg,fgh}, doc2: {...,efx→} share 5 of 7
    assert pairs[(1, 2)] == pytest.approx(5 / 7)
    assert (1, 3) not in pairs


# -- similarity -------------------------------------------------------------


def _exact_topk_numpy(emb_pdf, q, k):
    mat = np.stack(emb_pdf.embedding.to_numpy()).astype("float64")
    qv = np.asarray(q, dtype="float64")
    cos = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((emb_pdf.vec_id.to_numpy(), -cos))
    return emb_pdf.vec_id.to_numpy()[order][:k].tolist()


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    q = pdf.embedding.iloc[7]
    got = [r.vec_id for r in cosine_topk(emb, list(q), k=5).collect()]
    assert got == _exact_topk_numpy(pdf, q, 5)
    assert got[0] == 7  # self is nearest


def test_cosine_topk_join_matches_single(spark, emb):
    pdf = emb.toPandas()
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in pdf.embedding.iloc[i]]) for i in (3, 11)],
        "query_id long, embedding array<float>",
    )
    got = cosine_topk_join(queries, emb, k=4).toPandas()
    for qid in (3, 11):
        sub = got[got.query_id == qid].sort_values("_rank")
        assert sub.vec_id.tolist() == _exact_topk_numpy(
            pdf, pdf.embedding.iloc[qid], 4
        )


def test_lsh_ann_recall(spark, emb):
    pdf = emb.toPandas()
    q = list(pdf.embedding.iloc[0])
    exact = set(_exact_topk_numpy(pdf, q, 5))
    approx = {
        r.vec_id
        for r in lsh_ann_topk(emb, q, dim=len(q), k=5, n_bits=6,
                              multiprobe=3).collect()
    }
    # self must always be found; recall over exact top-5 should be decent
    assert 0 in approx
    assert len(exact & approx) >= 2


# -- quality ----------------------------------------------------------------


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! a b"), (2, ""), (3, "  x  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens, r.n_chars)
           for r in token_counts(df).collect()}
    # "Hello, world! a b" → ws 4; bpe: Hello , world ! a b = 6
    assert got[1] == (4, 6, 17)
    assert got[2] == (0, 0, 0)
    assert got[3][0] == 1


def test_quality_scores_bands(spark, docs):
    got = quality_scores(docs).toPandas()
    assert ((got.score >= 0) & (got.score <= 1)).all()
    assert (got.n_tokens > 0).all()
    # longer docs should not score lower purely for length
    assert got[got.n_tokens >= 20].score.mean() >= got.score.mean() - 0.3


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is that good"),
            (2, "el perro y la casa de que los gatos por una"),
            (3, "der hund und die katze ist nicht mit ein von zu"),
            (4, "这是一个中文句子 而且 很长 的 中文"),
            (5, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "zh", 5: "und"}


def test_fingerprints_stable_and_shift_tolerant(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
            (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
            (3, "PREFIX w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
        ],
        "doc_id long, text string",
    )
    rows = fingerprints(df).collect()
    got: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.gram_pos)):
        got.setdefault(r.doc_id, []).append(r.fp_hash)
    assert got[1] == got[2]  # deterministic
    # winnowing: shifted doc shares most picks
    shared = set(got[1]) & set(got[3])
    assert len(shared) >= len(set(got[1])) // 2


def test_fingerprints_window_one_keeps_every_gram(spark):
    """window=1 is the degenerate keep-every-distinct-consecutive-gram
    sketch (valid per the classic algorithm); it must not crash and must
    match the serial reference."""
    from crawler_spark.operators.quality import winnow_reference

    texts = ["a b c d e f g h", "dup dup dup dup dup dup"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.gram_pos, r.fp_hash)
        for r in fingerprints(df, k=3, window=1, portable=True).collect()
    }
    want = {
        (i, pos, h)
        for i, t in enumerate(texts)
        for pos, h in winnow_reference(t.lower().split(), 3, 1)
    }
    assert got == want


def test_fingerprints_match_serial_reference(spark):
    from crawler_spark.operators.quality import winnow_reference

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "tiny",
        "",
        "a b c d e",
        "x y z w v u t s r q p o n m",
        "dup dup dup dup dup dup dup dup",  # identical grams: lots of ties
        "  leading and   trailing whitespace   mix \n newline tok ",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.gram_pos, r.fp_hash)
        for r in fingerprints(df, k=5, window=4, portable=True).collect()
    }
    want = {
        (i, pos, h)
        for i, t in enumerate(texts)
        for pos, h in winnow_reference(t.lower().split(), 5, 4)
    }
    assert got == want


# -- multimodal -------------------------------------------------------------


def test_media_meta_and_stub_features(spark):
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = attach_media_meta(df).collect()
    assert all(r.n_bytes == 100 + r.media_id for r in meta)
    assert all(r.media_kind == "image" for r in meta)

    feats = decode_features(df, decoder=stub_decoder, dim=8,
                            max_batch_rows=6).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r.features for r in feats}
    assert all(len(v) == 8 for v in by_id.values())
    # deterministic: same payload → same features
    again = decode_features(df, decoder=stub_decoder, dim=8).collect()
    assert {r.media_id: r.features for r in again} == by_id


def test_real_decoder_is_stubbed(spark):
    df = spark.createDataFrame([(1, b"xx")], "media_id long, payload binary")
    with pytest.raises(Exception):
        decode_features(df, decoder=real_decoder, dim=4).collect()


def test_frame_sample_expansion(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)))], "media_id long, payload binary"
    )
    frames = frame_sample(df, n_frames=4, frame_bytes=16).collect()
    assert len(frames) == 4
    assert [r.frame_idx for r in frames] == [0, 1, 2, 3]
    assert frames[0].frame == bytes(range(16))
    assert frames[1].frame == bytes(range(64, 80))


def test_cosine_pairs_exact_vs_numpy(spark, emb):
    from crawler_spark.operators.similarity import cosine_pairs_exact

    sub = emb.where(F.col("vec_id") < 60)
    pdf = sub.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(pdf.embedding.to_numpy()).astype("float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ids = pdf.vec_id.to_numpy()
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.8
    }
    got = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_exact(sub, threshold=0.8).collect()
    }
    assert got == want


def test_semantic_dedup_cell_confinement_and_min_id(spark):
    """SemDeDup semantics: a high-cosine pair in the SAME cell is deduped
    to the min id; an equally-similar pair SPLIT across cells is kept
    (the compare is cell-confined by design — that is the Σc² trick);
    dissimilar same-cell rows are kept."""
    from crawler_spark.operators.similarity import semantic_dedup

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = [
        (1, [1.0, 0.01]),    # cell 0 ┐ cos≈1 → dup, 1 survives
        (2, [1.0, 0.02]),    # cell 0 ┘
        (3, [0.71, 0.705]),  # cell 0 ┐ cos≈1 but cross-cell → both kept
        (4, [0.705, 0.71]),  # cell 1 ┘
        (5, [0.9, 0.43]),    # cell 0, dissimilar enough → kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = {
        r.vec_id: r.cell
        for r in semantic_dedup(df, threshold=0.995, centroids=cents)
        .collect()
    }
    assert set(out) == {1, 3, 4, 5}
    assert out[3] == 0 and out[4] == 1


def test_semantic_dedup_identical_collapse_parity(spark, emb):
    """The identical-embedding collapse (default on) is result-identical
    to the uncollapsed run on a corpus salted with exact-duplicate
    cliques — the clique members share every outside edge, so the
    component structure and min-id survivors cannot change. This is the
    golden contract that lets the collapse default on: it is purely a
    Σ-pairs optimization (clique of m costs O(m) instead of O(m²))."""
    from crawler_spark.operators.similarity import (
        _centroids,
        semantic_dedup,
    )

    base = emb.where(F.col("vec_id") < 80).select("vec_id", "embedding")
    # 3 exact copies of every vector under fresh ids (the exact-dup-doc
    # embedding shape), plus an identical all-zero pair (cosine NULL via
    # try_divide — near-dup of nothing, excluded from the collapse)
    salted = base
    for k in (1, 2, 3):
        salted = salted.unionByName(
            base.select(
                (F.col("vec_id") + 1000 * k).alias("vec_id"), "embedding"
            )
        )
    zero = spark.createDataFrame(
        [(5000, [0.0] * 64), (5001, [0.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    salted = salted.unionByName(zero).cache()
    cents = _centroids(base, 8, "vec_id", "embedding")
    on = {
        (r.vec_id, r.cell)
        for r in semantic_dedup(
            salted, threshold=0.9, centroids=cents
        ).collect()
    }
    off = {
        (r.vec_id, r.cell)
        for r in semantic_dedup(
            salted, threshold=0.9, centroids=cents,
            collapse_identical=False,
        ).collect()
    }
    assert on == off
    # every non-zero clique collapsed to its min id: no +1000k copy
    # survives; BOTH zero rows survive (zero vectors are near-dup of
    # nothing — cosine NULL — and the collapse must not merge them)
    assert all(v < 1000 or v in (5000, 5001) for v, _ in on)
    assert {5000, 5001} <= {v for v, _ in on}
    salted.unpersist()


def test_incremental_semantic_equals_full_run_restriction(spark, emb):
    """semantic_dedup_incremental(new, corpus_assigned) must produce
    exactly the full semantic_cell_pairs(old ∪ new) pair set restricted
    to pairs touching a new row — with AND without the cell cap (the
    cap counts corpus and new rows together, like the full run) — the
    contract that lets a recurring crawl run SemDeDup per-round without
    re-pairing the corpus."""
    from crawler_spark.operators.similarity import (
        _centroids,
        ivf_assign,
        semantic_cell_pairs,
        semantic_dedup_incremental,
    )

    base = emb.where(F.col("vec_id") < 120).select("vec_id", "embedding")
    # cross-set near-dups: exact copies of some corpus vectors under new
    # (strictly larger) ids, plus genuinely new vectors
    clones = base.where("vec_id % 5 = 0").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    fresh = emb.where("vec_id >= 120 AND vec_id < 150").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    new = clones.unionByName(fresh)
    full = base.unionByName(new)
    new_ids = {r.vec_id for r in new.select("vec_id").collect()}
    cents = _centroids(base, 8, "vec_id", "embedding")

    old_assigned = ivf_assign(base, cents)
    full_assigned = ivf_assign(full, cents)
    # a cap strictly between the smallest and largest cell provably
    # engages (drops the biggest cell) without emptying the pair set
    sizes = sorted(
        r["n"]
        for r in full_assigned.groupBy("cell").agg(
            F.count("*").alias("n")
        ).collect()
    )
    assert sizes[0] < sizes[-1], sizes
    results = {}
    for cap in (None, sizes[-1] - 1):
        want = {
            (r.id_a, r.id_b)
            for r in semantic_cell_pairs(
                full_assigned, 0.35, max_cell_size=cap
            ).collect()
            if r.id_a in new_ids or r.id_b in new_ids
        }
        pairs, new_assigned = semantic_dedup_incremental(
            new, old_assigned, cents, threshold=0.35, max_cell_size=cap
        )
        got_rows = pairs.collect()
        got = {(r.id_a, r.id_b) for r in got_rows}
        assert want == got, (cap, len(want), len(got))
        results[cap] = got
        # id_b is always new; vs_corpus marks corpus-side id_a
        for r in got_rows:
            assert r.id_b in new_ids
            assert r.vs_corpus == (r.id_a not in new_ids)
    # the uncapped run found pairs and the cap genuinely dropped some
    assert results[None]
    assert results[sizes[-1] - 1] < results[None]
    # the returned assignment is the full run's assignment for new rows
    full_cells = {
        r.vec_id: r.cell
        for r in full_assigned.collect()
        if r.vec_id in new_ids
    }
    inc_cells = {r.vec_id: r.cell for r in new_assigned.collect()}
    assert full_cells == inc_cells


def test_lsh_near_dup_pairs_recall(spark, emb):
    from crawler_spark.operators.similarity import (
        cosine_pairs_exact,
        lsh_near_dup_pairs,
    )

    sub = emb.where(F.col("vec_id") < 150).cache()
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_exact(sub, threshold=0.3).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_near_dup_pairs(
            sub, dim=64, threshold=0.3, n_bits=16, n_bands=8
        ).collect()
    }
    # every reported pair is verified exact-cosine => no false positives
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.6  # banding recall


def test_ivf_topk_recall_and_determinism(spark, emb):
    from crawler_spark.operators.similarity import ivf_topk

    pdf = emb.toPandas()
    q = list(pdf.embedding.iloc[0])
    exact = set(_exact_topk_numpy(pdf, q, 5))
    got1 = [r.vec_id for r in
            ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).collect()]
    got2 = [r.vec_id for r in
            ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).collect()]
    assert got1 == got2  # deterministic centroid pick
    assert 0 in got1  # self found (its cell is always probed: cos=1)
    assert len(exact & set(got1)) >= 3


def test_simhash_chunk_scaling_hamming4(spark):
    """max_hamming=4 uses 5 chunks; a pair differing by 4 spread-out bits
    (one per 16-bit quarter — invisible to 4-chunk banding) is found."""
    from crawler_spark.operators.dedup import (
        _simhash_udf,
        simhash_near_dups,
    )

    # craft two texts, then check the operator against brute force
    df = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta epsilon zeta eta") for i in range(40)]
        + [(100, "alpha beta gamma delta epsilon zeta eta theta"),
           (101, "alpha beta gamma delta epsilon zeta eta iota")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in
            df.select("doc_id", _simhash_udf("text").alias("simhash")).collect()}
    want = {
        (a, b)
        for a in sigs for b in sigs if a < b
        and bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 4
    }
    got = {(r.id_a, r.id_b)
           for r in simhash_near_dups(df, max_hamming=4).collect()}
    assert got == want  # exact: banding recall + bit_count verification


def test_minhash_hashed_shingle_path_equivalence(spark):
    """The pre-hashed production path (word_shingle_hashes +
    minhash_signatures_from_hashes) yields byte-identical signatures to
    minhash_signatures(word_shingles(...)) — the string path derives the
    same family from the same xxhash64 base, it just reads each shingle
    string once instead of once per family member."""
    from crawler_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_from_hashes,
        word_shingle_hashes,
        word_shingles,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words entirely here now"),
        (4, "short"),  # sub-k-token doc: empty shingle set
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_str = {
        r.doc_id: r.sig
        for r in minhash_signatures(word_shingles(df), n_hashes=16).collect()
    }
    via_hash = {
        r.doc_id: r.sig
        for r in minhash_signatures_from_hashes(
            word_shingle_hashes(df), n_hashes=16
        ).collect()
    }
    assert via_str == via_hash
    assert set(via_str) == {1, 2, 3}  # doc 4 has no shingles


def test_minhash_collapse_identical_connectivity_equivalence(spark):
    """collapse_identical=True yields the SAME transitive closure (same
    clusters, same curation survivors) as the full bucket-cooccurrence
    pair set — collapsed cliques appear as stars at est_jaccard 1.0.

    The identical-signature docs here are case/whitespace variants:
    different bytes (so dedup_exact keeps them) but identical lowercased
    token streams, hence identical shingle sets and signatures — the
    boilerplate shape the collapse exists for."""
    from crawler_spark.operators.dedup import dedup_clusters, minhash_dedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta"),
        (3, "alpha  beta   gamma delta epsilon zeta eta theta"),
        (4, "alpha beta gamma delta epsilon zeta eta iota"),
        (5, "completely different content words entirely unrelated here"),
        (6, "another separate document with its own vocabulary okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.2, n_bands=8, rows_per_band=2)
    full = minhash_dedup(df, **kw)
    coll = minhash_dedup(df, collapse_identical=True, **kw)

    closure_full = {
        (r.node, r.canon_id) for r in dedup_clusters(full).collect()
    }
    closure_coll = {
        (r.node, r.canon_id) for r in dedup_clusters(coll).collect()
    }
    assert closure_full == closure_coll
    assert {(1, 1), (2, 1), (3, 1), (4, 1)} <= closure_coll

    coll_rows = coll.collect()
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    # star edges to the group representative, exact 1.0; every collapsed
    # pair the full path also finds (no invented pairs beyond the stars)
    stars = {(r.id_a, r.id_b) for r in coll_rows if r.est_jaccard == 1.0}
    assert {(1, 2), (1, 3)} <= stars
    assert {(r.id_a, r.id_b) for r in coll_rows} <= full_pairs | stars


def test_curation_collapse_survivors_equal(spark):
    """near_dup_curation (production path: collapse ON) keeps exactly the
    docs the full-pair chain keeps."""
    from crawler_spark.operators.dedup import (
        dedup_clusters,
        dedup_exact,
        minhash_dedup,
        near_dup_curation,
    )
    from pyspark.sql import functions as F

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet colors rainbow sky",
    ]
    rows = []
    did = 0
    for b in base:
        for variant in (b, b.upper(), b + " tail", b.replace(" ", "  ")):
            rows.append((did, variant))
            did += 1
    rows.append((did, "totally unrelated lone document stands alone fine"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(k=3, n_bands=8, rows_per_band=2, threshold=0.3)
    got = sorted(
        r.doc_id
        for r in near_dup_curation(df, max_bucket_size=10000, **kw).collect()
    )
    unique = dedup_exact(df)
    pairs = minhash_dedup(unique, max_bucket_size=10000, **kw)
    dup_ids = (
        dedup_clusters(pairs)
        .where(F.col("is_dup"))
        .select(F.col("node").alias("doc_id"))
    )
    want = sorted(
        r.doc_id for r in unique.join(dup_ids, "doc_id", "left_anti")
        .select("doc_id").collect()
    )
    assert got == want


def test_collapse_keeps_over_cap_clique(spark):
    """When an identical-signature clique EXCEEDS max_bucket_size the
    paths deliberately diverge in the collapse path's favor: full
    banding loses the whole clique to the bucket guard (its documented
    identical-doc caveat), while the collapse path removes the
    duplicates — stars bypass banding and the lone representative fits
    under the cap. This pins the behavior the docstrings promise for
    over-cap boilerplate; equivalence only holds while the cap does not
    bind (see test_minhash_collapse_identical_connectivity_equivalence)."""
    from crawler_spark.operators.dedup import (
        minhash_dedup,
        near_dup_curation,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    variants = [base, base.upper(), base.title(), base.replace(" ", "  "),
                base.replace(" ", "\t"), base.upper().replace(" ", "  "),
                base.title().replace(" ", "  "), base.replace(" ", "   ")]
    rows = [(i, v) for i, v in enumerate(variants)]  # 8-doc sig clique
    rows.append((100, "totally unrelated lone document stands alone fine"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=3, n_bands=8, rows_per_band=2, threshold=0.3)

    full = minhash_dedup(df, max_bucket_size=4, **kw)
    assert full.count() == 0  # cap floods every bucket: clique lost

    coll = minhash_dedup(df, max_bucket_size=4, collapse_identical=True, **kw)
    stars = {(r.id_a, r.id_b) for r in coll.collect()}
    assert stars == {(0, i) for i in range(1, 8)}

    kept = sorted(
        r.doc_id
        for r in near_dup_curation(df, max_bucket_size=4, **kw).collect()
    )
    assert kept == [0, 100]


def test_lsh_mega_bucket_guard(spark):
    """A degenerate bucket (many identical docs) is skipped at cap, but
    identical pairs still surface through their other (identical) bands
    unless ALL their buckets exceed the cap; distinct docs unaffected."""
    from crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    rows = [(i, "common boiler plate text shared by every doc") for i in range(30)]
    rows += [(100 + i, f"unique doc {i} alpha beta gamma delta") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(word_shingles(df), n_hashes=64)
    # no cap: 30 identical docs -> C(30,2)=435 pairs (+ none among uniques)
    full = lsh_candidate_pairs(sigs, max_bucket_size=None).count()
    assert full == 435
    # cap below the clique size: every bucket of the clique is skipped
    capped = lsh_candidate_pairs(sigs, max_bucket_size=10).count()
    assert capped == 0
    # cap above it: unaffected
    assert lsh_candidate_pairs(sigs, max_bucket_size=50).count() == 435


def test_gopher_flags_rules(spark):
    from crawler_spark.operators.quality import gopher_quality_flags

    long_ok = " ".join(["word"] * 60)
    df = spark.createDataFrame(
        [
            (1, long_ok),                           # passes everything
            (2, "too short"),                       # ok_words fails
            (3, " ".join(["###"] * 60)),            # symbols + alpha fail
            (4, "\n".join([f"line {i} trails..." for i in range(10)])
                + "\n" + long_ok),                  # ellipsis ratio fails
            (5, ""),                                # empty: words fail
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].keep
    assert not got[2].ok_words and not got[2].keep
    assert not got[3].ok_symbols and not got[3].ok_alpha
    assert not got[4].ok_ellipsis
    assert got[5].n_words == 0 and not got[5].keep


def test_gopher_repetition_flags(spark):
    from crawler_spark.operators.quality import gopher_repetition_flags

    df = spark.createDataFrame(
        [
            (1, "line one\nline two\nline one\nline one\n"),   # 2/4 dup lines
            (2, "buy now buy now buy now buy now buy now"),    # one bigram rules
            (3, "a normal doc with varied words and no repeats at all"),
            (4, ""),
            (5, "single"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_repetition_flags(df).collect()}
    assert got[1].dup_line_ratio == pytest.approx(0.5)
    assert not got[1].ok_dup_lines
    # doc 2 bigrams: [buy now]x5 + [now buy]x4 → top 5/9
    assert got[2].top_bigram_ratio == pytest.approx(5 / 9, abs=1e-6)
    assert not got[2].ok_top_bigram and not got[2].keep
    assert got[3].keep
    assert got[4].dup_line_ratio == 0.0 and got[4].top_bigram_ratio == 0.0
    assert got[5].top_bigram_ratio == 0.0 and got[5].keep


def test_connected_components_chains_and_islands(spark):
    from crawler_spark.operators.dedup import connected_components, dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # a 5-chain (needs jumps)
         (11, 10), (20, 21), (8, 7)],         # islands, unordered ids
        "id_a long, id_b long",
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 20: 20, 21: 20, 7: 7, 8: 7}
    clusters = {r.node: (r.canon_id, r.is_dup)
                for r in dedup_clusters(pairs).collect()}
    assert clusters[5] == (1, True) and clusters[1] == (1, False)


def test_redact_pii(spark):
    from crawler_spark.operators.scrub import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +1 (555) 010-4242 today"),
            (4, "clean text with no identifiers at all"),
            (5, "a@b.io then 8.8.8.8 then +44 20 7946 0958 end"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[1].clean_text == "mail [EMAIL] now"
    assert got[1].n_emails == 1
    assert got[2].clean_text == "server at [IP] and [IP] up"
    assert got[2].n_ips == 2 and got[2].n_phones == 0
    assert got[3].clean_text == "call [PHONE] today"
    assert got[4].clean_text == "clean text with no identifiers at all"
    assert got[5].clean_text == "[EMAIL] then [IP] then [PHONE] end"
    assert (got[5].n_emails, got[5].n_ips, got[5].n_phones) == (1, 1, 1)


def test_contamination_flags(spark):
    from crawler_spark.operators.scrub import contamination_flags

    bench_text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"prefix words {bench_text} suffix words here"),  # contains it
            (2, "totally unrelated content with many other words in place"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy",),
         ("quick brown fox jumps over the lazy dog",)],
        "ngram string",
    )
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in contamination_flags(docs, bench, n=8).collect()}
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_word_shingles_short_docs_no_crash(spark):
    from crawler_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.shingle) for r in word_shingles(df, k=3).collect()}
    # sub-k docs emit nothing; 4-token doc emits its two trigrams
    assert got == {(4, "a b c"), (4, "b c d")}
    # and the full near-dup pipelines tolerate them
    from crawler_spark.operators.dedup import minhash_dedup, ngram_jaccard_pairs

    assert minhash_dedup(df, threshold=0.9).count() == 0
    assert ngram_jaccard_pairs(df, threshold=0.9).count() == 0


def test_unigram_cross_entropy(spark):
    """Rare-word docs score higher than common-word docs; the scoring
    join is broadcast (no shuffle of the exploded token table)."""
    from crawler_spark.operators.quality import unigram_cross_entropy

    rows = [
        (0, "the the the the the the the the"),   # 8x most common token
        (1, "the the the the zyzzyva qoph"),      # mixes in two rare ones
        (2, "   "),                                # no tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = unigram_cross_entropy(df)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {0, 1}
    assert got[0].n_tokens == 8 and got[1].n_tokens == 6
    assert got[1].xent > got[0].xent
    # doc 0 is all 'the': xent = -ln(p('the')) exactly
    import math

    p_the = 12 / 14
    assert got[0].xent == pytest.approx(-math.log(p_the), abs=1e-9)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_temperature_sample_rates_and_determinism(spark):
    """share^alpha rebalancing: minority strata keep everything, the
    majority is downsampled at the exact computed rate; selection is a
    pure function of (id, salt)."""
    import hashlib
    import math

    from crawler_spark.operators.scrub import temperature_sample

    rows = [(i, "en" if i < 800 else ("de" if i < 900 else "zh"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_sample(df, "doc_id", "lang", alpha=0.5, salt="s")
    got = {r["doc_id"]: r["keep_p6"] for r in out.collect()}

    # python oracle for the per-stratum keep rate
    counts = {"en": 800, "de": 100, "zh": 100}
    total = 1000
    wsum = sum((n / total) ** 0.5 for n in counts.values())
    p6 = {
        s: round(min(1.0, ((n / total) ** 0.5 / wsum) / (n / total)) * 1e6)
        for s, n in counts.items()
    }
    assert p6["de"] == 1000000 and p6["zh"] == 1000000
    assert p6["en"] < 1000000

    def h(i):
        v = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:15], 16)
        return v % 1000000

    want = {
        i: p6[lang] for i, lang in rows if h(i) < p6[lang]
    }
    assert got == want
    # all minority rows kept; the majority actually thinned
    assert sum(1 for i, l in rows if l != "en" and i in got) == 200
    assert sum(1 for i, l in rows if l == "en" and i in got) < 800
    # observed en rate within 5 points of the target (md5 uniformity)
    en_rate = sum(1 for i, l in rows if l == "en" and i in got) / 800
    assert math.isclose(en_rate, p6["en"] / 1e6, abs_tol=0.05)

    # alpha=1: natural proportions, nothing dropped
    kept = temperature_sample(df, "doc_id", "lang", alpha=1.0).count()
    assert kept == 1000


def test_temperature_mix_upsamples_minorities(spark):
    """Uncapped mixing: copies = floor(p) + (hash < frac(p)); minority
    strata repeat, the majority thins, expectation hits share^alpha."""
    import hashlib

    from crawler_spark.operators.scrub import temperature_mix

    rows = [(i, "en" if i < 900 else "zh") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_mix(df, "doc_id", "lang", alpha=0.2, salt="x")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy"])

    counts = {"en": 900, "zh": 100}
    total = 1000
    wsum = sum((n / total) ** 0.2 for n in counts.values())
    p6 = {
        s: round(((n / total) ** 0.2 / wsum) / (n / total) * 1e6)
        for s, n in counts.items()
    }
    assert p6["zh"] > 1000000 < p6["zh"]  # minority upsampled
    assert p6["en"] < 1000000             # majority thinned

    def h(i):
        return int(hashlib.md5(f"{i}x".encode()).hexdigest()[:15], 16) % 1000000

    for i, lang in rows:
        n_copies = p6[lang] // 1000000 + (1 if h(i) < p6[lang] % 1000000 else 0)
        if n_copies == 0:
            assert i not in got
        else:
            assert sorted(got[i]) == list(range(n_copies)), (i, lang)
    # every zh doc appears at least floor(p) >= 1 times
    zh_docs = [i for i, l in rows if l == "zh"]
    assert all(i in got for i in zh_docs)


def test_host_reputation_signals(spark):
    """host_reputation vs hand-computed signals: duplicated and short
    pages sink a host's score; unique long-form content tops it."""
    from crawler_spark.operators.quality import host_reputation

    long_text = " ".join(f"w{i}" for i in range(400))
    rows = [
        # spammy: 3 docs, 2 identical, all short (5 tokens)
        (0, "buy cheap pills now online", "spam.example"),
        (1, "buy cheap pills now online", "spam.example"),
        (2, "one two three four five", "spam.example"),
        # clean: 2 unique long docs
        (3, long_text, "good.example"),
        (4, long_text + " extra tail token", "good.example"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {r["host"]: r for r in host_reputation(df).collect()}

    s = got["spam.example"]
    assert s["n_docs"] == 3
    # micro-unit integer arithmetic: dup_u = 10^6 - (2*10^6 div 3)
    assert s["dup_ratio"] == 0.333334
    assert s["short_ratio"] == 1.0
    assert s["mean_tokens"] == 5.0
    # spam_u = (5*333334 + 3*1000000 + 2*(10^6 - 15*2500 div 3)) div 10
    assert s["spam_score"] == 0.664167
    assert s["reputation"] == 0.335833

    g = got["good.example"]
    assert g["n_docs"] == 2
    assert (g["dup_ratio"], g["short_ratio"]) == (0.0, 0.0)
    # saturated length -> only the (zero) dup/short terms remain
    assert g["spam_score"] == 0.0 and g["reputation"] == 1.0
    assert g["reputation"] > s["reputation"]


def test_fingerprints_null_text_rows_dropped(spark):
    """A null text (failed extraction) must be DROPPED by the sketch, not
    crash the Arrow kernel — the contract of the relational form the
    mapInPandas kernel replaced (regression: np.asarray(None) TypeError)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"), (2, None),
         (3, "")],
        "doc_id int, text string",
    )
    out = fingerprints(df).collect()
    ids = {r.doc_id for r in out}
    assert 1 in ids and 2 not in ids


def test_soft_404_flags(spark):
    from crawler_spark.operators.quality import soft_404_flags

    tmpl = "sorry this page is missing"
    rows = [
        # per-host template, 3 distinct urls on h1 -> soft 404
        ("http://h1.test/a", "h1", 200, tmpl),
        ("http://h1.test/b", "h1", 200, tmpl),
        ("http://h1.test/c", "h1", 200, tmpl),
        # same template on h2 only twice -> below min_template_dup
        ("http://h2.test/a", "h2", 200, tmpl),
        ("http://h2.test/b", "h2", 200, tmpl),
        # phrase match, long body -> soft 404 regardless of size
        (
            "http://h1.test/d", "h1", 200,
            "we are sorry but the page you requested does not exist "
            + "filler " * 30,
        ),
        # tiny but unique -> NOT flagged (uniqueness = content)
        ("http://h1.test/e", "h1", 200, "short stub page"),
        # honest 404: flags computed, soft_404 never
        ("http://h1.test/f", "h1", 404, "404 not found"),
        # real content
        ("http://h1.test/g", "h1", 200, "word " * 50),
        # null text
        ("http://h1.test/h", "h1", 200, None),
    ]
    df = spark.createDataFrame(rows, ["url", "host", "status", "text"])
    out = {
        r["url"]: (
            r["tiny_body"], r["error_phrase"], r["template_dup"],
            r["soft_404"],
        )
        for r in soft_404_flags(df).collect()
    }
    assert out["http://h1.test/a"] == (True, False, True, True)
    assert out["http://h1.test/b"][3] and out["http://h1.test/c"][3]
    assert out["http://h2.test/a"] == (True, False, False, False)
    assert out["http://h1.test/d"] == (False, True, False, True)
    assert out["http://h1.test/e"] == (True, False, False, False)
    assert out["http://h1.test/f"] == (True, True, False, False)
    assert out["http://h1.test/g"] == (False, False, False, False)
    assert out["http://h1.test/h"] == (True, False, False, False)

    # hash and portable text keying agree
    a = {r["url"]: r["soft_404"]
         for r in soft_404_flags(df, hash_bodies=True).collect()}
    b = {r["url"]: r["soft_404"]
         for r in soft_404_flags(df, hash_bodies=False).collect()}
    assert a == b


def test_soft_404_template_shuffle_hash_leads_every_text_key(spark):
    """Template shuffles are keyed hash-first; the text column may ride
    the key ONLY alongside the hash (the exact-confirm leg — tiny
    bodies only), never alone: the corpus-wide text never keys an
    exchange by itself."""
    from crawler_spark.operators.quality import soft_404_flags
    from crawler_spark.plans.inspect import exchange_partition_keys

    df = spark.createDataFrame(
        [("http://h1.test/a", "h1", 200, "tiny body")],
        ["url", "host", "status", "text"],
    )
    out = soft_404_flags(df)  # hash mode
    for keys in exchange_partition_keys(out):
        if any(("text" in k) or ("_bt" in k) for k in keys):
            assert any("_bk" in k for k in keys), keys


def test_blocklist_flags(spark):
    from crawler_spark.operators.quality import blocklist_flags

    rows = [
        (1, "a clean page about cooking and gardens"),
        (2, "win the CASINO jackpot tonight"),          # 2 hits
        (3, "xxxtra value offer"),                      # substring decoy
        (4, None),                                      # null text
        (5, "casino casino casino"),                    # repeats count
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    wl = frozenset(["casino", "jackpot", "xxx"])
    out = {
        r["doc_id"]: (r["blocked_count"], r["blocked_distinct"], r["keep"])
        for r in blocklist_flags(df, words=wl).collect()
    }
    assert out[1] == (0, 0, True)
    assert out[2] == (2, 2, False)
    assert out[3] == (0, 0, True)   # whole-token: 'xxxtra' != 'xxx'
    assert out[4] == (0, 0, True)
    assert out[5] == (3, 1, False)
    # threshold: allow up to 2 hits
    out2 = {
        r["doc_id"]: r["keep"]
        for r in blocklist_flags(df, words=wl, max_hits=2).collect()
    }
    assert out2[2] is True and out2[5] is False


def test_blocklist_zero_shuffle(spark):
    from crawler_spark.operators.quality import blocklist_flags
    from crawler_spark.plans.inspect import exchange_count

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    assert exchange_count(blocklist_flags(df)) == 0


def test_blocklist_phrases_match_consecutive_tokens(spark):
    """Multiword blocklist entries match as consecutive whole tokens
    (ADVICE r4: the old seed .split() exploded 'weight loss pills'
    into benign unigrams, dropping ordinary prose at max_hits=0)."""
    from crawler_spark.operators.quality import blocklist_flags

    rows = [
        (1, "watching my weight and cutting my loss on pills"),  # words scattered
        (2, "buy Weight-Loss PILLS here"),        # phrase across punct/case
        (3, "weight loss pills weight loss pills"),  # adjacent repeats
        (4, "loss pills weight"),                 # wrong order
        (5, "miracle weight loss pills cure"),    # phrase inside prose
        (6, "casino and weight loss pills"),      # unigram + phrase mix
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    wl = frozenset(["casino", "weight loss pills"])
    out = {
        r["doc_id"]: (r["blocked_count"], r["blocked_distinct"], r["keep"])
        for r in blocklist_flags(df, words=wl).collect()
    }
    assert out[1] == (0, 0, True)   # constituent words never hit
    assert out[2] == (1, 1, False)  # tokenization-normalized phrase
    assert out[3] == (2, 1, False)  # adjacent occurrences both count
    assert out[4] == (0, 0, True)
    assert out[5] == (1, 1, False)
    assert out[6] == (2, 2, False)


def test_blocklist_seed_has_no_generic_unigrams(spark):
    """The vendored seed keeps multiword spam signals as phrases; its
    unigrams must not contain everyday words (ADVICE r4)."""
    from crawler_spark.functions.lexicons import BLOCKLIST
    from crawler_spark.operators.quality import blocklist_flags

    generic = {"weight", "loss", "cure", "signals", "crack", "replica",
               "prince", "pills", "miracle", "bitcoin", "forex",
               "inheritance", "winnings", "lottery", "betting"}
    unigrams = {w for w in BLOCKLIST if " " not in w}
    assert not (unigrams & generic)
    # and ordinary prose built from those words survives the default list
    df = spark.createDataFrame(
        [(1, "the prince studied weight loss and his lottery "
             "inheritance with miracle signals")],
        ["doc_id", "text"],
    )
    (row,) = blocklist_flags(df).collect()
    assert row["keep"] and row["blocked_count"] == 0


def test_blocklist_phrases_stay_zero_shuffle(spark):
    from crawler_spark.operators.quality import blocklist_flags
    from crawler_spark.plans.inspect import exchange_count

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    assert exchange_count(blocklist_flags(df)) == 0


def test_soft_404_template_key_is_hash_then_exact_text(spark):
    """With hash_bodies=True the template aggregate keys on BOTH the
    64-bit hash and the text itself (ADVICE r4: a collision between a
    unique stub and an error template must not flag live content —
    there is no downstream re-check)."""
    from crawler_spark.operators.quality import soft_404_flags
    from crawler_spark.plans.inspect import exchange_partition_keys

    df = spark.createDataFrame(
        [("http://h1.test/a", "h1", 200, "tiny body")],
        ["url", "host", "status", "text"],
    )
    out = soft_404_flags(df, hash_bodies=True)
    keysets = exchange_partition_keys(out)
    assert any(
        any("_bk" in k for k in keys) and any("_bt" in k for k in keys)
        for keys in keysets
    ), keysets


def test_mega_bucket_cap_trips_and_reports(spark):
    """VERDICT r4 item 4: a constructed mega-bucket actually trips
    max_bucket_size and the cap_stats diagnostic records the drop —
    for the minhash banding guard, the simhash chunk guard, and the
    semantic cell guard."""
    from crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_dups,
        word_shingles,
    )

    # 12 byte-identical docs share EVERY band bucket; cap 8 < 12 —
    # every one of the 16 band buckets goes over
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta")
         for i in range(12)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(word_shingles(df), n_hashes=64)
    stats = {}
    pairs = lsh_candidate_pairs(
        sigs, n_bands=16, rows_per_band=4, max_bucket_size=8,
        cap_stats=stats,
    )
    assert pairs.count() == 0  # clique lost: that is the documented cap
    assert stats["buckets_over_cap"] == 16
    assert stats["rows_dropped"] == 16 * 12
    assert stats["cap"] == 8

    # uncapped control: the clique pairs exist (C(12,2) = 66)
    assert lsh_candidate_pairs(
        sigs, n_bands=16, rows_per_band=4, max_bucket_size=None,
    ).count() == 66

    # simhash chunk guard: identical docs share all 4 chunks
    stats2 = {}
    p2 = simhash_near_dups(df, max_hamming=3, max_bucket_size=8,
                           cap_stats=stats2)
    assert p2.count() == 0
    assert stats2["buckets_over_cap"] == 4
    assert stats2["rows_dropped"] == 4 * 12

    # semantic cell guard: every vector in one cell, cap below it
    from crawler_spark.operators.similarity import (
        ivf_assign,
        semantic_cell_pairs,
    )
    import numpy as np

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)],
        "vec_id bigint, embedding array<float>",
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    assigned = ivf_assign(emb, cents)
    stats3 = {}
    p3 = semantic_cell_pairs(
        assigned, threshold=0.5, max_cell_size=4, cap_stats=stats3,
    )
    assert p3.count() == 0
    assert stats3["buckets_over_cap"] == 1
    assert stats3["rows_dropped"] == 10
    # cap off (default None) keeps the full within-cell pair set
    assert semantic_cell_pairs(assigned, threshold=0.5).count() == 45


def test_curation_chain_collapse_survives_over_cap_clique_with_stats(
    spark,
):
    """The production chain's collapse path removes an over-cap
    identical clique (signatures collapse before banding) and the
    cap_stats dict reports zero over-cap buckets AFTER collapse — the
    guard exists but no longer needs to bite for identical docs."""
    from crawler_spark.operators.dedup import near_dup_curation

    clique = [(i, "one two three four five six seven eight")
              for i in range(12)]
    others = [(100 + i, f"unique document number {i} about topic {i}")
              for i in range(4)]
    df = spark.createDataFrame(clique + others, ["doc_id", "text"])
    stats = {}
    out = near_dup_curation(df, max_bucket_size=8, cap_stats=stats)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [0, 100, 101, 102, 103]
    assert stats["buckets_over_cap"] == 0  # collapse shrank the buckets
    assert stats["rows_dropped"] == 0
