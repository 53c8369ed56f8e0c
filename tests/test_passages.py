"""Passage-level operators vs pure-Python oracles (chunking, repeated-
passage removal, host-mirror Jaccard, df-cap lower-bound contract)."""

import hashlib

import pytest


def _py_chunks(text, k):
    words = text.split(" ")
    return [
        " ".join(words[i : i + k]) for i in range(0, len(words), k)
    ]


def _md5p(s):
    return hashlib.md5(s.encode()).hexdigest()[:16]


DOCS = [
    # shared 3-word boilerplate "all rights reserved" at chunk offsets,
    # aligned on the chunk grid so removal actually triggers
    (0, "all rights reserved alpha beta gamma delta eps zeta", "h0"),
    (1, "all rights reserved one two three four five six", "h0"),
    (2, "one two three all rights reserved seven eight nine", "h1"),
    (3, "totally unique text with no repeats at all here", "h1"),
    (4, "all rights reserved alpha beta gamma delta eps zeta", "h2"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id: long, text: string, source: string"
    )


def test_doc_chunks_shapes_and_hashes(spark, docs_df):
    from crawler_spark.operators.passages import doc_chunks

    rows = doc_chunks(
        docs_df, chunk_words=3, portable=True
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    for doc_id, text, _ in DOCS:
        want = _py_chunks(text, 3)
        got = by_doc[doc_id]
        assert len(got) == len(want)
        for i, chunk in enumerate(want):
            assert got[i]["chunk_hash"] == _md5p(chunk)
            assert got[i]["n_words"] == len(chunk.split(" "))


def test_repeated_chunk_filter_first_occurrence(spark, docs_df):
    from crawler_spark.operators.passages import repeated_chunk_filter

    got = {
        r["doc_id"]: r
        for r in repeated_chunk_filter(
            docs_df, chunk_words=3, portable=True
        ).collect()
    }
    # python oracle: first occurrence by (doc_id, chunk_idx)
    seen = {}
    want = {}
    for doc_id, text, _ in DOCS:
        chunks = _py_chunks(text, 3)
        n_removed = kept = 0
        for idx, c in enumerate(chunks):
            key = _md5p(c)
            if key in seen:
                n_removed += 1
            else:
                seen[key] = (doc_id, idx)
                kept += len(c.split(" "))
        want[doc_id] = (len(chunks), n_removed, kept)
    for doc_id, (n_chunks, n_removed, kept) in want.items():
        r = got[doc_id]
        assert (r["n_chunks"], r["n_removed"], r["kept_words"]) == (
            n_chunks, n_removed, kept,
        )
    # the duplicated boilerplate chunk was actually removed somewhere
    assert sum(r["n_removed"] for r in got.values()) >= 2


def test_production_and_portable_hash_agree_on_stats(spark, docs_df):
    """xxhash64 and md5-prefix are different hash families but must
    yield identical removal STATS (no collisions at this size)."""
    from crawler_spark.operators.passages import repeated_chunk_filter

    a = {
        (r["doc_id"], r["n_chunks"], r["n_removed"], r["kept_words"])
        for r in repeated_chunk_filter(
            docs_df, chunk_words=3, portable=False
        ).collect()
    }
    b = {
        (r["doc_id"], r["n_chunks"], r["n_removed"], r["kept_words"])
        for r in repeated_chunk_filter(
            docs_df, chunk_words=3, portable=True
        ).collect()
    }
    assert a == b


def test_host_mirror_pairs_jaccard(spark, docs_df):
    from crawler_spark.operators.passages import host_mirror_pairs

    got = {
        (r["host_a"], r["host_b"]): (r["n_shared"], r["jaccard"])
        for r in host_mirror_pairs(
            docs_df, chunk_words=3, portable=True
        ).collect()
    }
    # python oracle over distinct chunk-hash sets per host
    sets = {}
    for doc_id, text, host in DOCS:
        sets.setdefault(host, set()).update(
            _md5p(c) for c in _py_chunks(text, 3)
        )
    hosts = sorted(sets)
    want = {}
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (
                    inter, inter / len(sets[a] | sets[b])
                )
    assert set(got) == set(want)
    for k, (n, j) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(j, abs=1e-12)
    # h0 and h2 share an entire document → strongest mirror signal
    assert max(want, key=lambda k: want[k][1]) == ("h0", "h2")


def test_host_mirror_df_cap_is_lower_bound(spark, docs_df):
    """Capping hosts-per-chunk only ever DROPS shared chunks: every
    capped intersection ≤ the exact one, and ubiquitous chunks (on
    more hosts than the cap) stop contributing entirely."""
    from crawler_spark.operators.passages import host_mirror_pairs

    exact = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in host_mirror_pairs(
            docs_df, chunk_words=3, portable=True
        ).collect()
    }
    capped = {
        (r["host_a"], r["host_b"]): r["n_shared"]
        for r in host_mirror_pairs(
            docs_df, chunk_words=3, portable=True, max_hosts_per_chunk=2
        ).collect()
    }
    for k, n in capped.items():
        assert n <= exact[k]
    # "all rights reserved" lives on all 3 hosts → dropped by cap=2
    assert set(capped) != set(exact) or any(
        capped[k] < exact[k] for k in capped
    )


def _py_span_stats(texts, k):
    """Independent oracle: covered = tokens inside any k-window whose
    text occurs >= 2 times in the corpus."""
    from collections import Counter

    toks = {i: t.lower().split() for i, t in texts.items()}
    grams = Counter()
    pos = {}
    for i, ws in toks.items():
        pos[i] = [
            " ".join(ws[p : p + k]) for p in range(len(ws) - k + 1)
        ]
        grams.update(pos[i])
    out = {}
    for i, ws in toks.items():
        dup_pos = [p for p, g in enumerate(pos[i]) if grams[g] >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        n_grams = max(len(ws) - k + 1, 0)
        out[i] = (
            n_grams,
            len(dup_pos),
            len(covered),
            round(len(covered) / len(ws), 6) if ws else 0.0,
        )
    return out


def test_duplicate_span_stats_unaligned_copy(spark):
    """A 20-token passage pasted at DIFFERENT offsets in two docs —
    invisible to the fixed chunk grid, fully covered by sliding
    k-grams; counts match the brute-force python oracle exactly."""
    from crawler_spark.operators.passages import duplicate_span_stats

    shared = " ".join(f"s{i}" for i in range(20))
    texts = {
        0: "a0 b0 c0 " + shared + " d0 e0",
        1: "x1 y1 z1 w1 v1 u1 t1 " + shared,
        2: "plain unique text q r s t u v w x y z one two three four",
        3: "self self self self self self self self self self self self",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_dup_grams"],
            r["covered_tokens"], r["dup_ratio"],
        )
        for r in duplicate_span_stats(df, k=10).collect()
    }
    want = _py_span_stats(texts, 10)
    assert got == want
    # the shared passage is found in both hosts; doc 2 is clean;
    # doc 3's self-repeat counts (within-doc duplication is duplication)
    assert got[0][2] >= 20 and got[1][2] >= 20
    assert got[2][2] == 0
    assert got[3][2] == 12  # all twelve tokens covered by self-repeats


def test_duplicate_span_stats_short_docs(spark):
    """Docs shorter than k emit zero grams and zero coverage."""
    from crawler_spark.operators.passages import duplicate_span_stats

    df = spark.createDataFrame(
        [(0, "too short"), (1, "too short")],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in
            duplicate_span_stats(df, k=10).collect()}
    for r in rows.values():
        assert (r["n_grams"], r["covered_tokens"], r["dup_ratio"]) == (
            0, 0, 0.0,
        )


def _py_span_removal(texts, k):
    """Brute-force reference for remove_duplicate_spans: a token is cut
    iff it lies in a duplicated k-gram occurrence that is not the gram's
    globally-first (min (doc, pos)) occurrence."""
    toks = {d: t.lower().split() for d, t in texts.items()}
    occ = {}
    for d in sorted(toks):
        l = toks[d]
        for p in range(len(l) - k + 1):
            occ.setdefault(" ".join(l[p:p + k]), []).append((d, p))
    cut = {d: set() for d in toks}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        first = min(sites)
        for d, p in sites:
            if (d, p) != first:
                cut[d].update(range(p, p + k))
    out = {}
    for d, l in toks.items():
        kept = [t for i, t in enumerate(l) if i not in cut[d]]
        out[d] = (" ".join(kept), len(kept), len(l) - len(kept))
    return out


def test_remove_duplicate_spans_matches_bruteforce(spark):
    """Removal equals the python reference on the unaligned-copy corpus:
    the first occurrence of the shared passage survives, later ones are
    cut, clean docs pass through untouched (normalized)."""
    from crawler_spark.operators.passages import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(20))
    texts = {
        0: "a0 b0 c0 " + shared + " d0 e0",
        1: "x1 y1 z1 w1 v1 u1 t1 " + shared,
        2: "plain unique text q r s t u v w x y z one two three four",
        3: "self self self self self self self self self self self self",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_spans(df, k=10).collect()
    }
    assert got == _py_span_removal(texts, 10)
    # doc 0 holds the first occurrence -> intact; doc 1 loses the copy
    assert "s0" in got[0][0] and "s19" in got[0][0]
    assert got[1] == ("x1 y1 z1 w1 v1 u1 t1", 7, 20)
    assert got[2][2] == 0  # clean doc untouched
    # production and portable hash families agree
    got_p = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_spans(df, k=10, portable=True).collect()
    }
    assert got_p == got


def _py_contaminated_removal(texts, bench_grams, k):
    """Brute-force reference for remove_contaminated_spans: a token is
    cut iff it lies in ANY k-gram occurrence matching the benchmark."""
    out = {}
    for d, t in texts.items():
        l = t.lower().split()
        cut = set()
        for p in range(len(l) - k + 1):
            if " ".join(l[p:p + k]) in bench_grams:
                cut.update(range(p, p + k))
        kept = [tok for i, tok in enumerate(l) if i not in cut]
        out[d] = (" ".join(kept), len(kept), len(l) - len(kept))
    return out


def test_remove_contaminated_spans_matches_bruteforce(spark):
    """Span decontamination equals the python reference: benchmark
    k-grams are cut wherever they occur (no first-occurrence
    exception), clean docs pass through normalized, and docs shorter
    than k are never cut."""
    from crawler_spark.operators.passages import remove_contaminated_spans

    eval_q = "what is the capital of france and when was it founded"
    texts = {
        0: "intro words here " + eval_q + " trailing analysis text",
        # the eval question twice in one doc — both occurrences cut
        1: eval_q + " padding middle tokens " + eval_q,
        2: "completely clean document with original prose only here",
        3: "too short",  # < k tokens: zero grams, untouched
    }
    k = 5
    bench_grams = set()
    ws = eval_q.split()
    for p in range(len(ws) - k + 1):
        bench_grams.add(" ".join(ws[p:p + k]))
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    bench = spark.createDataFrame(
        [(g,) for g in sorted(bench_grams)], "ngram: string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_contaminated_spans(df, bench, k=k).collect()
    }
    assert got == _py_contaminated_removal(texts, bench_grams, k)
    # the whole eval question is gone from both contaminated docs
    assert "capital" not in got[0][0] and "capital" not in got[1][0]
    assert got[1][1] == 3  # only "padding middle tokens" survives
    assert got[2][2] == 0 and got[3][2] == 0


def test_remove_contaminated_spans_empty_benchmark(spark):
    """An empty benchmark set removes nothing and normalizes only."""
    from crawler_spark.operators.passages import remove_contaminated_spans

    df = spark.createDataFrame(
        [(0, "Keep  ALL   of this")], "doc_id: long, text: string"
    )
    bench = spark.createDataFrame([], "ngram: string")
    [r] = remove_contaminated_spans(df, bench, k=3).collect()
    assert (r["clean_text"], r["n_kept"], r["n_removed"]) == (
        "keep all of this", 4, 0,
    )
