"""NULL/empty-input edge contracts of the curation operators.

Regressions for a round-5 review pass: real web corpora carry NULL
text (fetch failures), NULL lang (failed language ID), empty and
whitespace-mangled documents — and several operators either dropped
such rows silently (strata equi-joins never match NULL = NULL), crashed
at plan-build time (float(None) from a NULL avg), or manufactured
phantom tokens (split('', ' ') is ['']). Each test here pins the fixed
contract: NULL groups participate like any other group, NULL text means
zero tokens with typed zero stats, and empty documents produce no
chunks at all.
"""

import pytest

from pyspark.sql import functions as F


def test_temperature_sample_null_stratum_participates(spark):
    """A NULL stratum is a stratum: its rows get their own share^alpha
    rate (not silently dropped by the rate join), and the other
    strata's rates are computed over the SAME total either way."""
    from crawler_spark.operators.scrub import temperature_sample

    rows = [(i, "en" if i < 800 else ("de" if i < 900 else None))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_sample(df, "doc_id", "lang", alpha=0.5, salt="s")
    kept = {r["doc_id"]: (r["lang"], r["keep_p6"]) for r in out.collect()}

    # the NULL stratum is a 100-doc minority → p = 1.0, all rows kept
    null_kept = [i for i, (l, _) in kept.items() if l is None]
    assert len(null_kept) == 100
    assert all(kept[i][1] == 1000000 for i in null_kept)
    # and the majority rate is the one computed WITH the NULL group in
    # the total (identical to the all-non-NULL fixture in
    # test_training_ops — 'de'/None both minority, en thinned)
    wsum = (0.8 ** 0.5) + 2 * (0.1 ** 0.5)
    want_en = round(min(1.0, (0.8 ** 0.5 / wsum) / 0.8) * 1e6)
    en_rows = [i for i, (l, _) in kept.items() if l == "en"]
    assert all(kept[i][1] == want_en for i in en_rows)

    # alpha=1 keeps everything — including the NULL-stratum rows
    assert temperature_sample(df, "doc_id", "lang", alpha=1.0).count() == 1000


def test_temperature_mix_null_stratum_participates(spark):
    """Uncapped mixing must upsample a NULL minority stratum like any
    other (copies >= 1 for every row of an under-represented group)."""
    from crawler_spark.operators.scrub import temperature_mix

    rows = [(i, "en" if i < 900 else None) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_mix(df, "doc_id", "lang", alpha=0.5, salt="m")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # NULL stratum present and upsampled above its natural 100 rows
    assert by_lang.get(None, 0) > 100


def test_ccnet_buckets_null_lang_not_dropped(spark):
    """ccnet_buckets returns a row for every input doc, NULL-lang docs
    included — they tercile within their own group instead of vanishing
    from the output relation."""
    from crawler_spark.operators.selection import ccnet_buckets

    # each doc mixes one shared token with i doc-unique ones, so the
    # per-doc unigram cross-entropies are strictly increasing — no
    # percentile ties inside either language group
    rows = [
        (i, " ".join(["common"] * 3 + [f"w{i}_{j}" for j in range(i + 1)]),
         "en" if i % 3 else None)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = ccnet_buckets(df).collect()
    assert len(out) == 30
    null_rows = [r for r in out if r["lang"] is None]
    assert len(null_rows) == 10
    # the NULL group spans its own head/middle/tail split
    assert {r["bucket"] for r in null_rows} == {"head", "middle", "tail"}


def test_bm25_all_null_text_returns_empty(spark):
    """A non-empty corpus whose every text is NULL used to crash at
    plan-build time (avg(dl) is NULL → float(None)); the contract is an
    empty top-k, same as an empty corpus."""
    from crawler_spark.analytics.search import bm25_topk, tfidf_topk

    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id: long, text: string"
    )
    assert bm25_topk(df, ["x"]).collect() == []
    assert tfidf_topk(df, ["x"]).collect() == []


def test_retrieval_tokenization_is_word_tokens(spark):
    """Retrieval tokenizes with the repo-wide word definition: any
    whitespace run splits (newlines included), empties are dropped (no
    phantom-token dl inflation), and matching is case-insensitive."""
    from crawler_spark.analytics.search import bm25_topk, tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "Foo\nbar baz"),    # newline splits; case folds
            (2, "foo  bar   baz"),  # runs of spaces add no empty tokens
            (3, "foo bar baz"),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in tfidf_topk(df, ["foo"]).collect()}
    assert set(out) == {1, 2, 3}
    # identical bags of words → identical scores for all three docs
    assert len({r["score"] for r in out.values()}) == 1
    out = {r["doc_id"]: r for r in bm25_topk(df, ["foo"]).collect()}
    assert set(out) == {1, 2, 3}
    assert len({r["score"] for r in out.values()}) == 1


def test_doc_chunks_empty_docs_produce_no_chunks(spark):
    """split('', ' ') is [''] — an empty or whitespace-only document
    must yield ZERO chunks, not one phantom md5('') chunk that makes
    all empty docs mutual duplicates; double spaces add no tokens."""
    from crawler_spark.operators.passages import (
        doc_chunks,
        repeated_chunk_filter,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, None), (4, "a  b c")],
        "doc_id: long, text: string",
    )
    ch = doc_chunks(df, chunk_words=2).collect()
    assert {r["doc_id"] for r in ch} == {4}
    assert sorted((r["chunk_idx"], r["n_words"]) for r in ch) == [
        (0, 2), (1, 1)
    ]
    # and the filter reports zero-chunk stats for them, not a
    # first-empty-doc-survives / rest-removed fiction
    stats = {r["doc_id"]: r for r in repeated_chunk_filter(df, 2).collect()}
    assert set(stats) == {4}  # no chunk rows → no stats rows, by contract


def test_span_ops_null_text_typed_zeros(spark):
    """NULL-text docs keep the typed contract of the span operators:
    dup_ratio 0.0 (not NULL falling out of threshold filters), and
    remove_duplicate_spans returns an empty clean stream with zero
    counts (not an all-NULL row)."""
    from crawler_spark.operators.passages import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    base = "x y z " * 10
    df = spark.createDataFrame(
        [(1, base + "tail one"), (2, base + "tail two"), (3, None)],
        "doc_id: long, text: string",
    )
    stats = {r["doc_id"]: r for r in duplicate_span_stats(df, k=5).collect()}
    assert stats[3]["n_grams"] == 0
    assert stats[3]["n_dup_grams"] == 0
    assert stats[3]["covered_tokens"] == 0
    assert stats[3]["dup_ratio"] == 0.0
    assert stats[1]["dup_ratio"] > 0.0

    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, k=5).collect()}
    assert out[3]["clean_text"] == ""
    assert out[3]["n_kept"] == 0
    assert out[3]["n_removed"] == 0
    # the duplicated prefix was actually cut from the later copy
    assert out[2]["n_removed"] > 0


def test_cosine_topk_zero_vector_no_abort(spark):
    """A zero corpus vector has norm 0; under ANSI a plain divide would
    abort the whole job. Its cosine is NULL and it sorts after every
    real score (same try_divide guard as _pair_cosine)."""
    from crawler_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        "vec_id: long, embedding: array<double>",
    )
    out = cosine_topk(df, [1.0, 0.0], k=3).collect()
    by_id = {r["vec_id"]: r["cosine"] for r in out}
    assert by_id[2] is None
    assert by_id[1] == pytest.approx(1.0)
    # NULLs last: the zero vector never outranks a real match
    assert [r["vec_id"] for r in out][-1] == 2


def test_cosine_topk_join_empty_queries(spark):
    """Zero query rows must yield an empty top-k (np.array([]) is 1-D,
    so the axis-1 norm would raise AxisError at plan-build time
    otherwise) with the same output schema as the non-empty path."""
    from crawler_spark.operators.similarity import cosine_topk_join

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id: long, embedding: array<double>"
    )
    queries = corpus.where(F.lit(False)).withColumnRenamed(
        "vec_id", "query_id"
    )
    out = cosine_topk_join(queries, corpus, k=3)
    assert out.columns == ["query_id", "vec_id", "cosine", "_rank"]
    assert out.collect() == []


def test_lsh_near_dup_pairs_rejects_indivisible_bands(spark):
    """n_bits % n_bands != 0 silently discarded the top sign bits from
    every band; the contract is now an explicit error."""
    from crawler_spark.operators.similarity import lsh_near_dup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        lsh_near_dup_pairs(df, dim=2, n_bits=10, n_bands=4)


def test_quantize_edge_vectors(spark):
    """Empty vectors quantize to empty codes with zero error (instead
    of sequence(0, -1) descending into an ANSI out-of-bounds abort);
    a vector shorter than the stats dim reads NULL stats through F.get
    instead of aborting the aggregation."""
    from crawler_spark.operators.quantize import (
        dimension_stats,
        quantize,
        reconstruction_error,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [10.0, 0.0]), (3, []), (4, [5.0])],
        "vec_id: long, embedding: array<double>",
    )
    stats = dimension_stats(df, dim=2)
    mins, maxs = stats.first()
    assert mins == [0.0, 0.0] and maxs == [10.0, 10.0]

    codes = {r["vec_id"]: r["codes"] for r in quantize(df, stats=stats).collect()}
    assert codes[3] == []
    assert codes[1] == [0, 255]
    assert codes[4] == [128]

    errs = {
        r["vec_id"]: r
        for r in reconstruction_error(df, stats=stats).collect()
    }
    assert errs[3]["mse"] == 0.0 and errs[3]["max_abs_err"] == 0.0


def test_quantize_clamps_reused_stats(spark):
    """Reusing stored stats on data outside the fitted range must
    saturate codes at the byte bounds (uint8 contract), not emit
    values like 1020 or -893."""
    from crawler_spark.operators.quantize import dimension_stats, quantize

    fit = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id: long, embedding: array<double>",
    )
    stats = dimension_stats(fit)
    new = spark.createDataFrame(
        [(9, [9.0, -5.0])], "vec_id: long, embedding: array<double>"
    )
    [row] = quantize(new, stats=stats).collect()
    assert row["codes"] == [255, 0]


def test_dimension_stats_empty_corpus_clear_error(spark):
    """An empty embeddings input with no explicit dim raises a clear
    ValueError, not 'NoneType' object is not subscriptable."""
    from crawler_spark.operators.quantize import dimension_stats

    empty = spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        dimension_stats(empty)


def test_c4_and_gopher_null_text_typed(spark):
    """NULL-text docs keep typed stats in c4_clean and BOTH Gopher
    families — and the two Gopher keeps agree (an all-NULL row used to
    pass repetition but vanish from both branches of quality)."""
    from crawler_spark.operators.lines import c4_clean
    from crawler_spark.operators.quality import (
        gopher_quality_flags,
        gopher_repetition_flags,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "Real text. With sentences! Three of them?")],
        "doc_id: long, text: string",
    )
    c4 = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert c4[1]["clean_text"] == ""
    assert c4[1]["n_lines_kept"] == 0
    assert c4[1]["n_sentences"] == 0
    assert c4[1]["keep_doc"] is False

    gq = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert gq[1]["n_words"] == 0
    assert gq[1]["keep"] is False

    gr = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}
    assert gr[1]["dup_line_ratio"] == 0.0
    assert gr[1]["keep"] is True  # no repetition evidence → passes


def test_pack_shards_null_text_and_lang(spark):
    """Shard packing: NULL text counts 0 tokens (not a NULL/-1 that
    corrupts the running sum), whitespace runs/newlines count words
    correctly, and NULL-lang docs form their own language instead of
    silently vanishing from the export through the offset equi-join."""
    from crawler_spark.operators.packing import pack_shards

    rows = [
        (1, "en", None),          # 0 tokens
        (2, "en", "a  b\nc"),     # 3 words, not 1 or 4
        (3, "en", "d e"),
        (4, None, "x y z"),       # NULL lang: own group, not dropped
        (5, None, "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    out = {r["doc_id"]: r for r in pack_shards(df, budget=4).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["n_tokens"] == 0
    assert out[2]["n_tokens"] == 3
    # en stream: tokens_before 0,0,3 → shards 0,0,0 at budget 4
    assert [out[i]["shard_id"] for i in (1, 2, 3)] == [0, 0, 0]
    # NULL-lang stream independent: 0,3 → shards 0,0
    assert out[4]["lang"] is None and out[4]["shard_id"] == 0
    assert out[5]["shard_id"] == 0


def test_export_shards_docs_with_existing_n_tokens(spark, tmp_path):
    """A curated stream already carrying n_tokens (or shard_id) must
    export cleanly — the assignment's columns are authoritative, not a
    duplicate-column AnalysisException."""
    from crawler_spark.operators.packing import export_shards

    df = spark.createDataFrame(
        [(1, "en", "a b c", 99), (2, "en", "d e", 99)],
        "doc_id: long, lang: string, text: string, n_tokens: long",
    )
    manifest = export_shards(df, str(tmp_path / "sh"), budget=4)
    assert manifest["n_docs"] == 2
    assert manifest["n_tokens"] == 5  # recomputed, not the stale 99s


def test_budget_fn_admits_globally_earliest_across_chunks():
    """The stateful host-budget kernel receives each group as an
    ITERATOR of Arrow chunks; admission must pick the globally earliest
    (disc_ts, url) rows, not the earliest of whichever chunk streams
    first."""
    import pandas as pd

    from crawler_spark.streaming.ingest import _budget_fn

    class FakeState:
        exists = False

        def __init__(self):
            self.updated = None

        @property
        def get(self):
            raise AssertionError("state.get on non-existent state")

        def update(self, v):
            self.updated = v

    ts = pd.Timestamp("2026-01-01")
    late = pd.DataFrame(
        {"url": [f"u{i}" for i in range(10, 15)],
         "host": ["h"] * 5,
         "disc_ts": [ts + pd.Timedelta(seconds=s) for s in range(10, 15)]}
    )
    early = pd.DataFrame(
        {"url": [f"u{i}" for i in range(5)],
         "host": ["h"] * 5,
         "disc_ts": [ts + pd.Timedelta(seconds=s) for s in range(5)]}
    )
    state = FakeState()
    # the LATE chunk arrives first in iterator order
    out = list(_budget_fn(5)(("h",), iter([late, early]), state))
    admitted = pd.concat(out, ignore_index=True)
    assert list(admitted["url"]) == [f"u{i}" for i in range(5)]
    assert list(admitted["admit_seq"]) == list(range(5))
    assert state.updated == (5,)


def test_word_shingles_whitespace_insensitive(spark):
    """Docs identical up to surrounding/extra whitespace must produce
    IDENTICAL shingle sets (a '' token from a leading space used to
    mint spurious shingles → jaccard < 1 → near-dup recall hole)."""
    from crawler_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, "hello world foo bar"), (2, "  hello world\nfoo bar ")],
        "doc_id: long, text: string",
    )
    rows = word_shingles(df, k=3).collect()
    s1 = {r["shingle"] for r in rows if r["doc_id"] == 1}
    s2 = {r["shingle"] for r in rows if r["doc_id"] == 2}
    assert s1 == s2 == {"hello world foo", "world foo bar"}


def test_pagerank_empty_graph_returns_empty(spark):
    """An empty edge table (fresh store, no links yet) must yield an
    empty rank table — 1/n is constant-folded at plan time, so even a
    zero-row plan used to abort with DIVIDE_BY_ZERO under ANSI."""
    from crawler_spark.operators.graphrank import host_ranks_df, pagerank

    edges = spark.createDataFrame([], "src: string, dst: string")
    assert pagerank(edges).collect() == []
    links = spark.createDataFrame([], "source_host: string, host: string")
    assert host_ranks_df(links).collect() == []


def test_robots_conservative_star_disallow_blocks():
    """'Disallow: *' (and '*.pdf') must over-BLOCK in conservative mode
    — truncating the pattern to nothing and dropping it turned a
    disallow-everything file into allow-all, the one direction
    conservative mode promises never to err."""
    from crawler_spark.functions.robots import parse_robots_txt

    rules = parse_robots_txt(
        "h.test", "User-agent: *\nDisallow: *\n"
    )
    assert ("h.test", "/", False) in rules
    rules = parse_robots_txt(
        "h.test", "User-agent: *\nDisallow: *.pdf\n"
    )
    assert ("h.test", "/", False) in rules
    # empty Disallow still means allow-all (no rule) per RFC
    assert parse_robots_txt("h.test", "User-agent: *\nDisallow:\n") == []


def test_robots_multiple_matching_groups_merge():
    """RFC 9309 §2.2.1: several groups matching the UA at the same
    specificity COMBINE — machine-appended files carry multiple
    'User-agent: *' blocks, and keeping only the first dropped the
    later blocks' disallows."""
    from crawler_spark.functions.robots import (
        parse_crawl_delay,
        parse_robots_txt,
    )

    body = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\nCrawl-delay: 2\n"
    )
    rules = parse_robots_txt("h.test", body)
    assert ("h.test", "/a", False) in rules
    assert ("h.test", "/b", False) in rules
    assert parse_crawl_delay(body) == 2.0
    # a more specific UA group still beats (and excludes) the '*' groups
    body2 = "User-agent: mybot\nDisallow: /only\n\n" + body
    rules2 = parse_robots_txt("h.test", body2, user_agent="mybot/1.0")
    assert rules2 == [("h.test", "/only", False)]


def test_rrf_fuse_null_score_contributes_zero(spark):
    """A NULL score in a signal means 'no information' — contribution
    0 like an absent key, not rank 1 (NULLS FIRST under the -score
    sort used to hand the unknown key the MAXIMUM contribution)."""
    from crawler_spark.operators.topk import rrf_fuse

    sig = spark.createDataFrame(
        [("known_hi", 10.0), ("known_lo", 1.0), ("unknown", None)],
        "host: string, score: double",
    )
    out = {r["host"]: r["rrf"] for r in
           rrf_fuse([sig], key="host", score_col="score").collect()}
    assert out["known_hi"] > out["known_lo"]
    assert "unknown" not in out  # single signal, no info → no row


def test_html_self_closing_nonvoid_and_duplicate_attrs():
    """parse5 parity: '/>' on a non-void element is an OPEN tag (the
    text belongs inside the div), and duplicate attributes keep the
    FIRST occurrence."""
    from crawler_spark.functions.html import (
        extract_links_from,
        extract_text_blocks,
    )

    blocks = extract_text_blocks(
        "<html><body><div/>some words here</body></html>"
    )
    assert any("some words here" in b for b in blocks)
    links = [u for u, _, _ in extract_links_from(
        '<a href="/real" href="/spam">x</a>', "http://h.test/"
    )]
    assert links == ["http://h.test/real"]


def test_normalize_url_whatwg_slash_recovery():
    """WHATWG recovers special-scheme URLs written without '//' and
    treats '\\' as '/' — the reference's whatwg-url does both, so
    rejecting them dropped links the reference crawls (or keyed
    politeness on a hostname containing a backslash)."""
    from crawler_spark.functions.urls import (
        get_hostname,
        has_proto,
        normalize_url,
    )

    assert normalize_url("http:example.com/page") == (
        "http://example.com/page"
    )
    assert normalize_url("https:/example.com/x") == "https://example.com/x"
    canon = normalize_url("http://h.com\\path")
    assert canon == "http://h.com/path"
    assert get_hostname(canon) == "h.com"
    assert has_proto("http:example.com/page") is True


def test_asof_join_ignores_null_event_ts(spark):
    """An event with a NULL timestamp has no place on the time axis —
    it used to sort FIRST and fill every probe before the first real
    event (matched_ts=NULL with populated values, tolerance failing
    open)."""
    from crawler_spark.operators.temporal import asof_join

    events = spark.createDataFrame(
        [("k", None, 99), ("k", "2026-06-01 00:00:00", 1)],
        "user_id: string, ts: string, value: int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    probes = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00")], "user_id: string, ts: string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [row] = asof_join(probes, events, "user_id", "ts", ["value"]).collect()
    assert row["value"] is None and row["matched_ts"] is None
    [row] = asof_join(
        probes, events, "user_id", "ts", ["value"], tolerance_seconds=10
    ).collect()
    assert row["value"] is None


def test_range_join_buckets_rejects_colliding_cols(spark):
    """Overlapping left/right payload names (the natural self-join
    mistake) must fail fast, not produce a duplicate-name frame."""
    from crawler_spark.operators.temporal import range_join_buckets

    df = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00", "d")],
        "user_id: string, ts: string, digest: string",
    )
    with pytest.raises(ValueError, match="collide"):
        range_join_buckets(df, df, "user_id", "ts", 300,
                           ["digest"], ["digest"])


def test_change_rates_single_capture_not_dropped(spark):
    """A page fetched exactly once must still appear in the schedule
    (revisit at the band ceiling) — filtering it out meant
    due_for_recrawl could NEVER refetch it: a permanent staleness
    trap. CDX-style 14-digit string timestamps must parse, not
    ANSI-abort."""
    from crawler_spark.operators.freshness import (
        change_rates,
        due_for_recrawl,
    )

    caps = spark.createDataFrame(
        [("a", "20260101000000", "d1"),
         ("b", "20260101000000", "d1"), ("b", "20260111000000", "d2")],
        "url: string, cdx_ts: string, digest: string",
    )
    out = {r["url"]: r for r in change_rates(
        caps, ts_col="cdx_ts", tiebreak_col="digest"
    ).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_captures"] == 1
    assert out["a"]["rate_per_day"] == 0.0
    assert out["a"]["revisit_seconds"] == 30 * 86400.0
    assert out["b"]["n_changes"] == 1
    # and the once-crawled page becomes due once the ceiling elapses
    due = {r["url"] for r in due_for_recrawl(
        caps, "20270101000000", ts_col="cdx_ts", tiebreak_col="digest"
    ).collect()}
    assert "a" in due


def test_resolve_redirects_null_dst_not_terminal(spark):
    """A redirect edge whose Location failed to parse (dst NULL) is
    dropped — its src must not come back as (final_id=NULL, hops=1,
    is_cycle=false), a row claiming success with no terminal."""
    from crawler_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [("a", None), ("b", "c")], "src: string, dst: string"
    )
    out = {r["src_id"]: r for r in resolve_redirects(edges).collect()}
    assert "a" not in out
    assert out["b"]["final_id"] == "c"


def test_url_trap_flags_scheme_case_and_fragment(spark):
    """Mixed-case schemes must not count scheme+host as path segments,
    fragments are not query text, and repeated_segments needs a
    segment occurring >= 3 times (two pairs is not a trap)."""
    from crawler_spark.functions.traps import url_trap_flags

    df = spark.createDataFrame(
        [
            (1, "HTTP://a.test/doc/1"),
            (2, "http://a.test/a?x=1#" + "f" * 120),
            (3, "http://a.test/blog/blog/img/img"),
            (4, "http://a.test/a/b/a/c/a"),
        ],
        "doc_id: long, url: string",
    )
    out = {r["doc_id"]: r for r in url_trap_flags(df).collect()}
    assert out[1]["depth"] == 2
    assert out[2]["long_query"] is False
    assert out[2]["n_params"] == 1
    assert out[3]["repeated_segments"] is False
    assert out[4]["repeated_segments"] is True
