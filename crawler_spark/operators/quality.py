"""Text-analysis operators for training-data curation.

Language ID (n-gram/function-word heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting (rolling-hash winnowing).

Everything here — including the winnowing fingerprint — is pure JVM-side
column algebra (``split``/``regexp_count``/``length``/frame-bounded
windows) so it runs inside whole-stage codegen and is expressible in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textcols import (
    portable_hash64,
    sliding_grams,
    word_tokens,
)

# small function-word profiles for the language-ID heuristic (public,
# high-frequency words; the synthetic corpora only exercise determinism)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "por", "con", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "que", "pour"),
}


def ws_token_count(text: str | Column) -> Column:
    """Whitespace token count — SQL-portable: size(split(trim(t), '\\s+'))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish regex token count: word pieces OR single non-space symbols.

    ``regexp_count(t, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')`` — the same pattern
    runs verbatim in DuckDB, so the oracle can check it.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col),
        ws_token_count(text_col).alias("ws_tokens"),
        bpe_ish_token_count(text_col).alias("bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_component_cols(
    text: Column, stopwords: tuple[str, ...] = _LANG_MARKERS["en"]
) -> dict[str, Column]:
    """The quality-feature components as named Column expressions.

    Pure column algebra (no select/agg/window), so the same expressions
    drive batch ``quality_scores`` AND the streaming curation gate
    (``streaming/curation.py``) — structured streaming accepts them
    unchanged.
    """
    n_tokens = ws_token_count(text)
    n_chars = F.length(text)
    punct = F.regexp_count(
        text, F.lit(r"[!\"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]")
    )
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(text), r"\s+"),
            lambda t: t.isin(*[F.lit(s) for s in stopwords]),
        )
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "mean_token_len": n_chars / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stop_ratio": stop_hits / F.greatest(n_tokens, F.lit(1)),
    }


def quality_score_col() -> Column:
    """Composite score in [0, 1] over the NAMED component columns
    (``n_tokens``, ``punct_ratio``, ``stop_ratio`` must already exist):
    length factor × (1 − punct excess) × stopword-band factor."""
    length_factor = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    punct_factor = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 4
    )
    stop_factor = F.when(
        (F.col("stop_ratio") >= 0.05) & (F.col("stop_ratio") <= 0.6),
        F.lit(1.0),
    ).otherwise(F.lit(0.5))
    return F.round(length_factor * punct_factor * stop_factor, 6)


def quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = _LANG_MARKERS["en"],
) -> DataFrame:
    """Heuristic doc-quality features + a composite score in [0, 1].

    Components (all JVM-side / SQL-expressible):
      - ``n_tokens``, ``mean_token_len``;
      - ``punct_ratio``: punctuation chars / chars;
      - ``stop_ratio``: fraction of tokens in a small function-word list
        (natural English has ~0.2-0.5; keyword-stuffed or boilerplate text
        falls outside);
      - ``score``: see ``quality_score_col``.
    """
    comps = quality_component_cols(F.col(text_col), stopwords)
    out = df.select(
        F.col(id_col), *[v.alias(k) for k, v in comps.items()]
    )
    return out.withColumn("score", quality_score_col())


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID over function-word hit counts + CJK ratio.

    Pure column algebra: one hit-count per language profile (a tiny
    unrolled isin filter — no UDF, no join), plus a CJK character ratio
    gate for ``zh``. Ties break by profile order (en, es, de, fr).
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = []
    n_profiles = len(_LANG_MARKERS)
    for idx, (lang, markers) in enumerate(_LANG_MARKERS.items()):
        hits = F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers]))
        )
        # tie-break field: earlier profile order (en, es, de, fr) wins —
        # sorting desc on the struct compares hits first, then priority
        scores.append(
            F.struct(
                hits.alias("hits"),
                F.lit(n_profiles - idx).alias("pri"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.sort_array(F.array(*scores), asc=False)[0]
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]"))
    pred = F.when(
        cjk * 2 > F.length(F.col(text_col)) - cjk, F.lit("zh")
    ).otherwise(
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
) -> DataFrame:
    """Gopher-style repetition/format quality rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 — public heuristics that
    became the standard web-text curation filter).

    Implemented subset (all JVM-side column algebra, SQL-expressible):
      - word count in [min_words, max_words];
      - mean word length in [min_mean_word_len, max_mean_word_len];
      - '#'/ellipsis symbol-to-word ratio ≤ max_symbol_word_ratio;
      - fraction of lines starting with a bullet or ending in '…'
        bounded (here: ellipsis-terminated line ratio);
      - ≥ min_alpha_word_ratio of words contain at least one alphabetic
        character.

    Returns one row per doc with each rule's value, its pass flag, and
    ``keep`` = AND of all flags.
    """
    # NULL text ≡ empty text (the repo-wide NULL-text contract): a
    # fetch-failure doc gets typed zero stats and keep=false here, the
    # same way gopher_repetition_flags already coalesces — an all-NULL
    # row would otherwise vanish from BOTH keep filter branches
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(c), r"\s+")
    n_words = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(words)
    )
    mean_wlen = F.length(F.regexp_replace(F.trim(c), r"\s+", "")) / F.greatest(
        n_words, F.lit(1)
    )
    n_symbols = F.regexp_count(c, F.lit(r"#|\.\.\.")) + F.regexp_count(
        c, F.lit("…")
    )
    symbol_ratio = n_symbols / F.greatest(n_words, F.lit(1))
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
    )
    ellipsis_ratio = n_ellipsis_lines / F.greatest(n_lines, F.lit(1))
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha_words / F.greatest(n_words, F.lit(1))

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).cast("double").alias("mean_word_len"),
        F.round(symbol_ratio, 6).cast("double").alias("symbol_word_ratio"),
        F.round(ellipsis_ratio, 6).cast("double").alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).cast("double").alias("alpha_word_ratio"),
    )
    flags = {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbols": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_ellipsis": F.col("ellipsis_line_ratio")
        <= max_ellipsis_line_ratio,
        "ok_alpha": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
    }
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_ratio: float = 0.30,
    max_top_bigram_ratio: float = 0.18,
) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, second family):
    documents dominated by repeated lines or one repeated n-gram are
    boilerplate/spam. Implemented JVM-side (SQL-expressible):

      - ``dup_line_ratio``: fraction of non-empty lines that are exact
        duplicates of an earlier line;
      - ``top_bigram_ratio``: fraction of the doc's word-bigram
        occurrences taken by its single most frequent bigram.

    Returns one output row PER INPUT ROW (values + pass flags +
    ``keep``) — callers feeding duplicated ids must dedupe upstream (the
    earlier groupBy formulation silently merged them). ZERO shuffle: both
    ratios are per-row array algebra (the same pattern ``dup_line_ratio``
    always used). The top-bigram count is the longest run in the
    ``sort_array``-ed bigram array, found in one ``aggregate`` pass —
    n log n per doc, inside whole-stage codegen. The earlier
    explode → groupBy² formulation exchanged a corpus-sized gram table
    twice; at 100 TB that shuffle IS the operator's cost, and nothing
    about the semantics needs cross-row state (plan-asserted shuffle-free
    in tests/test_plans.py).
    """
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_ratio = F.when(n_lines > 0,
                            (n_lines - n_distinct_lines) / n_lines
                            ).otherwise(F.lit(0.0))

    # top-bigram occurrence count = longest equal-run in the sorted bigram
    # array; carry (prev, current run, best run) through one fold
    sorted_bg = F.sort_array(sliding_grams(word_tokens(c), 2))
    top_cnt = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(
                acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)
            ).otherwise(acc["run"] + 1).alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)
                ).otherwise(acc["run"] + 1),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # |bigrams| = max(0, |tokens| - 1) — NOT F.size(sorted_bg), which
    # would re-run the whole tokenize+gram-build+sort per row (no CSE
    # across higher-order lambdas; see the vocab comment below)
    total_cnt = F.greatest(
        F.size(word_tokens(c)) - F.lit(1), F.lit(0)
    )
    top_ratio = F.when(
        total_cnt > 0, top_cnt / total_cnt
    ).otherwise(F.lit(0.0))
    out = df.select(
        F.col(id_col),
        F.round(dup_line_ratio, 6).cast("double").alias("dup_line_ratio"),
        F.round(top_ratio, 6).cast("double").alias("top_bigram_ratio"),
    )
    return (
        out.withColumn(
            "ok_dup_lines", F.col("dup_line_ratio") <= max_dup_line_ratio
        )
        .withColumn(
            "ok_top_bigram",
            F.col("top_bigram_ratio") <= max_top_bigram_ratio,
        )
        .withColumn(
            "keep", F.col("ok_dup_lines") & F.col("ok_top_bigram")
        )
    )


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing)
# ---------------------------------------------------------------------------


def gram_hash(gram: Column) -> Column:
    """Deterministic 60-bit k-gram hash: first 15 hex chars of md5.

    md5 is the one hash both Spark and DuckDB evaluate identically, so the
    whole winnowing fingerprint is oracle-checkable; 15 hex chars = 60 bits
    fit a signed long on both engines.
    """
    return portable_hash64(gram)


def md5int15(s: str) -> int:
    """Driver-side twin of :func:`gram_hash` — THE portable 60-bit hash.

    Every oracle-checkable operator that needs driver-computed constants
    from the same family (winnow reference picks, dyadic LSH hyperplanes,
    dyadic classifier weights) derives them from this one definition, so
    a change to the hash width/encoding cannot silently break the
    cross-engine parity of one operator but not another."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def dyadic_weight(s: str) -> float:
    """Deterministic weight in [-1, 1) with denominator 128: exactly
    representable in IEEE double AND re-derivable in SQL from ``md5()``,
    so Spark literals and DuckDB expressions agree bit-for-bit. Shared by
    the portable LSH hyperplanes and the portable classifier head."""
    return (md5int15(s) % 257 - 128) / 128.0


def winnow_reference(tokens: list[str], k: int, window: int) -> list[tuple[int, int]]:
    """Serial spec of the winnowing sketch (Schleimer/Wilkerson/Aiken 2003,
    first-occurrence argmin, consecutive-pick dedup) — used by tests to
    verify the distributed plan. Returns [(gram_pos, fp_hash)]."""
    h = md5int15

    if not tokens:
        return []
    if len(tokens) < k:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [h(g) for g in grams]
    picks: list[tuple[int, int]] = []
    last = -1
    for i in range(max(len(hs) - window, 0) + 1):
        w = hs[i : i + window]
        j = i + int(np.argmin(w))
        if j != last:
            picks.append((j, hs[j]))
            last = j
    return picks


def _winnow_rows(pdf_iter, id_col: str, window: int):
    """Arrow-batched winnow pick kernel: (id, _hs array) batches in, flat
    (id, gram_pos, fp_hash) rows out.

    Vectorized per row: numpy sliding-window argmin (first occurrence of
    the minimum wins — np.argmin's tie rule IS the classic winnowing
    tie-break), then consecutive same-position dedup; output batches are
    built from concatenated numpy arrays, never per-pick python objects
    (a struct-array returning variant measured ~6 s of pandas→Arrow
    struct conversion at sf0.1 — the flat layout is ~20× cheaper).
    Semantics are pinned to :func:`winnow_reference` by tests."""
    for pdf in pdf_iter:
        ids = pdf[id_col].to_numpy()
        counts = np.zeros(len(pdf), dtype=np.int64)
        pos_parts = []
        h_parts = []
        for i, arr in enumerate(pdf["_hs"]):
            if arr is None:  # null text → null gram array: drop the row,
                continue     # matching the relational form this replaced
            h = np.asarray(arr, dtype=np.int64)
            m = len(h)
            if m == 0:
                continue
            if m <= window:
                sel = np.array([int(h.argmin())])
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, window)
                pos = np.arange(m - window + 1) + win.argmin(axis=1)
                keep = np.empty(len(pos), dtype=bool)
                keep[0] = True
                np.not_equal(pos[1:], pos[:-1], out=keep[1:])
                sel = pos[keep]
            counts[i] = len(sel)
            pos_parts.append(sel)
            h_parts.append(h[sel])
        if not pos_parts:
            yield pd.DataFrame(
                {id_col: ids[:0], "gram_pos": np.array([], dtype=np.int32),
                 "fp_hash": np.array([], dtype=np.int64)}
            )
            continue
        yield pd.DataFrame(
            {
                id_col: np.repeat(ids, counts),
                "gram_pos": np.concatenate(pos_parts).astype(np.int32),
                "fp_hash": np.concatenate(h_parts),
            }
        )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Winnowed rolling-hash sketch → (id, gram_pos, fp_hash) rows.

    Fully relational — no UDF: k-grams are built with ``transform`` over
    the token array, hashed per-gram, and the sliding-window argmin (first
    occurrence of the minimum wins, matching the classic algorithm) is a
    per-row fold. The exploded pick-per-row output shape is both the
    Spark-native layout for downstream overlap joins and sortable by the
    correctness harness.

    ``portable`` selects the gram hash, the same dual-path contract as
    ``minhash_signatures``: ``False`` (production default) uses JVM
    ``xxhash64`` — one codegen'd call per gram; ``True`` uses the
    md5-prefix :func:`gram_hash` both Spark and DuckDB evaluate
    identically (oracle-checkable, ~3-5× slower: md5 + base-16→10 string
    conversion per gram). Either hash yields a valid winnowing sketch —
    the picks differ, the sketch guarantees don't.

    ZERO shuffle: the whole sketch is per-row array algebra — hash the
    gram array once, take each window's first-occurrence argmin with one
    O(w) fold per position, drop consecutive duplicate picks with an
    indexed filter, and only then explode the (tiny) picks array. The
    earlier formulation exploded EVERY gram and ran two windows over a
    corpus-sized (id, pos, hash) exchange; the sliding argmin needs no
    cross-row state, so that shuffle bought nothing (plan-asserted
    shuffle-free in tests/test_plans.py).
    """
    toks = word_tokens(text_col)
    n = F.size(toks)
    grams = (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.array_join(toks, " ")))  # short doc: 1 gram
        .otherwise(sliding_grams(toks, k))
    )
    hs = F.transform(
        grams, lambda g: gram_hash(g) if portable else F.xxhash64(g)
    )

    base = df.select(F.col(id_col), hs.alias("_hs"))
    # The pick stage (per-window first-occurrence argmin + consecutive
    # dedup) is ONE Arrow-batched vectorized kernel over the hash array,
    # emitting the exploded (id, gram_pos, fp_hash) rows directly from
    # concatenated numpy arrays. A fully relational formulation exists in
    # git history; higher-order lambdas are interpreted with no
    # common-subexpression elimination, and both the flat least()/when()
    # form (~4.9 s at sf0.1) and a two-pass min/argmin split (~6.0 s)
    # lose to the numpy kernel. Still zero shuffle (asserted in
    # tests/test_plans.py): mapInPandas is a per-partition map, not an
    # exchange.
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, gram_pos int, fp_hash long"
    return base.mapInPandas(
        lambda it: _winnow_rows(it, id_col, window), out_schema
    )


def bigram_cross_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document cross-entropy under the corpus *bigram* model with
    add-``alpha`` smoothing — the second rung of the CCNet-style fluency
    ladder above ``unigram_cross_entropy`` (Wenzek et al. 2020 score with
    an LM and drop the worst tail; a smoothed bigram model catches
    shuffled-word gibberish that unigram frequency cannot).

    ``xent = mean(-ln P(w2|w1))`` over the doc's bigrams, where
    ``P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha·V)`` with corpus
    bigram counts ``c``, per-context totals ``c(w1 ·)`` and unigram
    vocabulary size ``V``. Returns ``(id, bigram_xent, n_bigrams)``, one
    row per doc with >= 1 bigram (>= 2 tokens).

    Scale shape: TWO corpus-sized shuffles (the bigram-count groupBy with
    map-side combine, then the probability equi-join of exploded doc
    bigrams against that table) plus one vocab-count shuffle; the
    context-total and vocabulary tables are zipfian-small and broadcast.
    With ``hash_grams=True`` (production default) every exchanged key is
    ``xxhash64`` (8 bytes) — gram *text* never crosses a shuffle; the
    string-keyed path is semantically identical modulo 64-bit collisions
    and mirrors the DuckDB oracle exactly.
    """
    toks = df.select(F.col(id_col), word_tokens(text_col).alias("_t"))
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_t") < 2,
                F.array().cast("array<struct<w1:string,bg:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at(F.col("_t"), i).alias("w1"),
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("_t"), i),
                            F.element_at(F.col("_t"), i + 1),
                        ).alias("bg"),
                    ),
                )
            )
        ).alias("_p"),
    )

    def _k(c: Column) -> Column:
        return F.xxhash64(c) if hash_grams else c

    ex = pairs.select(
        id_col,
        _k(F.col("_p.bg")).alias("_kb"),
        _k(F.col("_p.w1")).alias("_kw"),
    )
    bg_counts = ex.groupBy("_kb", "_kw").agg(F.count("*").alias("_c"))
    ctx = bg_counts.groupBy("_kw").agg(F.sum("_c").alias("_cw"))
    vocab_n = (
        toks.select(F.explode("_t").alias("_tok"))
        .select(_k(F.col("_tok")).alias("_kt"))
        .agg(F.count_distinct("_kt").alias("_v"))
    )
    probs = (
        bg_counts.join(F.broadcast(ctx), "_kw")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "_kb",
            (
                (F.col("_c") + F.lit(alpha))
                / (F.col("_cw") + F.lit(alpha) * F.col("_v"))
            ).alias("_p"),
        )
    )
    return (
        ex.select(id_col, "_kb")
        .join(probs, "_kb")
        .groupBy(id_col)
        .agg(
            F.avg(-F.log("_p")).alias("bigram_xent"),
            F.count("*").alias("n_bigrams"),
        )
    )


def unigram_cross_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-entropy under the corpus unigram model — the
    CCNet-style fluency signal (Wenzek et al. 2020 score documents with
    an LM and drop the worst tail; a unigram model is its shuffle-cheap
    first rung): ``xent = mean(-ln p(token))`` where ``p`` is the
    corpus-wide token frequency. Gibberish and boilerplate-heavy docs
    score high; docs made of common words score low.

    Returns ``(id, xent, n_tokens)``, one row per doc with ≥1 token.

    Scale shape: ONE corpus-sized shuffle (the token-count groupBy, with
    map-side partial aggregation); the resulting vocabulary table is
    zipfian-small and is explicitly ``broadcast()`` for the probability
    join, so per-doc scoring never exchanges the exploded token table.
    """
    toks = df.select(F.col(id_col), word_tokens(text_col).alias("_toks"))
    ex = toks.select(id_col, F.explode("_toks").alias("tok"))
    vocab = ex.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_total"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("cnt") / F.col("_total")).alias("p")
    )
    return (
        ex.join(F.broadcast(probs), "tok")
        .groupBy(id_col)
        .agg(
            F.avg(-F.log("p")).alias("xent"),
            F.count("*").alias("n_tokens"),
        )
    )


def host_reputation(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    short_tokens: int = 50,
    saturation_tokens: int = 400,
) -> DataFrame:
    """Per-host reputation rollup — the document-quality signal folded
    up to the unit the SCHEDULER works in (politeness budgets, robots,
    priorities are all per host; reference crawls per-host too,
    ``crawl.ts`` worker loop). A host serving mostly duplicated or
    trivially short pages should lose frontier priority before its
    next million URLs are fetched; this rollup is the feedback signal,
    the same broadcast-sized shape as ``graphrank.host_ranks_from_links``
    (host universe ~10^7 at 100 TB: one map-side-combined groupBy, the
    result joins the frontier as a broadcast).

    Per host:

      * ``n_docs``;
      * ``dup_ratio`` — 1 − distinct(text)/n_docs, computed over
        ``xxhash64(text)`` so the distinct-agg never shuffles text
        (the never-shuffle-text rule; the oracle counts distinct text
        itself, which is equal absent 64-bit collisions);
      * ``short_ratio`` — fraction of docs under ``short_tokens``
        whitespace tokens;
      * ``mean_tokens``;
      * ``spam_score`` = (5·dup + 3·short + 2·(1 −
        min(mean_tokens, S)/S)) / 10 with S = ``saturation_tokens`` — a
        documented, deterministic linear mix (weights are policy, not
        truth: callers tune them); ``reputation`` = 1 − spam_score.

    Every ratio is computed in integer MICRO-UNITS (floor of
    value·10⁶) from the integer aggregates, so the mix never touches a
    float until the final /10⁶ — float ``round()`` half-way cases land
    on different sides in Spark (HALF_UP on decimal), DuckDB, and
    python, and a 0.5/0.3/0.2 mix of 6-dp values hits a half-way case
    on almost every odd last digit. Integer floor-division is bitwise
    identical everywhere.
    """
    t = F.col(text_col)
    n_tok = ws_token_count(t)
    # project the per-doc signals FIRST: the distinct-agg exchange then
    # partitions on the derived (host, _th) attributes — fixed-width
    # rows, the text column is pruned before anything shuffles
    # (tests/test_plans.py asserts the exchange keys)
    sig = df.select(
        F.col(host_col).alias("host"),
        F.xxhash64(t).alias("_th"),
        (n_tok < short_tokens).cast("long").alias("_is_short"),
        n_tok.cast("long").alias("_n_tok"),
    )
    agg = sig.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_th").alias("_uniq"),
        F.sum("_is_short").alias("_n_short"),
        F.sum("_n_tok").alias("_sum_tok"),
    )
    m = F.lit(1_000_000).cast("long")
    dup_u = m - F.expr("_uniq * 1000000 div n_docs")
    short_u = F.expr("_n_short * 1000000 div n_docs")
    mean_u = F.expr("_sum_tok * 1000000 div n_docs")
    # min(mean, S)/S in micro-units: floor(sum_tok·(10⁶/S) / n_docs),
    # capped at 10⁶ — exact while S divides 10⁶
    assert 1_000_000 % saturation_tokens == 0, "S must divide 10^6"
    per = 1_000_000 // saturation_tokens
    sat_u = m - F.least(
        F.expr(f"_sum_tok * {per} div n_docs"), m
    )
    spam_u = F.floor(
        (F.lit(5) * dup_u + F.lit(3) * short_u + F.lit(2) * sat_u) / 10
    ).cast("long")
    return agg.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        (dup_u / m).cast("double").alias("dup_ratio"),
        (short_u / m).cast("double").alias("short_ratio"),
        (mean_u / m).cast("double").alias("mean_tokens"),
        (spam_u / m).cast("double").alias("spam_score"),
        ((m - spam_u) / m).cast("double").alias("reputation"),
    )


def soft_404_flags(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    status_col: str = "status",
    text_col: str = "text",
    max_tokens: int = 20,
    min_template_dup: int = 3,
    hash_bodies: bool = True,
) -> DataFrame:
    """Soft-404 detection: pages that answer HTTP 200 but are really
    error pages (the classic "sic transit gloria telae" problem,
    Bar-Yossef et al. WWW 2004). Hard 404s never reach the corpus; the
    200-status ghosts poison dedup statistics, link-graph ranks, and
    training data, and no single signal is reliable — so two
    independent ones are combined:

    - ``error_phrase`` — the body matches a not-found phrase pattern;
    - ``tiny_body`` AND ``template_dup`` — the body is under
      ``max_tokens`` whitespace tokens and its EXACT text recurs on
      ``>= min_template_dup`` distinct pages of the same host: a
      per-host error template. A tiny-but-unique page (a stub, a
      redirect notice) is NOT flagged — uniqueness is evidence of
      content.

    ``soft_404 = status == 200 AND (error_phrase OR (tiny_body AND
    template_dup))``. Non-200 rows keep their flags but are never
    soft-404 (the status already tells the truth).

    Scale shape: the per-row signals are zero-shuffle column algebra;
    template detection filters to tiny bodies FIRST and then counts
    per ``(host, xxhash64(text), text)`` — the 8-byte hash leads the
    shuffle key for cheap comparison but the text itself rides along,
    so a 64-bit collision between a unique stub and an error template
    can never conflate them (same hash-then-exact pattern as the
    URL-seen filter; equal text ⇒ equal hash, so the groups are
    byte-exact either way). Only the tiny subset — bounded by
    ``max_tokens`` — ever shuffles its text, never the corpus.
    ``hash_bodies=False`` drops the hash prefix and keys on the text
    alone; both paths are exact. Returns the input columns plus the
    four flags.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(F.split(F.trim(t), r"\s+")) - F.when(
        F.trim(t) == "", 1
    ).otherwise(0)
    tiny = n_tokens <= max_tokens
    phrase = F.lower(t).rlike(
        r"(page (could )?not (be )?found|404 (error|not found)"
        r"|does not exist|no longer (available|exists)"
        r"|page you (requested|are looking for))"
    )
    key = (F.xxhash64(t) if hash_bodies else t).alias("_bk")
    flagged = pages.select(
        *pages.columns,
        tiny.alias("tiny_body"),
        phrase.alias("error_phrase"),
        key,
    )
    # exact-text confirm column: with hash_bodies the hash only LEADS
    # the key — grouping and joining also on the text makes a 64-bit
    # collision harmless (there is no downstream re-check to catch it,
    # unlike dedup candidates, so exactness must live here)
    tkey = [t.alias("_bt")] if hash_bodies else []
    templates = (
        flagged.where(F.col("tiny_body"))
        .select(F.col(host_col).alias("_th"), "_bk", *tkey, F.col(url_col))
        .groupBy("_th", "_bk", *(["_bt"] if hash_bodies else []))
        .agg(F.count_distinct(url_col).alias("_n"))
        .where(F.col("_n") >= min_template_dup)
        .select(
            "_th",
            F.col("_bk").alias("_tbk"),
            *([F.col("_bt").alias("_tbt")] if hash_bodies else []),
            F.lit(True).alias("_dup"),
        )
    )
    cond = (flagged[host_col] == templates["_th"]) & (
        F.col("_bk") == F.col("_tbk")
    )
    if hash_bodies:
        cond = cond & (t == F.col("_tbt"))
    joined = flagged.join(templates, cond, "left")
    dup = F.coalesce(F.col("_dup"), F.lit(False))
    return joined.select(
        *pages.columns,
        "tiny_body",
        "error_phrase",
        dup.alias("template_dup"),
        (
            (F.col(status_col) == 200)
            & (F.col("error_phrase") | (F.col("tiny_body") & dup))
        ).alias("soft_404"),
    )


def blocklist_flags(
    df: DataFrame,
    words: frozenset[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """C4-style keyword blocklist filtering (Raffel et al. 2020 §2.2:
    drop any page containing any word from a public blocklist; UT1
    category lists are used the same way). ``words`` defaults to
    ``functions.lexicons.BLOCKLIST`` (a spam-term seed — ship the real
    public list as ``blocklist-en.txt`` next to the lexicons module,
    same drop-in contract as AFINN).

    Matching is whole-token on a simple documented tokenization
    (lowercase, split on non-alphanumeric runs) — "scunthorpe" never
    matches a blocklisted substring. Multiword entries ("weight loss
    pills") match as CONSECUTIVE whole tokens of the same stream —
    the shape the real public lists (DLP, UT1) use for compound spam
    signals whose constituent words ("weight", "loss") are ordinary
    prose; exploding them into unigrams would make the default
    ``max_hits=0`` filter far more aggressive than C4 intends.
    Returns ``(id, blocked_count, blocked_distinct, keep)`` where
    ``keep = blocked_count <= max_hits`` (C4 semantics at the default
    0: one hit drops the page); phrase occurrences count once each
    (non-overlapping) and a phrase counts once toward
    ``blocked_distinct``.

    Scale shape: the word set rides the plan as a LITERAL array inside
    whole-stage codegen and each phrase as a literal regex over the
    space-joined token stream — zero shuffle, zero UDF, no join; list
    sizes here are hundreds-to-thousands of tokens, far under
    literal-plan limits.
    """
    import re as _re

    raw = sorted(words if words is not None else _default_blocklist())
    # normalize every entry through the SAME tokenization as the text
    # so "Weight-Loss  Pills" in a dropped-in list file still matches
    norm = [" ".join(_re.split(r"[^a-z0-9]+", w.lower())).strip()
            for w in raw]
    wl = sorted({w for w in norm if w and " " not in w})
    phrases = sorted({w for w in norm if " " in w})
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != ""
    )
    lit_words = F.array(*[F.lit(w) for w in wl])
    hits = F.filter(toks, lambda x: F.array_contains(lit_words, x))
    uni_count = F.size(hits).cast("long")
    uni_distinct = F.size(F.array_distinct(hits)).cast("long")
    if phrases:
        # one normalized stream; (?:^| )…(?= |$) keeps matches token-
        # aligned and the lookahead lets adjacent occurrences both count
        stream = F.array_join(toks, " ")
        pc = [
            F.regexp_count(
                stream, F.lit("(?:^| )" + _re.escape(p) + "(?= |$)")
            ).cast("long")
            for p in phrases
        ]
        ph_count = pc[0]
        ph_distinct = (pc[0] > 0).cast("long")
        for c in pc[1:]:
            ph_count = ph_count + c
            ph_distinct = ph_distinct + (c > 0).cast("long")
    else:
        ph_count = F.lit(0).cast("long")
        ph_distinct = F.lit(0).cast("long")
    total = uni_count + ph_count
    return df.select(
        F.col(id_col),
        total.alias("blocked_count"),
        (uni_distinct + ph_distinct).alias("blocked_distinct"),
        (total <= max_hits).alias("keep"),
    )


def _default_blocklist() -> frozenset[str]:
    from crawler_spark.functions.lexicons import BLOCKLIST

    return BLOCKLIST
