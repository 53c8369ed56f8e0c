"""Text-analysis operators for training-data curation.

Language ID (n-gram/function-word heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting (rolling-hash winnowing).

Everything except the winnowing fingerprint is pure JVM-side column
algebra (``split``/``regexp_count``/``length``) so it runs inside
whole-stage codegen and is expressible in ANSI SQL for the DuckDB oracle.
The fingerprint needs a rolling window min — an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.operators.dedup import hash_token

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
      - ``score``: length factor × (1 − punct excess) × stopword-band
        factor, clamped to [0, 1].
    """
    c = F.col(text_col)
    n_tokens = ws_token_count(c)
    n_chars = F.length(c)
    punct = F.regexp_count(c, F.lit(r"[!\"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]"))
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(c), r"\s+"),
            lambda t: t.isin(*[F.lit(s) for s in stopwords]),
        )
    )
    out = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stop_ratio"),
    )
    length_factor = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    punct_factor = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 4
    )
    stop_factor = F.when(
        (F.col("stop_ratio") >= 0.05) & (F.col("stop_ratio") <= 0.6),
        F.lit(1.0),
    ).otherwise(F.lit(0.5))
    return out.withColumn(
        "score",
        F.round(length_factor * punct_factor * stop_factor, 6),
    )


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
    c = F.col(text_col)
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


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing)
# ---------------------------------------------------------------------------


def _winnow(tokens: list[str], k: int, window: int) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken 2003): k-gram rolling hashes,
    min per sliding window, deduped consecutive picks."""
    if len(tokens) < k:
        return [hash_token(" ".join(tokens))] if tokens else []
    hs = [hash_token(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)]
    if len(hs) <= window:
        return [min(hs)]
    picks: list[int] = []
    last = -1
    for i in range(len(hs) - window + 1):
        w = hs[i : i + window]
        j = i + int(np.argmin(w))
        if j != last:
            picks.append(hs[j])
            last = j
    return picks


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprint array<long>) winnowed rolling-hash sketch."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            out.append(
                [int(np.int64(np.uint64(h))) for h in _winnow(toks, k, window)]
            )
        return pd.Series(out)

    return df.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprint"))
