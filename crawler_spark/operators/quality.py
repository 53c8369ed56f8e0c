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
