"""Shared JVM-side text column expressions.

ONE definition of "word" and "sliding n-gram" for every operator that
tokenizes relationally (winnowing fingerprints, repetition rules,
decontamination n-grams, …) — three private copies would silently drift
the moment one site tweaks the tokenizer. These build pure Catalyst
expressions (codegen-friendly, mirrored 1:1 by the DuckDB oracles);
the UDF-kernel tokenizer with stopword semantics lives in ``textops``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """The engine-portable 60-bit hash every cross-engine-deterministic
    operator keys on: first 15 hex chars of md5 as a non-negative long
    — ``conv(substring(md5(x), 1, 15), 16, 10)`` evaluates identically
    in Spark and DuckDB (15 chars keeps the value under 2^60, inside
    both engines' exact integer range). ONE definition for the same
    reason as ``word_tokens`` below: the oracle contract rests on this
    expression, and private copies would silently drift. Callers mod /
    concat around it (rates, salts, hash families) but never re-spell
    the primitive."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_tokens(text: str | Column) -> Column:
    """Lower-cased whitespace tokens of the trimmed text, empties
    dropped — python's ``text.lower().split()`` as a column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def sliding_grams(toks: Column, n: int) -> Column:
    """All space-joined n-grams of a token array (empty when there are
    fewer than ``n`` tokens)."""
    m = F.size(toks) - F.lit(n - 1)
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), m - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
