"""Line-level web-text curation: corpus-wide repeated-line removal and
C4-style cleaning rules.

Web pages share boilerplate *lines* (nav bars, cookie banners, footers)
across documents; document-level dedup never sees them because every page
differs elsewhere. The standard fixes are:

- **repeated-line removal** (Falcon RefinedWeb, Penedo et al. 2023 §"line
  -wise corrections"; CCNet, Wenzek et al. 2020 dedups paragraph-hashes
  the same way): drop every line whose corpus-wide document frequency
  reaches a threshold, then reassemble each document from its surviving
  lines in original order.
- **C4 cleaning rules** (Raffel et al. 2020 §2.2): keep only lines that
  end in terminal punctuation and have at least `min_words` words, drop
  lines mentioning javascript, and drop whole pages that contain "lorem
  ipsum" or a curly brace or end up with fewer than 3 sentences.

Both are relational column algebra end-to-end — no Python UDFs — and both
are mirrored 1:1 by DuckDB oracles in ``__spark_entry__.oracle_sql``.

Reference tie-in: the reference crawler stores raw page text whole
(``src/lib/workers/texter.ts`` extracts, ``storage.ts`` inserts); these
operators are the 100-TB curation tier *downstream* of that store, per
the training-data-pipeline scope of SURVEY §7.

Scale shape (``drop_repeated_lines``):
- the line-frequency aggregation shuffles **8-byte xxhash64 keys only**
  (the projection drops text before the exchange — same contract as
  exact dedup in ``operators/dedup.py``), with map-side partial
  aggregation;
- the boilerplate-key join is an equi-join on that hash key;
- document reassembly is the single text-carrying shuffle, inherent
  because the output *is* the rebuilt text.

``c4_clean`` is zero-shuffle per-row algebra (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_lines", "drop_repeated_lines", "c4_clean"]


def split_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """One row per non-empty trimmed line: ``(id, *carry, pos, line)``.

    ``pos`` is the 0-based index in the document's raw newline split, so
    reassembly preserves original line order even after drops.
    ``carry_cols`` are per-document columns replicated onto every line
    row (e.g. the host for scoped counting) — cheaper than a re-join
    after the explode.
    """
    carry = list(carry_cols or [])
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "pos", "_raw"
            ),
        )
        .select(id_col, *carry, "pos", F.trim("_raw").alias("line"))
        .where(F.col("line") != "")
    )


def drop_repeated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    hash_lines: bool = True,
    scope_col: str | None = None,
) -> DataFrame:
    """Remove every line that appears in ``>= min_docs`` distinct
    documents corpus-wide; return one row per input document:
    ``(id, clean_text, n_kept, n_dropped)``.

    ``clean_text`` is the surviving trimmed non-empty lines joined by
    ``\\n`` in original order ('' when everything was boilerplate);
    empty/whitespace-only lines are normalized away (counted in
    neither ``n_kept`` nor ``n_dropped``).

    ``hash_lines=True`` (production) keys the frequency aggregation and
    the boilerplate join on ``xxhash64(line)`` so line text never
    crosses the counting shuffle; ``False`` keys on the line string
    itself — semantically identical modulo 64-bit collisions, used by
    the oracle-parity entry query.

    ``scope_col`` restricts the frequency count and the drop decision
    to documents sharing that column's value — host-scoped template
    removal: a nav bar repeated across one site is dropped, while a
    phrase that merely recurs on a handful of unrelated sites is kept
    (per-site boilerplate stripping as practiced by readability-style
    extractors; contrast the corpus-wide rule of RefinedWeb §"line-wise
    corrections", which this function keeps as the default). Same
    scale shape — the extra key column rides the existing 8-byte-key
    exchange — and per-host frequencies also shrink the reduce-side
    skew of ultra-common lines.
    """
    scope = [scope_col] if scope_col is not None else []
    lines = split_lines(df, id_col, text_col, carry_cols=scope)
    key = (
        F.xxhash64("line") if hash_lines else F.col("line")
    ).alias("_k")
    keyed = lines.select(id_col, *scope, "pos", "line", key)

    # document frequency per (scope,) line key: project to the key
    # BEFORE the exchange (hash mode ships 8-byte keys, never text)
    freq = keyed.select(*scope, "_k", id_col).groupBy(*scope, "_k").agg(
        F.count_distinct(id_col).alias("_df")
    )
    boiler = freq.where(F.col("_df") >= min_docs).select(
        *scope, "_k", F.lit(True).alias("_drop")
    )

    marked = keyed.join(boiler, [*scope, "_k"], "left")
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("_drop").isNull(), 1).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when(F.col("_drop").isNull(), 0).otherwise(1)
            ).alias("n_dropped"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_drop").isNull(), F.struct("pos", "line")
                    )
                )
            ).alias("_ks"),
        )
        .select(
            id_col,
            F.concat_ws(
                "\n", F.transform("_ks", lambda s: s["line"])
            ).alias("clean_text"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
        )
    )

    # one output row per input doc, including all-boilerplate and
    # empty-text docs
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def _c4_line_keep(line: Column, min_words: int) -> Column:
    """C4's per-line predicate: ends in terminal punctuation
    (``. ! ? "``), has >= min_words whitespace words, and does not
    mention javascript (case-insensitive)."""
    return (
        line.rlike('[.!?"]$')
        & (F.size(F.split(line, r"\s+")) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) as zero-shuffle per-row
    column algebra. Returns one row per document:
    ``(id, clean_text, n_lines_kept, n_sentences, has_lorem_ipsum,
    has_brace, keep_doc)``.

    Line rules (applied to trimmed non-empty lines, order preserved):
    terminal punctuation, >= ``min_words`` words, no "javascript".
    Document rules: drop when the page mentions "lorem ipsum", contains
    ``{``, or the cleaned text has fewer than ``min_sentences``
    sentences (terminal-punctuation count).
    """
    # NULL text ≡ empty text: every stat stays typed (('', 0, 0, false,
    # false, false) — the repo-wide NULL-text contract) instead of an
    # all-NULL row whose keep_doc=NULL vanishes from BOTH filter branches
    text = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.filter(
        F.transform(
            F.split(text, "\n"), lambda x: F.trim(x)
        ),
        lambda x: x != F.lit(""),
    )
    kept = F.filter(trimmed, lambda ln: _c4_line_keep(ln, min_words))
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    lorem = F.lower(text).contains("lorem ipsum")
    brace = text.contains("{")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        (
            ~lorem & ~brace & (n_sent >= min_sentences)
        ).alias("keep_doc"),
    )
