"""Unicode text normalization — the cleanup pass before any hashing op.

Web text arrives with decomposed accents, stray C0 controls and ragged
whitespace; every downstream *hash-based* operator (exact dedup, minhash
shingles, chunk/span dedup, winnowing) treats "café" and "café" (NFC vs
NFD) as different documents unless the corpus is normalized first. The
reference crawler never needed this (cheerio yields NFC JS strings);
at Common-Crawl scale it is the pipeline's first transformation.

Spec (deliberately small so the DuckDB oracle mirrors it exactly):

  1. NFC canonical composition;
  2. strip C0 controls and DEL except tab/LF/CR
     (``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]``);
  3. collapse horizontal whitespace runs (``[ \\t]+``) to one space;
  4. trim.

Spark-first split: ONLY step 1 needs Python (the JVM exposes no SQL
normalize function) and runs as an Arrow-batched pandas UDF; steps 2-4
are JVM ``regexp_replace``/``trim`` chains that stay in whole-stage
codegen after the UDF's Arrow hop. DuckDB's ``nfc_normalize`` (utf8proc)
and Python's ``unicodedata`` implement the same Unicode algorithm, so
the oracle value-checks the full output bytes.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
HSPACE_RE = r"[ \t]+"


@F.pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


def normalized_text(text_col: str | Column) -> Column:
    """The full 4-step cleanup as one column expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(nfc_udf(c), CONTROL_RE, ""),
            HSPACE_RE,
            " ",
        )
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, clean_text, changed)`` — ``changed`` marks rows the
    cleanup actually touched (cheap corpus-health telemetry)."""
    clean = normalized_text(text_col)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        (clean != F.col(text_col)).alias("changed"),
    )
