"""Text-analytics tier — the reference's `learn` phases as DataFrame jobs.

Re-expresses (reference cites per function):

- ``collectText`` (``learn.ts:140-222``): html → text blocks → sentiment →
  summary;
- ``addTermFrequencies`` (``learn.ts:322-385``): blocks → trigram TF
  (``calcNgrams``, ``text.ts:266-292``) → ``terms(url, term, score)``;
- ``addPageTags`` (``learn.ts:387-426``): terms → top-3 tags
  (``extractTags``, ``text.ts:300-314``);
- ``addSites`` (``learn.ts:538-554``): distinct non-empty hosts;
- ``linkCount`` (``reconfigure.ts:55-62``): per-page link count.

Spark-first shapes: tokenization/trigrams run once per block in an
Arrow-batched pandas UDF, then everything downstream is relational —
``explode → groupBy → window`` — so Catalyst handles partial aggregation
and the shuffles are on the natural keys (url, term). Per-page kernels
whose reference semantics are inherently whole-page (summary) run as
``applyInPandas`` grouped by url.

Tie-breaking parity: the reference's tag sort is a stable JS sort over
object-insertion order = first occurrence of each trigram in the page
token stream; we carry ``first_pos`` (min position of the gram) through
the aggregation and use it as the deterministic tiebreak.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.html import extract_text_udf
from crawler_spark.functions.textops import (
    calc_summary,
    sentiment_score,
    tokenize,
    trigrams,
)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([tokenize(t) for t in texts])


@F.pandas_udf(T.ArrayType(T.StringType()))
def trigrams_udf(tokens: pd.Series) -> pd.Series:
    return pd.Series([trigrams(list(t) if t is not None else []) for t in tokens])


@F.pandas_udf(T.DoubleType())
def sentiment_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([sentiment_score(tokenize(t)) for t in texts])


def page_blocks(pages_html: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """html → exploded ordered text blocks: (url, block_idx, text).

    Spark shape of ``extractText`` (``text.ts:46-81``) + the exploded
    ``text`` collection (``learn.ts:185-191``, SURVEY §1.1).
    """
    return pages_html.select(
        F.col(url_col).alias("url"),
        F.posexplode(extract_text_udf(html_col)).alias("block_idx", "text"),
    )


def block_sentiment(blocks: DataFrame) -> DataFrame:
    """Per-block AFINN sentiment (``calcSentiment``, ``text.ts:219-227``)."""
    return blocks.withColumn("sentiment", sentiment_udf("text"))


def sentiment_portable(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """AFINN sentiment with the UNSTEMMED lexicon as pure column algebra.

    The production path (:func:`block_sentiment` / ``sentiment_udf``,
    reference ``text.ts:219-227``) stems both lexicon and tokens with
    Porter — not expressible in the DuckDB oracle offline (its ``stem()``
    lives in the non-vendored fts extension). This twin drops only the
    stemming so the rest of the sentiment pipeline — punctuation strip,
    ``\\W``-split tokenization, stopword removal, lexicon lookup, mean
    over ALL kept tokens — is value-checkable end-to-end in SQL, the same
    dual-path pattern as ``minhash_signatures(portable=True)``.

    Zero shuffle, zero UDF: the lexicon (AFINN-111 + supplement, ~2.5k
    entries — see ``functions.lexicons``) is a per-row map literal and
    the stopword set an ``IN`` list — this scans and never exchanges.
    Literal-map lookup is O(|lexicon|) per token; measured at sf0.01 the
    tokenize/regexp pass dominates and a broadcast-join variant times
    identically, so the zero-exchange shape is kept. The SCALE path for
    sentiment remains the production Arrow UDF (dict lookup is O(1)).
    """
    from crawler_spark.functions.lexicons import AFINN, STOPWORDS
    from crawler_spark.functions.textops import PUNCT_CLASS as punct
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.coalesce(text_col, F.lit("")), punct, "")),
            r"[^a-z0-9_]+",
        ),
        lambda t: (t != F.lit("")) & ~t.isin(sorted(STOPWORDS)),
    )
    # ONE foldable literal instead of 2×|lexicon| expressions: a
    # create_map of ~5k literals costs seconds of Catalyst analysis per
    # query; str_to_map folds to the same MapData constant in one node.
    # \x01/\x02 never occur in AFINN words (verified superset: a-z,
    # apostrophe, hyphen, space).
    _lexstr = "\x01".join(f"{w}\x02{v}" for w, v in sorted(AFINN.items()))
    lex = F.str_to_map(F.lit(_lexstr), F.lit("\x01"), F.lit("\x02"))
    total = F.aggregate(
        F.col("_toks"),
        F.lit(0),
        lambda acc, t: acc
        + F.coalesce(F.element_at(lex, t).cast("int"), F.lit(0)),
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            F.when(F.size("_toks") == 0, F.lit(0.0))
            .otherwise(
                total.cast("double") / F.size("_toks").cast("double")
            )
            .alias("sentiment"),
        )
    )


def page_summaries(
    blocks: DataFrame, all_urls: DataFrame | None = None
) -> DataFrame:
    """Per-url summary (``calcSummary``, ``text.ts:185-208``).

    Whole-page semantics (corpus-relative block weights + stable top-2) →
    grouped-map ``applyInPandas``; per-group data is one page's blocks.

    A page whose extraction produced ZERO blocks has no rows in
    ``blocks`` — the reference still stores the sentinel summary for it
    (``calc_summary([])``). Pass ``all_urls`` (a one-column ``url``
    DataFrame of every page) to emit those sentinel rows too; without it
    only pages with ≥1 block get a summary row.
    """

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        texts = pdf.sort_values("block_idx")["text"].dropna().tolist()
        return pd.DataFrame({"url": [pdf["url"].iloc[0]],
                             "summary": [calc_summary(texts)]})

    src = blocks.select("url", "block_idx", "text")
    if all_urls is not None:
        # left join puts a single null-text row under block-less urls;
        # dropna() in the kernel turns it into calc_summary([])
        src = all_urls.select("url").distinct().join(src, "url", "left")
    return src.groupBy("url").applyInPandas(
        summarize, "url string, summary string"
    )


def _counted_grams(blocks: DataFrame, gram_col_expr) -> DataFrame:
    """(url, term, cnt, first_pos): explode grams with position, count per
    (url, term), keep the first-occurrence position for tie-breaks."""
    grams = blocks.select(
        "url",
        "block_idx",
        F.posexplode(gram_col_expr).alias("pos_in_block", "term"),
    )
    # global first-occurrence order within the page: (block_idx, pos)
    # packed into one long. 2^32 stride: a block would need 4e9 grams to
    # bleed into the next block's range (a 2^20 stride was overflowable
    # by one degenerate ~1M-gram block, silently corrupting the
    # first-occurrence tie-break); block_idx stays < 2^31 by schema.
    grams = grams.withColumn(
        "gpos",
        F.col("block_idx").cast("long") * F.lit(1 << 32)
        + F.col("pos_in_block"),
    )
    return grams.groupBy("url", "term").agg(
        F.count("*").alias("cnt"), F.min("gpos").alias("first_pos")
    )


def page_term_scores(blocks: DataFrame, use_trigrams: bool = True) -> DataFrame:
    """``terms(url, term, score)`` — max-normalized per-page TF.

    ``use_trigrams=True`` is the reference's ``addTermFrequencies`` path
    (``calcNgrams``, ``learn.ts:358``); ``False`` gives flat-token TF
    (``calcTermFrequencies``, ``text.ts:237-258``). The normalization is a
    per-url window max — partial aggregation first, so the shuffle carries
    one row per (url, term), not per token.
    """
    toks = blocks.withColumn("toks", tokenize_udf("text"))
    gram_expr = trigrams_udf("toks") if use_trigrams else F.col("toks")
    counted = _counted_grams(toks, gram_expr)
    w = Window.partitionBy("url")
    return counted.withColumn(
        "score", F.col("cnt") / F.max("cnt").over(w)
    ).select("url", "term", "score", "first_pos")


def page_tags(terms: DataFrame, limit: int = 3) -> DataFrame:
    """Top-``limit`` tags per url (``extractTags``, ``text.ts:300-314``).

    threshold = 2 × mean(score) per url; stable sort desc by score with
    first-occurrence tiebreak; relational: two windows, no UDF.
    """
    w = Window.partitionBy("url")
    w_rank = Window.partitionBy("url").orderBy(
        F.col("score").desc(), F.col("first_pos").asc()
    )
    return (
        terms.withColumn("avg2", F.avg("score").over(w) * 2)
        .where(F.col("score") > F.col("avg2"))
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= limit)
        .select("url", "term", F.col("rn").alias("rank"))
    )


def sites(pages: DataFrame, host_col: str = "host") -> DataFrame:
    """Distinct non-empty hosts (``learn.ts:538-554``)."""
    return (
        pages.select(F.col(host_col).alias("name"))
        .where(F.length("name") > 0)
        .distinct()
    )


def link_counts(links: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-page out-link count (``reconfigure.ts:55-62``)."""
    return links.groupBy(F.col(source_col).alias("url")).agg(
        F.count("*").alias("link_count")
    )
