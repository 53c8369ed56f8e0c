"""Ranked retrieval over the split-terms inverted index (TF-IDF top-k).

The reference builds per-term index collections (``index.ts`` /
``splitTerms``: one document list per term) but ships no query side —
lookups happen ad hoc in Mongo. This module supplies the query
operator a term index exists FOR: given a bag of query terms, rank
documents by summed TF-IDF and return the top-k, the textbook
disjunctive (OR) ranked retrieval.

Spark-first design: the query is a handful of terms — a *broadcast*
semi-join against the posting lists, never a shuffle of the corpus.
Per-document length and per-term document frequency are corpus-level
aggregates a real deployment precomputes once (they are exactly the
``split_terms`` output this module consumes); scoring then touches only
the posting rows of the query terms. The final top-k is a single
ordered ``limit`` — Spark executes that as a TakeOrdered over partial
per-partition heaps, no global sort materialization.

Tokenization is the repo-wide word definition
(:func:`crawler_spark.functions.textcols.word_tokens`: lower-cased,
split on any whitespace run, empties dropped) — identical to python's
``text.lower().split()``. On text that already went through the
reference-parity ``cleanText`` (lower-cased, whitespace collapsed)
this is the same bag of words as a single-space split; on raw text it
stays correct where a literal-space split would emit phantom empty
tokens, glue words across newlines, and match case-sensitively.
NULL-text documents simply contribute no postings.

Scoring (kept to expressions any engine reproduces bit-for-bit):
``tf = n_term_in_doc / n_tokens_in_doc``,
``idf = ln((N + 1) / (df + 1)) + 1``  (smoothed, sklearn-style),
``score = Σ_terms tf·idf``, ties broken by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textcols import word_tokens


def _query_postings(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared posting-list pipeline of both retrieval scorers: the
    per-(doc, query-term) tf table ``(doc_id, term, n, dl)`` and the
    per-term document-frequency table ``(term, df)``.

    One broadcast semi-join shrinks the exploded corpus to query-term
    rows before the only shuffle (the tf groupBy); doc length rides
    each posting row so no corpus-wide length join is needed.
    """
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string"
    )
    words = word_tokens(F.col(text_col))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        F.explode(words).alias("term"),
    )
    hits = toks.join(F.broadcast(q), "term")
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").alias("n"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return tf, df_


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a disjunctive term query, by TF-IDF sum.

    Returns ``(doc_id, n_hits, score)`` — ``n_hits`` = how many
    distinct query terms matched, ``score`` rounded to 6 dp for
    cross-engine compare.
    """
    n_docs = docs.count()  # one scalar; a deployment caches it with the index
    tf, df_ = _query_postings(docs, query_terms, id_col, text_col)
    return (
        tf.join(F.broadcast(df_), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.round(
                F.sum(
                    (F.col("n") / F.col("dl"))
                    * (
                        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                        + 1.0
                    )
                ),
                6,
            ).cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 (Robertson et al., TREC-3) —
    the saturation/length-normalized upgrade of :func:`tfidf_topk`.

    Same Spark shape (shared :func:`_query_postings` pipeline): one
    grouped tf pass over broadcast-shrunk postings, a broadcast df
    table, one TakeOrdered top-k. The corpus-level scalars — N and the
    average document length — are the numbers a deployment caches with
    its index; here they cost one 2-scalar aggregate job.

    Scoring, kept bit-reproducible cross-engine (every literal cast to
    double, same operation order as the DuckDB oracle)::

        idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )     # BM25+-style floor
        tfn(t,d)= n·(k1+1) / (n + k1·(1 - b + b·dl/avgdl))
        score   = Σ_terms idf·tfn     (rounded to 6 dp; ties → doc_id)

    Returns ``(doc_id, n_hits, score)`` like :func:`tfidf_topk`.
    """
    words = word_tokens(F.col(text_col))
    n_docs, avgdl = docs.select(
        F.count("*"), F.avg(F.size(words)).cast("double")
    ).first()
    if avgdl is None:  # empty corpus OR every text NULL: avg() is NULL —
        avgdl = 1.0  # postings are empty either way; avoid float(None)
    tf, df_ = _query_postings(docs, query_terms, id_col, text_col)
    n = F.col("n").cast("double")
    dl = F.col("dl").cast("double")
    dfc = F.col("df").cast("double")
    idf = F.log(
        (F.lit(float(n_docs)) - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (n * F.lit(k1 + 1.0)) / (
        n + F.lit(float(k1)) * (
            F.lit(1.0 - b) + F.lit(float(b)) * dl / F.lit(float(avgdl))
        )
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.round(F.sum(idf * tfn), 6).cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
