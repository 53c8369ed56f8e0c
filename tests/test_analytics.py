"""Analytics tier vs pure-kernel goldens over the mini-web corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.analytics.text_tier import (
    block_sentiment,
    link_counts,
    page_blocks,
    page_summaries,
    page_tags,
    page_term_scores,
    sites,
    tokenize_udf,
)
from crawler_spark.functions.html import extract_text_blocks
from crawler_spark.functions.textops import (
    calc_summary,
    extract_tags,
    ngram_frequencies,
    sentiment_score,
    tokenize,
)


@pytest.fixture(scope="module")
def html_corpus(spark, miniweb):
    pdf = miniweb.pages[miniweb.pages.html.notnull()][["url", "html"]].head(60)
    df = spark.createDataFrame(pdf, "url string, html binary")
    return pdf, df


def _golden_blocks(pdf):
    out = {}
    for r in pdf.itertuples(index=False):
        out[r.url] = extract_text_blocks(r.html.decode("utf-8"))
    return out


def test_page_blocks_match_kernel(spark, html_corpus):
    pdf, df = html_corpus
    got = page_blocks(df).toPandas()
    want = _golden_blocks(pdf)
    for url, grp in got.groupby("url"):
        blocks = grp.sort_values("block_idx")["text"].tolist()
        assert blocks == want[url], url
    assert set(got.url) == {u for u, b in want.items() if b}


def test_sentiment_matches_kernel(spark, html_corpus):
    pdf, df = html_corpus
    got = block_sentiment(page_blocks(df)).toPandas()
    for r in got.itertuples(index=False):
        assert r.sentiment == pytest.approx(
            sentiment_score(tokenize(r.text)), abs=1e-12
        )


def test_summaries_match_kernel(spark, html_corpus):
    pdf, df = html_corpus
    got = dict(
        (r.url, r.summary)
        for r in page_summaries(page_blocks(df)).toPandas().itertuples(index=False)
    )
    want = {u: calc_summary(b) for u, b in _golden_blocks(pdf).items() if b}
    assert got == want


def test_trigram_term_scores_match_kernel(spark, html_corpus):
    pdf, df = html_corpus
    got = page_term_scores(page_blocks(df), use_trigrams=True).toPandas()
    for url, grp in got.groupby("url"):
        scores = dict(zip(grp.term, grp.score))
        blocks = _golden_blocks(pdf)[url]
        want = ngram_frequencies([tokenize(b) for b in blocks])
        assert scores == pytest.approx(want), url


def test_tags_match_kernel(spark, html_corpus):
    pdf, df = html_corpus
    terms = page_term_scores(page_blocks(df), use_trigrams=True)
    got = page_tags(terms).toPandas()
    got_tags = {
        url: grp.sort_values("rank")["term"].tolist()
        for url, grp in got.groupby("url")
    }
    for url, blocks in _golden_blocks(pdf).items():
        if not blocks:
            continue
        want = extract_tags(ngram_frequencies([tokenize(b) for b in blocks]))
        assert got_tags.get(url, []) == want, url


def test_sites_and_link_counts(spark):
    pages = spark.createDataFrame(
        [("u1", "a.test"), ("u2", "a.test"), ("u3", "b.test"), ("u4", "")],
        "url string, host string",
    )
    assert sorted(r.name for r in sites(pages).collect()) == ["a.test", "b.test"]

    links = spark.createDataFrame(
        [("u1", "x"), ("u1", "y"), ("u2", "z")], "source string, url string"
    )
    got = {r.url: r.link_count for r in link_counts(links).collect()}
    assert got == {"u1": 2, "u2": 1}


def test_sentiment_portable_matches_python_and_stays_mapside(spark):
    """Unstemmed-AFINN twin: values equal a pure-Python recomputation of
    the same pipeline (tokenize minus stemming), and the plan contains
    no Exchange — it must stay per-row codegen at any scale."""
    from crawler_spark.analytics.text_tier import sentiment_portable
    from crawler_spark.functions.lexicons import AFINN
    from crawler_spark.functions.textops import tokenize

    rows = [
        (0, "I adore this — a true adventure, no abuse!"),
        (1, "the and of to"),          # stopwords only -> no tokens -> 0.0
        (2, ""),                        # empty -> 0.0
        (3, "abandon ABANDON abandon's accident."),  # case + possessive
        (4, "nothing from the lexicon here whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.sentiment for r in sentiment_portable(df).collect()}
    for doc_id, text in rows:
        toks = tokenize(text)
        want = (
            sum(AFINN.get(t, 0) for t in toks) / len(toks) if toks else 0.0
        )
        assert got[doc_id] == pytest.approx(want, abs=1e-12), (doc_id, text)

    plan = sentiment_portable(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
