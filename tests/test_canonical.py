"""rel=canonical extraction (functions/html.py) + corpus-wide collapse
(operators/redirects.canonical_collapse)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.html import extract_canonical_from
from crawler_spark.operators.redirects import canonical_collapse

B = "http://h.test/a/page"


def test_extract_absolute_and_relative():
    assert (
        extract_canonical_from(
            '<html><head><link rel="canonical" '
            'href="http://h.test/x"></head></html>',
            B,
        )
        == "http://h.test/x"
    )
    # relative href resolves against the page URL, fragment stripped
    assert (
        extract_canonical_from(
            '<head><link rel="canonical" href="../c#frag"></head>', B
        )
        == "http://h.test/c"
    )


def test_rel_matching_is_tokenized_and_case_insensitive():
    assert (
        extract_canonical_from(
            '<link rel="Alternate CANONICAL" href="http://h.test/y">', B
        )
        == "http://h.test/y"
    )
    # 'canonicalish' is not the canonical token
    assert (
        extract_canonical_from(
            '<link rel="canonicalish" href="http://h.test/n">', B
        )
        is None
    )


def test_first_declaration_wins_even_when_malformed():
    # two declarations: the first one lacks href -> treated as
    # undeclared, NOT falling through to the second (conflicting
    # declarations are a spam signal; we never guess)
    html = (
        '<link rel="canonical">'
        '<link rel="canonical" href="http://h.test/second">'
    )
    assert extract_canonical_from(html, B) is None
    html2 = (
        '<link rel="canonical" href="http://h.test/first">'
        '<link rel="canonical" href="http://h.test/second">'
    )
    assert extract_canonical_from(html2, B) == "http://h.test/first"


def test_absent_and_broken_html():
    assert extract_canonical_from("<p>no links here</p>", B) is None
    assert extract_canonical_from("<<<not html", B) is None


def test_collapse_chain_cycle_and_passthrough(spark):
    rows = [
        # chain: a -> b -> c (terminal, undeclared)
        ("http://h.test/a", "http://h.test/b"),
        ("http://h.test/b", "http://h.test/c"),
        ("http://h.test/c", None),
        # self-declaration == undeclared
        ("http://h.test/s", "http://h.test/s"),
        # 2-cycle: flagged, each collapses to itself
        ("http://h.test/x", "http://h.test/y"),
        ("http://h.test/y", "http://h.test/x"),
        # declaration pointing OUTSIDE the page set: target honored
        ("http://h.test/z", "http://other.test/final"),
    ]
    pages = spark.createDataFrame(rows, ["url", "canonical"])
    out = {
        r["url"]: (r["target"], r["canonical_hops"], r["canonical_cycle"])
        for r in canonical_collapse(pages).collect()
    }
    assert out["http://h.test/a"] == ("http://h.test/c", 2, False)
    assert out["http://h.test/b"] == ("http://h.test/c", 1, False)
    assert out["http://h.test/c"] == ("http://h.test/c", 0, False)
    assert out["http://h.test/s"] == ("http://h.test/s", 0, False)
    assert out["http://h.test/x"] == ("http://h.test/x", 0, True)
    assert out["http://h.test/y"] == ("http://h.test/y", 0, True)
    assert out["http://h.test/z"] == ("http://other.test/final", 1, False)


def test_collapse_keeps_extra_columns_and_multiplicity(spark):
    pages = spark.createDataFrame(
        [("http://h.test/a", "http://h.test/b", 7)] * 2
        + [("http://h.test/b", None, 9)],
        ["url", "canonical", "score"],
    )
    rows = canonical_collapse(pages).collect()
    assert len(rows) == 3
    a = [r for r in rows if r["url"] == "http://h.test/a"]
    assert len(a) == 2 and all(
        r["score"] == 7 and r["target"] == "http://h.test/b" for r in a
    )


def test_collapse_plan_no_cartesian(spark):
    from crawler_spark.plans.inspect import has_cartesian

    pages = spark.createDataFrame(
        [("http://h.test/a", "http://h.test/b")], ["url", "canonical"]
    )
    assert not has_cartesian(canonical_collapse(pages))
