"""Line-level curation operators: repeated-line removal + C4 rules +
bigram cross-entropy (operators/lines.py, operators/quality.py)."""

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.lines import c4_clean, drop_repeated_lines
from crawler_spark.operators.quality import bigram_cross_entropy

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha unique opener\nshared footer line\nmiddle body one"),
        (2, "beta distinct opener\nshared footer line\nmiddle body two"),
        (3, "gamma opener here\n  shared footer line  \nmiddle body three"),
        (4, "shared footer line"),  # all-boilerplate doc
        (5, ""),  # empty doc
        (6, "delta opener\n\n\nlonely line kept"),  # blank lines dropped
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repeated_lines_dropped_and_order_preserved(spark, docs):
    out = {
        r["doc_id"]: r
        for r in drop_repeated_lines(docs, min_docs=3).collect()
    }
    assert len(out) == 6  # one row per input doc, always
    # the footer appears (trimmed) in 4 distinct docs -> dropped
    assert out[1]["clean_text"] == "alpha unique opener\nmiddle body one"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    # whitespace-padded variant trims to the same line -> also dropped
    assert out[3]["clean_text"] == "gamma opener here\nmiddle body three"
    # all-boilerplate doc keeps its row with empty text
    assert out[4]["clean_text"] == "" and out[4]["n_dropped"] == 1
    # empty doc: no lines at all
    assert out[5]["clean_text"] == ""
    assert out[5]["n_kept"] == 0 and out[5]["n_dropped"] == 0
    # blank lines are normalized away, counted in neither bucket
    assert out[6]["clean_text"] == "delta opener\nlonely line kept"
    assert out[6]["n_kept"] == 2 and out[6]["n_dropped"] == 0


def test_repeated_lines_hash_and_string_paths_agree(spark, docs):
    a = drop_repeated_lines(docs, min_docs=2, hash_lines=True)
    b = drop_repeated_lines(docs, min_docs=2, hash_lines=False)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_repeated_lines_freq_shuffle_ships_hashes_not_text(spark):
    """The line-frequency aggregation must exchange 8-byte hash keys:
    no exchange in the production plan is PARTITIONED by the line text
    (the rebuild groupBy moves text keyed by doc_id — inherent)."""
    from crawler_spark.plans.inspect import (
        exchange_partition_keys,
        has_cartesian,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    df = drop_repeated_lines(d, min_docs=5)
    assert not has_cartesian(df)
    keys = exchange_partition_keys(df)
    assert keys, "expected exchanges in the line-dedup plan"
    for cols in keys:
        assert "line" not in cols, cols


def test_c4_rules(spark):
    rows = [
        # kept: terminal punct + >=5 words; 3 sentences -> keep_doc
        (1, "one fine sentence sits right here.\n"
            "does this line also survive the filter?\n"
            "a third full sentence closes the page!"),
        # line-level drops: no terminal punct / <5 words / javascript
        (2, "this line has no terminal punctuation\n"
            "short line.\n"
            "please enable JavaScript to continue browsing now.\n"
            "only this very sentence remains standing here."),
        # doc-level drops
        (3, "lorem ipsum dolor sit amet padding text here.\n"
            "perfectly good sentence number two stands here.\n"
            "perfectly good sentence number three stands here."),
        (4, "a fine sentence but the page has { braces }.\n"
            "second sentence on the braced page stands.\n"
            "third sentence on the braced page stands."),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_clean(d).collect()}
    assert out[1]["n_lines_kept"] == 3
    assert out[1]["n_sentences"] == 3 and out[1]["keep_doc"]
    assert out[2]["clean_text"] == (
        "only this very sentence remains standing here."
    )
    assert out[2]["n_lines_kept"] == 1
    assert not out[2]["keep_doc"]  # 1 sentence < 3
    assert out[3]["has_lorem_ipsum"] and not out[3]["keep_doc"]
    assert out[4]["has_brace"] and not out[4]["keep_doc"]


def test_c4_clean_zero_shuffle(spark):
    from crawler_spark.plans.inspect import exchange_count

    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert exchange_count(c4_clean(d)) == 0


def test_bigram_xent_hand_computed(spark):
    # corpus: "a b a b" (doc 1), "a b" (doc 2), "solo" (doc 3)
    # bigrams: (a b) x3, (b a) x1; ctx: a->3, b->1
    # vocab V = 3 ({a, b, solo} - bigram-less docs still count)
    # P(b|a) = (3+.5)/(3+1.5) = 7/9 ; P(a|b) = (1+.5)/(1+1.5) = 0.6
    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in bigram_cross_entropy(d, alpha=0.5).collect()
    }
    # doc 3 has no bigrams -> no row
    assert set(out) == {1, 2}
    exp1 = -(2 * math.log(7 / 9) + math.log(0.6)) / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["bigram_xent"] - exp1) < 1e-9
    assert abs(out[2]["bigram_xent"] - (-math.log(7 / 9))) < 1e-9


def test_bigram_xent_hash_and_string_paths_agree(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(50)
        .select("doc_id", "text")
    )
    a = bigram_cross_entropy(d, hash_grams=True).collect()
    b = bigram_cross_entropy(d, hash_grams=False).collect()
    ka = {r["doc_id"]: (round(r["bigram_xent"], 9), r["n_bigrams"]) for r in a}
    kb = {r["doc_id"]: (round(r["bigram_xent"], 9), r["n_bigrams"]) for r in b}
    assert ka == kb


def test_host_scoped_boilerplate(spark):
    # "site nav" repeats on every page of its host -> dropped under
    # scope; "cross-host disclaimer" appears once on each of 3 hosts ->
    # KEPT under host scoping, dropped corpus-wide. That asymmetry is
    # the whole point of the scope_col parameter.
    rows = [
        (1, "a", "site nav a\nbody one\ncross-host disclaimer"),
        (2, "a", "site nav a\nbody two"),
        (3, "a", "site nav a\nbody three"),
        (4, "b", "body four\ncross-host disclaimer"),
        (5, "c", "cross-host disclaimer\nbody five"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    scoped = {
        r["doc_id"]: r
        for r in drop_repeated_lines(
            docs, min_docs=3, scope_col="host"
        ).collect()
    }
    assert scoped[1]["clean_text"] == "body one\ncross-host disclaimer"
    assert scoped[2]["clean_text"] == "body two"
    assert scoped[2]["n_dropped"] == 1
    assert scoped[4]["clean_text"] == "body four\ncross-host disclaimer"
    assert scoped[5]["n_dropped"] == 0

    unscoped = {
        r["doc_id"]: r
        for r in drop_repeated_lines(docs, min_docs=3).collect()
    }
    # corpus-wide, the disclaimer reaches df=3 and is dropped too
    assert unscoped[1]["clean_text"] == "body one"
    assert unscoped[5]["clean_text"] == "body five"


def test_host_scoped_hash_and_string_paths_agree(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(60)
        .select(
            "doc_id",
            F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")).alias(
                "host"
            ),
            F.concat_ws(
                "\n",
                F.substring("text", 1, 40),
                F.concat(
                    F.lit("nav of host "),
                    (F.col("doc_id") % 3).cast("string"),
                ),
            ).alias("text"),
        )
    )
    a = drop_repeated_lines(
        d, min_docs=4, scope_col="host", hash_lines=True
    ).collect()
    b = drop_repeated_lines(
        d, min_docs=4, scope_col="host", hash_lines=False
    ).collect()
    ka = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"]) for r in a}
    kb = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"]) for r in b}
    assert ka == kb
    assert all(v[2] >= 1 for v in ka.values())  # every page lost its nav
