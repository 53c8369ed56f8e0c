"""Anchor-text extraction + per-target top-k aggregation.

Kernel: extract_anchors_from must keep/number links IDENTICALLY to
extract_links_from (they join 1:1 on link_pos) while adding cheerio
``.text()``-style anchor text. Operator: anchor_topk vs a brute-force
python oracle, including the one-vote-per-source spam contract.
"""

from crawler_spark.functions.html import (
    extract_anchors_from,
    extract_links_from,
)

HTML = b"""
<html><body>
  <p>intro</p>
  <a href="/a">  First   <b>Link</b> </a>
  <a href="HTTPS://Ex.com:443/b#frag">second link</a>
  <a>no href</a>
  <a href="mailto:x@y.z">mail</a>
  <a href="/img"><img src="i.png" alt="pic"></a>
  <div><a href="/c">nested <span>anchor text</span></a></div>
</body></html>
""".decode()

BASE = "https://ex.com/page"


def test_extract_anchors_matches_links_positionally():
    links = extract_links_from(HTML, BASE)
    anchors = extract_anchors_from(HTML, BASE)
    assert len(links) == len(anchors)
    for (u1, h1, p1), (u2, h2, _text, p2) in zip(links, anchors):
        assert (u1, h1, p1) == (u2, h2, p2)


def test_extract_anchors_text_cleaning():
    anchors = extract_anchors_from(HTML, BASE)
    by_url = {a[0]: a for a in anchors}
    # whitespace collapsed across the nested <b>
    assert by_url["https://ex.com/a"][2] == "First Link"
    # default port stripped + fragment dropped by canonicalization
    assert by_url["https://ex.com/b"][2] == "second link"
    # image-only anchor -> empty text, still a kept link
    assert by_url["https://ex.com/img"][2] == ""
    assert by_url["https://ex.com/c"][2] == "nested anchor text"


def test_extract_anchors_broken_html():
    assert extract_anchors_from("<a href=", BASE) == []
    assert extract_anchors_from("", BASE) == []


def _py_topk(rows, k, per_src_once):
    from collections import Counter

    import re

    def norm(a):
        return re.sub(r"\s+", " ", a).strip().lower()

    votes = Counter()
    if per_src_once:
        for key in {(d, norm(a), s) for s, d, a in rows if norm(a)}:
            votes[(key[0], key[1])] += 1
    else:
        for s, d, a in rows:
            if norm(a):
                votes[(d, norm(a))] += 1
    out = {}
    by_dst = {}
    for (d, a), v in votes.items():
        by_dst.setdefault(d, []).append((a, v))
    for d, pairs in by_dst.items():
        ranked = sorted(pairs, key=lambda p: (-p[1], p[0]))[:k]
        out[d] = [(a, v, i + 1) for i, (a, v) in enumerate(ranked)]
    return out


EDGES = [
    # (src, dst, anchor) — h1 spams "best page" 3x at t1: one vote
    ("h1", "t1", "best page"),
    ("h1", "t1", "Best   PAGE"),
    ("h1", "t1", "best page"),
    ("h2", "t1", "best page"),
    ("h2", "t1", "home"),
    ("h3", "t1", "home"),
    ("h4", "t1", "home"),
    ("h5", "t1", "archive"),
    ("h1", "t2", "  "),  # empty after normalize: dropped
    ("h1", "t2", "only anchor"),
]


def test_anchor_topk_distinct_source_votes(spark):
    from crawler_spark.operators.anchors import anchor_topk

    df = spark.createDataFrame(EDGES, "src: string, dst: string, anchor: string")
    got = {}
    for r in anchor_topk(df, k=2).collect():
        got.setdefault(r["dst"], []).append(
            (r["anchor"], r["votes"], r["rank"])
        )
    for d in got:
        got[d].sort(key=lambda t: t[2])
    want = _py_topk([(s, d, a) for s, d, a in EDGES], 2, True)
    assert got == want
    # spam contract explicitly: "home" (3 sources) outranks
    # "best page" (2 sources despite 4 raw rows)
    assert got["t1"][0] == ("home", 3, 1)
    assert got["t1"][1] == ("best page", 2, 2)


def test_anchor_topk_raw_counts_without_src(spark):
    from crawler_spark.operators.anchors import anchor_topk

    df = spark.createDataFrame(EDGES, "src: string, dst: string, anchor: string")
    got = {}
    for r in anchor_topk(df, src=None, k=1).collect():
        got.setdefault(r["dst"], []).append(
            (r["anchor"], r["votes"], r["rank"])
        )
    want = _py_topk([(s, d, a) for s, d, a in EDGES], 1, False)
    assert got == want
    # without the distinct, the spammed anchor wins on raw count
    assert got["t1"][0] == ("best page", 4, 1)
