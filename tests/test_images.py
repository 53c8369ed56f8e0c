"""Images tier: extraction golden parity, combine/count, classify plumbing."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.analytics.images import (
    combine_images,
    image_counts,
    page_images,
)
from crawler_spark.functions.html import extract_images_from

HTML = b"""<!doctype html><html><head><title>t</title></head><body>
<img src="/a.png" alt="first">
<div><img src="b.jpg"></div>
<div><span><img src="HTTP://CDN.test:80/c.gif?z=1&a=2" alt="deep"></span></div>
<img alt="no src at all">
<img src="">
<p>some text <img src="/in/p.png" alt="inline"> more</p>
</body></html>"""


def test_extract_images_serial_semantics():
    got = extract_images_from(HTML.decode(), "http://host1.test/page/0")
    # (img_url, alt, depth, img_pos); depth = number of ancestor ELEMENTS
    assert got == [
        ("http://host1.test/a.png", "first", 2, 0),
        ("http://host1.test/page/b.jpg", "", 3, 1),  # relative vs /page/0
        # WHATWG canonicalization: lowercased host, :80 stripped, query
        # params sorted (engine's deliberate superset, SURVEY U1)
        ("http://cdn.test/c.gif?a=2&z=1", "deep", 4, 2),
        ("http://host1.test/in/p.png", "inline", 3, 3),
    ]


def test_page_images_matches_serial(spark):
    from crawler_spark.fixtures.webgen import generate

    w = generate(seed=13, n_pages=60)
    pdf = w.pages[w.pages.html.notnull()][["url", "html"]]
    df = spark.createDataFrame(pdf, "url string, html binary")
    got = {
        (r.page_url, r.img_url, r.alt, r.depth, r.img_pos)
        for r in page_images(df).collect()
    }
    want = {
        (url, *img)
        for url, html in zip(pdf.url, pdf.html)
        for img in extract_images_from(bytes(html).decode(), url)
    }
    assert got == want
    assert len(want) > 0


def test_combine_and_count(spark):
    rows = [
        ("p1", "http://i/2.png"),
        ("p1", "http://i/1.png"),
        ("p2", "http://i/3.png"),
    ]
    df = spark.createDataFrame(rows, "page_url string, img_url string")
    combined = {r.page_url: (r.n_images, r.imgs)
                for r in combine_images(df).collect()}
    assert combined == {
        "p1": (2, "http://i/1.png|http://i/2.png"),
        "p2": (1, "http://i/3.png"),
    }
    counts = {r.page_url: r.n_images for r in image_counts(df).collect()}
    assert counts == {"p1": 2, "p2": 1}


def test_classify_features_deterministic_topk(spark):
    import numpy as np

    from crawler_spark.operators.classify import (
        classify_features,
        label_prototypes,
    )
    from crawler_spark.operators.multimodal import decode_features, stub_decoder

    media = spark.createDataFrame(
        [(i, bytes([i]) * 32) for i in range(10)],
        "media_id long, payload binary",
    )
    feats = decode_features(media, decoder=stub_decoder, dim=16)
    labels = ["cat", "dog", "car", "tree"]
    out = classify_features(feats, labels, k=3).toPandas()
    assert len(out) == 30
    assert set(out["rank"]) == {1, 2, 3}
    # per-item scores strictly ordered by rank
    for _, grp in out.groupby("media_id"):
        s = grp.sort_values("rank").score.tolist()
        assert s == sorted(s, reverse=True)
    # deterministic vs a driver-side replay of the same stub pipeline
    protos = label_prototypes(labels, 16)
    f0 = stub_decoder(bytes([0]) * 32, 16)
    scores = f0 @ protos.T
    best = labels[int(np.argmax(scores))]
    top1 = out[(out.media_id == 0) & (out["rank"] == 1)].category.iloc[0]
    assert top1 == best


def test_categorize_text_overlap_scores(spark):
    from crawler_spark.operators.classify import categorize_text

    df = spark.createDataFrame(
        [
            (1, "join hash join merge scan"),
            (2, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = categorize_text(
        df, ["join hash merge", "scan filter table"], k=5
    ).toPandas()
    got = {
        (r.doc_id, r.category): (r.score, r.rank)
        for r in out.itertuples(index=False)
    }
    # doc 1: 4/5 tokens in label 1, 1/5 in label 2
    assert got[(1, "join hash merge")] == (pytest.approx(0.8), 1)
    assert got[(1, "scan filter table")] == (pytest.approx(0.2), 2)
    assert not [k for k in got if k[0] == 2]  # zero scores filtered


def test_categorize_text_injectable_scorer(spark):
    import pandas as pd

    from crawler_spark.operators.classify import categorize_text

    def scorer(texts, labels):
        rows = []
        for i, t in enumerate(texts):
            for lab in labels:
                rows.append((i, lab, float(len(t or "")) / (1 + len(lab))))
        return pd.DataFrame(rows, columns=["_row", "category", "score"])

    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "xy")], "doc_id long, text string"
    )
    out = categorize_text(df, ["aa", "bbbb"], k=1, scorer=scorer).toPandas()
    # shorter label → higher score → rank 1 for both docs
    assert set(out.category) == {"aa"}
    assert sorted(out.doc_id) == [1, 2]
