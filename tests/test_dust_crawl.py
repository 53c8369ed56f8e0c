"""DUST canonicalization wired into the crawl: mine rules from one
crawl's content, feed them to the next via ``CrawlConfig.dust_rules``,
and the engine stops fetching known URL twins — Spark driver ≡ serial
oracle exactly (same golden contract as tests/test_crawl_golden.py).
"""

import pandas as pd
import pytest
from pyspark.sql import types as T

from crawler_spark.crawl.driver import run_crawl
from crawler_spark.crawl.store import CrawlStore
from crawler_spark.operators.dust import mine_dust_rules_from_pages
from crawler_spark.oracle.crawloracle import CrawlConfig, crawl_oracle

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("retry_after", T.IntegerType()),
    ]
)


def _page(url, html):
    return {
        "url": url,
        "warc_ts": None,
        "html": html.encode(),
        "text": None,
        "lang": "en",
        "content_type": "text/html",
        "status": 200,
        "retry_after": None,
    }


def _twin_html(n, kind):
    # IDENTICAL html for both twins of page n: same extracted text,
    # same onward links (to the NEXT level's twin pair)
    return (
        f"<html><body><p>story number {n} full content</p>"
        f'<a href="http://a.test/{kind}/{n}/index.html">read more</a>'
        f'<a href="http://a.test/{kind}/{n}/index.htm">printer friendly</a>'
        f"</body></html>"
    )


@pytest.fixture(scope="module")
def twin_web():
    root = (
        "<html><body><p>root hub page</p>"
        + "".join(
            f'<a href="http://a.test/p/{n}/index.html">s{n}</a>'
            f'<a href="http://a.test/p/{n}/index.htm">s{n} print</a>'
            for n in (1, 2)
        )
        + '<a href="http://a.test/q/other">other</a></body></html>'
    )
    leaf = "<html><body><p>leaf page {n} body text</p></body></html>"
    rows = [_page("http://a.test/", root)]
    for n in (1, 2):
        for ext in ("index.html", "index.htm"):
            # /p twins link onward to the /n twin pair
            rows.append(
                _page(f"http://a.test/p/{n}/{ext}", _twin_html(n, "n"))
            )
            rows.append(
                _page(
                    f"http://a.test/n/{n}/{ext}", leaf.format(n=n)
                )
            )
    rows.append(
        _page(
            "http://a.test/q/other",
            "<html><body><p>unrelated other page</p></body></html>",
        )
    )
    return pd.DataFrame(rows)


def _spark_corpus(spark, pdf):
    return spark.createDataFrame(pdf, CORPUS_SCHEMA)


CFG = dict(budgets={"*": 100}, max_rounds=10)


@pytest.fixture(scope="module")
def first_crawl_store(spark, twin_web, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dust_first"))
    run_crawl(
        spark,
        _spark_corpus(spark, twin_web),
        ["http://a.test/"],
        CrawlConfig(**CFG),
        root,
        bloom_buckets=4,
        bloom_bits=1 << 14,
    )
    return CrawlStore(spark, root)


def test_first_crawl_fetches_both_twins(first_crawl_store):
    urls = {r["url"] for r in first_crawl_store.read_pages().collect()}
    # without DUST every twin is fetched: 1 root + 2 exts × (2 p + 2 n)
    # + other = 10 pages
    assert len(urls) == 10
    assert "http://a.test/p/1/index.html" in urls
    assert "http://a.test/p/1/index.htm" in urls


def test_mined_rules_from_store(first_crawl_store):
    rules = {
        (r["host"], r["seg_from"], r["seg_to"]): r["support"]
        for r in mine_dust_rules_from_pages(
            first_crawl_store.read_page_text(with_host=True)
        ).collect()
    }
    # 4 content-equal twin pairs, all the same rewrite; canonical twin
    # is the shorter URL (index.htm)
    assert rules == {("a.test", "index.html", "index.htm"): 4}


def test_dust_crawl_golden_and_twins_never_fetched(
    spark, twin_web, first_crawl_store, tmp_path_factory
):
    mined = [
        (r["host"], r["seg_from"], r["seg_to"])
        for r in mine_dust_rules_from_pages(
            first_crawl_store.read_page_text(with_host=True)
        ).collect()
    ]
    cfg = CrawlConfig(dust_rules=mined, **CFG)
    oracle = crawl_oracle(twin_web, ["http://a.test/"], cfg)

    root = str(tmp_path_factory.mktemp("dust_second"))
    run_crawl(
        spark,
        _spark_corpus(spark, twin_web),
        ["http://a.test/"],
        cfg,
        root,
        bloom_buckets=4,
        bloom_bits=1 << 14,
    )
    got = (
        CrawlStore(spark, root)
        .read_pages()
        .toPandas()
        .sort_values(["round", "seq"])
        .reset_index(drop=True)
    )
    want = oracle.crawl_order.sort_values(["round", "seq"]).reset_index(
        drop=True
    )
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )
    # DUST collapses each twin pair onto the canonical .htm: 1 root +
    # (2 p + 2 n) canonicals + other = 6 pages, and no non-root page
    # ends in .html
    urls = set(got.url)
    assert len(urls) == 6
    assert not any(u.endswith("index.html") for u in urls)
    assert "http://a.test/p/1/index.htm" in urls
    assert "http://a.test/n/2/index.htm" in urls


def test_dust_off_is_unchanged(spark, twin_web, tmp_path_factory):
    # empty rule list is the default config: identical to the plain
    # golden path (no rewrite branch in either engine)
    cfg = CrawlConfig(**CFG)
    oracle = crawl_oracle(twin_web, ["http://a.test/"], cfg)
    assert len(oracle.crawl_order) == 10
