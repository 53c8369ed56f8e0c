"""Derive a crawlable mini-web corpus from the driver's ``documents`` table.

Used by ``__spark_entry__.entry`` and ``bench.py``: turns each document row
into an HTML page whose links form a deterministic graph over doc_ids, so
the crawl pipeline can run end-to-end at any testdata scale without
external data. Pure function of the input rows (no RNG at all).

Page layout exercises the extraction selector cases; link graph gives each
page 4 out-links (ring + strides) across ``n_hosts`` hosts, with one hot
host owning all doc_id % 4 == 0 pages (~25% — skew for the salted budget
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HOSTS = 8
HOT = "hot.docs.test"


def _host_expr(doc_id):
    return F.when(doc_id % 4 == 0, F.lit(HOT)).otherwise(
        F.concat(F.lit("d"), (doc_id % N_HOSTS).cast("string"), F.lit(".docs.test"))
    )


def _url_expr(doc_id):
    return F.concat(F.lit("http://"), _host_expr(doc_id), F.lit("/doc/"),
                    doc_id.cast("string"))


def corpus_from_documents(docs: DataFrame, n_docs: int | None = None) -> DataFrame:
    """documents(doc_id, text, lang, …) → corpus(url, warc_ts, html, text,
    lang, content_type, status, retry_after).

    ``html`` embeds the doc text as a ``<p>`` block plus header/footer
    boilerplate (removed by extraction) and 4 ``<a>`` links to other docs.
    The corpus ``text`` golden column is NOT precomputed here (the crawl
    writes its own extraction output); it carries the raw document text.
    """
    if n_docs is None:
        n_docs = docs.selectExpr("max(doc_id)").collect()[0][0] + 1
    d = F.col("doc_id")
    targets = [
        (d + 1) % n_docs,
        (d * 2 + 1) % n_docs,
        (d * 3 + 7) % n_docs,
        (d + n_docs // 2) % n_docs,
    ]
    anchors = F.concat(
        *[
            F.concat(F.lit('<a href="'), _url_expr(t), F.lit('">l</a>\n'))
            for t in targets
        ]
    )
    html = F.concat(
        F.lit("<html><head><title>d</title></head><body>"
              "<header>site chrome</header><h1>doc "),
        d.cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>"),
        anchors,
        F.lit("</div><footer>footer chrome</footer></body></html>"),
    )
    return docs.select(
        _url_expr(d).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + d * 137).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        F.lit(200).alias("status"),
        F.lit(None).cast("int").alias("retry_after"),
    )


def seed_urls(n: int = 1) -> list[str]:
    return [f"http://{HOT}/doc/{4 * i}" for i in range(n)]
