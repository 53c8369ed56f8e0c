"""WARC source/sink roundtrip + robustness."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.warc import read_warc, write_warc


@pytest.fixture(scope="module")
def corpus(spark):
    from crawler_spark.fixtures.doccorpus import corpus_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return corpus_from_documents(docs).repartition(4, "url").cache()


def test_warc_roundtrip(spark, corpus, tmp_path):
    out = str(tmp_path / "warc")
    manifest = write_warc(corpus, out).collect()
    assert sum(m.n_records for m in manifest) == corpus.count()
    assert len(manifest) == 4  # one file per partition

    back = read_warc(spark, out + "/*.warc")
    a = {
        (r.url, bytes(r.html), r.content_type, r.status, r.warc_ts)
        for r in corpus.select(
            "url", "html", "content_type", "status", "warc_ts"
        ).collect()
    }
    b = {
        (r.url, bytes(r.html), r.content_type, r.status,
         r.warc_ts.replace(tzinfo=None) if r.warc_ts else None)
        for r in back.collect()
    }
    assert a == b


def test_warc_payload_with_crlfcrlf(spark, tmp_path):
    """Payload containing the record separator must survive byte-exact
    (Content-Length framing, not delimiter scanning)."""
    tricky = b"<html>\r\n\r\nWARC/1.0\r\n\r\n</html>"
    df = spark.createDataFrame(
        [("http://t.test/x", None, tricky, "text/html", 200)],
        "url string, warc_ts timestamp, html binary, content_type string, "
        "status int",
    )
    out = str(tmp_path / "w")
    write_warc(df, out).collect()
    back = read_warc(spark, out + "/*.warc").collect()
    assert len(back) == 1
    assert bytes(back[0].html) == tricky
    assert back[0].status == 200


def test_warc_skips_non_response_records(spark, tmp_path):
    out = str(tmp_path / "m")
    import os

    os.makedirs(out)
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"robo\r\n\r\n"
    )
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a.test/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 52\r\n\r\n"
        b"HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
        b"\r\n\r\n"
    )
    with open(os.path.join(out, "f.warc"), "wb") as f:
        f.write(info + resp)
    rows = read_warc(spark, out + "/*.warc").collect()
    assert len(rows) == 1
    assert rows[0].url == "http://a.test/"
    assert rows[0].status == 404
    assert bytes(rows[0].html) == b"<p>x</p>"


def test_warc_roundtrip_non_ascii_url(spark, tmp_path):
    import pandas as pd

    from crawler_spark.sources.warc import read_warc, write_warc

    rows = pd.DataFrame(
        {
            "url": ["http://例え.test/ぱす?q=值", "http://plain.test/a"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01T00:00:00", "2024-01-02T00:00:00"]
            ),
            "html": [("<p>中文 content</p>").encode(), b"<p>ok x</p>"],
            "content_type": ["text/html; charset=utf-8"] * 2,
            "status": [200, 200],
        }
    )
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, content_type string,"
        " status int",
    )
    out = str(tmp_path / "warc")
    manifest = write_warc(df.coalesce(1), out).collect()
    assert sum(r.n_records for r in manifest) == 2
    back = read_warc(spark, out + "/*.warc").toPandas()
    assert set(back.url) == set(rows.url)
    got = back.set_index("url").loc["http://例え.test/ぱす?q=值"]
    assert bytes(got.html).decode() == "<p>中文 content</p>"
