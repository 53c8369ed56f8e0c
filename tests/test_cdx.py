"""SURT key + CDX index layout tests."""

import pytest
from pyspark.sql import functions as F


CASES = [
    ("HTTP://WWW.Example.COM/Path", "com,example)/path"),
    ("https://sub.Example.com:8443/a/b?b=2&a=1#frag",
     "com,example,sub:8443)/a/b?a=1&b=2"),
    ("http://user@example.com:80/", "com,example)/"),
    ("http://example.com", "com,example)/"),
    ("http://example.com?x=1", "com,example)/?x=1"),
    ("http://www.example.com:443/q?single", "com,example)/q?single"),
    ("http://a.b.c.d.test/x/y/z", "test,d,c,b,a)/x/y/z"),
]


def test_surt_key_cases(spark):
    from crawler_spark.sources.cdx import surt_key

    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.k for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [want for _, want in CASES]


def test_cdx_index_sorted_and_digested(spark):
    """Index rows are globally sorted by (surt, cdx_ts) across shard
    files and carry an md5 payload digest."""
    import hashlib

    from crawler_spark.sources.cdx import cdx_index

    rows = [
        ("http://b.test/2", "2024-01-01 00:00:02", "beta"),
        ("http://a.test/1", "2024-01-01 00:00:01", "alpha"),
        ("http://a.test/1", "2024-01-01 00:00:03", "alpha-v2"),
        ("http://www.a.test/0", "2024-01-01 00:00:00", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("ts"))
    idx = cdx_index(df, num_shards=2)
    # global order = concatenation of shard-local sorted runs
    parts = idx.rdd.glom().collect()
    flat = [(r["surt"], r["cdx_ts"]) for p in parts for r in p]
    assert flat == sorted(flat)
    got = {(r["surt"], r["cdx_ts"]): r for r in idx.collect()}
    k = ("test,a)/1", "20240101000001")
    assert got[k]["digest"] == hashlib.md5(b"alpha").hexdigest()
    assert got[k]["length"] == 5
    # null payload hashes as empty
    k0 = ("test,a)/0", "20240101000000")
    assert got[k0]["digest"] == hashlib.md5(b"").hexdigest()
    assert got[k0]["length"] == 0
    # both a.test captures of the same path are adjacent under the key
    surts = [s for s, _ in flat]
    assert surts.count("test,a)/1") == 2
