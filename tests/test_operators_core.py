"""Tests for the scheduler primitives: top-k per group, global seq, bloom."""

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.operators.seen import BloomSeenSet
from crawler_spark.operators.topk import topk_per_group, with_global_seq


def test_topk_per_group_matches_exact(spark):
    pdf = pd.DataFrame(
        {
            "host": [f"h{i % 5}" for i in range(200)],
            "pri": [((i * 37) % 200) for i in range(200)],
            "url": [f"u{i}" for i in range(200)],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        topk_per_group(df, ["host"], ["pri"], 3, salt=4)
        .orderBy("host", "pri")
        .toPandas()
    )
    want = (
        pdf.sort_values(["host", "pri"]).groupby("host").head(3).reset_index(drop=True)
    )
    assert got[["host", "pri", "url"]].reset_index(drop=True).equals(want)
    assert (got.groupby("host").size() == 3).all()
    assert list(got.groupby("host")["_rank"].apply(list)) == [[1, 2, 3]] * 5


def test_topk_per_group_variable_k(spark):
    pdf = pd.DataFrame(
        {"host": ["a"] * 10 + ["b"] * 10, "pri": list(range(10)) * 2}
    )
    df = spark.createDataFrame(pdf).withColumn(
        "k", F.when(F.col("host") == "a", 2).otherwise(5)
    )
    got = topk_per_group(df, ["host"], ["pri"], F.col("k"), salt=2).toPandas()
    sizes = got.groupby("host").size().to_dict()
    assert sizes == {"a": 2, "b": 5}


def test_with_global_seq_dense_and_ordered(spark):
    pdf = pd.DataFrame(
        {"a": [(i * 13) % 97 for i in range(97)], "b": list(range(97))}
    )
    df = spark.createDataFrame(pdf).repartition(7)
    got = with_global_seq(df, ["a"], out="seq", num_partitions=5).toPandas()
    got = got.sort_values("a").reset_index(drop=True)
    assert got["seq"].tolist() == list(range(97))
    # start offset
    got2 = with_global_seq(df, ["a"], out="seq", start=100).toPandas()
    assert sorted(got2["seq"]) == list(range(100, 197))


def test_bloom_no_false_negatives_and_fp_bound(spark):
    seen_urls = [f"http://h{i % 17}.test/p/{i}" for i in range(5000)]
    probe_seen = seen_urls[::5]
    probe_new = [f"http://new{i % 13}.test/q/{i}" for i in range(5000)]

    seen_df = spark.createDataFrame([(u,) for u in seen_urls], "url string")
    bloom = BloomSeenSet.build(seen_df, n_buckets=16, m_bits=1 << 17)

    probed = bloom.probe(
        spark.createDataFrame(
            [(u,) for u in probe_seen + probe_new], "url string"
        )
    ).toPandas()
    by_url = dict(zip(probed.url, probed.maybe_seen))
    # zero false negatives
    assert all(by_url[u] for u in probe_seen)
    # FP rate bounded (m/n ≈ 26 bits/item here → well under 1%)
    fp = sum(by_url[u] for u in probe_new) / len(probe_new)
    assert fp < 0.02, fp


def test_bloom_incremental_add_and_filter_unseen(spark):
    batch1 = [(f"http://a.test/{i}",) for i in range(1000)]
    batch2 = [(f"http://b.test/{i}",) for i in range(1000)]
    df1 = spark.createDataFrame(batch1, "url string")
    df2 = spark.createDataFrame(batch2, "url string")

    bloom = BloomSeenSet.build(df1, n_buckets=8, m_bits=1 << 16)
    bloom = bloom.add(df2)

    seen = df1.unionByName(df2)
    cands = spark.createDataFrame(
        batch1[:50] + [(f"http://c.test/{i}",) for i in range(50)], "url string"
    )
    out = bloom.filter_unseen(cands, seen).toPandas()
    assert sorted(out.url) == sorted(f"http://c.test/{i}" for i in range(50))


def test_bloom_checkpoint_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url string")
    bloom = BloomSeenSet.build(df, n_buckets=4, m_bits=1 << 14)
    p = str(tmp_path / "bloom")
    bloom.checkpoint(p)
    loaded = BloomSeenSet.load(spark, p, n_buckets=4, m_bits=1 << 14)
    probed = loaded.probe(df).toPandas()
    assert probed.maybe_seen.all()
