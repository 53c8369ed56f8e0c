"""Cuckoo-filter seen set: membership, deletion, persistence, capacity."""

import pytest

from crawler_spark.operators.cuckoo import CuckooSeenSet


def _urls(spark, lo, hi, prefix="http://h"):
    return spark.range(lo, hi).selectExpr(
        f"concat('{prefix}', id % 7, '.test/p/', id) AS url"
    )


def test_no_false_negatives_and_low_fp(spark):
    added = _urls(spark, 0, 2000)
    cf = CuckooSeenSet.empty(spark, n_buckets=8, m_entries=1 << 12)
    cf = cf.add(added)
    probed = cf.probe(added).toPandas()
    assert probed.maybe_seen.all()  # zero false negatives
    fresh = _urls(spark, 50_000, 52_000)
    fp = cf.probe(fresh).toPandas().maybe_seen.mean()
    assert fp < 0.05, fp


def test_delete_restores_unseen(spark):
    keep = _urls(spark, 0, 500)
    drop = _urls(spark, 500, 1000)
    cf = CuckooSeenSet.empty(spark, n_buckets=8, m_entries=1 << 12)
    cf = cf.add(keep).add(drop).delete(drop)
    assert cf.probe(keep).toPandas().maybe_seen.all()
    # deleted keys unseen again (up to fingerprint collisions — none at
    # this density in a 16-bit-fp table)
    assert not cf.probe(drop).toPandas().maybe_seen.any()
    assert cf.tables.agg({"n_items": "sum"}).collect()[0][0] == 500


def test_checkpoint_roundtrip(spark, tmp_path):
    added = _urls(spark, 0, 300)
    cf = CuckooSeenSet.empty(spark, n_buckets=4, m_entries=1 << 10)
    cf = cf.add(added)
    path = str(tmp_path / "cuckoo")
    cf.checkpoint(path)
    back = CuckooSeenSet.load(spark, path, n_buckets=4, m_entries=1 << 10)
    assert back.probe(added).toPandas().maybe_seen.all()


def test_capacity_overflow_is_loud(spark):
    cf = CuckooSeenSet.empty(spark, n_buckets=1, m_entries=2,
                             slots_per_entry=1)
    with pytest.raises(Exception, match="over capacity|SparkException|Py4J"):
        cf.add(_urls(spark, 0, 64)).tables.collect()


def test_power_of_two_required(spark):
    with pytest.raises(ValueError):
        CuckooSeenSet.empty(spark, m_entries=1000)
