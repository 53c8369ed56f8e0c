"""As-of join, bucketed range join, deterministic sampling."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.temporal import asof_join, range_join_buckets

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, seconds=0.0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds)


def test_asof_join_semantics(spark):
    events = spark.createDataFrame(
        [
            ("u1", _ts(0), 100, 1.0),
            ("u1", _ts(10), 101, 2.0),
            ("u1", _ts(30), 102, 3.0),
            ("u2", _ts(5), 200, 9.0),
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [
            ("u1", _ts(10)),   # exact tie → matches the ts-10 event (≤)
            ("u1", _ts(29)),   # between → latest is ts-10
            ("u1", _ts(99)),   # after all → ts-30
            ("u2", _ts(0)),    # before any event → null
            ("u3", _ts(50)),   # unseen key → null
        ],
        "user_id string, ts timestamp",
    )
    got = {
        (r.user_id, r.ts): (r.event_id, r.value)
        for r in asof_join(probes, events, "user_id", "ts",
                           ["event_id", "value"]).collect()
    }
    assert got[("u1", _ts(10))] == (101, 2.0)
    assert got[("u1", _ts(29))] == (101, 2.0)
    assert got[("u1", _ts(99))] == (102, 3.0)
    assert got[("u2", _ts(0))] == (None, None)
    assert got[("u3", _ts(50))] == (None, None)


def test_asof_join_probe_payload_passes_through(spark):
    """Probe columns beyond (key, ts) must survive into the output
    unchanged; a payload name colliding with a value column raises."""
    import pytest as _pytest

    events = spark.createDataFrame(
        [("u1", _ts(0), 100)],
        "user_id string, ts timestamp, event_id long",
    )
    probes = spark.createDataFrame(
        [("u1", _ts(5), "req-a", 7), ("u1", _ts(9), "req-b", 8)],
        "user_id string, ts timestamp, req_id string, attempt int",
    )
    rows = {
        r.req_id: (r.attempt, r.event_id)
        for r in asof_join(
            probes, events, "user_id", "ts", ["event_id"]
        ).collect()
    }
    assert rows == {"req-a": (7, 100), "req-b": (8, 100)}

    clashing = probes.withColumnRenamed("req_id", "event_id")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(clashing, events, "user_id", "ts", ["event_id"])


def test_asof_join_tolerance(spark):
    events = spark.createDataFrame(
        [("u1", _ts(0), 100)], "user_id string, ts timestamp, event_id long"
    )
    probes = spark.createDataFrame(
        [("u1", _ts(5)), ("u1", _ts(60))], "user_id string, ts timestamp"
    )
    got = {
        r.ts: r.event_id
        for r in asof_join(probes, events, "user_id", "ts", ["event_id"],
                           tolerance_seconds=600).collect()
    }
    assert got[_ts(5)] == 100
    assert got[_ts(60)] is None  # match exists but is older than tolerance


def test_range_join_buckets_exact_and_bounded(spark):
    rows = [
        ("u1", _ts(0), 1),
        ("u1", _ts(4), 2),            # within 5 min of 1
        ("u1", _ts(5), 3),            # exactly 5 min of 1 (inclusive)
        ("u1", _ts(5, 0.5), 4),       # 300.5 s after 1 → excluded
        ("u2", _ts(0), 5),
    ]
    e = spark.createDataFrame(rows, "user_id string, ts timestamp, eid long")
    l = e.select("user_id", "ts", F.col("eid").alias("l_event"))
    r = e.select("user_id", "ts", F.col("eid").alias("r_event"))
    got = {
        (x.l_event, x.r_event)
        for x in range_join_buckets(l, r, "user_id", "ts", 300,
                                    ["l_event"], ["r_event"]).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_range_join_no_cartesian(spark):
    from crawler_spark.plans.inspect import has_cartesian

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").where(
        "user_id < 50"
    )
    l = e.select("user_id", "ts", F.col("event_id").alias("l_event"))
    r = e.select("user_id", "ts", F.col("event_id").alias("r_event"))
    df = range_join_buckets(l, r, "user_id", "ts", 300, ["l_event"],
                            ["r_event"])
    assert not has_cartesian(df)


def test_stratified_sample_deterministic_and_rated(spark):
    from crawler_spark.operators.scrub import stratified_sample

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("xx").alias("lang"),
    )
    a = stratified_sample(df, "doc_id", "lang", {"en": 40}, default_rate=5,
                          salt="s")
    b = stratified_sample(df, "doc_id", "lang", {"en": 40}, default_rate=5,
                          salt="s")
    ra = sorted(r.doc_id for r in a.collect())
    assert ra == sorted(r.doc_id for r in b.collect())  # pure function
    n_en = a.where("lang = 'en'").count()
    n_xx = a.where("lang = 'xx'").count()
    assert abs(n_en / 2500 - 0.40) < 0.04
    assert abs(n_xx / 2500 - 0.05) < 0.02
    # independent draw under a different salt
    c = stratified_sample(df, "doc_id", "lang", {"en": 40}, default_rate=5,
                          salt="t")
    assert sorted(r.doc_id for r in c.collect()) != ra


def test_asof_join_null_value_column_stays_atomic(spark):
    """The matched event must be carried as one unit: an event with a
    null value column must NOT inherit an older event's value."""
    events = spark.createDataFrame(
        [("u1", _ts(0), 100, 7.0), ("u1", _ts(10), 101, None)],
        "user_id string, ts timestamp, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [("u1", _ts(20))], "user_id string, ts timestamp"
    )
    r = asof_join(probes, events, "user_id", "ts",
                  ["event_id", "value"]).collect()[0]
    assert (r.event_id, r.value) == (101, None)
    assert r.matched_ts == _ts(10)


def test_asof_join_tolerance_nulls_matched_ts(spark):
    events = spark.createDataFrame(
        [("u1", _ts(0), 100)], "user_id string, ts timestamp, event_id long"
    )
    probes = spark.createDataFrame(
        [("u1", _ts(20))], "user_id string, ts timestamp"
    )
    r = asof_join(probes, events, "user_id", "ts", ["event_id"],
                  tolerance_seconds=60).collect()[0]
    assert r.event_id is None and r.matched_ts is None
    # sub-second precision: 60.5 s old fails a 60 s tolerance
    probes2 = spark.createDataFrame(
        [("u1", _ts(1, 0.5))], "user_id string, ts timestamp"
    )
    r2 = asof_join(probes2, events, "user_id", "ts", ["event_id"],
                   tolerance_seconds=60).collect()[0]
    assert r2.event_id is None
