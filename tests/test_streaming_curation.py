"""Streaming document curation: quality gate + content-hash
first-arrival dedup, with watermark-bounded state (re-admission past the
watermark is the documented trade, same as the frontier ingest)."""

import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.streaming.curation import streamed_doc_curation

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "with many of the other animals that live in the forest today"
)
GOOD2 = (
    "a second perfectly ordinary document that is long enough to pass "
    "the length factor and contains the usual mix of common words"
)
JUNK = "!!! ??? ***"  # punct-saturated → score 0


def _write_docs(path, rows, fname):
    pdf = pd.DataFrame(rows, columns=["doc_id", "fetch_ts", "lang", "text"])
    pdf["fetch_ts"] = pd.to_datetime(pdf["fetch_ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(path, f"{fname}.parquet"), index=False)


def test_gate_and_first_arrival_dedup(spark, tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    _write_docs(d, [
        (1, t(0), "en", GOOD),
        (2, t(1), "en", JUNK),        # gated out
        (3, t(2), "en", GOOD),        # dup of 1 → dropped
        (4, t(3), "en", GOOD2),
    ], "b0")
    q = streamed_doc_curation(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        watermark="1 hour", min_score=0.25,
    )
    q.awaitTermination()
    out = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("doc_id").toPandas()
    )
    assert out["doc_id"].tolist() == [1, 4]
    assert (out["score"] >= 0.25).all()


def test_state_is_watermark_bounded(spark, tmp_path):
    """A duplicate arriving beyond the watermark re-admits — the state
    eviction that keeps the operator viable on an unbounded stream."""
    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    # each run is one micro-batch; the watermark produced by a batch only
    # takes effect (and evicts state) from the NEXT batch on, so the
    # duplicate needs an intervening batch to advance the clock past
    # doc 1's expiry before it can re-admit
    def run():
        q = streamed_doc_curation(
            spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            watermark="10 seconds", min_score=0.25,
        )
        q.awaitTermination()

    _write_docs(d, [(1, t(0), "en", GOOD)], "b0")
    run()
    _write_docs(d, [(3, t(3600), "en", GOOD2)], "b1")  # advances watermark
    run()
    _write_docs(d, [(2, t(3601), "en", GOOD)], "b2")  # dup, 1 h later
    run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]


def test_portable_hash_matches_batch_md5(spark, tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write_docs(d, [(1, TS0, "en", GOOD), (2, TS0, "en", GOOD2)], "b0")
    q = streamed_doc_curation(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        portable_hash=True,
    )
    q.awaitTermination()
    got = {
        r.doc_id: r.content_hash
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        r.doc_id: r.h
        for r in spark.read.parquet(d)
        .select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert got == want


def test_stream_near_dedup_collapses_reordered_text(spark, tmp_path):
    """The simhash-keyed stream drops a later arrival whose BYTES differ
    but whose token multiset is identical (reversed order, doubled
    whitespace) — the case the exact content-hash gate passes — while
    genuinely different docs survive."""
    from crawler_spark.streaming.curation import streamed_near_dedup

    d = str(tmp_path / "docs")
    os.makedirs(d)
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    reordered = "  ".join(reversed(GOOD.split(" ")))
    assert reordered != GOOD  # different bytes
    _write_docs(d, [
        (1, t(0), "en", GOOD),
        (2, t(1), "en", GOOD2),
        (3, t(2), "en", reordered),   # near-dup of 1 → dropped
        (4, t(3), "en", GOOD + " extrasignalword"),  # real change → kept
    ], "b0")
    q = streamed_near_dedup(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ck"),
        watermark="1 hour",
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 4]
    # the survivor carries the shared signature doc 3 collided with
    sig = {r.doc_id: r.simhash for r in out.collect()}
    assert sig[1] != sig[4]


BASE_H = (
    "the quick brown fox jumps over the lazy dog while rain falls on "
    "the quiet green meadow near the old stone bridge"
)
FAR1 = (
    "completely different text about tax law and parliamentary "
    "procedure in nineteenth century naval history archives"
)
FAR2 = (
    "another unrelated snippet regarding volcanic soil chemistry and "
    "deep sea sediment cores from the southern ocean"
)


def _hamming_fixture():
    """Arrival-ordered docs with planted simhash relations to BASE_H:
    reorder (h=0), ' chi' suffix (h=2), quick→rapid (h=3) — verified
    in-test so a hash-family change can't silently defuse the fixture."""
    return [
        (1, BASE_H),
        (2, "  ".join(reversed(BASE_H.split(" ")))),
        (3, BASE_H + " chi"),
        (4, BASE_H.replace("quick", "rapid")),
        (5, FAR1),
        (6, FAR2),
    ]


def _greedy_replay(docs, sigs, max_hamming):
    """Serial oracle for the hamming rung: a doc survives iff no
    PREVIOUSLY SEEN doc's signature is within max_hamming bits."""
    seen, surv = [], []
    for i, _ in docs:
        if not any(
            bin((sigs[i] ^ s) & ((1 << 64) - 1)).count("1") <= max_hamming
            for s in seen
        ):
            surv.append(i)
        seen.append(sigs[i])
    return surv


def test_stream_near_dedup_hamming3_matches_batch_and_greedy(
    spark, tmp_path
):
    """The hamming 1-3 rung (VERDICT r4 item 3): stream survivors equal
    (a) the serial greedy replay and (b) the batch pipeline
    simhash_near_dups(portable, d=3) → connected_components → keep
    first arrival, on a causally ordered fixture."""
    from crawler_spark.operators.dedup import (
        connected_components,
        simhash_near_dups,
        with_portable_simhash,
    )
    from crawler_spark.streaming.curation import streamed_near_dedup

    docs = _hamming_fixture()
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    rows = [(i, t(10 * i), "en", txt) for i, txt in docs]
    df = spark.createDataFrame(
        rows, "doc_id bigint, fetch_ts timestamp, lang string, text string"
    )
    sigs = {r.doc_id: r.simhash for r in with_portable_simhash(df).collect()}
    hm = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert hm(1, 2) == 0 and hm(1, 3) == 2 and hm(1, 4) == 3  # planted
    assert hm(1, 5) > 3 and hm(1, 6) > 3 and hm(5, 6) > 3

    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write_docs(d, rows, "b0")
    q = streamed_near_dedup(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ck"),
        watermark="1 hour", max_hamming=3,
    )
    q.awaitTermination()
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == _greedy_replay(docs, sigs, 3) == [1, 5, 6]

    # batch contract: CC over the d=3 pair set, keep first arrival
    pairs = simhash_near_dups(df, max_hamming=3, portable=True)
    comps = {
        r["node"]: r["comp"] for r in connected_components(pairs).collect()
    }
    first, batch_surv = {}, []
    for i, _ in docs:  # arrival order
        c = comps.get(i, i)
        if c not in first:
            first[c] = i
            batch_surv.append(i)
    assert got == sorted(batch_surv)


def test_stream_near_dedup_hamming3_microbatch_invariant_and_resumable(
    spark, tmp_path
):
    """Reorder/replay invariance: the same fixture split 1-file-per-doc
    and replayed 2 files per trigger (multiple micro-batches, state
    crossing batch boundaries) yields the same survivors; then a
    RESTART from the same checkpoint picks up newly arrived files and
    keeps suppressing against the persisted signature state."""
    from crawler_spark.streaming.curation import streamed_near_dedup

    docs = _hamming_fixture()
    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    d = str(tmp_path / "docs")
    os.makedirs(d)
    for i, txt in docs:
        _write_docs(d, [(i, t(10 * i), "en", txt)], f"f{i}")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = streamed_near_dedup(
        spark, d, out, ck, watermark="1 hour",
        max_hamming=3, max_files_per_trigger=2,
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [1, 5, 6]

    # late arrivals: another BASE_H near-twin (suppressed against state
    # from a FINISHED run) and one genuinely new doc (kept)
    _write_docs(d, [
        (7, t(70), "en", BASE_H + " chi"),
        (8, t(80), "en",
         "fresh topic entirely about medieval glass blowing techniques "
         "and the guild systems of the lowland trading cities"),
    ], "f7")
    q2 = streamed_near_dedup(
        spark, d, out, ck, watermark="1 hour",
        max_hamming=3, max_files_per_trigger=2,
    )
    q2.awaitTermination()
    got2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got2 == [1, 5, 6, 8]


def test_stream_near_dedup_hamming3_equal_ts_tiebreak_across_batches(
    spark, tmp_path
):
    """Equal event times straddling a micro-batch boundary follow the
    SAME (fetch_ts, doc_id) total order the batch contract and oracle
    pin: a state row suppresses an equal-ts arrival only when its
    doc_id is LOWER (state keeps doc_id for exactly this comparison —
    erasing it would make every state row precede every equal-ts batch
    row). The one non-retractable edge: when the LOWER id arrives
    later, the already-emitted higher-id row cannot be withdrawn, so
    both emit and downstream batch dedup catches it."""
    from crawler_spark.streaming.curation import streamed_near_dedup

    d = str(tmp_path / "docs")
    os.makedirs(d)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run():
        q = streamed_near_dedup(
            spark, d, out, ck, watermark="1 hour", max_hamming=3
        )
        q.awaitTermination()

    _write_docs(d, [(10, TS0, "en", BASE_H)], "f1")
    run()
    # same event time, both near-twins of doc 10 (and of each other):
    # id=20 is LATER than state row 10 in the total order → suppressed;
    # id=5 is EARLIER than 10 → not suppressed (10 already emitted —
    # the documented non-retractable edge, so both 5 and 10 appear)
    _write_docs(d, [
        (5, TS0, "en", BASE_H + " chi"),
        (20, TS0, "en", "  ".join(reversed(BASE_H.split(" ")))),
    ], "f2")
    run()
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [5, 10]


def test_stream_near_dedup_hamming3_watermark_readmits(spark, tmp_path):
    """Signature state is watermark-bounded: a near-twin arriving
    beyond the delay re-admits (the documented re-admission trade —
    batch dedup downstream catches it), while an in-watermark twin in
    the same run is suppressed."""
    from crawler_spark.streaming.curation import streamed_near_dedup

    t = lambda s: TS0 + dt.timedelta(seconds=s)  # noqa: E731
    d = str(tmp_path / "docs")
    os.makedirs(d)
    # one file per row, one row per trigger → three micro-batches in
    # event-time order; the 2-hour gap crosses the 1-hour watermark
    _write_docs(d, [(1, t(0), "en", BASE_H)], "f1")
    _write_docs(d, [(2, t(30), "en", BASE_H + " chi")], "f2")
    _write_docs(d, [(3, t(7200), "en", BASE_H + " chi")], "f3")
    q = streamed_near_dedup(
        spark, d, str(tmp_path / "out"), str(tmp_path / "ck"),
        watermark="1 hour", max_hamming=3, max_files_per_trigger=1,
    )
    q.awaitTermination()
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [1, 3]  # 2 suppressed in-watermark; 3 re-admitted
