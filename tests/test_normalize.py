"""Unicode normalization kernel vs Python unicodedata on messy inputs —
the cases the ASCII entry corpus cannot exercise."""

import re
import unicodedata

import pytest


def _py_norm(s):
    s = unicodedata.normalize("NFC", s)
    s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", s)
    s = re.sub(r"[ \t]+", " ", s)
    return s.strip()


CASES = [
    (0, "café time"),              # NFD é → composed
    (1, "á̀ stacked"),        # multiple combining marks
    (2, "tab\tand\t\tspaces   here"),    # whitespace squeeze
    (3, "ctrl\x00\x01chars\x7fgone"),    # C0 + DEL stripped
    (4, "keep\nnewlines\r\nintact"),     # LF/CR survive
    (5, "  leading and trailing \t "),   # trim
    (6, "already clean text"),           # no-op → changed False
    (7, "ﬁnal ligature stays"),     # NFC (not NFKC): ﬁ unchanged
]


def test_normalize_matches_unicodedata(spark):
    from crawler_spark.functions.normalize import normalize_text

    df = spark.createDataFrame(CASES, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["clean_text"], r["changed"])
        for r in normalize_text(df).collect()
    }
    for i, raw in CASES:
        want = _py_norm(raw)
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == (want != raw)
    assert got[6][1] is False
    # composed output: the é is a single codepoint now
    assert got[0][0] == "café time"
    assert len(got[0][0]) == len("café time")
    # NFC must NOT decompose/fold the ligature (that would be NFKC)
    assert got[7][0].startswith("ﬁ")


def test_normalize_is_idempotent(spark):
    from crawler_spark.functions.normalize import normalize_text

    df = spark.createDataFrame(CASES, "doc_id: long, text: string")
    once = normalize_text(df).selectExpr(
        "doc_id", "clean_text AS text"
    )
    twice = {
        r["doc_id"]: r["changed"] for r in normalize_text(once).collect()
    }
    assert not any(twice.values())
