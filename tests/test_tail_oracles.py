"""Random below-window oracle re-checks.

The driver's automated gate grades exactly the FIRST 50 entries of
``__spark_entry__.queries()`` (the window ``tests/test_registry.py``
pins). Everything below the window is only checked when someone runs
``tools/check_correctness.py`` by hand — so a regression in a tail entry
could sit unnoticed between judge rounds. This test closes that gap: every
pytest run re-verifies a random sample of below-window oracle entries
against DuckDB, seeded by the calendar day so consecutive runs within a
day are reproducible while coverage rotates across days.
"""

import datetime
import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

N_SAMPLE = 10
WINDOW = 50


def _tail_oracle_names():
    import __spark_entry__ as em

    names = list(em.queries())
    oracles = em.oracle_sql()
    return [n for n in names[WINDOW:] if n in oracles]


def test_random_tail_oracles(spark):
    import __spark_entry__ as em

    from check_correctness import SF_DIR, check_query, oracle_connection

    tail = _tail_oracle_names()
    assert tail, "no below-window oracle entries — did the window grow?"
    day = datetime.date.today().toordinal()
    rng = random.Random(day)
    sample = rng.sample(tail, min(N_SAMPLE, len(tail)))

    qs, oracles = em.queries(), em.oracle_sql()
    con = oracle_connection(SF_DIR)
    failures = []
    for name in sample:
        ok, n_s, n_d, h_s, h_d = check_query(
            spark, con, qs[name], oracles[name], SF_DIR
        )
        if not ok:
            failures.append(f"{name}: spark=({n_s},{h_s}) duck=({n_d},{h_d})")
    assert not failures, (
        f"tail oracle regressions (day seed {day}, sample {sample}): "
        + "; ".join(failures)
    )
