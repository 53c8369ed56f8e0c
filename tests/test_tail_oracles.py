"""Random below-window oracle re-checks.

The driver's automated gate grades exactly the FIRST 50 entries of
``__spark_entry__.queries()`` (the window ``tests/test_registry.py``
pins). Everything below the window is only checked when someone runs
``tools/check_correctness.py`` by hand — so a regression in a tail entry
could sit unnoticed between judge rounds. This test closes that gap: by
default every pytest run re-verifies EVERY below-window oracle entry
against DuckDB (~1-2 min at sf0.01 — the below-window half of
``tools/check_correctness.py``); set ``SPARK_GRAFT_TAIL_SAMPLE=<n>`` for
a quick local run that checks a day-seeded random sample instead
(reproducible within a day, rotating across days).
"""

import datetime
import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

_env = os.environ.get("SPARK_GRAFT_TAIL_SAMPLE", "all")
N_SAMPLE = None if _env == "all" else max(1, int(_env))
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
    if N_SAMPLE is None:
        sample = tail  # default: the FULL below-window oracle set
    else:
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
