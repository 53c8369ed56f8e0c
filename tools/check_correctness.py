#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every entry in ``__spark_entry__.queries()`` with a matching
``oracle_sql()``, run the Spark query and the DuckDB oracle at sf0.01 and
compare (row count, column names, value hash). Value hash: columns sorted
by name, rows sorted by all columns, floats pre-rounded by the queries
themselves; hash of the canonical CSV.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_hash(df) -> tuple[int, list[str], str]:
    """(n_rows, sorted col names, value hash) of a pandas frame."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return len(df), cols, hashlib.sha256(payload).hexdigest()[:16]


def oracle_connection(sf_dir: str = SF_DIR):
    """DuckDB connection with the test tables pre-registered as views —
    the same setup the driver's gate uses (also imported by
    tests/test_tail_oracles.py for the random below-window re-checks)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def check_query(spark, con, fn, sql, sf_dir: str = SF_DIR):
    """(ok, n_spark, n_duck, h_spark, h_duck) for one oracle-backed query."""
    sp = fn(spark, sf_dir).toPandas()
    du = con.execute(sql).df()
    n_s, c_s, h_s = canon_hash(sp)
    n_d, c_d, h_d = canon_hash(du)
    return (n_s, c_s, h_s) == (n_d, c_d, h_d), n_s, n_d, h_s, h_d


def main() -> None:
    import __spark_entry__ as em

    from crawler_spark.session import get_spark

    only = set(sys.argv[1:])
    qs, oracles = em.queries(), em.oracle_sql()
    con = oracle_connection()
    spark = get_spark("check")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            print(f"ROWS-ONLY {name}: {n} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        t0 = time.perf_counter()
        try:
            sp = fn(spark, SF_DIR).toPandas()
            du = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        n_s, c_s, h_s = canon_hash(sp)
        n_d, c_d, h_d = canon_hash(du)
        dt = time.perf_counter() - t0
        if (n_s, c_s, h_s) == (n_d, c_d, h_d):
            print(f"OK    {name}: {n_s} rows hash={h_s} ({dt:.1f}s)")
        else:
            n_fail += 1
            print(f"FAIL  {name}: spark=({n_s},{c_s},{h_s}) "
                  f"duck=({n_d},{c_d},{h_d}) ({dt:.1f}s)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
