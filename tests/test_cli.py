"""The spark-submit CLI (scripts/run_crawl.py) is the production entry
point (north rule: "runs via spark-submit --py-files"). It must work when
launched from ANY working directory: the driver process fixes its own
sys.path, but executor python workers resolve imports from PYTHONPATH —
the script exports the repo root there before the session starts (on a
real cluster --py-files supersedes this). Regression: before that export,
the first pandas-UDF stage died with ModuleNotFoundError when the script
was run from outside the repo root.
"""

import json
import os
import subprocess
import sys

import duckdb
import pytest

from crawler_spark.fixtures.webgen import generate
from tests.test_crawl_golden import _to_spark_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_crawl_from_foreign_cwd(spark, tmp_path):
    web = generate(seed=31, n_pages=80)
    corpus_dir = str(tmp_path / "corpus")
    _to_spark_corpus(spark, web.pages).write.parquet(corpus_dir)
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(web.seeds.url.tolist()) + "\n")
    store = str(tmp_path / "store")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "run_crawl.py"),
            "--corpus", corpus_dir, "--seeds", str(seeds_file),
            "--store", store, "--max-rounds", "2", "--budget", "*=50",
        ],
        cwd=str(tmp_path),  # NOT the repo root — that is the point
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["rounds"] == 2
    assert stats["pages"] > 0
    assert stats["committed_rounds"] == [0, 1]

    n = duckdb.sql(
        f"select count(*) from read_parquet('{store}/pages/**/*.parquet')"
    ).fetchone()[0]
    assert n == stats["pages"]


def test_bench_scaling_summary_contract():
    """The default bench line embeds the newest committed --scaling
    record (the north rule's two-parallelism evidence); pin the summary
    keys so a record-format change cannot silently drop them."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    s = bench._latest_scaling_record()
    assert s is not None, "no *_scaling.json under bench_records/"
    assert len(s["cpus"]) == 2 and s["cpus"][0] < s["cpus"][1]
    assert len(s["pages_per_sec"]) == 2
    assert 0.0 < s["efficiency"] <= 1.5
    assert s["record"].endswith("_scaling.json")
