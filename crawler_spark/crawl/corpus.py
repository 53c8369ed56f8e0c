"""Bucketed corpus layout — the shuffle-free fetch join.

The per-round "simulated fetch" is a left join of the scheduled frontier
slice against the corpus table (SURVEY §2.1 S2: fetching a round = lookup
of scheduled URLs in the Common-Crawl-style pages table). At bench scale
that join is trivial; at the target scale it is THE dominant shuffle of
every round: the corpus is the 100 TB side, and an unbucketed sort-merge
join re-exchanges it on ``url`` every single round, while broadcasting is
impossible in the other direction (a 10^7-row scheduled slice doesn't
broadcast either).

The fix is layout, not a new operator: persist the corpus ONCE as a
bucketed table (``CLUSTERED BY (url) INTO n BUCKETS, SORTED BY url`` —
Spark's hash-bucketed parquet layout, the plain-parquet stand-in for an
Iceberg ``bucket(n, url)`` partition spec). Catalyst then plans the fetch
join with ZERO exchange on the corpus side: only the (round-sized)
scheduled slice shuffles, into ``n_buckets`` partitions matching the
bucket hash. The plan witness is ``Bucketed: true`` +
``SelectedBucketsCount`` on the corpus scan and a single Exchange in the
whole join (tests/test_plans.py::test_bucketed_fetch_join_one_sided).

Write once, join every round — amortized over the crawl, the one-time
bucketed write replaces per-round corpus exchanges. The same layout
serves every other url-keyed probe (backfill lookups S3, page lookups
S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_corpus(
    corpus: DataFrame,
    table: str,
    n_buckets: int = 256,
    path: str | None = None,
) -> None:
    """Persist the corpus hash-bucketed (and bucket-sorted) by ``url``.

    ``path`` makes it an external table at an explicit location (tests /
    scratch dirs); default is the session warehouse. ``n_buckets`` should
    match the cluster's target join parallelism — at 100 TB, hundreds to
    thousands of buckets keep each bucket file a few hundred MB.
    """
    # pre-shuffle onto the bucket hash so each bucket is ONE sorted file
    # (repartition and bucketBy share the Murmur3 hash): multi-file
    # buckets cost extra scan tasks and forgo the sorted-bucket layout
    w = (
        corpus.repartition(n_buckets, "url")
        .write.bucketBy(n_buckets, "url")
        .sortBy("url")
    )
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").saveAsTable(table)


def read_bucketed_corpus(spark: SparkSession, table: str) -> DataFrame:
    """Read the bucketed corpus — pass the result as ``run_crawl``'s
    ``corpus``; every per-round fetch join then planning-inherits the
    bucket distribution (no corpus-side exchange, no caching needed)."""
    return spark.table(table)


def drop_bucketed_corpus(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
