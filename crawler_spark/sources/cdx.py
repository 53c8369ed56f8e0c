"""CDX archive index — the Common-Crawl/Wayback lookup layer over WARC.

The north rule frames the corpus as "Common-Crawl-style web pages"; the
repo already reads/writes WARC (``sources/warc.py``). What makes a WARC
archive *queryable* in that ecosystem is the CDX index: one row per
capture, keyed by the SURT (Sort-friendly URI Reordering Transform,
public spec used by OpenWayback/pywb/Common Crawl) so that all captures
of a host and its subdomains are contiguous under a plain lexicographic
sort — which is exactly what a range-partitioned, sorted parquet layout
gives for free in Spark.

Everything here is pure column algebra (zero UDF, whole-stage codegen),
and every step is mirrored 1:1 by the DuckDB oracle of the ``cdx_index``
entry query.

SURT subset implemented (documented spec, applied in this order):
  1. lowercase + trim the whole URL, strip the ``#fragment``;
  2. strip the scheme (``xx://``) and any ``user@`` info;
  3. host: drop one leading ``www.``, reverse the dot-labels and join
     with commas (``com,example``); keep a non-default port as
     ``:port`` (80/443 dropped — scheme is already gone, both defaults
     are equally elided);
  4. path: ``/``-rooted (empty path → ``/``); query params are split on
     ``&`` and sorted bytewise (the same superset rule the URL
     canonicalizer applies, SURVEY §2.8 U1).
Key = ``rev_host[:port]) + path[?sorted_query]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: str | Column) -> Column:
    """SURT canonical key of a URL (see module spec)."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    u = F.substring_index(u, "#", 1)
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(u, r"^([^/?]*)", 1)
    rest = F.substring(u, F.length(hostport) + 1, F.lit(1 << 30))
    # empty path or bare '?query' both root at '/'
    pathq = F.when(
        rest.startswith("?") | (rest == ""), F.concat(F.lit("/"), rest)
    ).otherwise(rest)
    hostport = F.regexp_replace(hostport, r"^[^@]*@", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keep_port = (port != "") & (port != "80") & (port != "443")
    path = F.substring_index(pathq, "?", 1)
    query = F.substring(
        pathq, F.length(path) + 2, F.lit(1 << 30)
    )  # after the '?', '' when absent
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    path_final = F.when(
        query == "", path
    ).otherwise(F.concat(path, F.lit("?"), sorted_q))
    return F.concat(
        rev,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path_final,
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "text",
    num_shards: int | None = None,
) -> DataFrame:
    """Build the CDX capture index: one row per (url, capture time).

    Columns: ``surt`` key, ``cdx_ts`` (the CDX ``yyyyMMddHHmmss``
    timestamp string), original ``url``, ``digest`` (md5 of the payload
    — engine-portable stand-in for CDX's sha1), ``length`` (payload
    chars). The result is range-partitioned and sorted by
    ``(surt, cdx_ts)`` — written as parquet this IS the sharded CDX
    layout: binary-search-able shards with host-contiguous keys, and
    Spark's range exchange balances shard sizes even under hot-host
    skew. ``num_shards`` defaults to the session's shuffle parallelism.
    """
    idx = df.select(
        surt_key(url_col).alias("surt"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("cdx_ts"),
        F.col(url_col).alias("url"),
        F.md5(F.coalesce(F.col(payload_col), F.lit(""))).alias("digest"),
        F.length(F.coalesce(F.col(payload_col), F.lit("")))
        .cast("long")
        .alias("length"),
    )
    shards = idx.repartitionByRange(
        *([num_shards] if num_shards else []), "surt", "cdx_ts"
    )
    return shards.sortWithinPartitions("surt", "cdx_ts")
