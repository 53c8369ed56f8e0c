"""Crawler-trap detection — frontier hygiene for infinite URL spaces.

The reference crawler has no defense against spider traps (calendar
pages, session-id links, mirrored path loops — the classic causes of a
frontier that grows faster than the crawl); its only bound is the
operator killing the process. At 10^10-frontier scale trap URLs are the
difference between a frontier that converges and one that doesn't, so
the scheduler needs a cheap per-URL signal BEFORE enqueueing.

Everything here is pure column algebra over the URL string (zero UDF,
codegen-friendly, mirrored 1:1 by the `url_trap_flags` DuckDB oracle).
Heuristics are the standard public ones (see e.g. Heydon & Najork,
"Mercator: A scalable, extensible Web crawler", 1999 §3.2 on URL
filters; IRLbot's spam/spider-trap discussion, Lee et al. 2009):

  * ``depth``          — path-segment count; deep paths are loop-suspect
  * ``repeated_segments`` — any path segment occurring ≥ 3 times
    (``/a/b/a/c/a`` — mirror/loop shape)
  * ``n_params`` / ``long_query`` — query-parameter explosion
  * ``has_session_id`` — a parameter named like a session token or a
    32+-char hex value (every fetch mints a "new" URL)
  * ``date_segments``  — ≥ 2 date-shaped path segments (calendar traps
    paginate forever)

``trap_score`` sums the binary flags; ``is_trap`` applies the default
≥ 2 threshold (one signal alone is common on legitimate sites).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parameter names that mint per-visit URLs (lowercase match)
SESSION_PARAMS = (
    "sid", "sessionid", "session_id", "phpsessid", "jsessionid",
    "aspsessionid", "cfid", "cftoken", "sess",
)

MAX_DEPTH = 8
MAX_PARAMS = 8
MAX_QUERY_LEN = 100
SEGMENT_REPEATS = 3
DATE_SEGMENTS = 2
TRAP_THRESHOLD = 2


def url_trap_flags(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the trap columns to ``df`` (see module docstring)."""
    u = F.col(url_col)
    # strip scheme://host (case-INSENSITIVE — 'HTTP://h/x' must not
    # count its scheme+host as two path segments) and the #fragment
    # (fragment text is not query text: a long fragment would flag
    # long_query and '&'s inside it would mint phantom params)
    after = F.regexp_replace(u, r"(?i)^[a-z][a-z0-9+.\-]*://[^/]*", "")
    after = F.substring_index(after, "#", 1)
    path = F.substring_index(after, "?", 1)
    query = F.substring(after, F.length(path) + 2, F.lit(1 << 30))
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    depth = F.size(segs)
    # true multiplicity test: SOME segment occurs ≥ 3 times. (The old
    # depth − distinct ≥ 2 shortcut also fired on two segments each
    # appearing twice — '/blog/blog/img/img' — a false trap signal.)
    repeated = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        )
        >= F.lit(SEGMENT_REPEATS),
        F.lit(False),
    )
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    n_params = F.size(params)
    long_query = F.length(query) > F.lit(MAX_QUERY_LEN)
    pnames = F.transform(
        params, lambda p: F.lower(F.substring_index(p, "=", 1))
    )
    has_session = F.exists(
        pnames, lambda n: n.isin(*SESSION_PARAMS)
    ) | F.exists(
        params,
        lambda p: F.substring_index(p, "=", -1).rlike("^[0-9a-fA-F]{32,}$"),
    )
    dateseg = F.size(
        F.filter(segs, lambda s: s.rlike(r"^(19|20)[0-9]{2}$|^[0-9]{1,2}$"))
    ) >= F.lit(DATE_SEGMENTS)
    flags: list[tuple[str, Column]] = [
        ("deep_path", depth > F.lit(MAX_DEPTH)),
        ("repeated_segments", repeated),
        ("many_params", n_params > F.lit(MAX_PARAMS)),
        ("long_query", long_query),
        ("has_session_id", has_session),
        ("date_segments", dateseg),
    ]
    out = df.withColumn("depth", depth).withColumn("n_params", n_params)
    score = F.lit(0)
    for name, col in flags:
        out = out.withColumn(name, col)
        score = score + col.cast("int")
    return out.withColumn("trap_score", score).withColumn(
        "is_trap", score >= F.lit(TRAP_THRESHOLD)
    )
