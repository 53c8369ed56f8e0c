"""Redirect-chain resolution — collapse 3xx chains to their final URL.

The reference follows redirects implicitly inside its fetch call
(``page.ts`` delegates to the HTTP client's redirect handling, one URL at
a time); a batch crawler instead accumulates a redirect *map* (src → dst
rows from 3xx responses) and must resolve every known URL to its chain
terminal before frontier scheduling, so that (a) the seen-set is keyed by
final URLs and mirrors of the same target are not fetched twice, and
(b) redirect *loops* — a real crawler-trap class — are detected and
dropped rather than refetched forever.

Spark-first design: the redirect map is a functional graph (each src has
at most one outgoing edge), so chains resolve with **pointer jumping**
(path doubling) — O(log L) self-joins for maximum chain length L, not one
join per hop. Each jump advances every unresolved row to its successor's
successor and adds the successor's accumulated hop count, the same
doubling invariant as ``operators.dedup.connected_components``; each
iteration is ``localCheckpoint``-ed to reset lineage. At 10^10 URLs a
redirect map is ~10^8 rows (1-3% of fetches are 3xx); six hash-joins of a
map that size — each keyed by the uniformly-hashed current pointer —
beat a 64-round sequential walk by an order of magnitude of shuffles,
and no step ever materializes anything larger than the map itself.

Rows still unresolved after enough doubling to cover ``max_hops`` are
redirect cycles (or chains longer than the crawler is willing to follow
— HTTP clients cap at ~20 hops for the same reason): flagged, not
resolved, so the driver can quarantine them like ``functions.traps``
does for URL-shape traps.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 32,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resolve every redirect source to its chain terminal.

    ``edges`` is a redirect map: at most ONE outgoing edge per ``src``
    (an HTTP response has one Location header). The map must be
    functional — callers building it from capture logs reduce to the
    latest capture per src first (a ``max_by`` groupBy); a duplicate
    src fed through the doubling join would fan out into one resolved
    row per branch rather than fail, so the reduction is the caller's
    contract, stated here instead of paid for with a per-call count.

    Returns one row per distinct src:
    ``(src_id, final_id, hops, is_cycle)`` — ``final_id`` is the first
    node in the chain with no outgoing redirect and ``hops`` the exact
    chain length; for a src whose chain has not terminated within
    ``max_hops`` (a loop, or an absurdly long chain) both are null and
    ``is_cycle`` is true.
    """
    # a NULL dst (a 3xx capture whose Location failed to parse) is NOT
    # a redirect edge: keeping it would emit (final_id=NULL, hops=1,
    # is_cycle=false) — a row that claims terminal resolution with no
    # terminal, and every such src would collapse onto one NULL key in
    # a final_id-keyed consumer. Dropping the edge makes the src a
    # non-redirecting node (resolves to itself), the honest reading.
    e = edges.where(F.col(dst).isNotNull()).select(
        F.col(src).alias("node"), F.col(dst).alias("cur")
    )
    # invariant: state[x].cur = f^(state[x].hops)(x); done ⇒ cur terminal
    state = e.select(
        "node",
        "cur",
        F.lit(1).cast("long").alias("hops"),
        F.lit(False).alias("done"),
    ).localCheckpoint(eager=False)
    # pointer distance doubles per jump (2^k after k jumps) but the done
    # flag lags one jump behind the pointer: a row learns it is finished
    # only when its join target was ALREADY terminal-resolved in the
    # previous round — so cover max_hops with the pointer by jump k-1
    # and spend one more jump converting reach into doneness
    n_jumps = max(2, math.ceil(math.log2(max(2, max_hops))) + 1)
    for _ in range(n_jumps):
        nxt = state.select(
            F.col("node").alias("n2"),
            F.col("cur").alias("cur2"),
            F.col("hops").alias("hops2"),
            F.col("done").alias("done2"),
        )
        hold = F.col("done") | F.col("n2").isNull()
        state = (
            state.join(nxt, state["cur"] == nxt["n2"], "left")
            .select(
                "node",
                F.when(hold, F.col("cur")).otherwise(F.col("cur2")).alias("cur"),
                F.when(hold, F.col("hops"))
                .otherwise(F.col("hops") + F.col("hops2"))
                .alias("hops"),
                (hold | F.col("done2")).alias("done"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        F.col("node").alias("src_id"),
        F.when(F.col("done"), F.col("cur")).alias("final_id"),
        F.when(F.col("done") & (F.col("hops") <= max_hops), F.col("hops"))
        .alias("_h"),
        F.col("done").alias("_d"),
    ).select(
        "src_id",
        # a chain that terminated but needed more than max_hops is
        # treated exactly like a loop: the crawler would have given up
        F.when(F.col("_h").isNotNull(), F.col("final_id")).alias("final_id"),
        F.col("_h").alias("hops"),
        F.col("_h").isNull().alias("is_cycle"),
    )


def canonical_collapse(
    pages: DataFrame,
    url_col: str = "url",
    canon_col: str = "canonical",
    max_hops: int = 32,
) -> DataFrame:
    """Honor ``rel=canonical`` declarations corpus-wide: resolve
    declaration CHAINS (A declares B canonical, B declares C) to their
    terminal target with the same pointer-jumping join as redirect
    chains, and collapse every page onto it.

    Input: one row per page carrying its declared canonical
    (``functions.html.extract_canonical_from``; null = undeclared).
    Output: the input columns plus

    - ``target`` — the URL this page's signals/content should be
      credited to: the chain terminal, or the page itself when it
      declares nothing, declares itself, or sits on a declaration
      CYCLE (a real spam/misconfiguration shape — flagged, and treated
      as undeclared exactly like HTTP redirect loops are quarantined);
    - ``canonical_hops`` — chain length to the target (0 = own page);
    - ``canonical_cycle`` — the cycle/over-length flag.

    Scale shape: the edge map is pages-with-a-declaration sized (a
    small fraction of the corpus), the doubling join is O(log max_hops)
    hash joins of that map, and the final attach is one equi-join on
    url — the page rows shuffle once, inherent to keying the output by
    page. Duplicate (url, canonical) declarations reduce by ``max`` so
    the resolver's functional-map contract holds deterministically.
    """
    u, c = F.col(url_col), F.col(canon_col)
    edges = (
        pages.select(u.alias("src"), c.alias("dst"))
        .where(c.isNotNull() & (c != u))
        .groupBy("src")
        .agg(F.max("dst").alias("dst"))
    )
    res = resolve_redirects(edges, max_hops=max_hops)
    out = pages.join(
        res, pages[url_col] == res["src_id"], "left"
    )
    return out.select(
        *pages.columns,
        F.coalesce(F.col("final_id"), u).alias("target"),
        F.coalesce(F.col("hops"), F.lit(0)).cast("long").alias(
            "canonical_hops"
        ),
        F.coalesce(F.col("is_cycle"), F.lit(False)).alias(
            "canonical_cycle"
        ),
    )
