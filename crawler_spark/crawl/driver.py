"""Round-synchronous crawl driver — the engine's flagship pipeline.

Spark re-expression of the reference's serial crawl loop (``crawl.ts:41-71``
driver, ``storage.ts:137-200`` pop, ``page.ts:136-219`` fetch/extract,
``storage.ts:82-112`` queue update, ``workers/crawler.ts:21-32`` cooldown)
as iterative batch rounds. Each round:

    frontier ──anti-join── cooldown (broadcast, tiny)
             ──topk_per_group── per-host politeness budget (skew-salted)
             ──with_global_seq── deterministic (round, seq) crawl order
                 (priority queue: host-rank broadcast join + global
                  round capacity when configured; default = pure BFS)
             ──left join corpus── simulated fetch (url → html/status/ct)
             ──extract_links/extract_text pandas UDFs── (Arrow-batched)
             ──robots + fetchable filters──
             ──bloom.filter_unseen── URL-seen set (bloom + exact re-check)
             ──with_global_seq── discovery priority (disc_round, disc_seq)
             ──commit── pages/links/discoveries/frontier/cooldown/bloom
                        + round manifest (atomic, resumable)

Semantics are specified by the pure-Python oracle
(``crawler_spark.oracle.crawloracle`` — see its module docstring for the
reference mapping); golden tests assert exact equality of crawl order,
seen set, link table, cooldown events and extracted text.

Every per-row operation is a vectorized pandas UDF; all joins are
hash/broadcast joins; the two global orderings use the scalable
``with_global_seq`` (no single-partition window). Cooldown and politeness
tables are broadcast-sized by construction (one row per host).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.crawl.store import (
    COOLDOWN_SCHEMA,
    DISC_SCHEMA,
    CrawlStore,
)
from crawler_spark.functions.html import extract_links_udf, extract_text_udf
from crawler_spark.functions.urls import get_hostname, is_fetchable
from crawler_spark.operators.dust import apply_dust_rules
from crawler_spark.operators.seen import BloomSeenSet
from crawler_spark.operators.topk import topk_per_group, with_global_seq
from crawler_spark.oracle.crawloracle import (
    DEFAULT_COOLDOWN_SECONDS,
    CrawlConfig,
)


@dataclass
class CrawlStats:
    rounds: int = 0
    pages: int = 0
    links: int = 0
    discoveries: int = 0
    per_round: list[dict] = field(default_factory=list)


def _robots_filter_udf(spark: SparkSession, config: CrawlConfig):
    """Vectorized robots allow/deny over (host, url): rules pre-grouped
    into a per-host dict, broadcast once, evaluated per host GROUP with
    vectorized prefix matches.

    Replaces an O(|all rules| × |links|) per-row scan: each URL now only
    sees its own host's rules (plus ``*`` wildcards), and each rule is
    one vectorized ``str.startswith`` over the host's URL block — the
    per-round cost is Σ_host |rules(host)| × |links(host)|, flat in total
    rule count. Semantics identical to the serial spec
    ``CrawlConfig.robots_allowed`` (longest pattern wins, allow wins
    ties, default allow; RFC 9309 ``*``/``$`` patterns — present when the
    rules were parsed with ``wildcards="exact"`` — match per §2.2.2 via a
    vectorized anchored regex), asserted by property tests and the crawl
    goldens. Rules are pre-compiled once here: each entry carries its
    regex (None ⇒ plain-prefix ``startswith`` fast path)."""
    from crawler_spark.functions.robots import pattern_to_regex

    by_host: dict[str, list[tuple[str, bool, str | None]]] = {}
    wild: list[tuple[str, bool, str | None]] = []
    for rhost, rule, allow in config.robots:
        entry = (rule, bool(allow), pattern_to_regex(rule))
        if rhost == "*":
            wild.append(entry)
        else:
            by_host.setdefault(rhost, []).append(entry)
    bc = spark.sparkContext.broadcast((by_host, wild))

    @F.pandas_udf("boolean")
    def robots_ok(hosts: pd.Series, urls: pd.Series) -> pd.Series:
        import numpy as np

        host_rules, wild_rules = bc.value
        s = urls.fillna("")
        # vectorized _url_path: strip scheme://host, cut the query;
        # empty/protocol-less → "/"
        has_proto = s.str.contains("://", regex=False)
        path = (
            s.str.replace(r"^.*?://[^/]*", "", n=1, regex=True)
            .str.split("?", n=1)
            .str[0]
        )
        path = path.where(has_proto & (path != ""), "/")
        out = np.ones(len(s), dtype=bool)  # default allow
        for host, idx in hosts.fillna("").groupby(
            hosts.fillna("")
        ).groups.items():
            rules = host_rules.get(host, []) + wild_rules
            if not rules:
                continue
            p = path.loc[idx]
            best_len = np.full(len(p), -1)
            best_allow = np.ones(len(p), dtype=bool)
            for rule, allow, rx in rules:
                if rx is None:
                    m = p.str.startswith(rule).to_numpy()
                else:
                    m = p.str.match(rx).to_numpy()
                ln = len(rule)
                upd = m & (
                    (ln > best_len) | ((ln == best_len) & allow)
                )
                best_allow = np.where(upd, allow, best_allow)
                best_len = np.where(m & (ln > best_len), ln, best_len)
            out[hosts.index.get_indexer(idx)] = best_allow
        return pd.Series(out, index=hosts.index)

    return robots_ok


def _budget_df(
    spark: SparkSession, config: CrawlConfig, rnd: int = 0
) -> tuple[DataFrame, int]:
    """Effective per-host budgets for round ``rnd`` (broadcast-sized).

    Periodic hosts (``config.budget_periods``) get their base budget on
    on-rounds (``rnd % period == 0``) and 0 otherwise — evaluated
    driver-side from the tiny config dicts, so a period costs nothing
    distributed. The ``'*'`` default is never periodic."""
    default = config.budgets.get("*", 1 << 30)
    hosts = (set(config.budgets) | set(config.budget_periods)) - {"*"}
    rows = [(h, config.budget_at(h, rnd)) for h in sorted(hosts)]
    df = spark.createDataFrame(rows or [("__none__", 0)], "host string, _bk int")
    return df, default


def seed_discoveries(
    spark: SparkSession, seeds: list[str], config: CrawlConfig
) -> DataFrame:
    """Seeds become disc_round = -1 discoveries; disc_seq = seed-list index
    (pre-filter, matching the oracle's enumerate order)."""
    rows: dict[str, tuple[int, int, str, str]] = {}
    for i, url in enumerate(seeds):
        host = get_hostname(url)
        if not is_fetchable(url):
            continue
        if config.limit_to and host != config.limit_to:
            continue
        from crawler_spark.oracle.crawloracle import _url_path

        if not config.robots_allowed(host, _url_path(url)):
            continue
        # first occurrence wins — matches the oracle's setdefault dedup
        rows.setdefault(url, (-1, i, url, host))
    return spark.createDataFrame(list(rows.values()), DISC_SCHEMA)


def _seen_filter_empty(
    spark, seen_filter: str, buckets: int, bloom_bits: int, cuckoo_entries: int
):
    if seen_filter == "cuckoo":
        from crawler_spark.operators.cuckoo import CuckooSeenSet

        return CuckooSeenSet.empty(spark, buckets, cuckoo_entries)
    if seen_filter != "bloom":
        raise ValueError(f"seen_filter must be bloom|cuckoo, got {seen_filter!r}")
    return BloomSeenSet.empty(spark, buckets, bloom_bits)


def _seen_filter_load(
    spark, path: str, seen_filter: str, buckets: int, bloom_bits: int,
    cuckoo_entries: int,
):
    if seen_filter == "cuckoo":
        from crawler_spark.operators.cuckoo import CuckooSeenSet

        filt = CuckooSeenSet.load(spark, path, buckets, cuckoo_entries)
        state, want = filt.tables, "slots"
    elif seen_filter == "bloom":
        filt = BloomSeenSet.load(spark, path, buckets, bloom_bits)
        state, want = filt.blooms, "bits"
    else:
        raise ValueError(f"seen_filter must be bloom|cuckoo, got {seen_filter!r}")
    # a bloom snapshot loaded as cuckoo (or vice versa) would fail later
    # with an opaque cogroup/schema error — fail here with the cause
    if want not in state.columns:
        raise ValueError(
            f"seen-filter snapshot at {path} has columns {state.columns} — "
            f"the store was written with the other seen_filter; resume "
            f"with the same filter the crawl started with"
        )
    return filt


def run_crawl(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: list[str],
    config: CrawlConfig,
    store_root: str,
    bloom_buckets: int = 16,
    bloom_bits: int = 1 << 18,
    resume: bool = False,
    write_partitions: int | None = 8,
    frontier_snapshot_every: int = 1,
    seen_filter: str = "bloom",
    cuckoo_entries: int = 1 << 16,
    priority_df: DataFrame | str | None = None,
) -> CrawlStats:
    """Run (or resume) the crawl to completion; state lives in the store.

    ``write_partitions`` caps files per round table — right for local/bench
    scale; pass None on a real cluster for natural partitioning.

    ``frontier_snapshot_every=N`` writes the frontier snapshot every N
    rounds; in between, the frontier is merge-on-read (``discoveries ≤ R``
    anti-join ``pages ≤ R`` via ``store.rebuild_frontier``) — the round
    loses one write job, at the cost of reading the discovery log. Choose
    by shape: write-bound short-frontier crawls want a large N; a
    10^10-row frontier whose discovery log dwarfs it wants N=1.

    ``seen_filter`` picks the approximate URL-seen layer (the north
    rule's "bloom/cuckoo" pair): ``"bloom"`` (default — smaller per key,
    embarrassingly-parallel OR adds, append-only) or ``"cuckoo"``
    (``operators.cuckoo.CuckooSeenSet`` — same bucketed layout and probe
    contract, plus DELETE, which is what makes :func:`retract_urls`
    recrawl campaigns scale; ``cuckoo_entries`` × 4 slots per bucket).
    Both filters drive the identical crawl (goldens assert it): the exact
    seen-log re-check is the correctness authority, the filter only
    bounds how much of it each round reads. Resume with the same
    ``seen_filter`` the store was written with.

    ``priority_df`` is the DISTRIBUTED host-priority feed — a DataFrame
    or parquet path with columns ``(host, priority)`` (what the mined
    ``operators.graphrank.host_ranks_df`` / ``fused_host_priority_df``
    return). It takes precedence over ``config.priority`` (the
    dict-shaped feed the serial oracle shares) and never passes through
    driver memory: the scheduler joins it AQE-sized per round, so a
    10^8-host rank table costs one ordinary join instead of a driver
    dict whose row count is the host universe. Golden-tested equal to
    the dict feed at equal scores."""
    if config.round_capacity < 0:
        # a negative cap would silently schedule nothing here while the
        # serial oracle's list slice would keep all-but-the-last rows
        raise ValueError(
            f"round_capacity must be >= 0, got {config.round_capacity}"
        )
    store = CrawlStore(spark, store_root, max_write_partitions=write_partitions)
    robots_ok = _robots_filter_udf(spark, config)
    budget_df, budget_default = _budget_df(spark, config)
    # host-priority table. Two feeds, one contract (host -> score):
    #  - ``priority_df`` (DataFrame or parquet path, columns
    #    (host, priority)) — the DISTRIBUTED feed: the rank table stays
    #    an executor-side DataFrame end-to-end, never a driver dict, so
    #    a 10^8-host universe (where a collect() would OOM the driver)
    #    costs one ordinary join per round and AQE picks broadcast vs
    #    shuffle by its actual size. Mined feeds
    #    (operators.graphrank.host_ranks_df / fused_host_priority_df)
    #    return exactly this shape; takes precedence over the dict.
    #  - ``config.priority`` (dict) — the serial-oracle-shaped feed for
    #    tests and small curated lists; broadcast-hinted because a dict
    #    that fit in driver memory is broadcast-sized by construction.
    # None keeps the default BFS path join-free.
    prio_df = None
    prio_hint = F.broadcast  # dict feed: politeness-table-sized
    if priority_df is not None:
        if isinstance(priority_df, str):
            priority_df = spark.read.parquet(priority_df)
        missing = {"host", "priority"} - set(priority_df.columns)
        if missing:
            raise ValueError(
                f"priority_df needs columns (host, priority); missing "
                f"{sorted(missing)} in {priority_df.columns}"
            )
        # the rank table joins once per round for the whole crawl —
        # persist so rounds scan executor memory (spilling to local disk
        # at 10^8-host sizes), not the parquet files, every round.
        # max-per-host first: the dict feed was duplicate-free by
        # construction, but a parquet feed (e.g. a union of signal
        # exports) can carry a host twice, and a duplicate key in this
        # left join would schedule the same URL twice in one round —
        # one host-keyed aggregation at crawl START (not per round)
        # buys the uniqueness invariant deterministically (max beats
        # dropDuplicates' partition-order pick).
        prio_df = (
            priority_df.select(
                "host", F.col("priority").cast("double").alias("_hp")
            )
            .groupBy("host")
            .agg(F.max("_hp").alias("_hp"))
            .persist()
        )
        prio_hint = lambda df: df  # let AQE size the join  # noqa: E731
    elif config.priority:
        prio_df = spark.createDataFrame(
            [(h, float(p)) for h, p in config.priority.items()],
            "host string, _hp double",
        )
    # DUST canonicalization rules (config.dust_rules — broadcast-sized
    # like priority/budgets: rules per site, not per page). The
    # per-host sorted-array form apply_dust_rules consumes is built
    # DRIVER-SIDE from the config list — a literal local relation, so
    # the per-round apply join re-broadcasts a constant instead of
    # re-running an aggregation (and there is no persisted DataFrame
    # to leak if a round aborts); see operators/dust.py.
    dust_df = None
    if config.dust_rules:
        by_host: dict[str, list[tuple[str, str]]] = {}
        for h, f, t in sorted(config.dust_rules, key=lambda r: (r[1], r[2])):
            by_host.setdefault(h, []).append((f, t))
        dust_df = spark.createDataFrame(
            [(h, rl) for h, rl in sorted(by_host.items())],
            "_rhost string, _rules array<struct<f:string,t:string>>",
        )

    corpus_slim = corpus.select(
        F.col("url"),
        F.col("html").alias("_c_html"),
        F.col("content_type").alias("_c_ct"),
        F.col("status").alias("_c_status"),
        F.col("retry_after").alias("_c_retry"),
    )

    stats = CrawlStats()
    cooldown: dict[str, int] = {}
    empty_streak = 0  # consecutive rounds scheduling nothing (period wait)

    # the filter's shape, recorded in the store at crawl start and
    # validated on resume: geometry is not recoverable from the snapshot
    # bytes, and a silent mismatch (different bits/buckets/entries)
    # probes the loaded state at the wrong positions — false NEGATIVES,
    # already-crawled urls bypassing the exact re-check
    geometry = {"seen_filter": seen_filter, "buckets": bloom_buckets}
    if seen_filter == "cuckoo":
        geometry["entries"] = cuckoo_entries
    else:
        geometry["bits"] = bloom_bits

    last = store.resume_round() if resume else None
    if last is None:
        if not resume:
            stale = store.committed_rounds()
            if stale:
                # starting fresh over a store with committed rounds
                # would overwrite the early rounds but leave later
                # manifests behind — a subsequent resume would pick up
                # the OLD crawl's last round mixed with the new tables.
                # Refuse rather than wipe: the driver never deletes a
                # store it did not just create.
                raise ValueError(
                    f"store at {store_root} already holds committed "
                    f"rounds {stale[:3]}{'...' if len(stale) > 3 else ''} "
                    f"— pass resume=True to continue that crawl, or "
                    f"point store_root at a fresh directory"
                )
        frontier = seed_discoveries(spark, seeds, config)
        n_frontier = frontier.count()
        bloom = _seen_filter_empty(
            spark, seen_filter, bloom_buckets, bloom_bits, cuckoo_entries
        )
        bloom = bloom.add(frontier.select("url"))
        start_round = 0
        seed_disc = frontier  # committed with round 0
        have_bloom_snapshot = False  # round 0 must write the first one
        store.write_filter_geometry(geometry)
    else:
        import os as _os

        stored_geo = store.read_filter_geometry()
        if stored_geo is not None and stored_geo != geometry:
            raise ValueError(
                f"seen-filter geometry mismatch: store was written with "
                f"{stored_geo}, resume asked for {geometry} — resume "
                f"with the geometry the crawl started with"
            )
        if stored_geo is None:  # pre-geometry store: record for later
            store.write_filter_geometry(geometry)
        store.backfill_seen(bloom_buckets, last)
        # consumed retraction records (url already recrawled) retire here
        # so one campaign doesn't permanently tax every future resume
        store.retire_retractions()
        if store.has_retractions():
            # retracted urls resurface via their original discovery rows
            # only on the merge-on-read path (the frontier snapshot
            # predates the retraction); their count invalidates the
            # manifest's frontier_size, so pay one count job here —
            # retraction resumes are campaign events, not per-round cost
            frontier = store.rebuild_frontier(last)
            n_frontier = frontier.count()
        elif _os.path.isdir(store.table_round_path("frontier", last)):
            frontier = store.read_snapshot("frontier", last, DISC_SCHEMA)
            n_frontier = int(
                store.read_manifest(last)["metrics"]["frontier_size"]
            )
        else:  # between snapshots: merge-on-read from the logs
            frontier = store.rebuild_frontier(last)
            n_frontier = int(
                store.read_manifest(last)["metrics"]["frontier_size"]
            )
        cd = store.read_snapshot("cooldown", last, COOLDOWN_SCHEMA).collect()
        cooldown = {r["host"]: r["expire_round"] for r in cd}
        # newest filter checkpoint at or below `last`: empty (cooldown/
        # period-wait) rounds skip the rewrite of an unchanged filter,
        # so `last` itself may have no snapshot
        bloom_rnd = store.latest_snapshot_round("bloom", last)
        if bloom_rnd is None:
            raise ValueError(
                f"no seen-filter checkpoint at or below round {last} in "
                f"{store_root} — store is corrupt or was pruned past its "
                f"last filter snapshot"
            )
        bloom = _seen_filter_load(
            spark, store.table_round_path("bloom", bloom_rnd), seen_filter,
            bloom_buckets, bloom_bits, cuckoo_entries,
        )
        have_bloom_snapshot = True
        if store.has_retractions():
            # apply pending retractions to the LOADED filter, never the
            # on-disk snapshot (an in-place overwrite of a committed
            # checkpoint would break the store's crash-safety — the
            # mutated state persists through the NEXT round's normal
            # atomic commit instead, and reapplying on a re-resume is
            # idempotent because the disk state is unchanged until then):
            #   1. cuckoo: DELETE the pending fingerprints (bloom cannot;
            #      its stale positives just pay the exact-join path);
            #   2. re-ADD urls that resurfaced in the frontier — they are
            #      DISCOVERED again, and the filter must stay a superset
            #      of discovered ∪ seen or a link to a retracted url
            #      during its own recrawl round probes filter-negative,
            #      bypasses the exact re-check, and double-crawls it.
            ret_urls = store.read_retractions().select("url")
            if hasattr(bloom, "delete"):
                bloom = bloom.delete(ret_urls)
            bloom = bloom.add(
                frontier.join(F.broadcast(ret_urls), "url", "left_semi")
                .select("url")
            )
        start_round = last + 1
        seed_disc = None

    frontier = frontier.cache()
    _reload_prev = 0.0  # end-of-round state-reload cost, surfaced in the NEXT round's manifest

    for rnd in range(start_round, config.max_rounds):
        # frontier size is tracked from the previous commit — no extra job
        if n_frontier == 0:
            break

        # tag every job of the round (scheduler, sequencing, writes) so
        # the manifest can record the per-round Spark job count — the
        # number the fixed-cost budget tracks
        job_group = f"crawl-round-{rnd}"
        spark.sparkContext.setJobGroup(job_group, f"crawl round {rnd}")
        _round_t0 = time.perf_counter()

        # -- eligibility: cooldown anti-join (broadcast, one row per host) --
        active_cd = [(h, e) for h, e in cooldown.items() if e >= rnd]
        eligible = frontier
        if active_cd:
            cd_df = spark.createDataFrame(active_cd, COOLDOWN_SCHEMA)
            eligible = frontier.join(F.broadcast(cd_df), "host", "left_anti")

        # -- per-host politeness budget (skew-salted two-phase top-k) ------
        if config.budget_periods:
            # periodic budgets change per round — rebuild the (tiny)
            # broadcast table from the config dicts
            budget_df, budget_default = _budget_df(spark, config, rnd)
        eligible = eligible.join(F.broadcast(budget_df), "host", "left").withColumn(
            "_k", F.coalesce(F.col("_bk"), F.lit(budget_default))
        )
        # -- optional global round budget (fair-share across hosts) -------
        # Hamilton apportionment of config.global_budget over each host's
        # consumable demand min(pending, politeness budget); the per-host
        # cap becomes the grant. One host-dimension count-agg per round
        # plus allocate_budget's two O(1) scalar jobs — the frontier
        # itself never re-shuffles. Serial twin: oracle hamilton_grants
        # (golden-matched); IEEE-double quota arithmetic is identical on
        # both sides.
        if config.global_budget:
            from crawler_spark.operators.allocate import allocate_budget

            demand = (
                eligible.groupBy("host", "_k")
                .agg(F.count("*").alias("_pend"))
                .select(
                    "host",
                    F.least(
                        F.col("_pend"), F.col("_k").cast("long")
                    ).alias("n_pending"),
                )
            )
            grants = allocate_budget(
                demand, config.global_budget, small_hint=n_frontier
            ).select("host", F.col("granted").alias("_g"))
            eligible = (
                eligible.join(F.broadcast(grants), "host", "left")
                .withColumn(
                    "_k", F.coalesce(F.col("_g"), F.lit(0)).cast("int")
                )
                .drop("_g")
            )
        scheduled = topk_per_group(
            eligible, ["host"], ["disc_round", "disc_seq"], F.col("_k"), salt=8
        ).drop("_bk", "_k", "_rank")

        # -- deterministic global crawl order ------------------------------
        # default: pure BFS (disc_round, disc_seq) — the reference's FIFO
        # pop. With host priorities configured (north-rule priority
        # queue), the order key becomes (priority DESC, BFS): one more
        # join against the rank table — broadcast-hinted for the dict
        # feed, AQE-sized for the distributed priority_df feed.
        _t0 = time.perf_counter()
        order_cols = ["disc_round", "disc_seq"]
        if prio_df is not None:
            scheduled = (
                scheduled.join(prio_hint(prio_df), "host", "left")
                .withColumn(
                    "_nprio", -F.coalesce(F.col("_hp"), F.lit(0.0))
                )
                .drop("_hp")
            )
            order_cols = ["_nprio", "disc_round", "disc_seq"]
        # the tracked frontier size is a hard row bound for the schedule —
        # small rounds take with_global_seq's one-job bounded path, big
        # rounds (the 10^10-frontier shape) the range-partitioned one
        scheduled, n_scheduled = with_global_seq(
            scheduled, order_cols, out="seq",
            return_count=True, small_hint=n_frontier,
        )
        if prio_df is not None:
            scheduled = scheduled.drop("_nprio")
        if config.round_capacity and n_scheduled > config.round_capacity:
            # global round capacity: keep the top of the priority order;
            # overflow is never popped, so it stays in the frontier (the
            # frontier_rem anti-join below only removes scheduled urls)
            scheduled = scheduled.where(
                F.col("seq") < F.lit(config.round_capacity)
            )
            n_scheduled = config.round_capacity
        scheduled = scheduled.cache()
        phase_t = {"schedule": round(time.perf_counter() - _t0, 3)}
        if _reload_prev:
            # end-of-previous-round state reload (committed frontier +
            # seen-filter re-read) — it prepares THIS round, so it is
            # this round's fixed cost
            phase_t["reload"] = _reload_prev
            _reload_prev = 0.0
        phase_t["_round_t0"] = _round_t0
        if n_scheduled == 0:
            # wait for periodic budgets only while a full period cycle
            # hasn't yet passed without progress: if max(period)
            # consecutive non-cooling rounds schedule nothing, every
            # remaining frontier entry is permanently unschedulable (e.g.
            # budget 0) and waiting longer only burns empty commits.
            # Cooling rounds don't consume the period-wait allowance — a
            # cooldown longer than the period must not starve the host
            # whose on-round falls right after expiry. Same logic in the
            # serial oracle (golden-matched).
            cooling = any(e >= rnd for e in cooldown.values())
            pending_periodic = (
                bool(config.budget_periods)
                and empty_streak < max(config.budget_periods.values())
            )
            if not cooling:
                empty_streak += 1
            if cooling or pending_periodic:
                # everything eligible is cooling, or periodic budgets are
                # configured and this may be an off round for what's left
                # — commit an empty round so round numbering (and
                # cooldown/period cadence) stays resumable.
                # Pending seed discoveries commit HERE (otherwise a crash
                # during a cooldown stretch would leave them out of the
                # discovery log and the rebuild-from-logs frontier path
                # would lose them); the unchanged frontier honors the
                # snapshot interval.
                disc_empty = (
                    seed_disc
                    if seed_disc is not None
                    else spark.createDataFrame([], DISC_SCHEMA)
                )
                seed_disc = None
                rc = _RoundCommit(
                    store, rnd, spark, bloom.n_buckets, job_group=job_group
                )
                rc.begin(_empty_pages(spark), _empty_links(spark))
                # an empty round adds nothing to the filter — skip the
                # full-state checkpoint rewrite (at 10^10-frontier scale
                # that state is GBs; a 50-round cooldown wait must not
                # rewrite it 50 times for zero change) UNLESS no snapshot
                # exists on disk yet (first round of a fresh crawl: the
                # seed urls live only in the in-memory filter). Resume
                # falls back to latest_snapshot_round; the in-memory
                # retraction mutations are reconstructable because the
                # retraction records retire only after recrawl.
                rc.finish(disc_empty, frontier, cooldown, bloom, stats,
                          n_frontier=n_frontier,
                          write_frontier=(
                              (rnd % max(1, frontier_snapshot_every)) == 0
                          ),
                          write_bloom=not have_bloom_snapshot)
                have_bloom_snapshot = True
                scheduled.unpersist()
                continue
            scheduled.unpersist()
            break
        empty_streak = 0

        # -- simulated fetch ----------------------------------------------
        fetched = scheduled.join(corpus_slim, "url", "left")
        fetched = fetched.withColumn(
            "type",
            F.when(
                F.col("_c_ct").contains("text/html"), F.lit("html")
            ).otherwise(F.lit("error")),
        ).withColumn(
            "status", F.coalesce(F.col("_c_status"), F.lit(-100)).cast("int")
        )
        fetched = fetched.cache()

        # extracted text per url (the byte-identical per-row invariant) is
        # fused onto the pages row — one write instead of two; retry_after
        # rides along so 429-cooldown events come from the written parquet
        # (driver-side footer read in _commit) instead of a collect job
        pages_df = fetched.select(
            "seq", "url", "host", "status", "type",
            F.when(
                F.col("type") == "html",
                F.array_join(extract_text_udf("_c_html"), "\n"),
            ).alias("text"),
            F.col("_c_retry").cast("int").alias("retry_after"),
        )

        # -- link extraction (Arrow-batched pandas UDF) --------------------
        links = (
            fetched.where(F.col("type") == "html")
            .select(
                "seq",
                F.col("url").alias("source"),
                F.col("host").alias("source_host"),
                F.explode(extract_links_udf("_c_html", "url")).alias("l"),
            )
            .select(
                "seq",
                "source",
                "source_host",
                F.col("l.url").alias("url"),
                F.col("l.host").alias("host"),
                F.col("l.link_pos").alias("link_pos"),
            )
            .cache()
        )

        # -- fetch-side writes start NOW, overlapping the discovery work --
        # pages/links/seen depend only on the scheduled fetch; submitting
        # them before the sequencing job below means the round's widest
        # write (pages, which evaluates the text-extraction UDF) runs
        # concurrently with link filtering + the seen probe + sequencing
        rc = _RoundCommit(store, rnd, spark, bloom.n_buckets,
                          job_group=job_group)
        rc.begin(pages_df, links.drop("seq"))

        try:
            # -- frontier merge: filter → dedup-first-occurrence → seen ----
            frontier_rem = frontier.join(
                scheduled.select("url"), "url", "left_anti"
            ).select("disc_round", "disc_seq", "url", "host")

            cands = links.where(
                F.col("url").startswith("http://") | F.col("url").startswith("https://")
            )
            if config.limit_to:
                cands = cands.where(F.col("host") == config.limit_to)
            if dust_df is not None:
                # rewrite BEFORE robots (robots judges the fetched URL)
                # and before the first-occurrence dedup + seen probe, so
                # known DUST twins collapse onto their canonical form
                # and never refetch (oracle mirror:
                # CrawlConfig.dust_canonical)
                cands = (
                    apply_dust_rules(cands, dust_df)
                    .withColumn("url", F.col("canonical_url"))
                    .drop("canonical_url", "dust_applied")
                )
            if config.robots:
                # only pay the Python round-trip when rules exist (empty rule
                # set allows everything — robots_allowed() default)
                cands = cands.where(robots_ok("host", "url"))
            cands = (
                cands.groupBy("url", "host")
                .agg(F.min(F.struct("seq", "link_pos")).alias("_first"))
                .select(
                    "url",
                    "host",
                    F.col("_first.seq").alias("_src_seq"),
                    F.col("_first.link_pos").alias("_src_pos"),
                )
            )

            # exact re-check build side: the committed url-only seen log,
            # PRUNED to the bloom-positive buckets (store.read_seen pushes
            # `bucket IN` into the parquet scan) — the full pages history
            # never rescans — plus this round's in-flight urls
            def _seen_hist(buckets, _sched=scheduled, _rem=frontier_rem):
                return (
                    store.read_seen(buckets).select("url")
                    .unionByName(_sched.select("url"))
                    .unionByName(_rem.select("url"))
                )

            unseen = bloom.filter_unseen(cands, seen_for_buckets=_seen_hist)

            _t0 = time.perf_counter()
            # small_hint here is an ESTIMATE, not a tracked bound: scheduled
            # pages × a generous links-per-page factor. A corpus where a
            # small round discovers millions of urls degrades to one slow
            # (still correct) sort task; rounds big enough for that to matter
            # exceed the threshold and take the range path anyway.
            seq_disc, n_new = with_global_seq(
                unseen, ["_src_seq", "_src_pos"], out="disc_seq",
                return_count=True, small_hint=n_scheduled * 64,
            )
            phase_t["extract_seen"] = round(time.perf_counter() - _t0, 3)
            new_disc = (
                seq_disc.withColumn("disc_round", F.lit(rnd))
                .select("disc_round", "disc_seq", "url", "host")
            )

            if seed_disc is not None:
                disc_to_commit = seed_disc.unionByName(new_disc)
                seed_disc = None
            else:
                disc_to_commit = new_disc

            next_frontier = frontier_rem.unionByName(new_disc)
            bloom = bloom.add(new_disc.select("url"))

            # -- atomic round commit -------------------------------------------
            # frontier size tracked arithmetically: previous size minus the
            # scheduled rows plus this round's new discoveries — no count job
            n_frontier = n_frontier - n_scheduled + n_new
            snap = (rnd % max(1, frontier_snapshot_every)) == 0
            rc.finish(
                disc_to_commit, next_frontier, cooldown, bloom, stats,
                n_frontier=n_frontier, config=config, phase_timings=phase_t,
                write_frontier=snap,
            )
            have_bloom_snapshot = True
        except BaseException:
            # drain the fetch-side writers begun above before unwinding —
            # see _RoundCommit.abort (no manifest was written, so resume
            # still sees a clean round boundary)
            rc.abort()
            raise

        # re-read committed state → bounded lineage across rounds; the
        # with_global_seq checkpoints free themselves via the
        # ContextCleaner once these per-round frames are dereferenced
        frontier.unpersist()
        scheduled.unpersist()
        fetched.unpersist()
        links.unpersist()
        _t0 = time.perf_counter()
        if snap:
            frontier = store.read_snapshot("frontier", rnd, DISC_SCHEMA)
        else:
            frontier = store.rebuild_frontier(rnd)
        frontier = frontier.cache()
        bloom = _seen_filter_load(
            spark, store.table_round_path("bloom", rnd), seen_filter,
            bloom_buckets, bloom_bits, cuckoo_entries,
        )
        _reload_prev = round(time.perf_counter() - _t0, 3)

    if priority_df is not None:
        prio_df.unpersist()
    return stats


def retract_urls(
    spark: SparkSession, store_root: str, urls: list[str]
) -> int:
    """Mark crawled ``urls`` for RECRAWL: the next
    ``run_crawl(..., resume=True)`` resurfaces them in the frontier via
    their original discovery records and fetches them one more time.

    Writes ONLY the retraction log (``CrawlStore.retract``) — it never
    touches the committed filter snapshot, so no filter geometry is
    needed here and there is no non-atomic in-place rewrite to crash
    through. The resume path applies the filter consequences: under
    ``seen_filter="cuckoo"`` the pending fingerprints are DELETED at
    load time (the operation bloom cannot do — a mass recrawl campaign
    would otherwise leave every retracted url a permanent
    approximate-filter positive paying the exact-join path forever),
    resurfaced urls are re-added, and the mutated filter persists
    through the next round's normal atomic commit. Consumed records
    retire on the following resume. Returns the retraction watermark
    round (-1 when nothing was ever committed)."""
    return CrawlStore(spark, store_root).retract(urls)


def _empty_pages(spark):
    return spark.createDataFrame(
        [],
        "seq long, url string, host string, status int, type string, "
        "text string, retry_after int",
    )


def _empty_links(spark):
    return spark.createDataFrame(
        [],
        "source string, source_host string, url string, host string, "
        "link_pos int",
    )


def _hot_hosts_from_files(
    path: str, files: list[str]
) -> list[tuple[str, int | None]]:
    """(host, retry_after-of-min-seq) for hosts with a 429 row — read from
    the round's parquet files on the driver (they are budget-bounded)."""
    import os

    import pyarrow.parquet as pq

    frames = []
    cols = ["seq", "host", "status", "type", "retry_after"]
    for f in files:
        frames.append(
            pq.read_table(os.path.join(path, f), columns=cols).to_pandas()
        )
    pdf = pd.concat(frames, ignore_index=True)
    hot = pdf[(pdf["status"] == 429) & (pdf["type"] == "error")]
    if hot.empty:
        return []
    # NOT groupby().first(): pandas first() skips NaN per column and would
    # take a later row's retry_after when the min-seq row's is null —
    # diverging from the oracle (which uses the min-seq row verbatim)
    first = hot.sort_values("seq", kind="mergesort").drop_duplicates(
        subset="host", keep="first"
    ).sort_values("host")
    return [
        (r["host"], None if pd.isna(r["retry_after"]) else int(r["retry_after"]))
        for _, r in first.iterrows()
    ]


class _RoundCommit:
    """Two-stage concurrent round commit.

    The pages/links/seen writes depend only on the scheduled fetch, so
    :meth:`begin` submits them BEFORE the discovery-sequencing job runs
    and they overlap it; the discovery-dependent writes (discovery log,
    frontier snapshot, seen-filter checkpoint) join in :meth:`finish`.
    The round's commit wall drops from ``seq job + max(all writes)`` to
    ``max(fetch-side writes, seq job + max(discovery-side writes))``.
    (Concurrent evaluation of a shared cached partition is safe: the
    BlockManager's per-block loading lock makes one task compute it and
    the others wait.) A driver exception between begin and finish leaves
    orphan table files but NO manifest — the store's manifest-last
    atomicity keeps them invisible to resume, exactly as before.

    ``job_group`` tags every job of the round (including the scheduler's,
    via the driver's per-round ``setJobGroup``) so the manifest can record
    ``spark_jobs`` — the per-round job count the fixed-cost budget tracks.
    """

    def __init__(
        self,
        store: CrawlStore,
        rnd: int,
        spark: SparkSession,
        n_buckets: int,
        job_group: str | None = None,
    ):
        from concurrent.futures import ThreadPoolExecutor

        self.store, self.rnd, self.spark = store, rnd, spark
        self.n_buckets = n_buckets
        self.job_group = job_group
        self.timings: dict[str, float] = {}
        self._pool = ThreadPoolExecutor(max_workers=6)
        self._f: dict = {}

    def _submit(self, name, fn):
        def run():
            if self.job_group is not None:
                # per-thread on purpose: each pool thread pins its own JVM
                # thread (PYSPARK_PIN_THREAD), so the round's job group
                # must be re-set in every submitting thread
                self.spark.sparkContext.setLocalProperty(
                    "spark.jobGroup.id", self.job_group
                )
            t0 = time.perf_counter()
            out = fn()
            self.timings[name] = round(time.perf_counter() - t0, 3)
            return out

        return self._pool.submit(run)

    def abort(self) -> None:
        """Drain in-flight writes after a round-body failure.

        Blocks until every submitted write finishes, then closes the
        pool. Called when an exception escapes between :meth:`begin` and
        :meth:`finish`: without the drain the fetch-side writers keep
        appending round tables in the background while the caller
        unwinds, and a same-session ``run_crawl(resume=True)`` would race
        its orphan-table cleanup against them (two writers, one path).
        Manifest-last atomicity still hides whatever they wrote. Write
        errors are swallowed — the round already failed."""
        for fut in self._f.values():
            try:
                fut.result()
            except Exception:
                pass  # original round-body exception is what propagates
        self._pool.shutdown(wait=True)

    def begin(self, pages_df: DataFrame, links_df: DataFrame) -> None:
        """Submit the fetch-side writes (pages, links, url-only seen log).

        The url-only seen log gets one row per crawled page, keyed and
        sorted by its filter bucket so later rounds' ``bucket IN (...)``
        exact re-checks prune at row-group level; column pruning keeps the
        text-extraction UDF out of this projection's plan."""
        seen_df = pages_df.select(
            F.pmod(F.xxhash64("url"), F.lit(self.n_buckets))
            .cast("int")
            .alias("bucket"),
            "url",
        ).sortWithinPartitions("bucket")
        self._f["pages"] = self._submit(
            "w_pages",
            lambda: self.store.write_round_table("pages", self.rnd, pages_df),
        )
        self._f["links"] = self._submit(
            "w_links",
            lambda: self.store.write_round_table("links", self.rnd, links_df),
        )
        self._f["seen"] = self._submit(
            "w_seen",
            lambda: self.store.write_round_table("seen", self.rnd, seen_df),
        )

    def finish(self, *args, **kwargs) -> None:
        """Commit the round; on failure drain all writers before raising
        (``shutdown(wait=True)`` in the except covers the discovery-side
        futures local to :meth:`_finish` that :meth:`abort` can't see)."""
        try:
            self._finish(*args, **kwargs)
        except BaseException:
            self._pool.shutdown(wait=True)
            raise

    def _finish(
        self,
        disc_df: DataFrame,
        frontier_df: DataFrame,
        cooldown: dict[str, int],
        bloom: BloomSeenSet,
        stats: CrawlStats,
        n_frontier: int,
        config: CrawlConfig | None = None,
        phase_timings: dict[str, float] | None = None,
        write_frontier: bool = True,
        write_bloom: bool = True,
    ) -> None:
        rnd, store = self.rnd, self.store
        f_disc = self._submit(
            "w_discoveries",
            lambda: store.write_round_table("discoveries", rnd, disc_df),
        )
        f_frontier = (
            self._submit(
                "w_frontier",
                lambda: store.write_round_table("frontier", rnd, frontier_df),
            )
            if write_frontier
            else None
        )
        # write_bloom=False: empty round, filter unchanged since the last
        # written checkpoint — resume walks back to it
        f_bloom = (
            self._submit(
                "w_bloom",
                lambda: bloom.checkpoint(
                    store.table_round_path("bloom", rnd)
                ),
            )
            if write_bloom
            else None
        )

        lineage: dict[str, list[str]] = {}
        lineage["pages"], n_pages = self._f["pages"].result()
        # 429 cooldown updates, add-if-absent per host (storage.ts:216):
        # derived from the just-written pages parquet via a driver-side
        # pyarrow read (tiny files) — no dedicated Spark collect job
        cooldown_events: list[tuple[str, int]] = []
        if config is not None and n_pages:
            hot = _hot_hosts_from_files(
                store.table_round_path("pages", rnd), lineage["pages"]
            )
            for h, retry in hot:
                if cooldown.get(h, -1) >= rnd:
                    continue  # already cooling
                retry = (
                    DEFAULT_COOLDOWN_SECONDS if retry is None else int(retry)
                )
                expire = rnd + max(1, math.ceil(retry / config.round_seconds))
                cooldown[h] = expire
                cooldown_events.append((h, expire))
        lineage["links"], n_links = self._f["links"].result()
        lineage["seen"], _ = self._f["seen"].result()
        lineage["discoveries"], n_disc = f_disc.result()
        if f_frontier is not None:
            lineage["frontier"], _ = f_frontier.result()
        else:
            lineage["frontier"] = []  # merge-on-read round, no snapshot
        if f_bloom is not None:
            f_bloom.result()
        self._pool.shutdown(wait=True)

        # cooldown is driver-resident state (a small dict) — pyarrow
        # write, not a Spark job
        import pyarrow as pa

        cd_pdf = pd.DataFrame(
            {
                "host": list(cooldown),
                "expire_round": list(cooldown.values()),
            }
        )
        cd_schema = pa.schema(
            [("host", pa.string()), ("expire_round", pa.int32())]
        )
        t0 = time.perf_counter()
        lineage["cooldown"] = store.write_driver_table(
            "cooldown", rnd, cd_pdf, cd_schema
        )
        self.timings["w_cooldown"] = round(time.perf_counter() - t0, 3)
        lineage["bloom"] = ["bloom.parquet"] if f_bloom is not None else []

        timings = dict(phase_timings or {})
        t0 = timings.pop("_round_t0", None)
        timings.update(self.timings)
        if t0 is not None:
            # scheduling start → commit durable: the true per-round wall
            # (phase timings overlap, so they cannot be summed)
            timings["round_wall"] = round(time.perf_counter() - t0, 3)
        metrics = {
            "timings_sec": timings,
            "scheduled": n_pages,
            "links_found": n_links,
            "new_discoveries": n_disc,
            "frontier_size": n_frontier,
            "cooldown_events": cooldown_events or [],
            "active_cooldowns": sorted(
                h for h, e in cooldown.items() if e >= rnd
            ),
        }
        if self.job_group is not None:
            try:
                metrics["spark_jobs"] = len(
                    self.spark.sparkContext.statusTracker()
                    .getJobIdsForGroup(self.job_group)
                )
            except Exception:
                pass  # diagnostics only — never fail a commit over it
        store.commit_round(rnd, metrics, lineage)
        stats.rounds += 1
        stats.pages += n_pages
        stats.links += n_links
        stats.discoveries += n_disc
        stats.per_round.append({"round": rnd, **metrics})
