"""Round-synchronous crawl driver — the engine's flagship pipeline.

Spark re-expression of the reference's serial crawl loop (``crawl.ts:41-71``
driver, ``storage.ts:137-200`` pop, ``page.ts:136-219`` fetch/extract,
``storage.ts:82-112`` queue update, ``workers/crawler.ts:21-32`` cooldown)
as iterative batch rounds. Each round:

    frontier ──anti-join── cooldown (broadcast, tiny)
             ──topk_per_group── per-host politeness budget (skew-salted)
             ──with_global_seq── deterministic (round, seq) crawl order
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


def _robots_filter_udf(config: CrawlConfig):
    """Vectorized robots allow/deny over (host, url) with broadcast rules."""
    rules = list(config.robots)

    @F.pandas_udf("boolean")
    def robots_ok(hosts: pd.Series, urls: pd.Series) -> pd.Series:
        from crawler_spark.oracle.crawloracle import _url_path

        cfg = CrawlConfig(robots=rules)
        return pd.Series(
            [
                cfg.robots_allowed(h or "", _url_path(u or ""))
                for h, u in zip(hosts, urls)
            ]
        )

    return robots_ok


def _budget_df(spark: SparkSession, config: CrawlConfig) -> tuple[DataFrame, int]:
    default = config.budgets.get("*", 1 << 30)
    rows = [(h, k) for h, k in config.budgets.items() if h != "*"]
    df = spark.createDataFrame(rows or [("__none__", 0)], "host string, _bk int")
    return df, default


def seed_discoveries(
    spark: SparkSession, seeds: list[str], config: CrawlConfig
) -> DataFrame:
    """Seeds become disc_round = -1 discoveries; disc_seq = seed-list index
    (pre-filter, matching the oracle's enumerate order)."""
    rows = []
    for i, url in enumerate(seeds):
        host = get_hostname(url)
        if not is_fetchable(url):
            continue
        if config.limit_to and host != config.limit_to:
            continue
        from crawler_spark.oracle.crawloracle import _url_path

        if not config.robots_allowed(host, _url_path(url)):
            continue
        rows.append((-1, i, url, host))
    return spark.createDataFrame(rows, DISC_SCHEMA)


def run_crawl(
    spark: SparkSession,
    corpus: DataFrame,
    seeds: list[str],
    config: CrawlConfig,
    store_root: str,
    bloom_buckets: int = 16,
    bloom_bits: int = 1 << 18,
    resume: bool = False,
) -> CrawlStats:
    """Run (or resume) the crawl to completion; state lives in the store."""
    store = CrawlStore(spark, store_root)
    robots_ok = _robots_filter_udf(config)
    budget_df, budget_default = _budget_df(spark, config)

    corpus_slim = corpus.select(
        F.col("url"),
        F.col("html").alias("_c_html"),
        F.col("content_type").alias("_c_ct"),
        F.col("status").alias("_c_status"),
        F.col("retry_after").alias("_c_retry"),
    )

    stats = CrawlStats()
    cooldown: dict[str, int] = {}

    last = store.resume_round() if resume else None
    if last is None:
        frontier = seed_discoveries(spark, seeds, config)
        n_frontier = frontier.count()
        bloom = BloomSeenSet.empty(spark, bloom_buckets, bloom_bits)
        bloom = bloom.add(frontier.select("url"))
        start_round = 0
        seed_disc = frontier  # committed with round 0
    else:
        frontier = store.read_snapshot("frontier", last, DISC_SCHEMA)
        n_frontier = int(
            store.read_manifest(last)["metrics"]["frontier_size"]
        )
        cd = store.read_snapshot("cooldown", last, COOLDOWN_SCHEMA).collect()
        cooldown = {r["host"]: r["expire_round"] for r in cd}
        bloom = BloomSeenSet.load(
            spark, store.table_round_path("bloom", last), bloom_buckets,
            bloom_bits,
        )
        start_round = last + 1
        seed_disc = None

    frontier = frontier.cache()

    for rnd in range(start_round, config.max_rounds):
        # frontier size is tracked from the previous commit — no extra job
        if n_frontier == 0:
            break

        # -- eligibility: cooldown anti-join (broadcast, one row per host) --
        active_cd = [(h, e) for h, e in cooldown.items() if e >= rnd]
        eligible = frontier
        if active_cd:
            cd_df = spark.createDataFrame(active_cd, COOLDOWN_SCHEMA)
            eligible = frontier.join(F.broadcast(cd_df), "host", "left_anti")

        # -- per-host politeness budget (skew-salted two-phase top-k) ------
        eligible = eligible.join(F.broadcast(budget_df), "host", "left").withColumn(
            "_k", F.coalesce(F.col("_bk"), F.lit(budget_default))
        )
        scheduled = topk_per_group(
            eligible, ["host"], ["disc_round", "disc_seq"], F.col("_k"), salt=8
        ).drop("_bk", "_k", "_rank")

        # -- deterministic global crawl order ------------------------------
        scheduled = with_global_seq(
            scheduled, ["disc_round", "disc_seq"], out="seq"
        ).cache()
        n_scheduled = scheduled.count()
        if n_scheduled == 0:
            if any(e >= rnd for e in cooldown.values()):
                # everything eligible is cooling — commit an empty round so
                # round numbering (and cooldown expiry) stays resumable
                self_urls = spark.createDataFrame([], DISC_SCHEMA)
                _commit(store, rnd, spark, _empty_pages(spark),
                        _empty_links(spark), self_urls, frontier, cooldown,
                        bloom, stats, n_frontier=n_frontier)
                continue
            break

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

        pages_df = fetched.select(
            "seq", "url", "host", "status", "type"
        )

        # extracted text per url — the byte-identical per-row invariant
        page_text_df = fetched.where(F.col("type") == "html").select(
            "url",
            F.array_join(extract_text_udf("_c_html"), "\n").alias("text"),
        )

        # -- cooldown updates (429s), add-if-absent per host ---------------
        hot = (
            fetched.where((F.col("status") == 429) & (F.col("type") == "error"))
            .groupBy("host")
            .agg(F.min_by("_c_retry", "seq").alias("retry_after"))
            .collect()
        )
        cooldown_events = []
        for r in hot:
            h = r["host"]
            if cooldown.get(h, -1) >= rnd:
                continue  # already cooling (storage.ts:216 add-if-absent)
            retry = r["retry_after"]
            retry = DEFAULT_COOLDOWN_SECONDS if retry is None else int(retry)
            expire = rnd + max(1, math.ceil(retry / config.round_seconds))
            cooldown[h] = expire
            cooldown_events.append((h, expire))

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

        # -- frontier merge: filter → dedup-first-occurrence → seen --------
        frontier_rem = frontier.join(
            scheduled.select("url"), "url", "left_anti"
        ).select("disc_round", "disc_seq", "url", "host")

        cands = links.where(
            F.col("url").startswith("http://") | F.col("url").startswith("https://")
        )
        if config.limit_to:
            cands = cands.where(F.col("host") == config.limit_to)
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

        exact_seen = (
            store.read_pages().select("url")
            .unionByName(scheduled.select("url"))
            .unionByName(frontier_rem.select("url"))
        )
        unseen = bloom.filter_unseen(cands, exact_seen)

        new_disc = (
            with_global_seq(unseen, ["_src_seq", "_src_pos"], out="disc_seq")
            .withColumn("disc_round", F.lit(rnd))
            .select("disc_round", "disc_seq", "url", "host")
        ).cache()

        if seed_disc is not None:
            disc_to_commit = seed_disc.unionByName(new_disc)
            seed_disc = None
        else:
            disc_to_commit = new_disc

        next_frontier = frontier_rem.unionByName(new_disc).cache()
        bloom = bloom.add(new_disc.select("url"))

        # -- atomic round commit -------------------------------------------
        n_frontier = next_frontier.count()
        _commit(
            store, rnd, spark, pages_df, links.drop("seq"), disc_to_commit,
            next_frontier, cooldown, bloom, stats,
            n_frontier=n_frontier, cooldown_events=cooldown_events,
            page_text_df=page_text_df,
        )

        # re-read committed state → bounded lineage across rounds
        frontier.unpersist()
        scheduled.unpersist()
        fetched.unpersist()
        links.unpersist()
        frontier = store.read_snapshot("frontier", rnd, DISC_SCHEMA).cache()
        bloom = BloomSeenSet.load(
            spark, store.table_round_path("bloom", rnd), bloom_buckets,
            bloom_bits,
        )

    return stats


def _empty_pages(spark):
    return spark.createDataFrame(
        [], "seq long, url string, host string, status int, type string"
    )


def _empty_links(spark):
    return spark.createDataFrame(
        [],
        "source string, source_host string, url string, host string, "
        "link_pos int",
    )


def _commit(
    store: CrawlStore,
    rnd: int,
    spark: SparkSession,
    pages_df: DataFrame,
    links_df: DataFrame,
    disc_df: DataFrame,
    frontier_df: DataFrame,
    cooldown: dict[str, int],
    bloom: BloomSeenSet,
    stats: CrawlStats,
    n_frontier: int,
    cooldown_events: list[tuple[str, int]] | None = None,
    page_text_df: DataFrame | None = None,
) -> None:
    lineage: dict[str, list[str]] = {}
    lineage["pages"] = store.write_round_table("pages", rnd, pages_df)
    if page_text_df is None:
        page_text_df = spark.createDataFrame([], "url string, text string")
    lineage["page_text"] = store.write_round_table("page_text", rnd, page_text_df)
    lineage["links"] = store.write_round_table("links", rnd, links_df)
    lineage["discoveries"] = store.write_round_table("discoveries", rnd, disc_df)
    lineage["frontier"] = store.write_round_table("frontier", rnd, frontier_df)
    cd_df = spark.createDataFrame(
        [(h, e) for h, e in cooldown.items()] or [], COOLDOWN_SCHEMA
    )
    lineage["cooldown"] = store.write_round_table("cooldown", rnd, cd_df)
    bloom.checkpoint(store.table_round_path("bloom", rnd))
    lineage["bloom"] = ["bloom.parquet"]

    n_pages = pages_df.count()
    n_links = links_df.count()
    n_disc = disc_df.count()
    metrics = {
        "scheduled": n_pages,
        "links_found": n_links,
        "new_discoveries": n_disc,
        "frontier_size": n_frontier,
        "cooldown_events": cooldown_events or [],
        "active_cooldowns": sorted(
            h for h, e in cooldown.items() if e >= rnd
        ),
    }
    store.commit_round(rnd, metrics, lineage)
    stats.rounds += 1
    stats.pages += n_pages
    stats.links += n_links
    stats.discoveries += n_disc
    stats.per_round.append({"round": rnd, **metrics})
