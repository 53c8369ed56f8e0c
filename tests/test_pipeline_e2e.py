"""The complete product path in ONE test, public APIs only:

    crawl → learn phases → quality gate → exact dedup → shard export

i.e. everything a reference user runs (crawl + the learn CLI phases)
followed by the training-data tier the reference stops short of. Each
stage is golden/oracle/property-tested on its own elsewhere; this test
pins the COMPOSITION: stage outputs feed the next stage's input contract
without adapters, and the exported shards contain exactly the curated
survivors.
"""

from pyspark.sql import functions as F

from crawler_spark.analytics.learn import learn_outputs
from crawler_spark.crawl.driver import run_crawl
from crawler_spark.crawl.store import CrawlStore
from crawler_spark.fixtures.webgen import generate
from crawler_spark.operators.dedup import dedup_exact
from crawler_spark.operators.packing import export_shards
from crawler_spark.operators.quality import quality_scores
from crawler_spark.oracle.crawloracle import CrawlConfig, crawl_oracle
from tests.test_crawl_golden import _to_spark_corpus


def test_crawl_learn_curate_export(spark, tmp_path):
    web = generate(seed=13, n_pages=80)
    cfg = CrawlConfig(
        budgets={r.host: int(r.budget_per_round)
                 for r in web.politeness.itertuples()},
        robots=[(r.host, r.rule, bool(r.allow))
                for r in web.robots.itertuples()],
        max_rounds=6,
    )
    root = str(tmp_path / "store")
    corpus = _to_spark_corpus(spark, web.pages)
    stats = run_crawl(spark, corpus, web.seeds.url.tolist(), cfg, root,
                      bloom_buckets=8, bloom_bits=1 << 16)
    assert stats.pages > 0
    store = CrawlStore(spark, root)

    # -- learn phases over the finished store --------------------------
    learned = learn_outputs(store, corpus, ["terms", "tags", "links"])
    assert learned["terms"].count() > 0
    assert learned["links"].count() > 0

    # -- curation over the crawled text (store output IS the corpus
    #    input of the training tier — no adapter) ----------------------
    docs = (
        store.read_page_text()
        .where(F.length("text") > 0)
        .select(F.col("url").alias("doc_id"), "text")
    )
    n_docs = docs.count()
    assert n_docs > 0
    gated_ids = (
        quality_scores(docs).where(F.col("score") >= 0.2).select("doc_id")
    )
    gated = docs.join(gated_ids, "doc_id", "left_semi")
    unique = dedup_exact(gated, id_col="doc_id")
    n_unique = unique.count()
    assert 0 < n_unique <= gated.count() <= n_docs

    # -- training-shard export -----------------------------------------
    out = str(tmp_path / "shards")
    manifest = export_shards(
        unique.withColumn("lang", F.lit("en")), out, budget=500,
    )
    assert manifest["n_docs"] == n_unique
    shards = spark.read.parquet(out)
    assert shards.count() == n_unique
    assert shards.select("doc_id").distinct().count() == n_unique
    # exported text survives the round trip byte-identically
    back = shards.select("doc_id", F.col("text").alias("t"))
    diff = (
        unique.join(back, "doc_id")
        .where(~F.col("text").eqNullSafe(F.col("t")))
        .count()
    )
    assert diff == 0


def test_all_signals_resumed_session_golden(spark, tmp_path):
    """VERDICT r4 item 2: the full multi-session product loop with
    EVERY scheduler signal wired at once — priority (pagerank+trust
    RRF fusion, fed DISTRIBUTED via a parquet priority_df), mined DUST
    rules, robots, per-host budgets, and a global round capacity — and
    the session interrupted + resumed mid-crawl. The signals interact
    in the scheduler (priority orders the capacity cut, dust rewrites
    before robots, budgets bound within the cut); each is individually
    golden elsewhere, this pins the COMPOSITION: the resumed driver's
    full crawl order ≡ the serial oracle with all signals active, then
    a Cho–Garcia-Molina due set retracts and the resumed recrawl (all
    signals still loaded) refetches exactly the due URLs.
    """
    from pyspark.sql import types as T

    from crawler_spark.functions.urls import get_hostname
    from crawler_spark.operators.dust import mine_dust_rules_from_pages
    from crawler_spark.operators.freshness import due_for_recrawl
    from crawler_spark.operators.graphrank import fused_host_priority_df
    from crawler_spark.crawl.driver import retract_urls

    import pandas as pd

    # --- a three-host web with content twins (DUST fodder), cross-host
    #     links (rank/trust fodder), and a robots-blocked path ---------
    def page(url, html):
        return {
            "url": url, "warc_ts": None, "html": html.encode(),
            "text": None, "lang": "en", "content_type": "text/html",
            "status": 200, "retry_after": None,
        }

    def twin_html(n):
        return (
            f"<html><body><p>article {n} body shared by both twins</p>"
            f'<a href="http://b.test/page/{n}">source {n}</a>'
            f"</body></html>"
        )

    rows = [page(
        "http://a.test/",
        "<html><body><p>hub</p>"
        + "".join(
            f'<a href="http://a.test/p/{n}/index.html">s{n}</a>'
            f'<a href="http://a.test/p/{n}/index.htm">s{n}p</a>'
            for n in (1, 2, 3)
        )
        + '<a href="http://b.test/">b</a>'
        + '<a href="http://c.test/">c</a>'
        + '<a href="http://a.test/private/x">secret</a>'
        + "</body></html>",
    )]
    for n in (1, 2, 3):
        for ext in ("index.html", "index.htm"):
            rows.append(page(f"http://a.test/p/{n}/{ext}", twin_html(n)))
        rows.append(page(
            f"http://b.test/page/{n}",
            f"<html><body><p>b leaf {n} distinct text content</p>"
            "</body></html>",
        ))
    rows.append(page(
        "http://b.test/",
        "<html><body><p>b hub</p>"
        + "".join(f'<a href="http://b.test/page/{n}">l{n}</a>'
                  for n in (1, 2, 3))
        + '<a href="http://a.test/">back</a></body></html>',
    ))
    rows.append(page(
        "http://c.test/",
        '<html><body><p>c island</p><a href="http://c.test/x">x</a>'
        "</body></html>",
    ))
    rows.append(page(
        "http://c.test/x",
        "<html><body><p>c leaf page text</p></body></html>",
    ))
    rows.append(page(
        "http://a.test/private/x",
        "<html><body><p>robots-blocked</p></body></html>",
    ))
    web = pd.DataFrame(rows)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("retry_after", T.IntegerType()),
    ])
    corpus = spark.createDataFrame(web, schema)
    seeds = ["http://a.test/"]
    budgets = {"a.test": 2, "b.test": 1, "c.test": 1}
    robots = [("a.test", "/private", False)]

    # --- session 0: bootstrap BFS crawl; mine EVERY signal from it ----
    boot = str(tmp_path / "boot")
    run_crawl(spark, corpus, seeds,
              CrawlConfig(budgets=budgets, robots=robots, max_rounds=20),
              boot, bloom_buckets=4, bloom_bits=1 << 14)
    boot_store = CrawlStore(spark, boot)
    dust = [
        (r["host"], r["seg_from"], r["seg_to"])
        for r in mine_dust_rules_from_pages(
            boot_store.read_page_text(with_host=True)
        ).collect()
    ]
    assert ("a.test", "index.html", "index.htm") in dust
    prio_df = fused_host_priority_df(
        boot_store.read_links(), ["pagerank", "trust"],
        seed_hosts=[get_hostname(u) for u in seeds],
    )
    pq = str(tmp_path / "prio.parquet")
    prio_df.write.parquet(pq)
    prio_dict = {
        r["host"]: float(r["priority"])
        for r in spark.read.parquet(pq).collect()
    }
    assert len(prio_dict) >= 3  # every host ranked

    # --- all-signal config: oracle takes the dict, driver the parquet -
    sig = dict(budgets=budgets, robots=robots, dust_rules=dust,
               round_capacity=3)
    oracle = crawl_oracle(
        web, seeds, CrawlConfig(priority=prio_dict, max_rounds=12, **sig)
    )
    # the signals bite: order differs from plain BFS, twins collapse
    bfs = crawl_oracle(
        web, seeds, CrawlConfig(budgets=budgets, robots=robots,
                                max_rounds=12)
    )
    key = ["round", "seq"]
    assert (oracle.crawl_order.sort_values(key).url.tolist()
            != bfs.crawl_order.sort_values(key).url.tolist())
    urls = set(oracle.crawl_order.url)
    assert not any(u.endswith("index.html") for u in urls)  # dust
    assert "http://a.test/private/x" not in urls            # robots
    assert (oracle.crawl_order.groupby("round").size() <= 3).all()

    # --- driver: partial session, then resume — all signals both times
    root = str(tmp_path / "store")
    run_crawl(spark, corpus, seeds,
              CrawlConfig(max_rounds=4, **sig), root,
              bloom_buckets=4, bloom_bits=1 << 14, priority_df=pq)
    mid_rounds = CrawlStore(spark, root).committed_rounds()
    assert len(mid_rounds) == 4  # genuinely interrupted mid-crawl
    run_crawl(spark, corpus, seeds,
              CrawlConfig(max_rounds=12, **sig), root,
              bloom_buckets=4, bloom_bits=1 << 14, priority_df=pq,
              resume=True)
    store = CrawlStore(spark, root)
    got = (store.read_pages().toPandas()
           .sort_values(key).reset_index(drop=True))
    want = oracle.crawl_order.sort_values(key).reset_index(drop=True)
    cols = ["round", "seq", "url", "host", "status", "type"]
    assert list(map(tuple, got[cols].itertuples(index=False))) == list(
        map(tuple, want[cols].itertuples(index=False))
    )

    # --- freshness: due set → retract → resume (signals still loaded) -
    pages = store.read_pages().select("url").distinct()
    victims = sorted(
        r.url for r in pages.orderBy("url").limit(2).collect()
    )
    c1 = pages.select(
        "url", F.lit("2024-01-01 00:00:00").alias("ts_s"),
        F.lit("d1").alias("digest"),
    )
    c2 = pages.select(
        "url", F.lit("2024-01-02 00:00:00").alias("ts_s"),
        F.when(F.col("url").isin(victims), F.lit("d2"))
        .otherwise(F.lit("d1")).alias("digest"),
    )
    caps = c1.union(c2).withColumn("warc_ts", F.to_timestamp("ts_s"))
    due = sorted(
        r.url for r in due_for_recrawl(caps, "2024-01-05 00:00:00")
        .collect()
    )
    assert due == victims
    retract_urls(spark, root, due)
    run_crawl(spark, corpus, seeds,
              CrawlConfig(max_rounds=20, **sig), root,
              bloom_buckets=4, bloom_bits=1 << 14, priority_df=pq,
              resume=True)
    counts = (store.read_pages().groupBy("url").count().toPandas()
              .set_index("url")["count"].to_dict())
    for u, n in counts.items():
        assert n == (2 if u in due else 1), (u, n)


def test_randomized_composed_config_differential(spark):
    """One pinned trial of the randomized differential sweep
    (scripts/diff_sweep.py): a DENSE random composition — DUST rewrite
    + per-round capacity + cuckoo seen filter + mid-crawl kill/resume
    (base 21000, trial 0) — must match the serial oracle exactly on
    crawl order, seen set, text bytes, and links. The sweep searched 68
    such compositions in round 5 with zero divergence; this keeps one
    of the densest in the suite so the composition path cannot rot."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "diff_sweep",
        _os.path.join(_os.path.dirname(__file__), _os.pardir,
                      "scripts", "diff_sweep.py"),
    )
    ds = importlib.util.module_from_spec(spec)
    import sys as _sys
    _sys.modules["diff_sweep"] = ds
    spec.loader.exec_module(ds)
    checks, mode, pages = ds.run_trial(spark, 0, 21000)
    assert "kill@2" in mode and "cuckoo" in mode  # the composition we pinned
    assert pages > 0
    assert all(checks.values()), checks
