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
from crawler_spark.oracle.crawloracle import CrawlConfig
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
