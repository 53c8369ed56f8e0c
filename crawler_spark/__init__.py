"""crawler_spark — a PySpark-native distributed crawl + web-text analytics engine.

A from-scratch re-build (NOT a port) of the capabilities of the reference
crawler (`xupit3r/crawler`, TypeScript + MongoDB + puppeteer) as an idiomatic
Spark engine:

- URL frontier + fetch scheduler as a round-synchronous BFS driver loop over
  partitioned tables (``crawler_spark.crawl``),
- a partitioned bloom-filter URL-seen set (``crawler_spark.operators.seen``),
- per-host politeness budgets, cooldowns and robots.txt as broadcast
  rule maps (``crawler_spark.crawl.driver``, ``crawler_spark.functions.robots``),
- cheerio-parity link discovery + text extraction as vectorized Arrow/pandas
  UDFs (``crawler_spark.functions.html``),
- the reference's text-analytics tier (sentiment/TF/trigrams/tags/summary)
  (``crawler_spark.analytics``),
- large-scale training-data ops: dedup (exact/minhash/simhash), similarity
  search, text quality, multimodal plumbing (``crawler_spark.operators``).

All per-row logic is vectorized pandas/Arrow UDFs — no row-at-a-time Python
UDFs anywhere in the hot path.
"""

__version__ = "0.1.0"

# Curated public API — the names a user of the engine reaches for first.
from crawler_spark.crawl.corpus import (  # noqa: E402
    read_bucketed_corpus,
    save_bucketed_corpus,
)
from crawler_spark.crawl.driver import retract_urls, run_crawl  # noqa: E402
from crawler_spark.crawl.store import CrawlStore  # noqa: E402
from crawler_spark.operators.freshness import (  # noqa: E402
    change_rates,
    due_for_recrawl,
)
from crawler_spark.operators.graphrank import (  # noqa: E402
    host_ranks_from_links,
    pagerank,
)
from crawler_spark.oracle.crawloracle import CrawlConfig  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402
from crawler_spark.sources.cdx import cdx_index, surt_key  # noqa: E402

__all__ = ["CrawlConfig", "CrawlStore", "cdx_index", "change_rates",
           "due_for_recrawl", "get_spark", "host_ranks_from_links", "pagerank",
           "read_bucketed_corpus", "retract_urls", "run_crawl",
           "save_bucketed_corpus", "surt_key", "__version__"]
