"""Images tier: collect / combine / count (reference images pipeline).

Spark re-expression of the reference's image stages:

- ``page_images`` ⇔ ``collectImages`` (``learn.ts:104-138``) +
  ``processImagesInHtml`` (``learn.ts:67-102``): every ``<img>`` with a
  canonicalizable ``src`` becomes one flat row
  ``images(page_url, img_url, alt, depth, img_pos)`` — the Spark-native
  exploded layout for the reference's ``images`` collection
  (``types.ts:31-37``), extracted by the Arrow-batched
  ``extract_images_udf`` kernel.
- ``combine_images`` ⇔ ``reconfigure.ts:247-285``: group the flat rows
  back to one row per page. The reference nests an array of image docs;
  relationally we emit the count plus a deterministic sorted join of the
  image urls (scalar columns — checkable by the DuckDB oracle; callers
  that want the nested form use ``collect_list`` on the same grouping).
- ``image_counts`` ⇔ the ``distinct('page')`` + per-page image counts
  shape (``reconfigure.ts:253``, SURVEY A3).

All grouping is a single hash aggregation with map-side partial
aggregation; at corpus scale the groupBy key is the page url — the same
key the pages table is bucketed by, so co-located input needs no extra
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.html import extract_images_udf


def page_images(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Corpus pages → flat images table (one row per kept ``<img>``)."""
    return (
        df.select(
            F.col(url_col).alias("page_url"),
            F.explode(extract_images_udf(html_col, url_col)).alias("i"),
        )
        .select("page_url", "i.img_url", "i.alt", "i.depth", "i.img_pos")
    )


def combine_images(
    images: DataFrame, page_col: str = "page_url", img_col: str = "img_url"
) -> DataFrame:
    """One row per page: image count + sorted pipe-joined urls."""
    return images.groupBy(page_col).agg(
        F.count("*").alias("n_images"),
        F.array_join(F.array_sort(F.collect_list(img_col)), "|").alias(
            "imgs"
        ),
    )


def image_counts(
    images: DataFrame, page_col: str = "page_url"
) -> DataFrame:
    """Per-page image count (linkCount shape for the images table)."""
    return images.groupBy(page_col).agg(F.count("*").alias("n_images"))
