"""Classification plumbing: text categories + image-feature classify.

The reference's classify stage runs mobilenet top-3 on fetched image
bytes (``classify.ts:70-111``, SURVEY O4) and an LLM top-5 on page text
(``classify.ts:39-68`` ``categoriesFromText``, ``learn.ts:509-537``).
Neither model ships in this environment, so — like
``operators.multimodal.decode_features`` — the MODELS are injectable and
the distributed plumbing (broadcast label set, batch scoring, per-item
top-k with deterministic tiebreaks, output schema) is real and tested:

- ``categorize_text``: labels × docs scoring. The default scorer is a
  deterministic relational token-overlap (pure JVM column algebra —
  mirrored by a DuckDB oracle); pass ``scorer=`` to swap in a real model
  (zero-shot NLI, an LLM endpoint) running as an Arrow-batched
  ``mapInPandas``.
- ``classify_features``: decoded media features → top-k categories via a
  linear head. The default head projects features onto per-label
  prototype vectors derived deterministically from the label names (a
  stand-in for mobilenet's final layer); inject ``prototypes=`` with real
  class weights in production.

Top-k is per-item: ``row_number`` over a window partitioned by the id —
bounded work per item regardless of corpus size, and the label set is
dimension-sized (broadcast) by construction.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TextScorer = Callable[[pd.Series, list[str]], pd.DataFrame]


def _col_type(df: DataFrame, col: str) -> str:
    """simpleString type of ``col`` — the id column keeps its input type
    through the mapInPandas schemas (ids are not always longs)."""
    for f in df.schema.fields:
        if f.name == col:
            return f.dataType.simpleString()
    raise KeyError(col)


def categorize_text(
    df: DataFrame,
    labels: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    scorer: TextScorer | None = None,
) -> DataFrame:
    """(id, category, score, rank): top-``k`` labels per doc, score > 0.

    Default scorer (no UDF): score(label, doc) = fraction of the doc's
    whitespace tokens that appear in the label's token set — deterministic
    and SQL-expressible, so the whole path is oracle-checkable. Ranks
    break ties by label asc (reference top-5 shape, ``classify.ts:39-68``).
    """
    if scorer is None:
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: t != F.lit(""),
        )
        scored_parts = []
        for label in labels:
            lt = [t for t in label.lower().split() if t]
            hits = F.size(
                F.filter(toks, lambda t: t.isin(*[F.lit(x) for x in lt]))
            )
            scored_parts.append(
                F.struct(
                    F.lit(label).alias("category"),
                    (hits / F.greatest(F.size(toks), F.lit(1))).alias(
                        "score"
                    ),
                )
            )
        scored = df.select(
            F.col(id_col),
            F.explode(F.array(*scored_parts)).alias("c"),
        ).select(id_col, "c.category", "c.score")
    else:
        # scorer contract: (texts: pd.Series, labels) -> DataFrame with
        # columns (_row: batch-local 0-based index, category, score)
        schema = f"{id_col} {_col_type(df, id_col)}, category string, score double"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = scorer(pdf[text_col], labels)
                out[id_col] = out["_row"].map(
                    dict(enumerate(pdf[id_col].values))
                )
                yield out[[id_col, "category", "score"]]

        scored = df.select(id_col, text_col).mapInPandas(run, schema)

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("category")
    )
    return (
        scored.where(F.col("score") > 0)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "category",
            F.round("score", 6).cast("double").alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def label_prototypes(labels: list[str], dim: int) -> np.ndarray:
    """Deterministic per-label prototype vectors (sha256-seeded normals) —
    the stand-in for a trained classifier head's weight rows."""
    rows = []
    for label in labels:
        seed = int.from_bytes(
            hashlib.sha256(label.encode()).digest()[:8], "big"
        )
        rows.append(
            np.random.default_rng(seed).standard_normal(dim).astype(
                "float32"
            )
        )
    return np.stack(rows)


def classify_features(
    feats: DataFrame,
    labels: list[str],
    id_col: str = "media_id",
    feat_col: str = "features",
    k: int = 3,
    prototypes: np.ndarray | None = None,
) -> DataFrame:
    """(id, category, score, rank): linear-head top-``k`` over features.

    The mobilenet-classify shape (``classify.ts:70-111``, top-3 default):
    scores = features · prototypesᵀ, batch matmul per Arrow batch, top-k
    per item with (score desc, label asc) tiebreak. ``prototypes`` rows
    must align with ``labels``; default = :func:`label_prototypes`.
    """
    protos = prototypes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proto = protos
        lab = np.array(labels)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype="float32") for v in pdf[feat_col]]
            )
            p = (
                proto
                if proto is not None
                else label_prototypes(labels, mat.shape[1])
            )
            scores = mat @ p.T  # (rows, labels)
            # top-k by (-score, label) — lexsort keys, last is primary
            order = np.lexsort(
                (np.tile(lab, (len(mat), 1)), -scores), axis=1
            )[:, :k]
            ids, cats, scs, rks = [], [], [], []
            for r, row_id in enumerate(pdf[id_col].values):
                for rank, j in enumerate(order[r], start=1):
                    ids.append(row_id)
                    cats.append(lab[j])
                    scs.append(round(float(scores[r, j]), 6))
                    rks.append(rank)
            yield pd.DataFrame(
                {id_col: ids, "category": cats, "score": scs, "rank": rks}
            )

    schema = (
        f"{id_col} {_col_type(feats, id_col)}, category string, "
        "score double, rank int"
    )
    return feats.select(id_col, feat_col).mapInPandas(run, schema)


def classify_features_portable(
    feats: DataFrame,
    labels: list[str],
    id_col: str = "media_id",
    feat_col: str = "features",
    dim: int = 16,
    k: int = 3,
) -> DataFrame:
    """ENGINE-PORTABLE twin of :func:`classify_features` for the oracle.

    The linear head's prototype weights are dyadic rationals
    ``p(label, d) = (md5int15(label#d) % 257 − 128) / 128`` (computed
    driver-side with hashlib and embedded as literals; DuckDB computes
    the identical doubles in SQL), and each score is a LEFT FOLD of the
    per-dimension products in array order (``F.aggregate`` here,
    ``list_reduce`` there) — so scores, 6-dp rounding, and the
    (score desc, label asc) top-k agree bit-for-bit across engines.
    Relational form: per-label struct explode + one per-item window —
    no UDF; the label set is dimension-sized by construction."""
    from crawler_spark.operators.quality import dyadic_weight

    def w(label: str, d: int) -> float:
        return dyadic_weight(f"{label}#{d}")

    parts = []
    for label in sorted(set(labels)):
        warr = F.array(*[F.lit(w(label, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(feat_col), warr, lambda a, c: a * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        parts.append(
            F.struct(
                F.lit(label).alias("category"),
                F.round(dot, 6).cast("double").alias("score"),
            )
        )
    scored = feats.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("c")
    ).select(id_col, "c.category", "c.score")
    win = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("category")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
    )
