"""Training-shard packing: assign documents to fixed token-budget shards.

The last step of a training-data pipeline: after curation
(``__spark_entry__.corpus_curation``) the corpus is exported as shards
of ~``budget`` tokens each, per language, in a deterministic order — so
a re-run (or a resumed export) produces byte-identical shard membership,
the same determinism contract as ``operators.scrub.stratified_sample``.

Semantics: documents are laid end-to-end in ``(lang, doc_id)`` order and
cut every ``budget`` tokens; a document belongs to the shard its FIRST
token lands in (documents are never split, so a shard can overflow by at
most one document — the standard concat-then-chunk approximation).
Equivalently ``shard_id = floor(tokens_before_doc / budget)``.

Spark-first design: the naive formulation is a running token sum over
``Window.partitionBy(lang).orderBy(doc_id)`` — one task per language,
and a web corpus is ~half English, so that window is the textbook skew
bottleneck. This module reuses ``operators.topk.with_global_seq``'s
two-phase plan, generalized from row counts to WEIGHTED sums:
range-partition by the total order, aggregate per-partition token sums
per ``(partition, lang)`` (a tiny langs×partitions driver round-trip,
not a data collect), prefix-sum those on the driver, then a
partition-LOCAL running sum plus the broadcast offset. Every partition
works in parallel regardless of language skew, and the result depends
only on the total order, not on partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def export_shards(
    docs: DataFrame,
    path: str,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    tokens: Column | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Write the corpus as ``lang=…/shard_id=…`` parquet — the training
    export sink. Shard membership comes from ``pack_shards`` (a pure
    function of the corpus), so re-running the export reproduces the
    exact same shard contents — the resume/retry contract a 100 TB
    export needs (a died-halfway job is simply rerun; overwrite mode
    makes the retry idempotent).

    Partitioning by (lang, shard_id) gives the trainer direct
    per-shard file pruning; within a shard, rows are written sorted by
    ``doc_id`` (``sortWithinPartitions``) so file contents are
    deterministic too, not just membership. Returns a small manifest
    ``{n_docs, n_shards, n_tokens}`` computed from the assignment
    DataFrame already at hand — no second scan of the corpus.
    """
    sharded, manifest = _assign_with_manifest(
        docs, budget, lang_col, id_col, tokens, num_partitions
    )
    sharded.write.mode("overwrite").partitionBy(
        lang_col, "shard_id"
    ).parquet(path)
    return manifest


def _assign_with_manifest(
    docs: DataFrame,
    budget: int,
    lang_col: str,
    id_col: str,
    tokens: Column | None,
    num_partitions: int | None,
) -> tuple[DataFrame, dict]:
    """Shared half of both export sinks: shard assignment joined back to
    the corpus, repartitioned by (lang, shard) and sorted by id within
    each shard, plus the `{n_docs, n_shards, n_tokens}` manifest
    (computed from the assignment already at hand — no second corpus
    scan)."""
    assigned = pack_shards(
        docs, budget, lang_col, id_col, tokens, num_partitions
    ).localCheckpoint(eager=False)  # manifest agg + write both read it:
    # without freezing, each action re-runs the window sum + offset join
    m = assigned.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang", "shard_id").alias("n_shards"),
        F.sum("n_tokens").alias("n_tokens"),
    ).first()
    # the assignment's shard_id/n_tokens are authoritative: drop any
    # same-named input columns (e.g. a curated stream already carrying
    # n_tokens) instead of failing on duplicate/ambiguous columns
    sharded = (
        docs.drop("shard_id", "n_tokens")
        .join(
            assigned.select(
                F.col("doc_id").alias(id_col), "shard_id", "n_tokens"
            ),
            id_col,
        )
        .repartition(F.col(lang_col), F.col("shard_id"))
        .sortWithinPartitions(id_col)
    )
    return sharded, {
        "n_docs": m["n_docs"],
        "n_shards": m["n_shards"],
        "n_tokens": m["n_tokens"],
    }


def export_jsonl(
    docs: DataFrame,
    path: str,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    tokens: Column | None = None,
    num_partitions: int | None = None,
) -> dict:
    """The same deterministic ``lang=…/shard_id=…`` shard layout as
    :func:`export_shards`, written as JSON-Lines text files — the wire
    format most LLM training loaders consume directly.

    One JSON object per line; keys are the document's columns plus
    ``n_tokens``, serialized in sorted column order so the BYTES are a
    pure function of the corpus (same resume/retry contract as the
    parquet sink: membership from ``pack_shards``, rows sorted by id
    within each shard, overwrite-idempotent). Returns the same manifest
    ``{n_docs, n_shards, n_tokens}``.
    """
    sharded, manifest = _assign_with_manifest(
        docs, budget, lang_col, id_col, tokens, num_partitions
    )
    payload_cols = sorted(
        c for c in sharded.columns if c not in (lang_col, "shard_id")
    )
    (
        sharded.select(
            F.col(lang_col),
            F.col("shard_id"),
            F.to_json(
                F.struct(*[F.col(c) for c in payload_cols])
            ).alias("value"),
        )
        .write.mode("overwrite")
        .partitionBy(lang_col, "shard_id")
        .text(path)
    )
    return manifest


def pack_shards(
    docs: DataFrame,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    tokens: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a per-language training shard id.

    ``tokens`` is the per-document token count expression (default:
    whitespace word count of ``text``). Returns
    ``(doc_id, lang, n_tokens, shard_id)`` with ``shard_id`` dense from
    0 within each language.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    if tokens is None:
        # true whitespace word count, NULL text ≡ empty ≡ 0 tokens — a
        # literal-space split would count empties in space runs, treat
        # "a\nb" as one token, and (worse) give NULL text a NULL count
        # that silently corrupts the running sum and the manifest
        from crawler_spark.operators.quality import ws_token_count

        tokens = ws_token_count(F.coalesce(F.col("text"), F.lit("")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        tokens.cast("long").alias("n_tokens"),
    )
    # freeze partition-id assignment across the two jobs — see
    # topk.with_global_seq for why this localCheckpoint is load-bearing
    parted = (
        base.repartitionByRange(num_partitions, "lang", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sums = (
        parted.groupBy("_pid", "lang")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )  # langs × partitions rows — driver-side prefix sum, not a collect
    # NULL lang is a language of its own (failed/abstained language ID):
    # it sorts first in the prefix walk and joins back null-safely —
    # an equi-join would silently drop every NULL-lang doc from the
    # export, and a bare tuple sort would TypeError on None
    acc: dict[str | None, int] = {}
    offsets = []
    for r in sorted(
        sums, key=lambda r: (r["lang"] is not None, r["lang"] or "", r["_pid"])
    ):
        offsets.append((r["_pid"], r["lang"], acc.get(r["lang"], 0)))
        acc[r["lang"]] = acc.get(r["lang"], 0) + r["t"]
    off_df = spark.createDataFrame(
        offsets, "_opid int, _olang string, _off long"
    )
    w = (
        Window.partitionBy("_pid", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parted.withColumn("_cum", F.sum("n_tokens").over(w))
        .join(
            F.broadcast(off_df),
            (F.col("_pid") == F.col("_opid"))
            & F.col("lang").eqNullSafe(F.col("_olang")),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor(
                (F.col("_off") + F.col("_cum") - F.col("n_tokens"))
                / F.lit(float(budget))
            ).alias("shard_id"),
        )
    )
