"""Quality-aware data selection: DSIR importance weights + CCNet buckets.

Two published selection signals a web-corpus curation pass computes
after cleaning and dedup, both pure DataFrame algebra:

* **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): score every raw document by how much more
  likely its hashed n-gram features are under a small TARGET corpus
  (the domain you want more of) than under the raw corpus itself —
  ``log w(x) = Σ_f  log p_tgt(f) − log p_raw(f)`` over the doc's
  features. Selection then keeps the top weights (or Gumbel-resamples
  by them); this module produces the per-doc log-weights.

* **CCNet buckets** (Wenzek et al. 2020, "CCNet: Extracting High
  Quality Monolingual Datasets from Web Crawl Data"): split each
  language's documents into head/middle/tail thirds by LM score —
  downstream consumers train on head+middle or weight by bucket.

Spark-first shapes:

  * DSIR's feature space is HASHED into a fixed bucket count (the
    paper's trick, and the scale trick): both models and the log-ratio
    table are ≤ ``buckets`` rows — broadcast-sized BY CONSTRUCTION no
    matter how big either corpus is. Two corpus-sized shuffles total
    (one count per model), then per-doc scoring is a broadcast join +
    one groupBy on doc_id. Dual hash family like the dedup operators:
    ``xxhash64`` in production, md5-prefix when ``portable=True`` so
    the DuckDB oracle derives bit-identical buckets.
  * CCNet cutoffs are computed as per-language AGGREGATES (exact
    interpolated percentiles — only the xent doubles reach the
    per-lang reducer, never documents), broadcast back, and labels
    assigned by comparison — no global sort of the corpus, which is
    the anti-pattern an ntile-over-everything would hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textcols import (
    portable_hash64,
    sliding_grams,
    word_tokens,
)
from crawler_spark.operators.quality import unigram_cross_entropy


def _bucket_col(gram, buckets: int, portable: bool):
    if portable:
        # md5-prefix → int, mod buckets: reproducible in any engine
        return portable_hash64(gram) % buckets
    return F.pmod(F.xxhash64(gram), F.lit(buckets))


def _doc_features(
    df: DataFrame, id_col: str, text_col: str, buckets: int, portable: bool
) -> DataFrame:
    """(doc_id, bucket) — one row per unigram AND bigram occurrence,
    hashed into ``buckets``. Occurrences, not distinct: DSIR's model is
    a bag-of-features multinomial."""
    toks = word_tokens(F.col(text_col))
    feats = F.concat(toks, sliding_grams(toks, 2))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(feats).alias("_g")
    ).select("doc_id", _bucket_col(F.col("_g"), buckets, portable).alias("b"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    alpha: float = 1.0,
    portable: bool = False,
) -> DataFrame:
    """Per-document DSIR importance log-weights of ``raw`` vs ``target``.

    Returns ``(doc_id, n_feats, logw)`` for every raw document;
    ``logw = Σ log((c_tgt(b)+α)/(N_tgt+αB)) − log((c_raw(b)+α)/(N_raw+αB))``
    over the doc's feature-bucket occurrences (add-α smoothing keeps
    buckets unseen in the target finite). Docs with no features score
    0.0. Selection policy (top-k, quantile threshold, Gumbel top-k
    resampling) is the caller's; weights are the reusable part.

    Scale shape: two corpus-sized feature shuffles (the two bucket
    counts, map-side combined, fixed-width ``(bucket)`` keys), one
    ``buckets``-row log-ratio table explicitly ``broadcast()`` for the
    scoring join, one groupBy on the uniform doc id. Nothing downstream
    of the counts depends on corpus size. The raw feature stream is
    deliberately RE-DERIVED for the scoring pass (tokenize+hash is
    cheap, stays in codegen, and needs no storage) instead of
    checkpointing a corpus×features intermediate.
    """
    b = float(buckets)
    raw_f = _doc_features(raw, id_col, text_col, buckets, portable)
    tgt_f = _doc_features(target, id_col, text_col, buckets, portable)

    def model(cnt: DataFrame, out: str) -> DataFrame:
        tot = cnt.agg(F.sum("_c").alias("_n"))
        return cnt.crossJoin(F.broadcast(tot)).select(
            "b",
            F.log(
                (F.col("_c") + F.lit(alpha))
                / (F.col("_n") + F.lit(alpha * b))
            ).alias(out),
        )

    raw_cnt = raw_f.groupBy("b").agg(F.count("*").alias("_c"))
    tgt_cnt = tgt_f.groupBy("b").agg(F.count("*").alias("_c"))
    raw_m = model(raw_cnt, "lp_raw")
    tgt_m = model(tgt_cnt, "lp_tgt")
    # full ratio table: raw buckets drive scoring (every scored feature
    # exists in raw_m by construction); target-missing buckets fall back
    # to the smoothed floor log(α / (N_tgt + αB)). N_tgt comes from the
    # SAME keyed bucket-count relation the model uses (≤ buckets rows;
    # ReuseExchange collapses the shared aggregation subtree), not a
    # second keyless count() that would re-scan the target corpus.
    tgt_n = tgt_cnt.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("double").alias("_nt")
    )
    ratio = (
        raw_m.join(tgt_m.select("b", "lp_tgt"), "b", "left")
        .crossJoin(F.broadcast(tgt_n))
        .select(
            "b",
            (
                F.coalesce(
                    "lp_tgt",
                    F.log(F.lit(alpha) / (F.col("_nt") + F.lit(alpha * b))),
                )
                - F.col("lp_raw")
            ).alias("lr"),
        )
    )
    scored = (
        raw_f.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lr").alias("logw"))
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("logw", F.lit(0.0)).cast("double").alias("logw"),
        )
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail split per language by unigram
    cross-entropy (lower xent = more fluent = head).

    Cutoffs are the exact interpolated 1/3 and 2/3 per-language
    percentiles of the 6-dp-rounded xent; a document lands in ``head``
    when ``xent <= p33``, ``middle`` when ``<= p66``, else ``tail``.
    Returns ``(doc_id, lang, xent, bucket)``.

    The cutoff aggregate ships only xent doubles to one reducer per
    language (languages are few; documents never globally sort), and
    the cutoff table is broadcast back for the label join — the same
    two-phase shape as the dedup guards.
    """
    x = unigram_cross_entropy(docs, id_col=id_col, text_col=text_col)
    # checkpoint: the xent relation feeds BOTH the cutoff aggregate and
    # the label join — without freezing it, Spark re-runs the whole
    # token-explode + vocab pipeline twice (same rationale as
    # topk.with_global_seq's pid freeze)
    xent = (
        x.join(
            docs.select(
                F.col(id_col).alias(id_col), F.col(lang_col).alias("lang")
            ),
            id_col,
        )
        .select(
            id_col,
            "lang",
            F.round("xent", 6).cast("double").alias("xent"),
        )
        .localCheckpoint(eager=False)
    )
    cuts = xent.groupBy(F.col("lang").alias("_l")).agg(
        F.percentile("xent", F.lit(1.0 / 3.0)).alias("_p33"),
        F.percentile("xent", F.lit(2.0 / 3.0)).alias("_p66"),
    )
    # null-safe label join: groupBy gave NULL-lang docs their own cutoff
    # row, and an equi-join would silently drop every such doc from the
    # output relation (the same hazard scrub.host_disjoint_split warns
    # about) — NULL-lang docs bucket within their own group instead
    return (
        xent.join(F.broadcast(cuts), F.col("lang").eqNullSafe(F.col("_l")))
        .select(
            id_col,
            "lang",
            "xent",
            F.when(F.col("xent") <= F.col("_p33"), F.lit("head"))
            .when(F.col("xent") <= F.col("_p66"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
