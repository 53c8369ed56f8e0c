"""Corpus scrubbing: PII redaction + benchmark decontamination.

Two curation stages every large-scale training-data pipeline runs after
quality filtering and dedup:

- ``redact_pii``: replace emails / IPv4 addresses / phone-number spans
  with typed placeholder tokens and count what was removed. Pure JVM
  ``regexp_replace``/``regexp_count`` chains — whole-stage codegen, no
  UDF — using a regex subset (char classes, bounded repeats,
  non-capturing groups, ``\\b``) that Java regex and RE2 evaluate
  identically, so the DuckDB oracle checks the exact output bytes.
- ``contamination_flags``: flag documents whose text contains any n-gram
  from a benchmark/eval set (the standard n-gram-overlap decontamination
  check, e.g. GPT-3 appendix C / PaLM-style 8-gram overlap). The
  benchmark n-gram set is dimension-sized by construction → broadcast
  hash join against each doc's distinct n-grams; per-doc hit counts come
  from one partial-aggregated groupBy.

Replacement order matters and is part of the contract: emails first
(their local parts may contain digits), then IPv4 (dotted quads would
otherwise be eaten by the phone span), then phone spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textcols import (
    portable_hash64,
    sliding_grams,
    word_tokens,
)

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_emails, n_ips, n_phones)."""
    c = F.col(text_col)
    after_email = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "[IP]")
    clean = F.regexp_replace(after_ip, PHONE_RE, "[PHONE]")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).alias("n_phones"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum subsampling: keep a row iff
    ``hash(id, salt) % 100 < rate(stratum)``.

    The hash is the engine-portable md5-prefix (first 15 hex chars as an
    integer — identical in Spark and DuckDB), so the sample is a pure
    function of (id, salt): reproducible across runs, engines, retries
    and partitionings — the property corpus subsampling needs so a
    re-run of a 100 TB job selects the SAME documents. Rates are integer
    percents; change ``salt`` to draw an independent sample.
    """
    h = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    ) % 100
    rate = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        rate = (
            F.when(cond, F.lit(r))
            if rate is None
            else rate.when(cond, F.lit(r))
        )
    rate = (
        rate.otherwise(F.lit(default_rate))
        if rate is not None
        else F.lit(default_rate)
    )
    return df.where(h < rate)


def host_disjoint_split(
    df: DataFrame,
    host_col: str = "host",
    eval_bps: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Leakage-free train/eval split for web corpora: every HOST (not
    document) lands wholly in train or eval, so near-duplicate pages
    from the same site — mirrors, templated boilerplate, syndicated
    articles — can never straddle the split and leak eval content into
    training (the standard web-data hygiene rule; cf. C4/Gopher eval
    decontamination by document n-grams, which this complements at the
    site level).

    The side is ``md5(host || salt) % 10000 < eval_bps`` with the same
    engine-portable md5-prefix hash as :func:`stratified_sample`:
    deterministic across runs, engines, retries and partitionings, and
    pure per-row column algebra — zero shuffle, no host table to join.
    ``eval_bps`` is the eval share in basis points (1000 = 10%); change
    ``salt`` for an independent split. Adds boolean ``is_eval``.
    """
    # NULL hosts (malformed/relative URLs) coalesce to '' so they get a
    # deterministic side instead of is_eval=NULL — a NULL flag would
    # drop those rows from BOTH splits' filters silently.
    h = portable_hash64(
        F.concat(
            F.coalesce(F.col(host_col).cast("string"), F.lit("")),
            F.lit(salt),
        )
    ) % 10000
    return df.withColumn("is_eval", h < F.lit(eval_bps))


def temperature_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.7,
    target_fraction: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain mixing: sample each stratum toward a
    ``share^alpha`` distribution (multilingual/domain rebalancing à la
    mBERT/XLM-R training mixes; alpha=1 keeps natural proportions,
    alpha→0 approaches uniform).

    For stratum d with natural share ``s_d = n_d / N``, the target share
    is ``s_d^alpha / Σ s^alpha`` and the keep probability
    ``p_d = min(1, target_fraction · target_share / s_d)`` — downsampling
    over-represented strata (sampling is without replacement, so p is
    capped at 1; true upsampling is a separate repeat step). Selection
    uses the same engine-portable md5 hash as ``stratified_sample``, so
    the chosen rows are a pure function of (id, salt, corpus
    composition): re-runs at 100 TB select identical documents.

    Plan shape: one strata-sized aggregation (partial map-side combine),
    two 1-row reductions, then a broadcast join of the rate table back
    onto the corpus and a per-row hash filter — the corpus itself never
    shuffles. Returns kept rows as ``(id, stratum, keep_p6)`` where
    ``keep_p6`` is the keep probability in parts-per-million (rounded —
    the integer the hash is compared against, identical in the oracle).
    """
    rates = _temperature_rates(
        df, strata_col, alpha, target_fraction, capped=True
    )
    h = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    ) % 1000000
    # null-safe: groupBy gave a NULL stratum its own rate row, and an
    # equi-join would silently drop those rows while their count still
    # skews every other stratum's rate (the hazard host_disjoint_split
    # documents); NULL-strata docs sample like any other stratum
    return (
        df.join(F.broadcast(rates), df[strata_col].eqNullSafe(rates["_s"]))
        .where(h < F.col("keep_p6"))
        .select(F.col(id_col), F.col(strata_col), F.col("keep_p6"))
    )


def _temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    target_fraction: float,
    capped: bool,
) -> DataFrame:
    """``(_s, keep_p6)``: per-stratum keep probability in ppm, where
    ``p = target_fraction · (s^alpha / Σ s^alpha) / s``. The rate table
    is strata-sized (dimension cardinality), so the unpartitioned
    windows below run over a handful of rows; the corpus-sized count
    aggregation above them still partial-aggregates normally.
    (This is one of the repo's two audited `WindowExec: No Partition
    Defined` warning sites — safe because the windowed input is the
    post-aggregation rate table, bounded by |strata|, never the
    corpus; see BASELINE.md "WindowExec warnings ... pre-answered".)"""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strata_col).alias("_s")).agg(
        F.count("*").alias("_n")
    )
    everything = Window.partitionBy()
    p = (
        F.lit(target_fraction)
        * (F.col("_w") / F.col("_wsum"))
        / (F.col("_n") / F.col("_tot"))
    )
    if capped:
        p = F.least(F.lit(1.0), p)
    return (
        counts.withColumn("_tot", F.sum("_n").over(everything))
        .withColumn(
            "_w", F.pow(F.col("_n") / F.col("_tot"), F.lit(alpha))
        )
        .withColumn("_wsum", F.sum("_w").over(everything))
        .select(
            "_s",
            F.round(p * F.lit(1000000.0)).cast("long").alias("keep_p6"),
        )
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.7,
    target_fraction: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """``temperature_sample`` without the p≤1 cap: true with-replacement
    mixing. Each row is emitted ``floor(p)`` times plus one more when
    its portable hash falls under ``frac(p)`` — so under-represented
    strata are UPSAMPLED (repeated epochs, the standard multilingual
    training mix) and over-represented ones thinned, by the same single
    formula: ``copies = p6 // 10^6 + (hash < p6 % 10^6)`` with
    ``p6 = round(p · 10^6)``. Expected stratum sizes hit the share^alpha
    targets exactly in expectation, and the realized copy counts are a
    pure function of (id, salt, corpus composition).

    Returns ``(id, stratum, copy)`` with ``copy`` 0-based, so output
    rows stay unique and a downstream shard packer can treat each copy
    as a document. Same plan shape as ``temperature_sample`` (strata-
    sized rate table broadcast back; corpus never shuffles) plus a
    per-row ``explode(sequence(...))`` that stays in codegen.
    """
    rates = _temperature_rates(
        df, strata_col, alpha, target_fraction, capped=False
    )
    h = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    ) % 1000000
    n_copies = (
        F.floor(F.col("keep_p6") / F.lit(1000000))
        + F.when(h < F.col("keep_p6") % 1000000, F.lit(1)).otherwise(F.lit(0))
    ).alias("_copies")
    return (
        # null-safe join for the same reason as temperature_sample
        df.join(F.broadcast(rates), df[strata_col].eqNullSafe(rates["_s"]))
        .select(F.col(id_col), F.col(strata_col), n_copies)
        .where(F.col("_copies") > 0)
        .select(
            id_col,
            strata_col,
            F.explode(
                F.sequence(F.lit(0), (F.col("_copies") - 1).cast("int"))
            ).alias("copy"),
        )
    )


def doc_ngrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct word n-grams per doc: (id, ngram) — JVM-side slide."""
    grams = sliding_grams(word_tokens(text_col), n)
    return (
        df.select(F.col(id_col), F.explode(grams).alias("ngram")).distinct()
    )


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    bench_col: str = "ngram",
) -> DataFrame:
    """(id, n_hits, contaminated) — docs sharing ≥1 n-gram with the
    benchmark set. ``benchmark`` is a one-column DataFrame of n-grams
    (dimension-sized: broadcast)."""
    grams = doc_ngrams(df, id_col, text_col, n)
    hits = (
        grams.join(
            F.broadcast(benchmark.select(F.col(bench_col).alias("ngram"))),
            "ngram",
            "left_semi",
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
