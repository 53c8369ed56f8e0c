"""Passage-level corpus operators: repeated-chunk removal + mirror hosts.

The reference dedupes whole text blocks within one page at extraction
time (``text.ts`` keeps a block's first occurrence); a training-data
pipeline needs the *cross-document* generalization — CCNet/RefinedWeb
style removal of boilerplate passages that repeat across the corpus
(headers, footers, cookie banners, licence blurbs), and its host-level
aggregate: *mirror detection*, flagging host pairs that serve largely
the same passages so the scheduler stops crawling the copy.

Spark-first design, shared by both operators:

  * chunking is pure per-row array algebra (``split`` → ``sequence`` →
    ``slice`` → ``posexplode``) — whole-stage codegen, no Python;
  * the ONLY thing that crosses a shuffle is ``(hash, ids, n_words)``:
    the chunk text is hashed *before* the exchange, the same
    never-shuffle-text rule as ``operators.dedup.dedup_exact``;
  * dual hash family like ``dedup.minhash_signatures``: production
    uses ``xxhash64`` (JVM, 8 bytes), ``portable=True`` uses an md5
    prefix so a DuckDB oracle computes bit-identical keys;
  * mirror pairs come from a posting-list self-join on chunk hash with
    a document-frequency cap (``max_hosts_per_chunk``) — a chunk shared
    by h hosts yields h² pair rows, so ubiquitous boilerplate ("all
    rights reserved") must be capped, the exact df-cap contract of
    ``dedup.ngram_jaccard_pairs``.

At 100 TB: chunks ≈ 10× documents; the first-occurrence window and the
per-host distinct both shuffle fixed-width rows keyed by a uniform
hash. Nothing is quadratic except host *pairs per shared chunk*, which
the df-cap bounds by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.textcols import sliding_grams, word_tokens


def _chunk_hash_col(portable: bool):
    if portable:
        # md5 hex prefix — reproducible in any engine; oracle path only
        return lambda c: F.substring(F.md5(c), 1, 16)
    return lambda c: F.xxhash64(c).cast("string")


def doc_chunks(
    docs: DataFrame,
    chunk_words: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Explode documents into fixed-width word chunks.

    Returns ``(doc_id, chunk_idx, chunk_hash, n_words)`` — one row per
    ``chunk_words``-word window (last window ragged). The chunk *text*
    never leaves this function: downstream operators join and group on
    the hash alone.
    """
    h = _chunk_hash_col(portable)
    # drop empty tokens: split('', ' ') is [''], which would otherwise
    # make every empty/whitespace-only document one phantom chunk whose
    # hash md5('') marks all such docs mutual duplicates (and inflate
    # n_words on any double-space). NULL text stays NULL → no rows out
    # of posexplode, same as a zero-chunk doc.
    words = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    chunks = F.when(
        n_chunks <= 0, F.array().cast("array<array<string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.slice(words, i * chunk_words + 1, chunk_words),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(chunks).alias("chunk_idx", "_c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            h(F.array_join("_c", " ")).alias("chunk_hash"),
            F.size("_c").alias("n_words"),
        )
    )


def repeated_chunk_filter(
    docs: DataFrame,
    chunk_words: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Corpus-wide repeated-passage removal, first occurrence kept.

    A chunk occurrence is *removed* when the identical chunk appeared
    earlier in corpus order (ordered by ``(doc_id, chunk_idx)`` — a
    total order, so re-runs remove the same occurrences). Returns per-
    document survival stats:
    ``(doc_id, n_chunks, n_removed, kept_words)``.

    One shuffle, keyed by chunk hash; the window's sort key is unique
    so first-occurrence choice is deterministic.
    """
    ch = doc_chunks(docs, chunk_words, id_col, text_col, portable)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_removed"),
            F.sum(
                F.when(F.col("rn") == 1, F.col("n_words")).otherwise(0)
            ).alias("kept_words"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Exact-substring duplication coverage à la Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"):
    a token position is *covered* when it lies inside a ``k``-token
    window whose exact text occurs at least twice in the corpus
    (anywhere — another document or elsewhere in the same one). Unlike
    ``repeated_chunk_filter``'s fixed grid, the window SLIDES, so
    unaligned copies are caught.

    The full suffix-array construction is replaced by the k-gram
    relaxation every distributed implementation uses: duplicated spans
    ≥ k tokens are found exactly; shorter repeats are ignored (k is the
    minimum match length — Lee et al. use 50 BPE tokens).

    Returns ``(doc_id, n_grams, n_dup_grams, covered_tokens,
    dup_ratio)`` with ``dup_ratio = covered_tokens / n_tokens`` —
    the per-document "how much of me exists elsewhere" signal a
    curation pipeline thresholds on.

    Two shuffles, both fixed-width: gram hashes (hashed BEFORE the
    exchange — the never-shuffle-text rule) for the global duplicate
    count, then (doc_id, pos) rows for the interval-merge window.
    Coverage is computed by the lag trick — ``min(k, pos - prev_pos)``
    new tokens per duplicated gram — NOT by exploding k offsets per
    gram (a k× row blowup at corpus scale).
    """
    h = _chunk_hash_col(portable)
    toks = word_tokens(F.col(text_col))
    grams = sliding_grams(toks, k)
    # fixed-width rows only through the two shuffles below: (doc_id,
    # pos, gh) — per-doc totals are re-derived from `docs` in `totals`,
    # so n_tokens does NOT ride the corpus-sized gram exchanges
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "_g"),
    ).select("doc_id", "pos", h(F.col("_g")).alias("gh"))
    dup = (
        g.withColumn("_cnt", F.count("*").over(Window.partitionBy("gh")))
        .where(F.col("_cnt") >= 2)
    )
    lagw = Window.partitionBy("doc_id").orderBy("pos")
    cover = (
        dup.withColumn("_prev", F.lag("pos").over(lagw))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_grams"),
            F.sum(
                F.when(
                    F.col("_prev").isNull()
                    | (F.col("pos") - F.col("_prev") >= k),
                    F.lit(k),
                ).otherwise(F.col("pos") - F.col("_prev"))
            ).alias("covered_tokens"),
        )
    )
    # coalesce: word_tokens(NULL) is NULL and size(NULL) is NULL under
    # ANSI — a NULL-text doc must report (0, 0, 0, 0.0), not NULLs that
    # silently fall out of both sides of a dup_ratio threshold filter
    n_toks = F.coalesce(F.size(toks), F.lit(0))
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        n_toks.alias("n_tokens"),
        F.greatest(n_toks - F.lit(k - 1), F.lit(0)).alias("n_grams"),
    )
    return totals.join(cover, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("covered_tokens", F.lit(0))
        .cast("long")
        .alias("covered_tokens"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.coalesce("covered_tokens", F.lit(0))
                / F.col("n_tokens")
            ),
            6,
        ).cast("double").alias("dup_ratio"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Exact-substring dedup with REMOVAL — the other half of
    :func:`duplicate_span_stats` (Lee et al. 2021 remove duplicated
    substrings from the corpus, they don't just measure them): a token
    is removed when it lies inside a duplicated ``k``-gram occurrence
    that is NOT the gram's globally-first occurrence (min ``(doc_id,
    pos)``), so exactly one copy of every duplicated passage survives
    the corpus. Returns one row per doc:
    ``(doc_id, clean_text, n_kept, n_removed)`` — ``clean_text`` is the
    surviving NORMALIZED token stream (lower-cased, single-spaced; the
    standard contract of token-level span dedup).

    Scale shape: the gram table shuffles fixed-width hashes only (the
    never-shuffle-text rule); removal intervals are lag-merged per doc
    — never the k× per-gram offset explode — then carried back to the
    doc row as a (start, end) array; the final token filter is one
    per-row ``filter × exists`` pass over merged, disjoint intervals
    (≤ n_tokens/k of them).
    """
    h = _chunk_hash_col(portable)
    toks_col = word_tokens(F.col(text_col))
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sliding_grams(toks_col, k)).alias("pos", "_g"),
    ).select("doc_id", "pos", h(F.col("_g")).alias("gh"))
    w = Window.partitionBy("gh")
    marked = (
        g.withColumn("_cnt", F.count("*").over(w))
        .withColumn("_first", F.min(F.struct("doc_id", "pos")).over(w))
    )
    removals = marked.where(
        (F.col("_cnt") >= 2)
        & ~(
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("pos") == F.col("_first.pos"))
        )
    ).select("doc_id", "pos")
    return _cut_spans(docs, removals, k, id_col, text_col)


def _cut_spans(
    docs: DataFrame,
    removals: DataFrame,
    k: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared removal tail: ``removals`` rows ``(doc_id, pos)`` mark
    k-token windows to cut; merge them into disjoint intervals per doc
    (lag-island detection — never the k× per-gram offset explode) and
    rebuild each doc's surviving normalized token stream."""
    toks_col = word_tokens(F.col(text_col))

    # merge the [pos, pos+k-1] intervals per doc: lag-island detection,
    # island id by running sum, one (start, end) row per island
    lagw = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        removals.withColumn("_prev", F.lag("pos").over(lagw))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("pos") > F.col("_prev") + k),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(
                lagw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(k - 1)).alias("e"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )

    # NULL text → empty token stream, so the output keeps its typed
    # (clean_text string, n_kept long, n_removed long) contract instead
    # of an all-NULL row
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(toks_col, F.array().cast("array<string>")).alias("_t"),
    )
    joined = base.join(spans, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_t")).otherwise(
        F.filter(F.col("_t"), lambda t, i: ~covered(i))
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size("_t") - F.size(kept)).cast("long").alias("n_removed"),
    )


def remove_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_col: str = "ngram",
) -> DataFrame:
    """Span-level benchmark decontamination — the removal counterpart
    of ``scrub.contamination_flags`` (which only FLAGS documents): every
    token inside a ``k``-gram that appears in the benchmark set is cut,
    the rest of the document survives. Dropping whole contaminated
    documents wastes the 99% of a long page that never touched the eval
    set; span removal keeps it (the n-gram-overlap decontamination
    practice of GPT-3 appendix C / Brown et al. 2020, applied as spans).

    ``benchmark`` is a one-column DataFrame of word ``k``-grams
    (dimension-sized by definition — eval sets are small — so it is
    BROADCAST: the gram probe is a map-side semi-join, no shuffle of
    the corpus gram table at all). Matching is on normalized gram text
    (lower-cased, single-spaced — ``word_tokens`` semantics, the same
    normalization ``doc_ngrams`` applies); unlike
    :func:`remove_duplicate_spans` there is no first-occurrence
    exception — contamination has no copy worth keeping.

    Returns ``(doc_id, clean_text, n_kept, n_removed)``, the same
    contract as :func:`remove_duplicate_spans`.
    """
    toks_col = word_tokens(F.col(text_col))
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sliding_grams(toks_col, k)).alias("pos", "_g"),
    )
    removals = g.join(
        F.broadcast(
            benchmark.select(F.col(bench_col).alias("_g")).distinct()
        ),
        "_g",
        "left_semi",
    ).select("doc_id", "pos")
    return _cut_spans(docs, removals, k, id_col, text_col)


def host_mirror_pairs(
    docs: DataFrame,
    chunk_words: int = 50,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hosts_per_chunk: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Host pairs ranked by passage-set Jaccard — mirror detection.

    Each host is represented by its set of distinct chunk hashes;
    ``jaccard = |A∩B| / |A∪B|`` over those sets. Only pairs sharing at
    least one chunk are emitted (a mirror score of zero is not a
    mirror). ``max_hosts_per_chunk`` drops chunks shared by more hosts
    than the cap before pairing — boilerplate that everyone serves says
    nothing about mirroring and is the only quadratic term; with the
    cap the join is bounded by cap² pairs per chunk. When capped, the
    intersection (and so the Jaccard) is an honest *lower bound*, the
    same documented semantics as ``dedup.ngram_jaccard_pairs``.

    Returns ``(host_a, host_b, n_shared, jaccard)``.
    """
    hc = (
        doc_chunks(docs, chunk_words, id_col, text_col, portable)
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(host_col).alias("host")
            ),
            "doc_id",
        )
        .select("host", "chunk_hash")
        .distinct()
    )
    sizes = hc.groupBy("host").agg(F.count("*").alias("n"))
    posting = hc
    if max_hosts_per_chunk is not None:
        df_w = Window.partitionBy("chunk_hash")
        posting = (
            hc.withColumn("_df", F.count("*").over(df_w))
            .where(F.col("_df") <= max_hosts_per_chunk)
            .drop("_df")
        )
    a = posting.select(
        F.col("host").alias("host_a"), F.col("chunk_hash").alias("h")
    )
    b = posting.select(
        F.col("host").alias("host_b"), F.col("chunk_hash").alias("h")
    )
    inter = (
        a.join(b, "h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )
