"""Large-scale document deduplication operators.

Beyond the reference's exact dedup (``text.ts:30-38`` within a page;
URL-seen across pages), a training-data pipeline needs corpus-level near
dedup. All operators are pure DataFrame compositions — hashing stays
JVM-side (``xxhash64``/``md5``); only simhash uses an Arrow-batched pandas
UDF (bit manipulation over token arrays).

Scale notes (the design constraint is ~10^10 documents):

- exact: one hash-shuffle on ``xxhash64(text)``; no text comparison ever
  crosses the wire, only (hash, id).
- minhash-LSH: shingles exploded once, ``n_hashes`` min-aggregations in a
  single ``groupBy`` (partial aggregation map-side), banding explodes
  ``n_bands`` rows/doc, candidate pairs only within equal (band, hash)
  buckets — the classic sub-quadratic path. Estimated jaccard from
  signature agreement; an optional exact verify joins shingle sets for
  candidates only.
- simhash: 64-bit signature per doc (one UDF pass), near-dup = hamming ≤ d
  found by pigeonhole banding over 4×16-bit chunks (d ≤ 3 ⇒ one chunk
  equal), pairs verified by JVM-side ``bit_count(s1 XOR s2)``.
- ngram-jaccard: exact sub-quadratic via inverted index (explode distinct
  grams → self-join on gram → per-pair intersection counts); prune with a
  length-ratio filter before scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.textcols import portable_hash64, word_tokens
from crawler_spark.functions.textops import tokenize

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_key_cols(text_col: str) -> list:
    """Shuffle key for exact dedup: (xxhash64, md5, length) of the text.

    Equality of the triple ⟺ byte-equality of the text for any realistic
    corpus (a simultaneous 64-bit + 128-bit collision at equal length is
    ~2^-192 — content-addressed storage ships on weaker guarantees), so
    the dedup exchange carries three scalar columns instead of the
    documents themselves: at 100 TB nothing but (key, id) crosses the
    wire, and identical-text skew hits a 24-byte key, not megabyte rows.
    """
    return [
        F.xxhash64(F.col(text_col)).alias("_ck_h"),
        F.md5(F.col(text_col)).alias("_ck_fp"),
        F.length(F.col(text_col)).alias("_ck_ln"),
    ]


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, canon_id, is_dup): canon = min id among byte-identical texts.

    Plan: project to (content key, id) BEFORE the window — the hash
    exchange moves only the 24-byte key + id; text never shuffles (plan
    asserted in tests/test_plans.py).
    """
    w = Window.partitionBy("_ck_h", "_ck_fp", "_ck_ln")
    return (
        df.select(F.col(id_col), *_content_key_cols(text_col))
        .select(
            F.col(id_col),
            F.min(id_col).over(w).alias("canon_id"),
        )
        .withColumn("is_dup", F.col(id_col) != F.col("canon_id"))
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Survivors only (first id per identical text).

    Ranks on the slim (content key, id) projection, then joins the
    surviving ids back on ``id_col`` — the full rows shuffle once on the
    uniformly-distributed id instead of on raw text (where every
    duplicate clique lands in a single task)."""
    w = Window.partitionBy("_ck_h", "_ck_fp", "_ck_ln").orderBy(id_col)
    survivors = (
        df.select(F.col(id_col), *_content_key_cols(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def _shingle_array(text_col: str, k: int):
    """Word k-shingle array expression (shared by the string and hashed
    shingle ops). JVM-side: lower/split/slide via ``transform`` over the
    token index range."""
    # drop empty tokens: leading/trailing whitespace would otherwise
    # inject '' tokens that mint spurious shingles — two word-identical
    # docs differing only in surrounding whitespace would jaccard < 1
    # (and exact dedup already missed them), a near-dup recall hole
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    n = F.size(toks) - F.lit(k - 1)
    # the n < 1 guard is load-bearing: Spark's sequence(0, -1) DESCENDS
    # ([0, -1]) instead of being empty, and the resulting slice(toks, 0,
    # k) throws at runtime — any real corpus has sub-k-token docs
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word k-shingles per doc: (id, shingle)."""
    return (
        df.select(
            F.col(id_col), F.explode(_shingle_array(text_col, k)).alias("shingle")
        )
        .where(F.length("shingle") > 0)
        .distinct()
    )


def word_shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct 64-bit shingle hashes per doc: (id, sb long).

    The production minhash input: each shingle string is hashed ONCE
    (``xxhash64``) right after the explode, so (a) the ``distinct``
    exchange carries an 8-byte long instead of the raw shingle string,
    and (b) the 64-hash signature family downstream derives from this
    fixed-width base instead of re-reading the string 64 times —
    at corpus scale the signature stage is memory-bandwidth-bound on
    exactly that re-reading. Set-semantics are identical to
    ``word_shingles`` up to 64-bit hash collisions (negligible for
    minhash, which is itself an estimate)."""
    return (
        df.select(
            F.col(id_col), F.explode(_shingle_array(text_col, k)).alias("shingle")
        )
        .where(F.length("shingle") > 0)
        .select(F.col(id_col), F.xxhash64("shingle").alias("sb"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, sig array<long>): n_hashes min-aggregations in ONE groupBy.

    ``portable=True`` swaps the per-family hash from JVM ``xxhash64``
    (fast; Spark-only) to the md5-prefix hash both Spark and DuckDB
    evaluate identically — slower, but it makes the whole minhash-LSH
    pipeline value-checkable by the SQL oracle."""
    if portable:
        def h(i: int):
            return portable_hash64(
                F.concat(F.lit(f"{i}|"), F.col("shingle"))
            )

        aggs = [F.min(h(i)).alias(f"h{i}") for i in range(n_hashes)]
        sig = F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
        return (
            shingles.groupBy(id_col)
            .agg(*aggs)
            .select(F.col(id_col), sig.alias("sig"))
        )
    # production: hash the string ONCE to a 64-bit base (materialized as
    # a column so codegen cannot re-expand it into all 64 aggs), then
    # derive the family from the fixed-width base — same signatures as
    # minhash_signatures_from_hashes(word_shingle_hashes(...)).
    based = shingles.select(
        F.col(id_col), F.xxhash64("shingle").alias("sb")
    )
    return minhash_signatures_from_hashes(based, id_col, n_hashes)


def minhash_signatures_from_hashes(
    hashes: DataFrame, id_col: str = "doc_id", n_hashes: int = 64
) -> DataFrame:
    """(id, sig array<long>) from pre-hashed shingles (id, sb long).

    Each family member is ``xxhash64(i, sb)`` — a fixed-width 12-byte
    input, so the whole 64-way aggregation reads each shingle's bytes
    once (in ``word_shingle_hashes``) instead of 64 times. One groupBy,
    map-side partial min."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sb"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
    return (
        hashes.groupBy(id_col)
        .agg(*aggs)
        .select(F.col(id_col), sig.alias("sig"))
    )


def collapse_identical_signatures(
    sigs: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Split a signature table into one REPRESENTATIVE row per distinct
    signature (the min id) plus (id, rep_id) membership edges for the
    collapsed docs.

    Near-boilerplate cliques — docs that survive ``dedup_exact`` on
    trivial byte differences but share their whole shingle set — carry
    IDENTICAL minhash signatures, and candidate-pair generation is a
    pure function of the signature: banding such a clique is quadratic
    inside every band bucket while adding zero information. Collapsing
    first makes the clique LINEAR (a star to its representative, each
    edge a true ``est_jaccard`` of 1.0) and shrinks the banding input by
    the clique factor. Connectivity is preserved exactly: members share
    their representative's signature, so any cross-clique pair the full
    banding would find is found between the representatives. This is the
    signature-level twin of running ``dedup_exact`` before LSH — the
    two guards a 100 TB boilerplate-heavy corpus needs.

    Cost: one groupBy + one join keyed on the signature array, in place
    of banding's 16× row explode over the collapsed docs — a win
    whenever identical-signature groups exist, noise otherwise.
    """
    grouped = sigs.groupBy("sig").agg(F.min(id_col).alias("_rep"))
    reps = grouped.select(F.col("_rep").alias(id_col), "sig")
    members = (
        sigs.join(grouped, "sig")
        .where(F.col(id_col) != F.col("_rep"))
        .select(F.col(id_col), F.col("_rep").alias("rep_id"))
    )
    return reps, members


def band_rows(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Slim LSH bucket rows ``(id, band, bhash)`` of a signature table —
    the join side of every banding path and the PERSISTABLE index an
    incremental crawl appends to per round (see
    :func:`minhash_dedup_incremental`). Carrying only (id, band, bhash)
    keeps the explode/window/self-join stages off the ~0.5 KB signature
    arrays."""

    def bkey(b: int):
        cols = [F.col("sig")[b * rows_per_band + r]
                for r in range(rows_per_band)]
        if portable:
            # join-key as a plain string of the band's values — the
            # SQL-reproducible form (xxhash64 is Spark-only)
            return F.concat_ws("|", *cols)
        return F.xxhash64(*cols).cast("string")

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), bkey(b).alias("bhash"))
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.explode(bands).alias("b")
    ).select(id_col, "b.band", "b.bhash")


def _report_cap_hits(
    sized: DataFrame, keys: list[str], cap: int, cap_stats: dict
) -> None:
    """Fill ``cap_stats`` with how hard a mega-bucket guard bit:
    ``buckets_over_cap`` (distinct over-cap groups) and ``rows_dropped``
    (banding rows those groups excluded from the join). Diagnostic-only
    — costs one extra aggregation job over the slim sized rows, so it
    runs only when a caller (bench harness, capacity test) asks."""
    row = (
        sized.where(F.col("_bsz") > cap)
        .groupBy(*keys)
        .agg(F.first("_bsz").alias("_n"))
        .agg(
            F.count("*").alias("b"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
        )
        .collect()[0]
    )
    cap_stats["buckets_over_cap"] = int(row["b"])
    cap_stats["rows_dropped"] = int(row["r"])
    cap_stats["cap"] = cap


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 10000,
    portable: bool = False,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing ≥1 LSH band bucket, with
    ``est_jaccard`` = signature agreement fraction.

    ``max_bucket_size`` guards against degenerate mega-buckets (boiler-
    plate/duplicated shingle sets put huge doc sets into one (band, hash)
    bucket, and the within-bucket join is quadratic): buckets above the
    cap are skipped before the join. CAVEAT: byte-identical docs share
    every band, so an identical-doc clique larger than the cap loses ALL
    its pairs — run ``dedup_exact`` BEFORE minhash (exact duplicates are
    its job) or pass ``max_bucket_size=None``. For genuinely *near* (not
    identical) duplicates the loss is rare: such pairs co-occur in
    several independent bands. Standard production LSH trade."""
    n_hashes = n_bands * rows_per_band

    # the signature table feeds THREE consumers (band explode + two
    # agreement joins); a lazy localCheckpoint materializes the expensive
    # 64-way aggregation exactly once (same pattern as
    # topk.with_global_seq — GC-cleaned, partition ids frozen)
    sigs = sigs.localCheckpoint(eager=False)

    # SLIM banding rows (band_rows): carrying the 64-long signature
    # arrays through the explode/window/self-join would multiply every
    # band row (and every within-bucket join row — quadratic in bucket
    # size) by ~0.5 KB and turn the stage memory-bandwidth bound; the
    # agreement join below re-attaches signatures to the DEDUPED pairs
    # instead, which is the small side of the funnel.
    exploded = band_rows(sigs, id_col, n_bands, rows_per_band, portable)
    if max_bucket_size is not None:
        # window count over (band, bhash): one shuffle over slim rows
        w = Window.partitionBy("band", "bhash")
        sized = exploded.withColumn("_bsz", F.count("*").over(w))
        if cap_stats is not None:
            _report_cap_hits(
                sized, ["band", "bhash"], max_bucket_size, cap_stats
            )
        exploded = sized.where(F.col("_bsz") <= max_bucket_size).drop(
            "_bsz"
        )

    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = pairs.join(
        sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")),
        "id_a",
    ).join(
        sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")),
        "id_b",
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return pairs.select(
        "id_a", "id_b", (agree / F.lit(n_hashes)).alias("est_jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int | None = 10000,
    portable: bool = False,
    collapse_identical: bool = False,
    cap_stats: dict | None = None,
) -> DataFrame:
    """End-to-end near-dup pairs with est_jaccard ≥ threshold.

    Run ``dedup_exact`` first — see the mega-bucket caveat on
    ``lsh_candidate_pairs`` (``max_bucket_size`` passes through);
    ``portable=True`` uses the SQL-reproducible hash family (oracle
    checkable, slower). Production shingles travel pre-hashed
    (``word_shingle_hashes``): the distinct exchange and the 64-way
    signature aggregation both work on 8-byte longs, never re-reading
    shingle strings.

    ``collapse_identical=True`` routes identical-signature groups around
    the banding join (:func:`collapse_identical_signatures`): a
    collapsed clique appears as a star to its representative
    (est_jaccard exactly 1.0) instead of all C(n,2) pairs, and the
    representative alone carries the clique into banding. While
    ``max_bucket_size`` does not bind, the pair set is
    CONNECTIVITY-EQUIVALENT to the full path — same transitive closure,
    same clusters. When a clique EXCEEDS the cap the two paths diverge,
    in the collapse path's favor: the full path drops every band bucket
    the clique floods and so loses the whole clique (the documented
    identical-doc caveat on :func:`lsh_candidate_pairs`), while the
    collapse path keeps it — star edges never enter banding, and the
    lone representative shrinks its buckets back under the cap.
    Default off: this operator's standalone contract (and its oracle) is
    the full bucket-cooccurrence pair set; the curation chain — where
    pairs only feed connected components — turns it on."""
    if portable:
        sh = word_shingles(df, id_col, text_col, k)
        sigs = minhash_signatures(
            sh, id_col, n_bands * rows_per_band, portable=True
        )
    else:
        sh = word_shingle_hashes(df, id_col, text_col, k)
        sigs = minhash_signatures_from_hashes(
            sh, id_col, n_bands * rows_per_band
        )
    if collapse_identical:
        # the sig table feeds the collapse groupBy AND join — freeze the
        # expensive 64-way aggregation once (lazy; GC-cleaned)
        sigs = sigs.localCheckpoint(eager=False)
        reps, members = collapse_identical_signatures(sigs, id_col)
        rep_pairs = lsh_candidate_pairs(
            reps, id_col, n_bands, rows_per_band, max_bucket_size,
            portable=portable, cap_stats=cap_stats,
        )
        member_pairs = members.select(
            F.col("rep_id").alias("id_a"),  # rep = group min, so id_a < id_b
            F.col(id_col).alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
        return rep_pairs.where(
            F.col("est_jaccard") >= threshold
        ).unionByName(member_pairs)
    return lsh_candidate_pairs(
        sigs, id_col, n_bands, rows_per_band, max_bucket_size,
        portable=portable, cap_stats=cap_stats,
    ).where(F.col("est_jaccard") >= threshold)


def minhash_dedup_incremental(
    new_df: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int | None = 10000,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs for the documents arriving THIS crawl round,
    against an already-signed corpus AND each other — without re-pairing
    the corpus against itself. Returns ``(pairs, new_sigs)``.

    This is the recurring-crawl shape at 10^10 docs: the corpus-vs-
    corpus pair set was resolved in earlier rounds; re-running
    :func:`minhash_dedup` over old+new repays the whole quadratic-ish
    banding funnel every round for pairs that cannot have changed.
    Incrementally, each round costs signatures for the NEW docs plus one
    banding join of (corpus ∪ new) bucket rows against the NEW bucket
    rows — per-round work scales with the round, not the corpus, and the
    signature store (``corpus_sigs`` ∪ returned ``new_sigs``) is the
    only state carried forward. Store :func:`band_rows` of the corpus
    alongside to skip even the corpus re-explode.

    ``pairs`` columns: ``(id_a, id_b, est_jaccard, vs_corpus)`` where
    ``id_b`` is always a new doc; ``vs_corpus`` marks corpus-side
    ``id_a`` (new-new pairs have ``id_a < id_b``). EQUIVALENCE: with the
    same cap, the pair set equals the full ``minhash_dedup(old ∪ new)``
    restricted to pairs touching a new doc (orientation aside) — the
    bucket-size guard counts corpus and new rows together, exactly like
    the full run (property-tested). Requires new ids disjoint from
    corpus ids (a crawl store's monotone doc ids satisfy this).
    """
    n_hashes = n_bands * rows_per_band
    if portable:
        sh = word_shingles(new_df, id_col, text_col, k)
        new_sigs = minhash_signatures(sh, id_col, n_hashes, portable=True)
    else:
        sh = word_shingle_hashes(new_df, id_col, text_col, k)
        new_sigs = minhash_signatures_from_hashes(sh, id_col, n_hashes)
    # feeds banding + the agreement joins + the caller's store append
    new_sigs = new_sigs.localCheckpoint(eager=False)

    nb = band_rows(new_sigs, id_col, n_bands, rows_per_band, portable)
    ob = band_rows(corpus_sigs, id_col, n_bands, rows_per_band, portable)
    un = ob.withColumn("_new", F.lit(False)).unionByName(
        nb.withColumn("_new", F.lit(True))
    )
    if max_bucket_size is not None:
        # cap on the COMBINED bucket (corpus + new rows) — the same
        # population the full run counts, keeping equivalence exact
        w = Window.partitionBy("band", "bhash")
        un = (
            un.withColumn("_bsz", F.count("*").over(w))
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    un = un.localCheckpoint(eager=False)  # feeds both join sides
    a = un.alias("a")
    b = un.where(F.col("_new")).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (
                (~F.col("a._new"))
                | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (~F.col("a._new")).alias("vs_corpus"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    all_sigs = corpus_sigs.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
    ).unionByName(
        new_sigs.select(
            F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
        )
    )
    pairs = pairs.join(all_sigs, "id_a").join(
        new_sigs.select(
            F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")
        ),
        "id_b",
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda v: v,
        )
    )
    scored = pairs.select(
        "id_a",
        "id_b",
        (agree / F.lit(n_hashes)).alias("est_jaccard"),
        "vs_corpus",
    ).where(F.col("est_jaccard") >= threshold)
    return scored, new_sigs


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit simhash per doc, batch-vectorized.

    Token hashes + bit matrices are computed ONCE per distinct token in
    the Arrow batch (natural text is zipfian — the per-batch vocabulary
    is a small fraction of total token occurrences), then each doc's
    votes are one fancy-indexed row-sum. Output is bit-for-bit identical
    to per-doc hashing."""
    docs = [tokenize(t) for t in texts]
    vocab: dict[str, int] = {}
    for toks in docs:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    if vocab:
        hs = np.fromiter(
            (hash_token(t) for t in vocab), dtype=np.uint64, count=len(vocab)
        )
        # (vocab, 64) bit matrix, small ints for fast row sums
        bit_mat = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
        ).astype(np.int32)
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = np.zeros(len(docs), dtype=np.int64)
    for i, toks in enumerate(docs):
        if not toks:
            continue
        idx = np.fromiter(
            (vocab[t] for t in toks), dtype=np.intp, count=len(toks)
        )
        # int32 sums can't underflow; *2 - n stays signed
        votes = bit_mat[idx].sum(axis=0) * 2 - len(toks)
        sig = powers[votes > 0].sum(dtype=np.uint64)
        out[i] = int(sig.astype(np.int64))
    return pd.Series(out)


def hash_token(tok: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a), process-independent."""
    h = 0xCBF29CE484222325
    for ch in tok.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return df.select(F.col(id_col), _simhash_udf(F.col(text_col)).alias("simhash"))


def with_portable_simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    n_bits: int = 60,
) -> DataFrame:
    """Append the SQL-portable simhash as a column, PRESERVING every
    other column — pure per-row algebra (zero shuffle, no UDF), so it
    drops into batch selects and Structured Streaming plans alike
    (``streaming/curation.streamed_near_dedup`` keys its in-watermark
    state on it).

    The token-hash array is materialized as a temp column first so
    codegen cannot re-expand the per-token md5 into all ``n_bits``
    majority votes (same trick as the minhash base column).
    """
    toks = word_tokens(F.coalesce(F.col(text_col), F.lit("")))
    hs = F.transform(
        toks,
        lambda t: portable_hash64(t),
    )
    tmp_hs, tmp_n = "_simhash_hs", "_simhash_n"
    out = df.withColumn(tmp_hs, hs).withColumn(tmp_n, F.size(toks))

    def vote(b: int):
        ones = F.size(
            F.filter(
                F.col(tmp_hs),
                lambda h: F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
                == F.lit(1),
            )
        )
        return ones * 2 - F.col(tmp_n)

    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        sig = sig + F.when(
            vote(b) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out.withColumn(out_col, sig).drop(tmp_hs, tmp_n)


def simhash_portable_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
) -> DataFrame:
    """SQL-portable simhash: md5-prefix token hash, 60-bit signature, pure
    per-row column algebra — zero shuffle, no UDF.

    The production operator is :func:`simhash_signatures` (FNV-1a,
    batch-vectorized pandas UDF). This variant exists so the simhash
    *algorithm* — per-bit majority vote over token hashes — is
    value-checkable against an independent engine (the DuckDB oracle runs
    the identical md5-prefix votes), the same dual-path pattern as
    ``minhash_signatures(portable=True)``. Tokens are the relational
    ``word_tokens`` (lower/split/filter-empties) so both engines tokenize
    identically; token multiplicity weights votes, as in the UDF path.
    """
    return with_portable_simhash(df, text_col, "simhash", n_bits).select(
        F.col(id_col), F.col("simhash")
    )


def simhash_chunks(max_hamming: int, sig_col: str = "simhash"):
    """Pigeonhole chunk array for a 64-bit simhash column: ``d + 1``
    disjoint bit ranges as ``struct<chunk:int, val:bigint>`` — d bit
    flips cannot touch every chunk, so two signatures within hamming d
    share at least one equal chunk value. Shared by the batch pair
    generator (:func:`simhash_near_dups`) and the streaming hamming
    rung (``streaming.curation.streamed_near_dedup``) so both band
    identically."""
    n_chunks = max_hamming + 1
    base_w, extra = divmod(64, n_chunks)
    bounds = []
    off = 0
    for c in range(n_chunks):
        w = base_w + (1 if c < extra else 0)
        bounds.append((off, w))
        off += w
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col(sig_col), off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
            for c, (off, w) in enumerate(bounds)
        ]
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
    portable: bool = False,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ d via pigeonhole banding.

    The 64-bit signature is split into ``d + 1`` chunks: d bit-flips
    cannot touch every chunk, so two signatures within hamming d share at
    least one equal chunk — candidates come from equality joins on
    chunks, then exact verification with JVM-side ``bit_count(xor)``.
    Chunk count scales with ``max_hamming`` (recall guarantee holds for
    any d ≤ 63); more chunks ⇒ shorter chunks ⇒ more candidates.

    ``max_bucket_size`` guards the chunk join the same way
    ``lsh_candidate_pairs`` guards band buckets: a clique of identical or
    near-identical docs shares every chunk value, making the within-bucket
    join quadratic in the clique. Buckets above the cap are skipped — run
    ``dedup_exact`` first so identical-doc cliques never reach this
    operator (that is exact dedup's job); for genuinely near docs the pair
    usually survives via another, smaller chunk bucket. The default cap
    (10000) keeps the operator safe at web-corpus scale; pass ``None``
    explicitly for the exact recall-≤-d contract — after running
    ``dedup_exact``, so identical-doc cliques never reach this join.

    ``portable=True`` swaps the signature source to
    :func:`simhash_portable_signatures` (md5-prefix hash family) — the
    pigeonhole banding has EXACT recall at hamming ≤ d and the pairs are
    exactly-verified, so the full pair set is deterministic and the
    DuckDB oracle can check it with a brute-force hamming join over the
    same SQL-computed signatures (value-proof of the banding itself).
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63]")
    sigs = (
        simhash_portable_signatures(df, id_col, text_col)
        if portable
        else simhash_signatures(df, id_col, text_col)
    )
    if max_hamming == 0:
        # one 64-bit "chunk" would need an unrepresentable (1<<64)-1 mask;
        # hamming 0 is simply signature equality — a plain self-join
        a, b = sigs.alias("a"), sigs.alias("b")
        return (
            a.join(
                b,
                (F.col("a.simhash") == F.col("b.simhash"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.lit(0).alias("hamming"),
            )
        )
    ex = sigs.select(
        id_col, "simhash",
        F.explode(simhash_chunks(max_hamming)).alias("c"),
    ).select(id_col, "simhash", "c.chunk", "c.val")
    if max_bucket_size is not None:
        w_b = Window.partitionBy("chunk", "val")
        sized = ex.withColumn("_bsz", F.count("*").over(w_b))
        if cap_stats is not None:
            _report_cap_hits(
                sized, ["chunk", "val"], max_bucket_size, cap_stats
            )
        ex = sized.where(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("s_a"),
            F.col("b.simhash").alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .drop("s_a", "s_b")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp): comp = min node id in the node's connected component.

    The canonical-assignment step after any near-dup pair generator
    (minhash/simhash/embedding-LSH emit PAIRS; keeping one doc per
    duplicate CLUSTER needs the transitive closure). Iterative
    min-label propagation with pointer jumping:

      1. neighbor step — each node takes the min label among itself and
         its direct neighbors (one shuffle on the symmetric edge list);
      2. pointer-jump step — each node re-reads the label OF its current
         label (path halving), collapsing chains in O(log n) rounds
         instead of O(diameter).

    Each iteration is localCheckpointed — iterative Spark plans otherwise
    grow lineage exponentially — and the loop stops when a round changes
    no label (one small count per round). Near-dup clusters have tiny
    diameters, so this typically converges in 2-4 rounds.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # 1. min over direct neighborhood
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_min", F.col("comp"))
                ).alias("comp"),
            )
        )
        # 2. pointer jump: comp <- comp(comp)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        jumped = (
            stepped.join(parent, stepped.comp == parent.p_node, "left")
            .select(
                "node",
                F.coalesce("p_comp", "comp").alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(node, canon_id, is_dup) over the pair graph's components — the
    cluster-level twin of ``exact_duplicates`` (nodes in no pair are not
    emitted; they are trivially canonical)."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.select(
        F.col("node"),
        F.col("comp").alias("canon_id"),
        (F.col("node") != F.col("comp")).alias("is_dup"),
    )


def cluster_survivors(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Pick ONE survivor per duplicate cluster by QUALITY instead of by
    min-id: the member with the highest score wins, ties break to the
    lowest id. In production curation the cluster member kept is usually
    the longest or highest-quality page, not an arbitrary canonical —
    this is the knob (compose with :func:`dedup_clusters` output and any
    score table, e.g. ``operators.quality.quality_scores`` or a plain
    text length).

    ``clusters`` is ``(node, canon_id, ...)``; ``scores`` maps
    ``id_col`` → ``score_col``. Returns ``(node, canon_id, keep)`` with
    exactly one ``keep=true`` row per cluster.

    Scale shape: one equi-join on the uniform node id plus one
    cluster-keyed window (clusters are tiny — pair-graph components),
    no corpus-sized state.
    """
    # LEFT join: a cluster member missing from the score table must
    # still receive a keep decision (it sorts after every scored member
    # via nulls-last), and a wholly-unscored cluster still keeps its
    # lowest-id member — "exactly one keep per cluster" holds always.
    joined = clusters.join(
        scores.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("_s")
        ),
        "node",
        "left",
    )
    w = Window.partitionBy("canon_id").orderBy(
        F.col("_s").desc_nulls_last(), F.col("node")
    )
    return joined.withColumn("_rn", F.row_number().over(w)).select(
        "node", "canon_id", (F.col("_rn") == 1).alias("keep")
    )


def plan_lsh_bands(
    threshold: float,
    n_hashes: int = 64,
    fp_weight: float = 0.5,
    steps: int = 1000,
) -> tuple[int, int]:
    """Choose the LSH banding ``(n_bands, rows_per_band)`` for a target
    jaccard ``threshold``.

    With ``b`` bands of ``r`` rows, a pair at jaccard ``s`` becomes a
    candidate with probability ``1 - (1 - s^r)^b`` (the classic S-curve,
    MMDS ch. 3). This picks the factorization ``b·r = n_hashes``
    minimizing ``fp_weight · ∫₀ᵗ P(s) ds + (1-fp_weight) · ∫ₜ¹ (1-P(s)) ds``
    — the false-positive mass below the threshold plus the false-negative
    mass above it, numerically integrated (the same objective the public
    datasketch library optimizes). Lower ``fp_weight`` when missed
    near-dups cost more than extra candidate verification.

    Pure driver-side arithmetic over the O(d(n)) divisor pairs — call it
    once when configuring :func:`minhash_dedup` / :func:`minhash_signatures`
    instead of hand-picking ``n_bands``/``rows_per_band``.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if n_hashes < 2:
        raise ValueError(f"n_hashes must be >= 2, got {n_hashes}")
    best: tuple[float, int, int] | None = None
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        fp = fn = 0.0
        dx = 1.0 / steps
        for i in range(steps):
            s = (i + 0.5) * dx
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p * dx
            else:
                fn += (1.0 - p) * dx
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def soft_dedup_weights(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "weight",
) -> DataFrame:
    """Soft deduplication: per-document TRAINING WEIGHT instead of removal.

    Members of a near-dup cluster get weight ``1 / cluster_size``;
    documents in no cluster keep weight ``1.0`` — the loss then sees each
    duplicated content unit once in expectation while every individual
    page (and its unique context: host, anchors, freshness) stays in the
    corpus. This is the down-weighting alternative to dropping that
    SemDeDup/D4-style curation pipelines expose as a knob next to hard
    removal (compose ``clusters`` from :func:`dedup_clusters` over any
    pair source: minhash, simhash, or embedding-cosine).

    Scale shape: cluster sizes come from one ``groupBy`` on ``canon_id``
    over the CLUSTER table (pair-graph components — orders of magnitude
    smaller than the corpus), then one equi-join back to ``docs`` on the
    uniformly-distributed id. The corpus itself never shuffles; with AQE
    the member-weight side broadcasts when small.

    Returns ``docs`` narrowed to ``(id_col, weight_col)`` with the weight
    rounded to 6 dp (double).
    """
    sizes = clusters.groupBy("canon_id").agg(F.count("*").alias("_csz"))
    member_w = (
        clusters.join(sizes, "canon_id")
        .select(
            F.col("node").alias(id_col),
            (F.lit(1.0) / F.col("_csz")).alias("_w"),
        )
    )
    return docs.select(id_col).join(member_w, id_col, "left").select(
        id_col,
        F.round(F.coalesce(F.col("_w"), F.lit(1.0)), 6)
        .cast("double")
        .alias(weight_col),
    )


def near_dup_curation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int | None = 10000,
    portable: bool = False,
    cap_stats: dict | None = None,
) -> DataFrame:
    """The guarded end-to-end near-dup removal chain, composed in the
    order the individual operators' contracts require:

      ``dedup_exact`` (byte-identical cliques die here, so no identical-doc
      mega-bucket ever reaches the LSH join) → ``minhash_dedup`` with the
      mega-bucket guard ON (banding buckets above ``max_bucket_size`` are
      skipped — safe now precisely because exact dedup ran first) →
      ``dedup_clusters`` (transitive closure of the pair graph) → survivors
      (one doc per cluster, min-id canonical).

    This is the configuration a 100 TB curation pass runs: every stage is
    bounded — no quadratic blow-up on boilerplate cliques — and the whole
    chain is one Catalyst plan (no materialization between stages). The
    unguarded defaults on the individual operators exist for their exact
    contracts + oracles; this composition is the scale path.

    The production path (``portable=False``) also collapses
    identical-signature groups before banding
    (:func:`collapse_identical_signatures`): while ``max_bucket_size``
    does not bind, clusters and survivors are identical to the full
    pair set (test-asserted), with near-boilerplate cliques costing
    O(n) instead of O(n²). For a clique LARGER than the cap the paths
    deliberately diverge: full banding loses the whole clique to the
    bucket guard (every one of its buckets floods — the documented
    identical-doc caveat), so the old production chain KEPT all copies
    of over-cap boilerplate; the collapse path still removes them —
    star edges bypass banding and the lone representative fits under
    the cap (test-asserted with a clique 2× the cap). The portable path
    keeps full banding because its DuckDB oracle mirrors the full
    bucket-cooccurrence SQL.
    """
    unique = dedup_exact(df, id_col, text_col)
    pairs = minhash_dedup(
        unique, id_col, text_col, k, n_bands, rows_per_band,
        threshold, max_bucket_size, portable,
        collapse_identical=not portable, cap_stats=cap_stats,
    )
    dup_ids = (
        dedup_clusters(pairs)
        .where(F.col("is_dup"))
        .select(F.col("node").alias(id_col))
    )
    return unique.join(dup_ids, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact n-gram jaccard (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Exact jaccard over distinct word n-grams, sub-quadratic via the
    inverted index: pairs sharing ≥1 gram → |A∩B| by count, |A∪B| from
    per-doc gram counts. Returns (id_a, id_b, jaccard ≥ threshold).

    ``max_doc_freq`` caps the posting list: a shingle present in ``f``
    docs emits f² candidate pairs, so one boilerplate shingle shared by a
    million docs is a 10^12-pair explosion. Shingles with document
    frequency > the cap are dropped from the inverted-index join only —
    union sizes still count every shingle, so the score is a LOWER bound
    (intersection misses dropped shingles, union is exact): no false
    near-dups, and a pair whose overlap is mostly ultra-common boilerplate
    was below any useful threshold anyway. The same guard as
    ``lsh_candidate_pairs``' mega-bucket cap. The default cap (10000)
    keeps the operator safe at web-corpus scale; pass ``None`` explicitly
    for the exact contract (what this operator's DuckDB oracle checks).
    """
    grams = word_shingles(df, id_col, text_col, n)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    if max_doc_freq is not None:
        # window count over shingle: one shuffle (the join shuffles on
        # shingle anyway), no second aggregation scan of the gram lineage
        w_df = Window.partitionBy("shingle")
        grams = (
            grams.withColumn("_df", F.count("*").over(w_df))
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_grams").alias("na")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
