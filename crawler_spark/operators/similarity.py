"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Over a table ``embeddings(vec_id long, embedding array<float>, label int)``.

Two tiers:

- ``cosine_topk`` / ``cosine_topk_join`` — exact baseline. The dot product
  stays JVM-side (``F.zip_with`` + ``F.aggregate``) for the single-query
  path; the multi-query join broadcasts the (small) query set and runs one
  Arrow-batched numpy matmul per corpus partition (``mapInPandas``) — the
  classic "small Q × huge corpus" scale shape: corpus is streamed, never
  shuffled; only ``|Q|·k`` candidate rows leave each partition before the
  final skew-safe top-k.
- ``lsh_ann_topk`` — random-hyperplane LSH: ``n_bits`` sign bits from a
  deterministic (seeded) projection matrix → bucket id; probe searches only
  the query's bucket (multi-probe: optionally flip 1 bit). Recall/latency
  trade verified against the exact baseline in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.topk import topk_per_group


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector — fully JVM-side.

    dot = aggregate(zip_with(v, q, *)); the plan is scan → project →
    takeOrdered(k): no shuffle of vectors, only the global top-k heap.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.linalg.norm(np.asarray(query, dtype="float64"))) or 1.0
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # try_divide: a zero corpus vector has norm 0, and a plain divide
    # would abort the whole job under ANSI mode (same guard as
    # _pair_cosine); its cosine is undefined → NULL → sorts last
    cos = F.try_divide(dot, _norm_col(vec_col) * F.lit(qn))
    return (
        emb.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact k-NN join: every query × corpus, queries broadcast.

    Returns (query_id, vec_id, cosine, _rank). Each corpus partition does
    one numpy matmul against the broadcast query matrix and emits only its
    local top-k per query; the global top-k then reduces |parts|·k rows.
    """
    spark = corpus.sparkSession
    q_rows = queries.select(query_id_col, vec_col).collect()
    out_schema_empty = f"{query_id_col} long, {id_col} long, cosine double"
    if not q_rows:
        # zero queries → empty top-k (np.array([]) is 1-D and the axis-1
        # norm below would raise AxisError at plan-build time otherwise)
        return spark.createDataFrame([], out_schema_empty).withColumn(
            "_rank", F.lit(0)
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype="float64")
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = f"{query_id_col} long, {id_col} long, cosine double"

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_l, q_mat_l = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = q_mat_l @ mat.T  # (Q, n)
            n_keep = min(k, sims.shape[1])
            idx = np.argpartition(-sims, n_keep - 1, axis=1)[:, :n_keep]
            rows = {
                query_id_col: np.repeat(q_ids_l, n_keep),
                id_col: pdf[id_col].to_numpy()[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    local = corpus.select(id_col, vec_col).mapInPandas(part_topk, out_schema)
    return topk_per_group(
        local,
        [query_id_col],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
        salt=4,
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------


def _projection(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_ids(
    emb: DataFrame,
    dim: int,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, bucket): sign-bit bucket from seeded hyperplanes."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(_projection(dim, n_bits, seed))

    schema = f"{id_col} long, {vec_col} array<float>, bucket long"

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = bc.value
        weights = (1 << np.arange(proj.shape[0], dtype=np.int64))
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            bits = (mat @ proj.T) > 0
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["bucket"] = (bits @ weights).astype(np.int64)
            yield pdf

    return emb.select(id_col, vec_col).mapInPandas(bucketize, schema)


def lsh_ann_topk(
    emb: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket(s).

    ``multiprobe`` ≥ 1 also probes buckets at hamming distance 1 from the
    query bucket (flipping the lowest-margin bits first), trading latency
    for recall. At scale the bucket column is the table's partition key, so
    a probe is a partition-pruned scan.
    """
    proj = _projection(dim, n_bits, seed)
    qv = np.asarray(query, dtype="float64")
    margins = proj @ qv
    bits = margins > 0
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    base = int((bits @ weights))
    buckets = [base]
    if multiprobe > 0:
        order = np.argsort(np.abs(margins))
        for b in order[:multiprobe]:
            buckets.append(base ^ int(weights[b]))

    bucketed = lsh_bucket_ids(emb, dim, n_bits, seed, id_col, vec_col)
    cand = bucketed.where(F.col("bucket").isin(buckets)).drop("bucket")
    return cosine_topk(cand, query, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


def _pair_cosine(vec_a, vec_b):
    """JVM-side cosine between two array columns (zip_with + aggregate).
    ``try_divide`` so an all-zero vector yields NULL (dropped by every
    ``>= threshold`` filter — a zero vector is near-dup of nothing)
    instead of ANSI-mode DIVIDE_BY_ZERO aborting the whole job."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.try_divide(dot, _norm_col(vec_a) * _norm_col(vec_b))


def cosine_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact (id_a < id_b, cosine ≥ threshold) pairs — O(n²) verification
    baseline for small n (oracle-checkable in SQL). The scale path is
    ``lsh_near_dup_pairs``; this exists to measure its recall and to give
    the DuckDB oracle an exactly-reproducible query."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", _pair_cosine(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_portable_bucket_ids(
    emb: DataFrame,
    dim: int,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, bucket) with an ENGINE-PORTABLE hyperplane family.

    Weights ``w(b, d) = (md5int15("b|d") % 257 − 128) / 128`` are dyadic
    rationals derived from md5 — both Spark (computed driver-side with
    hashlib, embedded as literals) and DuckDB (computed in SQL with the
    same hex-prefix trick) obtain bit-identical doubles, and the per-bit
    dot product is a LEFT FOLD in array order on both engines
    (``F.aggregate`` here, ``list_reduce`` there), so the sign bits —
    hence buckets, hence the banded candidate set — agree exactly. The
    production family is :func:`lsh_bucket_ids` (seeded Gaussian, numpy);
    uniform-dyadic hyperplanes bucket just as well for the value-proof.
    Pure column algebra: no UDF, zero shuffle."""
    from crawler_spark.operators.quality import dyadic_weight

    def w(b: int, d: int) -> float:
        return dyadic_weight(f"{b}|{d}")

    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        warr = F.array(*[F.lit(w(b, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), warr, lambda a, c: a.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            dot > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return emb.select(id_col, vec_col, bucket.alias("bucket"))


def lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Sub-quadratic embedding near-dup pairs: random-hyperplane sign bits
    split into ``n_bands`` bands; candidates join on equal (band, value)
    (high-cosine pairs agree on most sign bits, so some band matches);
    exact cosine verified JVM-side on candidates only. Same banding shape
    as minhash-LSH — pairs never leave their hash bucket until verified.

    ``portable=True`` swaps the hyperplane family to
    :func:`lsh_portable_bucket_ids` so the DuckDB oracle can reproduce
    the buckets — and therefore the exact banded candidate set — in SQL."""
    bucketed = (
        lsh_portable_bucket_ids(emb, dim, n_bits, id_col, vec_col)
        if portable
        else lsh_bucket_ids(emb, dim, n_bits, seed, id_col, vec_col)
    )
    if n_bits % n_bands:
        # a remainder would silently discard the top n_bits % n_bands
        # sign bits from every band — the caller pays for hyperplane
        # dot products that never narrow a candidate bucket
        raise ValueError(
            f"n_bits ({n_bits}) must be divisible by n_bands ({n_bands}):"
            " bands cover exactly n_bands * (n_bits // n_bands) bits"
        )
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("bucket"), i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(n_bands)
        ]
    )
    ex = bucketed.select(
        id_col, vec_col, F.explode(bands).alias("b")
    ).select(id_col, vec_col, "b.band", "b.val")
    a, b = ex.alias("a"), ex.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("cosine", _pair_cosine(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def _centroids(
    emb: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic centroid pick: the ``n_centroids`` rows with smallest
    ``xxhash64(id)`` — a uniform pseudo-random sample that is a pure
    function of the data (no RNG state, reproducible across runs/resumes).
    One tiny collect (n_centroids × dim floats); at 10^10 rows this is the
    standard 'train on a sample' IVF step."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    mat = np.array([r[1] for r in rows], dtype="float64")
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cell): nearest-centroid (max cosine) assignment via
    one numpy matmul per Arrow batch. At scale, write the result
    partitioned by ``cell`` so probes are partition-pruned scans."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    schema = f"{id_col} long, {vec_col} array<float>, cell int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            out = pdf[[id_col, vec_col]].copy()
            out["cell"] = np.argmax(mat @ cents.T, axis=1).astype("int32")
            yield out

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: search only the ``n_probe`` cells whose centroids are
    closest to the query. Exact within probed cells. Pass ``centroids``
    (unit rows, e.g. from ``operators.cluster.kmeans_fit``) to search a
    TRAINED codebook; the default is the untrained hash pick."""
    cents = (
        _centroids(emb, n_centroids, id_col, vec_col)
        if centroids is None
        else centroids
    )
    qv = np.asarray(query, dtype="float64")
    qv = qv / max(float(np.linalg.norm(qv)), 1e-12)
    probe = np.argsort(-(cents @ qv))[:n_probe].tolist()
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    cand = assigned.where(F.col("cell").isin(probe)).drop("cell")
    return cosine_topk(cand, query, k, id_col, vec_col)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cell_size: int | None = None,
    cap_stats: dict | None = None,
    collapse_identical: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate removal (Abbas et al.
    2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication", arXiv:2303.09540): assign each embedding to
    its nearest-centroid cell, compare pairs only WITHIN a cell, and
    drop every row transitively connected to a lower-id row by a
    ``cosine ≥ threshold`` edge. Returns the surviving (id, cell) rows
    — the id set is the curated corpus, ``cell`` kept for downstream
    partition-pruned reads.

    Scale shape — the whole point of the cell step: the quadratic
    pairwise compare is confined to cells (Σ c_i² instead of n², the
    SemDeDup trick), assignment is one numpy matmul per Arrow batch
    (:func:`ivf_assign`), the pair join shuffles on ``cell`` (pick
    ``n_cells`` ≈ n / target-cell-size; write ``assigned`` partitioned
    by cell at corpus scale so each cell's compare is partition-local),
    and the transitive closure is ``dedup_clusters``' O(log n)-round
    min-label propagation. Dedup survivors use min-id, consistent with
    every other dedup operator in this engine.

    ``centroids``: pass pre-normalized rows for a reproducible cell
    layout (the oracle query uses the lowest-id embeddings, mirroring
    ``ivf_portable``); default is the deterministic xxhash64 sample of
    :func:`_centroids`.

    ``collapse_identical`` (default on) is the semantic twin of the
    minhash identical-signature collapse: byte-identical embeddings —
    the embedding of an exact-duplicate document, the dominant dup
    shape in a web corpus — form a fully-connected clique under any
    ``threshold < 1.0`` (cosine(v, v) = 1; all-zero vectors are
    near-dup of NOTHING — ``_pair_cosine`` yields NULL for them — so
    they are excluded from the collapse and pass straight through).
    Each clique collapses to
    its min-id representative BEFORE the quadratic within-cell compare,
    so a boilerplate clique of size m costs O(m) instead of O(m²)
    pairs — without it, a corpus that is 50% exact-dup embeddings makes
    every cell compare quadratic in the dup count no matter how fine
    the cell layout. Result-identical to the uncollapsed run (clique
    members share every outside edge, so components and min-id
    survivors are unchanged — golden-tested); auto-disabled at
    ``threshold >= 1.0`` where float rounding of cosine(v, v) could
    diverge from the exact path. The collapse costs exactly ONE extra
    shuffle: a groupBy on ``(xxhash64(vec), vec, cell)`` whose map-side
    partial aggregation folds each clique to one row per map task
    before anything moves. Grouping on the exact vector alongside its
    hash is the seen-filter's hash-then-confirm pattern — a 64-bit
    collision lands two distinct vectors in two distinct groups, never
    merging them — and the group's min-id row IS the compare set, so no
    join-back is needed: non-representatives are excluded from the
    survivor output by construction (identical vectors share a cell —
    ``ivf_assign`` is deterministic in the vector — so the group key
    adding ``cell`` never splits a clique)."""
    from crawler_spark.operators.dedup import dedup_clusters

    if centroids is None:
        centroids = _centroids(emb, n_cells, id_col, vec_col)
    # assignment feeds the pair join twice plus the survivor anti-join —
    # freeze the mapInPandas output once (lazy; GC-cleaned)
    assigned = ivf_assign(emb, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    compare = assigned
    if collapse_identical and threshold < 1.0:
        # NULL key for zero vectors (cosine NULL ⇒ never a dup) keeps
        # them out of the collapse; they pass straight to the compare
        # set, each surviving on its own id
        sq = F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x,
        )
        keyed = assigned.select(
            id_col, vec_col, "cell",
            F.when(sq > 0, F.xxhash64(F.col(vec_col))).alias("_vkey"),
        )
        reps = (
            keyed.where(F.col("_vkey").isNotNull())
            .groupBy("_vkey", vec_col, "cell")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, vec_col, "cell")
        )
        passthrough = keyed.where(F.col("_vkey").isNull()).select(
            id_col, vec_col, "cell"
        )
        # the compare set feeds the within-cell self-join (twice) and
        # the survivor select — freeze it so the collapse groupBy runs
        # once, mirroring the `assigned` checkpoint it supersedes
        compare = reps.unionByName(passthrough).localCheckpoint(eager=False)
    pairs = semantic_cell_pairs(
        compare, threshold, id_col, vec_col,
        max_cell_size=max_cell_size, cap_stats=cap_stats,
    )
    dups = (
        dedup_clusters(pairs)
        .where(F.col("is_dup"))
        .select(F.col("node").alias(id_col))
    )
    # survivors come from the COMPARE set: with the collapse on, clique
    # non-representatives are absent from it (dropped by construction),
    # so no explicit clique-dup list or join-back is ever built
    return compare.select(id_col, "cell").join(dups, id_col, "left_anti")


def semantic_cell_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
    cap_stats: dict | None = None,
) -> DataFrame:
    """Within-cell (id_a < id_b, cosine ≥ threshold) pairs over an
    ``(id, vec, cell)`` assignment — :func:`semantic_dedup`'s compare
    stage, public so its plan (a cell-keyed equi-join, never a
    cartesian) is independently inspectable/testable.

    ``max_cell_size`` is the cell-level twin of the minhash/simhash
    mega-bucket guards: the within-cell join is quadratic in cell size,
    and a degenerate centroid layout (or an embedding-space hotspot of
    boilerplate vectors) can funnel a corpus-scale fraction into one
    cell — over-cap cells are skipped entirely, so Σ c_i² stays bounded
    by cap·n. Default None: :func:`semantic_dedup`'s standalone
    contract (and its oracle) is the full within-cell pair set; the
    scale chain opts in. ``cap_stats`` (a dict) receives
    ``buckets_over_cap`` / ``rows_dropped`` diagnostics like the
    dedup-module guards."""
    if max_cell_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("cell")
        sized = assigned.withColumn("_csz", F.count("*").over(w))
        if cap_stats is not None:
            from crawler_spark.operators.dedup import _report_cap_hits

            sized2 = sized.withColumnRenamed("_csz", "_bsz")
            _report_cap_hits(sized2, ["cell"], max_cell_size, cap_stats)
        assigned = sized.where(F.col("_csz") <= max_cell_size).drop(
            "_csz"
        )
    a = assigned.select(
        "cell", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = assigned.select(
        "cell", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _pair_cosine(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def _incremental_compare_set(
    new_assigned: DataFrame,
    corpus_assigned: DataFrame,
    id_col: str,
    vec_col: str,
    max_cell_size: int | None = None,
    cap_stats: dict | None = None,
) -> DataFrame:
    """The (corpus-in-touched-cells ∪ new) frame the incremental round
    compares, flagged ``_new`` — public-shaped so its plan (cell-keyed
    semi-join prune, combined-population cell cap) is inspectable in
    tests independently of the checkpoint boundary that hides it from
    the final pair plan."""
    touched = new_assigned.select("cell").distinct()
    old = corpus_assigned.join(touched, "cell", "left_semi")
    un = (
        old.select(id_col, vec_col, "cell")
        .withColumn("_new", F.lit(False))
        .unionByName(
            new_assigned.select(id_col, vec_col, "cell").withColumn(
                "_new", F.lit(True)
            )
        )
    )
    if max_cell_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("cell")
        sized = un.withColumn("_csz", F.count("*").over(w))
        if cap_stats is not None:
            from crawler_spark.operators.dedup import _report_cap_hits

            _report_cap_hits(
                sized.withColumnRenamed("_csz", "_bsz"),
                ["cell"],
                max_cell_size,
                cap_stats,
            )
        un = sized.where(F.col("_csz") <= max_cell_size).drop("_csz")
    return un


def semantic_dedup_incremental(
    new_emb: DataFrame,
    corpus_assigned: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
    cap_stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Semantic near-dup PAIRS for the embeddings arriving THIS crawl
    round, against an already-assigned corpus AND each other — without
    re-pairing the corpus with itself. Returns ``(pairs, new_assigned)``
    — the semantic twin of :func:`~crawler_spark.operators.dedup.
    minhash_dedup_incremental`, completing the recurring-crawl story
    for the SemDeDup tier.

    Per-round cost ∝ the round, not the corpus: the new embeddings are
    assigned to cells with one numpy matmul per Arrow batch
    (:func:`ivf_assign` — ``centroids`` must be the SAME array every
    round or cell identities drift), the corpus state is pruned to the
    cells the round actually touches (a cell-keyed semi-join; store
    ``corpus_assigned`` partitioned by ``cell`` and the prune becomes
    partition pruning at the scan), and one cell-keyed equi-join
    compares (corpus-in-touched-cells ∪ new) against the NEW rows only.
    State carried forward is ``corpus_assigned ∪`` the returned
    ``new_assigned`` (the caller typically appends only the round's
    SURVIVORS — dups never enter the state, so identical-embedding
    cliques cannot accumulate in it across rounds, which is why this
    operator needs no clique collapse of its own).

    ``pairs`` columns: ``(id_a, id_b, cosine, vs_corpus)`` where
    ``id_b`` is always a new row; ``vs_corpus`` marks corpus-side
    ``id_a`` (new-new pairs have ``id_a < id_b``). EQUIVALENCE: with
    the same centroids and cap, the pair set equals the full
    :func:`semantic_cell_pairs` over ``corpus ∪ new`` restricted to
    pairs touching a new row — ``max_cell_size`` counts corpus and new
    rows together per cell, exactly the population the full run counts
    (untouched cells contribute no new-touching pairs, so pruning them
    never changes the restriction; property-tested). Requires new ids
    disjoint from (and, for orientation parity with the full run,
    greater than) corpus ids — a crawl store's monotone ids satisfy
    this."""
    new_assigned = ivf_assign(
        new_emb, centroids, id_col, vec_col
    ).localCheckpoint(eager=False)
    un = _incremental_compare_set(
        new_assigned, corpus_assigned, id_col, vec_col,
        max_cell_size=max_cell_size, cap_stats=cap_stats,
    ).localCheckpoint(eager=False)  # feeds both join sides
    a, b = un.alias("a"), un.where(F.col("_new")).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (
                (~F.col("a._new"))  # corpus rows pair with every new row
                | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        )
        .withColumn(
            "cosine",
            _pair_cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
            (~F.col("a._new")).alias("vs_corpus"),
        )
    )
    return pairs, new_assigned
