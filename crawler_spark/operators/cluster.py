"""Distributed k-means over embedding columns (Lloyd's iterations).

Trains the centroids the ANN/semantic tier consumes: ``similarity.ivf_topk``
and ``similarity.semantic_dedup`` accept a pre-built ``centroids`` ndarray,
and until now the only producer was ``similarity._centroids`` — a hash-pick
of k corpus rows, i.e. an UNtrained codebook. D4 (Tirumala et al. 2023)
diversifies LLM training data with exactly this clustering step (embed →
k-means → rebalance across clusters), and IVF recall at a fixed probe count
improves with trained cells. The reference crawler has no analog (pages are
never embedded — ``types.ts`` has no vector field); this is part of the
beyond-reference training-data tier.

Scale shape (production ``kmeans_fit``):

- E-step: nearest-centroid assignment is one numpy matmul per Arrow batch
  against the BROADCAST (k × dim) codebook — the corpus never shuffles.
- M-step: each partition emits at most k partial rows (cell, count,
  sum-vector); the driver collects ≤ partitions × k of them and reduces in
  numpy. Driver state is k × dim doubles — the same centroid-table-sized
  collect ``similarity._centroids`` already performs, constant in corpus
  size. This is the classic scalable Lloyd's (MLlib's treeAggregate shape).
- Per iteration: ONE mapInPandas pass over the corpus, zero exchanges
  (plan-asserted in tests/test_cluster.py).

``kmeans_portable_assign`` is the engine-portable value-proof twin (same
pattern as ``minhash_portable`` / ``lsh_portable_bucket_ids``): embeddings
quantized to an integer grid (``floor(x·1000)``) make the M-step sums
ORDER-INDEPENDENT-exact (integer-valued doubles < 2^53), and every dot
product / norm is a LEFT FOLD in array-index order (``F.aggregate`` here,
``list_reduce`` in DuckDB), so assignments after any number of iterations
agree bit-for-bit with the unrolled SQL oracle — no float-tie tolerance
caveat. Ties in the argmax break to the lowest cell id on both engines.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


# ---------------------------------------------------------------------------
# production: spherical Lloyd's, numpy kernels, broadcast codebook
# ---------------------------------------------------------------------------


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Spherical k-means: rows are L2-normalized once inside the kernel,
    assignment maximizes cosine, the new centroid is the (renormalized)
    mean of its members. Returns the (k × dim) unit-row codebook, ready
    for ``similarity.ivf_assign`` / ``ivf_topk`` / ``semantic_dedup``.

    ``init`` defaults to the deterministic hash sample
    (``similarity._centroids``) so the whole fit is a pure function of
    the data — reproducible across runs, retries and partitionings. An
    empty cell keeps its previous centroid (it can re-acquire members
    later); with unit inputs the objective (Σ max-cosine) is the standard
    non-decreasing Lloyd's objective.
    """
    from crawler_spark.operators.similarity import _centroids

    spark = emb.sparkSession
    cents = (
        _centroids(emb, k, id_col, vec_col) if init is None else init
    ).astype("float64")
    if cents.shape[0] != k:
        raise ValueError(f"init has {cents.shape[0]} rows, expected k={k}")
    data_dim = int(emb.select(F.size(vec_col)).first()[0])
    if cents.shape[1] != data_dim:
        raise ValueError(
            f"init dim {cents.shape[1]} != embedding dim {data_dim}"
        )
    # the E-step is a plain dot against the codebook, so cosine semantics
    # (and the documented unit-row return for empty cells) require unit
    # init rows — normalize defensively; a no-op for unit inputs
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    dim = cents.shape[1]
    schema = "cell int, n long, s array<double>"

    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cb = bc.value
            acc_n = np.zeros(len(cb), dtype="int64")
            acc_s = np.zeros_like(cb)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(mat @ cb.T, axis=1)
                acc_n += np.bincount(cell, minlength=len(cb))
                np.add.at(acc_s, cell, mat)
            hit = np.nonzero(acc_n)[0]
            yield pd.DataFrame(
                {
                    "cell": hit.astype("int32"),
                    "n": acc_n[hit],
                    "s": list(acc_s[hit]),
                }
            )

        rows = emb.select(vec_col).mapInPandas(partials, schema).collect()
        total_n = np.zeros(k, dtype="int64")
        total_s = np.zeros((k, dim), dtype="float64")
        for r in rows:
            total_n[r["cell"]] += r["n"]
            total_s[r["cell"]] += np.asarray(r["s"], dtype="float64")
        nxt = cents.copy()  # empty cells keep their previous centroid
        hit = total_n > 0
        nxt[hit] = total_s[hit] / total_n[hit, None]
        nxt[hit] /= np.maximum(
            np.linalg.norm(nxt[hit], axis=1, keepdims=True), 1e-12
        )
        cents = nxt
        bc.destroy()
    return cents


def kmeans_objective(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Σ over rows of max-cosine to the codebook — the spherical Lloyd's
    objective (higher is better). One broadcast matmul pass; used by tests
    to assert training improved on the untrained hash pick."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame({"c": [float((mat @ cb.T).max(axis=1).sum())]})

    part = emb.select(vec_col).mapInPandas(score, "c double")
    row = part.agg(F.sum("c").alias("obj")).collect()[0]
    bc.destroy()
    return float(row["obj"] or 0.0)


# ---------------------------------------------------------------------------
# portable twin: integer-grid quantization + left-fold dots (bit-exact)
# ---------------------------------------------------------------------------


def _fold_dot(vec_col, weights: list[float]):
    """Left fold of Σ vec[i]·w[i] in array-index order — the same op
    sequence as DuckDB ``list_reduce(list_transform(...), (a,b)->a+b)``,
    so results are bit-identical across engines."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col, warr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _py_fold_norm(cent: list[float]) -> float:
    """Python left fold of max(√(Σ c_i²), 1e-12) — IEEE-identical to the
    SQL ``greatest(sqrt(list_reduce(list_transform(c, x -> x*x),
    (a,b)->a+b)), 1e-12)``. The floor guards an all-zero centroid (a
    quantized-to-zero init row or a cell whose members sum to zero in
    every dim): without it the Spark score divides by a literal 0.0 —
    a job-aborting DIVIDE_BY_ZERO under ANSI mode — while DuckDB would
    return NULL and this reference would raise: three different
    behaviors. With the shared floor all three engines score such a
    centroid identically (a huge-but-finite dot/1e-12 ratio)."""
    acc = 0.0
    for c in cent:
        acc = acc + c * c
    return max(math.sqrt(acc), 1e-12)


def kmeans_portable_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_first, cell): assignments after iteration 1 and after
    iteration ``n_iter``, bit-reproducible in SQL.

    Init = the k LOWEST ids' quantized vectors (the ``ivf_portable``
    pick). Quantization ``floor(x·quant)`` (cast long on both engines)
    makes every M-step sum exact regardless of order; assignment scores
    are ``fold-dot(q, c) / fold-norm(c)`` — cosine up to the constant
    |q| factor, which cannot change the per-row argmax — with argmax
    ties to the lowest cell. The M-step shuffles only the map-side
    partial-aggregated (cell, dim) sums (k × dim per partition), then
    the driver folds k × dim longs into next-iteration literals: the
    same centroid-table-sized collect as production. Oracle:
    ``kmeans_portable`` in ``__spark_entry__.oracle_sql``.
    """
    q = emb.select(
        F.col(id_col),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * quant).cast("double")
        ).alias("q"),
    ).localCheckpoint(eager=False)

    init_rows = q.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init_rows)}")
    cents = [[float(x) for x in r["q"]] for r in init_rows]
    dim = len(cents[0])

    def assign_col(cent_lists: list[list[float]]):
        scores = F.array(
            *[
                _fold_dot(F.col("q"), c) / F.lit(_py_fold_norm(c))
                for c in cent_lists
            ]
        )
        # array_position returns the FIRST (1-based) match → tie to
        # lowest cell id, matching the oracle's ORDER BY score DESC, c
        return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

    first = None
    cur = None
    for it in range(n_iter):
        cur = q.withColumn("cell", assign_col(cents))
        if it == 0:
            first = cur.select(
                id_col, F.col("cell").alias("cell_first")
            ).localCheckpoint(eager=False)
        if it == n_iter - 1:
            break
        sums = (
            cur.select(
                "cell", F.posexplode(F.col("q")).alias("pos", "v")
            )
            .groupBy("cell", "pos")  # partial agg → k×dim rows shuffled
            .agg(
                F.sum(F.col("v").cast("long")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        nxt = [list(c) for c in cents]  # empty cells keep previous
        for r in sums:
            nxt[r["cell"]][r["pos"]] = r["s"] / r["n"]  # exact ints → double
        cents = nxt
    return first.join(
        cur.select(id_col, "cell"), id_col, "inner"
    ).select(id_col, "cell_first", "cell")


def kmeans_portable_reference(
    vecs: dict[int, list[float]], k: int = 8, n_iter: int = 2, quant: int = 1000
) -> dict[int, tuple[int, int]]:
    """Serial spec of :func:`kmeans_portable_assign` (same arithmetic,
    same fold order) — used by tests to verify the distributed plan
    bit-for-bit. Returns {id: (cell_first, cell_final)}."""
    ids = sorted(vecs)
    q = {i: [float(math.floor(float(x) * quant)) for x in vecs[i]] for i in ids}
    cents = [list(q[i]) for i in ids[:k]]

    def argmax_cell(row: list[float], cent_lists: list[list[float]]) -> int:
        best, best_s = 0, None
        for ci, c in enumerate(cent_lists):
            acc = 0.0
            for a, b in zip(row, c):
                acc = acc + a * b
            s = acc / _py_fold_norm(c)
            if best_s is None or s > best_s:
                best, best_s = ci, s
        return best

    first: dict[int, int] = {}
    cur: dict[int, int] = {}
    for it in range(n_iter):
        cur = {i: argmax_cell(q[i], cents) for i in ids}
        if it == 0:
            first = dict(cur)
        if it == n_iter - 1:
            break
        nxt = [list(c) for c in cents]
        for ci in range(k):
            members = [i for i in ids if cur[i] == ci]
            if members:
                n = len(members)
                for d in range(len(nxt[ci])):
                    s = 0
                    for i in members:
                        s += int(q[i][d])
                    nxt[ci][d] = s / n
        cents = nxt
    return {i: (first[i], cur[i]) for i in ids}
