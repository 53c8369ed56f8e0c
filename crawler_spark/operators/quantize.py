"""Scalar (int8) embedding quantization — the ANN memory-scale path.

At 100 TB the embedding table is the similarity tier's dominant cost:
10^10 docs × 64-1024 float32 dims. Per-dimension scalar quantization to
uint8 (the standard first rung below product quantization — what FAISS
calls ``SQ8``) cuts storage and scan bytes 4× and keeps distance
computation vectorizable; recall loss at 8 bits is small because
per-dimension ranges are tight after normalization (exercised by the
recall test in tests/test_quantize.py).

Spark-first design — every step is column algebra, no UDF:

  * ``dimension_stats``: ONE corpus aggregation producing d mins and d
    maxes (an expression per dimension, all partial-aggregated
    map-side; d is dimension-table-sized, so the result is a 1-row
    broadcast);
  * ``quantize`` / ``reconstruction_error``: per-row ``transform`` /
    ``aggregate`` folds over the vector paired with the broadcast
    stats row — zero corpus shuffle, index-ordered folds so the error
    numbers are bit-reproducible across engines (the DuckDB oracle
    runs the same fold);
  * degenerate dimensions (min == max) quantize to 0 and reconstruct
    to the constant — guarded in both directions.

Edge contracts (ANSI mode aborts a job on out-of-bounds array access
or divide-by-zero, so each is guarded explicitly): ragged/short vectors
read stats through ``F.get`` (NULL beyond the stats dim, skipped by
min/max — the ``dust.py`` convention), empty vectors quantize to empty
codes with zero error (``sequence(0, -1)`` would otherwise DESCEND),
codes are clamped to [0, 255] so reusing stored stats on
out-of-range data keeps the uint8 contract instead of silently
emitting e.g. 1020, and an empty corpus raises a clear ValueError.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dimension_stats(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """1-row DataFrame ``(mins: array<double>, maxs: array<double>)``.

    ``dim`` defaults to the first row's vector length (one tiny driver
    lookup; a deployment stores d with the table schema)."""
    if dim is None:
        head = emb.select(F.size(vec_col).alias("d")).first()
        if head is None:
            raise ValueError(
                "dimension_stats: empty embeddings input and no explicit"
                " dim= — pass dim or a non-empty corpus"
            )
        dim = head["d"]
    v = F.col(vec_col)
    # F.get, not v[i]: a vector shorter than dim yields NULL for the
    # missing dimensions (skipped by min/max) instead of an ANSI
    # out-of-bounds job abort
    return emb.agg(
        F.array(
            *[F.min(F.get(v, i).cast("double")) for i in range(dim)]
        ).alias("mins"),
        F.array(
            *[F.max(F.get(v, i).cast("double")) for i in range(dim)]
        ).alias("maxs"),
    )


def _q_expr(vec: Column, mins: Column, maxs: Column) -> Column:
    """uint8 code per element: round((x-min)/(max-min)*255) clamped to
    [0, 255], 0 when the dimension is constant."""
    codes = F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda i: F.when(
            F.get(maxs, i) == F.get(mins, i), F.lit(0)
        ).otherwise(
            # clamp: with REUSED stats (quantizing a new round against
            # the stored codebook ranges) out-of-range values must
            # saturate at the byte bounds, not escape the uint8 contract
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round(
                        (vec[i].cast("double") - F.get(mins, i))
                        / (F.get(maxs, i) - F.get(mins, i))
                        * F.lit(255.0)
                    ).cast("int"),
                ),
            )
        ),
    )
    # sequence(0, -1) DESCENDS ([0, -1]) instead of producing an empty
    # array — empty vectors must yield empty codes, not an abort
    return F.when(
        F.coalesce(F.size(vec), F.lit(0)) <= 0,
        F.array().cast("array<int>"),
    ).otherwise(codes)


def quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: DataFrame | None = None,
) -> DataFrame:
    """``(id, codes: array<int>)`` — uint8 codes per dimension."""
    stats = stats if stats is not None else dimension_stats(emb, vec_col)
    return (
        emb.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            _q_expr(F.col(vec_col), F.col("mins"), F.col("maxs")).alias(
                "codes"
            ),
        )
    )


def reconstruction_error(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Per-vector quantization fidelity: ``(id, mse, max_abs_err)``.

    Errors are computed with an index-ordered per-row fold (quantize →
    dequantize → squared/abs error), so the sums are deterministic and
    engine-portable; both outputs rounded to 9 dp (errors are ~1e-3
    scale — 6 dp would quantize the metric itself). Empty vectors
    report (0.0, 0.0)."""
    stats = stats if stats is not None else dimension_stats(emb, vec_col)
    vec = F.col(vec_col)
    mins, maxs = F.col("mins"), F.col("maxs")

    def dequant(i):
        mn, mx = F.get(mins, i), F.get(maxs, i)
        code = F.when(mx == mn, F.lit(0)).otherwise(
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.round(
                        (vec[i].cast("double") - mn) / (mx - mn) * F.lit(255.0)
                    ),
                ),
            )
        )
        return F.when(mx == mn, mn).otherwise(
            mn + code / F.lit(255.0) * (mx - mn)
        )

    err = lambda i: vec[i].cast("double") - dequant(i)  # noqa: E731
    n = F.coalesce(F.size(vec), F.lit(0))
    # same sequence(0, -1) guard as _q_expr: empty vector → empty fold
    idx = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.size(vec) - 1)
    )
    sq_sum = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + err(i) * err(i)
    )
    max_abs = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: F.greatest(acc, F.abs(err(i)))
    )
    mse = F.when(n <= 0, F.lit(0.0)).otherwise(sq_sum / n)
    return (
        emb.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(mse, 9).cast("double").alias("mse"),
            F.round(max_abs, 9).cast("double").alias("max_abs_err"),
        )
    )
