"""Scalar quantization: roundtrip bounds, degenerate dims, ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id: long, embedding: array<float>",
    )


def test_roundtrip_error_bounded_by_half_step(spark):
    """|x - dequant(x)| <= (max-min)/255/2 + eps per dimension, and the
    reported mse/max match a numpy replica exactly at 9 dp."""
    from crawler_spark.operators.quantize import reconstruction_error

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(80, 16)).astype("float32")
    got = {
        r["vec_id"]: (r["mse"], r["max_abs_err"])
        for r in reconstruction_error(_emb_df(spark, mat)).collect()
    }
    x = mat.astype("float64")
    mn, mx = x.min(axis=0), x.max(axis=0)
    code = np.round((x - mn) / (mx - mn) * 255.0)
    deq = mn + code / 255.0 * (mx - mn)
    err = x - deq
    half_step = (mx - mn) / 255.0 / 2.0
    assert np.all(np.abs(err) <= half_step + 1e-12)
    for i in range(len(mat)):
        assert got[i][0] == pytest.approx(
            round(float((err[i] ** 2).mean()), 9), abs=2e-9
        )
        assert got[i][1] == pytest.approx(
            round(float(np.abs(err[i]).max()), 9), abs=2e-9
        )


def test_degenerate_dimension_is_exact(spark):
    """A constant dimension must reconstruct exactly (no 0/0)."""
    from crawler_spark.operators.quantize import (
        quantize,
        reconstruction_error,
    )

    mat = np.array([[1.0, 7.5], [2.0, 7.5], [3.0, 7.5]], dtype="float32")
    df = _emb_df(spark, mat)
    codes = {r["vec_id"]: r["codes"] for r in quantize(df).collect()}
    assert all(c[1] == 0 for c in codes.values())
    errs = {r["vec_id"]: r["max_abs_err"] for r in
            reconstruction_error(df).collect()}
    # dim 0 spans [1,3]: max err <= (3-1)/255/2; dim 1 exact
    assert all(e <= (2.0 / 255 / 2) + 1e-9 for e in errs.values())


def test_quantized_knn_recall(spark):
    """Top-10 cosine neighbors computed on DEQUANTIZED vectors must
    recall >= 0.9 of the exact float neighbors (clustered data — the
    regime ANN cares about)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 32))
    mat = np.vstack(
        [c + 0.05 * rng.normal(size=(40, 32)) for c in centers]
    ).astype("float32")
    x = mat.astype("float64")
    mn, mx = x.min(axis=0), x.max(axis=0)
    deq = mn + np.round((x - mn) / (mx - mn) * 255.0) / 255.0 * (mx - mn)

    def topk(m, k=10):
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = n @ n.T
        np.fill_diagonal(sims, -2)
        return np.argsort(-sims, axis=1)[:, :k]

    exact, quant = topk(x), topk(deq)
    recall = np.mean([
        len(set(exact[i]) & set(quant[i])) / exact.shape[1]
        for i in range(len(mat))
    ])
    assert recall >= 0.9, recall

    # and the Spark codes reproduce the numpy codes bit-for-bit
    from crawler_spark.operators.quantize import quantize

    got = {r["vec_id"]: r["codes"] for r in
           quantize(_emb_df(spark, mat)).collect()}
    want = np.round((x - mn) / (mx - mn) * 255.0).astype(int)
    for i in range(0, len(mat), 37):
        assert got[i] == list(want[i])
