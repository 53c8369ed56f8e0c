"""operators.cluster — distributed k-means (production + portable twin).

Checks: (1) production ``kmeans_fit`` equals a pure-numpy serial Lloyd's
run from the same init (the partition-partial M-step reduces to the same
means); (2) training improves the spherical objective over the untrained
hash pick; (3) an empty cell keeps its previous centroid; (4) the portable
twin matches its serial fold-exact spec BIT-FOR-BIT (the same spec the
DuckDB oracle mirrors — see ``kmeans_portable`` in oracle_sql); (5) plan
shape: the production per-iteration pass has no exchange (corpus never
shuffles) and the portable M-step exchanges only map-side-combined
(cell, dim) partials.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from crawler_spark.operators.cluster import (
    kmeans_fit,
    kmeans_objective,
    kmeans_portable_assign,
    kmeans_portable_reference,
)


def _toy_emb(spark, n=240, dim=16, n_clusters=4, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = cents[c] + 0.15 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _serial_spherical(vecs: np.ndarray, init: np.ndarray, n_iter: int):
    cents = init.copy()
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    for _ in range(n_iter):
        cell = np.argmax(unit @ cents.T, axis=1)
        nxt = cents.copy()
        for c in range(len(cents)):
            m = unit[cell == c]
            if len(m):
                v = m.mean(axis=0)
                nxt[c] = v / max(float(np.linalg.norm(v)), 1e-12)
        cents = nxt
    return cents


def test_kmeans_fit_matches_serial_lloyds(spark):
    emb = _toy_emb(spark).repartition(5)
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    vecs = np.array([r["embedding"] for r in rows], dtype="float64")
    init = vecs[:4] / np.linalg.norm(vecs[:4], axis=1, keepdims=True)
    got = kmeans_fit(emb, k=4, n_iter=3, init=init)
    want = _serial_spherical(vecs, init, 3)
    # partial sums reduce in a different order than the serial mean —
    # equal up to float reassociation, not bitwise
    assert np.allclose(got, want, atol=1e-9)


def test_kmeans_fit_improves_objective(spark):
    emb = _toy_emb(spark)
    from crawler_spark.operators.similarity import _centroids

    init = _centroids(emb, 4, "vec_id", "embedding")
    trained = kmeans_fit(emb, k=4, n_iter=4)
    assert kmeans_objective(emb, trained) >= kmeans_objective(emb, init) - 1e-9


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # two tight groups, k=3 seeded with a third centroid far from both:
    # it captures nothing and must survive the update unchanged
    a, b = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    rows = [(i, a) for i in range(10)] + [(10 + i, b) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lone = np.array([-1.0, -1.0, -1.0]) / math.sqrt(3.0)
    init = np.array([a, b, list(lone)], dtype="float64")
    got = kmeans_fit(emb, k=3, n_iter=2, init=init)
    assert np.allclose(got[2], lone)
    assert np.allclose(got[0], a) and np.allclose(got[1], b)


def test_kmeans_fit_rejects_wrong_k(spark):
    emb = _toy_emb(spark, n=20)
    with pytest.raises(ValueError, match="expected k"):
        kmeans_fit(emb, k=3, init=np.eye(4, 16))


def test_kmeans_fit_rejects_wrong_dim(spark):
    emb = _toy_emb(spark, n=20)  # dim 16
    with pytest.raises(ValueError, match="embedding dim"):
        kmeans_fit(emb, k=4, init=np.eye(4, 8))


def test_kmeans_fit_normalizes_init(spark):
    """A caller-supplied non-unit init must behave as its unit direction
    (the E-step is a dot against the codebook — cosine only for unit
    rows), and an empty cell returns a UNIT row, as documented."""
    a, b = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    rows = [(i, a) for i in range(10)] + [(10 + i, b) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [-10.0, -10.0, -10.0]])
    got = kmeans_fit(emb, k=3, n_iter=2, init=init)
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0)
    assert np.allclose(got[2], np.array([-1.0, -1.0, -1.0]) / math.sqrt(3.0))


def test_portable_assign_survives_zero_quantized_centroid(spark):
    """An init row whose components all quantize to 0 (|x| < 1/quant)
    yields the all-zero centroid; the shared 1e-12 norm floor keeps all
    three engines scoring it identically instead of Spark aborting with
    DIVIDE_BY_ZERO (ANSI mode) while the oracle returns NULL."""
    rows = [(0, [0.0004, 0.0002, 0.0003, 0.0001])] + [
        (i, [float(i), 1.0, 0.0, 0.5]) for i in range(1, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cell_first"], r["cell"])
        for r in kmeans_portable_assign(emb, k=3, n_iter=2).collect()
    }
    vecs = {r[0]: r[1] for r in rows}
    assert got == kmeans_portable_reference(vecs, k=3, n_iter=2)


def test_portable_assign_matches_serial_spec_bitexact(spark):
    emb = _toy_emb(spark, n=120, dim=8, n_clusters=3).repartition(7)
    got = {
        r["vec_id"]: (r["cell_first"], r["cell"])
        for r in kmeans_portable_assign(emb, k=5, n_iter=3).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    want = kmeans_portable_reference(vecs, k=5, n_iter=3)
    assert got == want


def test_portable_assign_needs_k_rows(spark):
    emb = _toy_emb(spark, n=3, dim=4)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_portable_assign(emb, k=8)


def test_production_iteration_plan_never_shuffles_corpus(spark):
    """The E+M pass is mapInPandas over the scan — zero exchanges; the
    driver only ever collects (partitions × k) partial rows."""
    emb = _toy_emb(spark, n=60, dim=8)
    captured = {}
    orig = type(emb).mapInPandas

    def spy(self, fn, schema, **kw):
        out = orig(self, fn, schema, **kw)
        captured["plan"] = out._jdf.queryExecution().executedPlan().toString()
        return out

    type(emb).mapInPandas = spy
    try:
        kmeans_fit(emb, k=4, n_iter=1)
    finally:
        type(emb).mapInPandas = orig
    assert "Exchange" not in captured["plan"]


def test_trained_centroids_feed_ivf(spark):
    """Composition contract: kmeans_fit output slots into ivf_topk and
    the trained search still returns the query itself at rank 1."""
    from crawler_spark.operators.similarity import ivf_topk

    emb = _toy_emb(spark, n=100, dim=8, n_clusters=4)
    cents = kmeans_fit(emb, k=4, n_iter=2)
    q = emb.where("vec_id = 17").collect()[0]["embedding"]
    top = ivf_topk(emb, [float(x) for x in q], 5, n_probe=2, centroids=cents)
    rows = top.orderBy(F.desc("cosine"), "vec_id").collect()
    assert rows[0]["vec_id"] == 17 and rows[0]["cosine"] > 0.999
