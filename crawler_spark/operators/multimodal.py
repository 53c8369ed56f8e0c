"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the same shape the html payload uses in the crawl
corpus. The Spark-side plumbing (schemas, batch iteration, partition
sizing, UDF signatures) is real and tested; the actual media decoding is
STUBBED (`NotImplementedError` by default, or a deterministic fake for
tests) because no image/audio libraries exist in this container — swap
``decoder=`` for a real one (PIL/libvips/ffmpeg) in production.

Patterns demonstrated:

- ``attach_media_meta``: derive typed metadata (kind, byte size, content
  hash) from the binary column — JVM-side only.
- ``decode_features``: ``mapInPandas`` batch iterator over binary payloads
  → fixed-width float feature vectors; batches are re-chunked to
  ``max_batch_rows`` so one huge media partition can't blow executor
  memory (the Arrow batch knob that matters at scale).
- ``frame_sample``: video-style 1→N expansion (payload → frames) showing
  the explode-shaped UDTF contract with deterministic output sizing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_COLS = ("media_kind", "n_bytes", "content_md5")


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", kind: str = "image"
) -> DataFrame:
    """Typed metadata for an opaque binary column — no Python involved."""
    return (
        df.withColumn("media_kind", F.lit(kind))
        .withColumn("n_bytes", F.length(F.col(payload_col)))
        .withColumn("content_md5", F.md5(F.col(payload_col)))
    )


def stub_decoder(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + feature-extract'.

    Stands in for the real media decoder (NOT installable here). Features
    are a pure function of the payload bytes, so tests are reproducible
    and the full distributed path is exercised.
    """
    d = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(d[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype("float32")


def real_decoder(payload: bytes, dim: int) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject a decoder via decode_features(decoder=...)"
    )


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder: Callable[[bytes, int], np.ndarray] = real_decoder,
    max_batch_rows: int = 256,
) -> DataFrame:
    """binary payloads → (id, features array<float>) via mapInPandas.

    Re-chunks each incoming Arrow batch to ``max_batch_rows`` before
    decoding — media rows are orders of magnitude wider than text rows,
    and executor memory is bounded by rows-per-batch × payload size.
    """
    schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), max_batch_rows):
                chunk = pdf.iloc[lo : lo + max_batch_rows]
                feats = [
                    decoder(bytes(p) if p is not None else b"", dim).tolist()
                    for p in chunk[payload_col]
                ]
                yield pd.DataFrame({id_col: chunk[id_col].values,
                                    "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    frame_bytes: int = 64,
) -> DataFrame:
    """Video-style 1→N expansion: payload → n_frames deterministic slices.

    The stub 'decoder' slices the payload at even strides; a real one
    would demux + decode. Output: (id, frame_idx, frame binary).
    """
    schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p) if p is not None else b""
                stride = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * stride : i * stride + frame_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def decode_features_portable(
    df: DataFrame,
    id_col: str = "media_id",
    key_col: str = "payload_key",
    dim: int = 16,
) -> DataFrame:
    """ENGINE-PORTABLE twin of :func:`decode_features` for the oracle.

    Features are dyadic rationals derived from md5 of the media's string
    key — ``f(key, j) = (md5int15(key|j) % 257 − 128) / 128`` — the same
    hash family as ``similarity.lsh_portable_bucket_ids``, so DuckDB
    reproduces every feature bit-exactly with its hex-prefix trick and
    the downstream classify top-k becomes value-checkable end-to-end
    (production decode stays injectable: sha256-seeded stub offline, a
    real model head in deployment). Pure column algebra, zero UDF, zero
    shuffle."""
    from crawler_spark.operators.quality import gram_hash

    feats = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(
                gram_hash(
                    F.concat(F.col(key_col), F.lit("|"), j.cast("string"))
                ),
                F.lit(257),
            )
            - F.lit(128)
        )
        / F.lit(128.0),
    )
    return df.select(id_col, feats.alias("features"))
