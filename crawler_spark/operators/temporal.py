"""Temporal join operators: as-of join and bucketed range join.

Spark has no native ASOF or interval join (DuckDB/kdb/Timescale do);
both are expressible scalably with DataFrame primitives:

- ``asof_join``: for every probe row, the latest right-side row with
  ``ts <= probe_ts`` per key. The naive formulation is an inequality
  join (quadratic per key); the scalable plan is the UNION trick — tag
  both sides, sort within key by (ts, side), and carry the right side's
  values forward with ``last(..., ignorenulls=True)`` over a running
  frame. ONE shuffle + one windowed sort pass, linear in rows per key;
  no key's cost depends on the cross product.
- ``range_join_buckets``: pairs of rows within a bounded time distance.
  A raw ``a.ts < b.ts AND b.ts - a.ts <= span`` theta-join degenerates
  to per-key cartesian; bucketing each row into ``span``-sized epochs
  and equi-joining on (key, bucket) plus (key, bucket+1) turns it into
  two hash joins whose candidates are exactly the rows within one
  bucket width — the standard interval-bucketing rewrite (what
  Databricks' range-join optimization does under the hood) — then the
  exact predicate filters residuals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Each probe row + the value columns of the latest event ≤ its ts.

    Probe payload columns (anything besides ``key``/``ts``) pass through
    unchanged, riding the union as one struct — output is
    ``(key, ts, *probe_payload, *value_cols, matched_ts)``. A payload
    column sharing a name with a value column is rejected (the output
    would be ambiguous).

    ``events`` must be unique per (key, ts) — pre-aggregate ties first
    (ambiguous as-of matches are a spec bug, not an engine choice).
    ``tolerance_seconds`` drops matches older than the tolerance (null
    values instead), mirroring pandas ``merge_asof(tolerance=...)``.
    """
    probe_extra = [c for c in probes.columns if c not in (key, ts)]
    clash = set(probe_extra) & (set(value_cols) | {"matched_ts"})
    if clash:
        raise ValueError(
            f"probe payload columns collide with output columns: {sorted(clash)}"
        )
    # the matched event travels as ONE struct — filling each value column
    # independently with last(ignorenulls) would stitch columns from
    # DIFFERENT events whenever a matched event carries a null value
    ev_struct = F.struct(
        F.col(ts).alias("_ev_ts"), *[F.col(c) for c in value_cols]
    )
    pv_struct = F.struct(
        *[F.col(c) for c in probe_extra]
    ) if probe_extra else F.struct(F.lit(0).alias("_nop"))
    p = probes.select(
        F.col(key), F.col(ts), F.lit(1).alias("_probe"),
        F.lit(None).cast(
            events.select(ev_struct.alias("_ev")).schema["_ev"].dataType
        ).alias("_ev"),
        pv_struct.alias("_pv"),
    )
    # an event with a NULL timestamp has no place on the time axis:
    # NULLs sort FIRST in the window order, so such an event would fill
    # every probe before the first real event (and the tolerance guard
    # fails open on a NULL age) — matched_ts=NULL with populated values
    e = events.where(F.col(ts).isNotNull()).select(
        F.col(key), F.col(ts), F.lit(0).alias("_probe"),
        ev_struct.alias("_ev"),
        F.lit(None).cast(
            probes.select(pv_struct.alias("_pv")).schema["_pv"].dataType
        ).alias("_pv"),
    )
    # events sort before probes at equal ts → "≤" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        p.unionByName(e)
        .select(
            F.col(key), F.col(ts), F.col("_probe"), F.col("_pv"),
            F.last("_ev", ignorenulls=True).over(w).alias("_ev"),
        )
        .where(F.col("_probe") == 1)
    )
    if tolerance_seconds is not None:
        # microsecond-exact staleness (unix_timestamp truncates seconds);
        # a stale match is no match: event columns AND matched_ts null out
        age = (
            F.col(ts).cast("timestamp_ltz").cast("double")
            - F.col("_ev._ev_ts").cast("timestamp_ltz").cast("double")
        )
        filled = filled.withColumn(
            "_ev",
            F.when(age > tolerance_seconds, F.lit(None)).otherwise(
                F.col("_ev")
            ),
        )
    return filled.select(
        key, ts,
        *[F.col(f"_pv.{c}").alias(c) for c in probe_extra],
        *[F.col(f"_ev.{c}").alias(c) for c in value_cols],
        F.col("_ev._ev_ts").alias("matched_ts"),
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    span_seconds: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Pairs (l, r) with same key and ``0 < r.ts − l.ts ≤ span_seconds``.

    Two equi hash joins on (key, epoch bucket) — candidates bounded by
    bucket width — then the exact window predicate.
    """
    # same ambiguity guard as asof_join, both directions: overlapping
    # payload lists (the natural self-join passes the same column
    # twice) or a payload named like key/ts would yield a frame with
    # duplicate column names that fails only at first downstream select
    clash = (set(left_cols) & set(right_cols)) | (
        (set(left_cols) | set(right_cols)) & {key, ts}
    )
    if clash:
        raise ValueError(
            "left_cols/right_cols collide (with each other or with "
            f"key/ts): {sorted(clash)} — alias them before the join"
        )
    bkt: Column = F.floor(F.unix_timestamp(F.col(ts)) / span_seconds)
    l = left.select(
        F.col(key), F.col(ts).alias("_lts"), bkt.alias("_bkt"),
        *[F.col(c) for c in left_cols],
    )
    r = right.select(
        F.col(key).alias("_rkey"), F.col(ts).alias("_rts"),
        bkt.alias("_rbkt"), *[F.col(c) for c in right_cols],
    )
    pairs = None
    for shift in (0, 1):
        cand = l.join(
            r,
            (F.col(key) == F.col("_rkey"))
            & (F.col("_bkt") + shift == F.col("_rbkt")),
        )
        pairs = cand if pairs is None else pairs.unionByName(cand)
    # microsecond-exact predicate: truncated unix_timestamp seconds would
    # admit pairs up to a second beyond the span. TIMESTAMP_NTZ has no
    # direct double cast — route through timestamp_ltz (the DIFFERENCE is
    # timezone-invariant).
    def _secs(c: str) -> Column:
        return F.col(c).cast("timestamp_ltz").cast("double")

    delta = _secs("_rts") - _secs("_lts")
    return (
        pairs.where((delta > 0) & (delta <= span_seconds))
        .select(
            key, F.col("_lts").alias("l_ts"), F.col("_rts").alias("r_ts"),
            *left_cols, *right_cols,
        )
    )
