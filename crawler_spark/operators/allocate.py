"""Global round-budget apportionment across hosts.

The reference crawler caps work per host with a fixed per-round budget
(``crawl.ts:12`` — 5 workers; per-host politeness in this rebuild is
``crawl/driver.py``'s skew-salted top-k). A cluster-scale frontier needs
the complementary knob: ONE global page budget per round (fetch capacity
of the whole fleet) apportioned across hosts by weight — pending mass,
host reputation, or any score — so a million-host frontier fills the
round exactly without any host starving on integer truncation.

``allocate_budget`` implements largest-remainder (Hamilton)
apportionment: every host first gets ``floor(B * w / W)`` units, then the
``B - Σfloor`` leftover units go one each to the largest fractional
remainders (ties → host ascending). Deterministic, one pass, exact total.

Scale shape: runs on the HOST table (dimension-sized — ~10^7-10^8 rows at
a 10^10-URL frontier, orders of magnitude below the corpus). Two scalar
aggregates (total weight, total floor) are O(1) driver round-trips; the
remainder ranking reuses :func:`operators.topk.with_global_seq`, the
range-partitioned global sequence — no single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.topk import with_global_seq


def allocate_budget(
    pending: DataFrame,
    total_budget: int,
    host_col: str = "host",
    pending_col: str = "n_pending",
    weight_col: str | None = None,
) -> DataFrame:
    """Apportion ``total_budget`` fetch slots across hosts.

    ``pending`` carries one row per host: ``host_col``, ``pending_col``
    (how many URLs the host has queued) and optionally ``weight_col``
    (apportionment weight — defaults to the pending count itself).

    Returns ``(host, n_pending, alloc, granted)``:

    - ``alloc``: the Hamilton share — ``Σ alloc == total_budget`` exactly
      whenever any positive weight exists.
    - ``granted``: ``least(alloc, n_pending)`` — a host cannot consume
      more slots than it has queued. Unconsumed units roll to the next
      round rather than re-apportioning (a second pass would make the
      round's scheduling iterative; the frontier loop already re-runs
      allocation every round, so the roll-over is self-correcting).

    Hosts with zero/negative/null weight take no part in apportionment
    and get ``alloc = 0``.
    """
    w = (
        F.col(weight_col) if weight_col else F.col(pending_col)
    ).cast("double")
    base_cols = [
        F.col(host_col).alias("host"),
        F.col(pending_col).cast("long").alias("n_pending"),
        w.alias("_w"),
    ]
    t = pending.select(*base_cols)
    live = t.where(F.col("_w") > 0)
    dead = t.where(~(F.col("_w") > 0)).select(
        "host", "n_pending", F.lit(0).cast("long").alias("alloc")
    )

    total_w = live.agg(F.sum("_w")).collect()[0][0]
    if not total_w:
        return dead.withColumn(
            "granted", F.least("alloc", "n_pending").cast("long")
        )

    # quota in the same operation order as the oracle: (B * w) / W
    quota = F.lit(float(total_budget)) * F.col("_w") / F.lit(float(total_w))
    based = live.select(
        "host",
        "n_pending",
        F.floor(quota).alias("_base"),
        (quota - F.floor(quota)).alias("_rem"),
    )
    sum_base = based.agg(F.sum("_base")).collect()[0][0] or 0
    leftover = max(0, int(total_budget) - int(sum_base))

    seqd = with_global_seq(
        based.withColumn("_nrem", -F.col("_rem")),
        ["_nrem", "host"],
        out="_seq",
    )
    alloc = (
        F.col("_base")
        + F.when(F.col("_seq") < F.lit(leftover), F.lit(1)).otherwise(0)
    ).cast("long")
    out = seqd.select("host", "n_pending", alloc.alias("alloc"))
    return out.unionByName(dead).withColumn(
        "granted", F.least("alloc", "n_pending").cast("long")
    )
