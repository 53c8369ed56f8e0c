"""Physical-plan inspection helpers.

The engine's scale contract is not just "right answers" but "right plans":
filters and column pruning reach the parquet scan, small dimensions
broadcast, hot paths stay inside whole-stage codegen, and nothing degrades
to a cartesian product. These helpers turn those properties into
assertions (used in tests/test_plans.py) instead of eyeballed
``.explain()`` output.

All parsing is over ``df._jdf.queryExecution().executedPlan().toString()``
/ the formatted explain string — stable, public Spark output formats.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of the DataFrame's physical plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan — the column-pruning witness."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))
    ]


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan set of column names actually read from files."""
    cols = []
    for schema in scan_read_schemas(df):
        inner = schema[len("struct<"):].rstrip(">")
        names = {
            f.split(":")[0].strip() for f in re.split(r",(?=[A-Za-z_])", inner)
            if f.strip()
        }
        cols.append(names)
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the physical plan, e.g. BroadcastHashJoin."""
    plan = simple_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in join_strategies(df)


def has_cartesian(df: DataFrame) -> bool:
    js = join_strategies(df)
    return "CartesianProduct" in js or "BroadcastNestedLoopJoin" in js


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans (``*(n)`` markers) — wider/fewer
    is better. Under AQE the final plan only exists after execution, so by
    default the DataFrame is materialized (noop sink) first."""
    if execute:
        # must execute THIS DataFrame's own queryExecution (a noop write
        # would clone the plan and leave this AdaptiveSparkPlan unfinalized)
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    ids = re.findall(r"\*\((\d+)\)", plan)
    return len(set(ids))


def exchange_payload_columns(df: DataFrame) -> list[set[str]]:
    """Per-Exchange set of column names that cross the shuffle.

    The witness for "wide payloads never shuffle" contracts (e.g. exact
    dedup must exchange content hashes, not document text): the formatted
    plan's Exchange blocks list their full input attribute set."""
    plan = formatted_plan(df)
    out: list[set[str]] = []
    for block in re.split(r"\n\(", plan):
        if not re.match(r"\d+\) Exchange", block):
            continue
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
        if m:
            out.append(
                {c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()}
            )
    return out


def exchange_partition_keys(df: DataFrame) -> list[set[str]]:
    """Per-Exchange set of column names the partitioning keys REFERENCE.

    Distinct from :func:`exchange_payload_columns`: a full-row shuffle
    keyed by a uniform id is fine at scale (rows must move to be joined),
    but a shuffle KEYED by document text hashes megabyte strings and
    serializes every duplicate clique onto one task. Keys are parsed
    paren-balanced from ``hashpartitioning(...)``/``rangepartitioning``
    argument lists, and every ``name#id`` attribute reference inside them
    counts — ``hashpartitioning(xxhash64(text#5), 200)`` reports
    ``{"text"}``, because a key EXPRESSION over text still evaluates the
    full string per row."""
    plan = formatted_plan(df)
    out: list[set[str]] = []
    for m in re.finditer(r"(?:hash|range)partitioning\(", plan):
        start = m.end()
        depth, i = 1, start
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        args = plan[start : i - 1]
        out.append(
            {c for c in re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", args)}
        )
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan."""
    return len(re.findall(r"\n\(\d+\) Exchange", formatted_plan(df)))


def partial_aggregation_present(df: DataFrame) -> bool:
    """True when the plan does map-side partial aggregation before the
    exchange (HashAggregate(... partial...) under the shuffle)."""
    plan = formatted_plan(df)
    return bool(re.search(r"Functions \[\d+\]: \[partial_", plan))
