"""robots.txt parsing → broadcast rule maps.

The reference has NO robots handling (SURVEY §2.9 T5); the north rule
requires "robots.txt allow/deny enforced as broadcast rule maps". The
crawl engine consumes rules as ``(host, path_prefix, allow)`` tuples with
longest-prefix-wins / allow-wins-ties semantics
(``CrawlConfig.robots_allowed``) — the same evaluation order as RFC 9309
(Google's robots spec) for prefix rules.

This module compiles real robots.txt bodies into those tuples:

- group selection per RFC 9309: the group whose ``User-agent`` most
  specifically matches wins (exact product token beats ``*``); multiple
  ``User-agent`` lines stack onto one group; groups for other agents are
  ignored entirely.
- ``Allow``/``Disallow`` values are treated as path prefixes. RFC 9309
  wildcards have two modes (``wildcards=`` on the parsers):
  ``"conservative"`` (default) never fetches what a plain prefix rule
  denies: a ``Disallow`` pattern is truncated at its first ``*`` (and a
  trailing ``$`` dropped), which can only over-block; an ``Allow``
  pattern containing ``*`` or ``$`` is dropped entirely (truncating it
  would WIDEN the allow and could override a plain ``Disallow`` via
  allow-wins-ties), which can only under-fetch. ``"exact"`` keeps the
  patterns verbatim and every evaluator (``CrawlConfig.robots_allowed``
  serial spec, the driver's vectorized UDF) matches them per RFC 9309
  §2.2.2: ``*`` spans any octets, a trailing ``$`` anchors the end, and
  rule precedence is the octet length of the PATTERN text (allow wins
  ties) — Google's reference matcher semantics.
- empty ``Disallow:`` means allow-all (emitted as no rule); comments
  (``#``), CRLF, and case-insensitive field names handled.

``parse_robots_txt`` is the pure kernel (driver-side, config building);
``rules_from_bodies`` maps a DataFrame of fetched robots bodies
``(host, body)`` to the rule table distributed (one pandas UDF pass) —
the table is dimension-sized (rules per host), i.e. broadcast-sized by
construction.
"""

from __future__ import annotations

import math
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_RULE_SCHEMA = "host string, rule string, allow boolean"


def pattern_to_regex(pattern: str) -> str | None:
    """RFC 9309 path pattern → anchored-at-start regex, or None when the
    pattern is a plain prefix (no ``*``, no trailing ``$``) — the caller
    should use the cheaper ``startswith`` path then."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    body, anchored = pattern, False
    if body.endswith("$"):
        body, anchored = body[:-1], True
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return rx + r"\Z" if anchored else rx


def path_matches(pattern: str, path: str) -> bool:
    """Does ``path`` match the RFC 9309 ``pattern``? Plain prefixes use
    ``startswith``; ``*``/``$`` patterns match per §2.2.2. The serial
    spec for both ``CrawlConfig.robots_allowed`` and the driver UDF."""
    rx = pattern_to_regex(pattern)
    if rx is None:
        return path.startswith(pattern)
    return re.match(rx, path) is not None


# patterns with more stars than this fall back to conservative handling
# even in exact mode: each '*' compiles to a backtracking '.*' in the
# vectorized matcher, and a hostile robots.txt stuffing dozens of stars
# into one rule ('/*a*a*a*a…') could otherwise stall an executor task on
# long non-matching paths (RFC 9309 §2.3 explicitly allows enforcing
# parsing limits). Real-world rules use 1-3 stars.
MAX_EXACT_WILDCARDS = 8


def _clean_pattern(
    value: str, allow: bool, wildcards: str = "conservative"
) -> str | None:
    """Robots path pattern → enforceable pattern (None = unenforceable).

    ``wildcards="exact"`` keeps ``*``/``$`` verbatim (normalized to a
    leading ``/`` or ``*``) for RFC 9309 §2.2.2 matching downstream;
    patterns exceeding ``MAX_EXACT_WILDCARDS`` stars fall back to the
    conservative path (ReDoS guard). The default ("conservative")
    resolves wildcards in the never-over-fetch direction: truncating a
    Disallow over-blocks (safe); truncating an Allow would widen it past
    what RFC 9309 grants, so wildcarded Allows are dropped.
    """
    if wildcards not in ("conservative", "exact"):
        raise ValueError(
            f"wildcards must be 'conservative' or 'exact', got "
            f"{wildcards!r}"
        )
    v = value.strip()
    if not v:
        return None  # empty Disallow: allow all ⇒ no rule
    if wildcards == "exact" and v.count("*") <= MAX_EXACT_WILDCARDS:
        if not v.startswith(("/", "*")):
            v = "/" + v
        return v
    has_wild = "*" in v or v.endswith("$")
    if has_wild and allow:
        return None
    star = v.find("*")
    if star >= 0:
        v = v[:star]
    if v.endswith("$"):
        v = v[:-1]
    if not v:
        # a NON-empty disallow that truncated to nothing ('*', '*.pdf',
        # '$') could match anything — conservative mode must over-BLOCK,
        # so it becomes '/'; dropping it would turn 'Disallow: *' into
        # allow-all, the one direction this mode promises never to err.
        # (A genuinely empty value returned None above = allow-all per
        # RFC; wildcarded ALLOW rules were dropped above = over-block.)
        return "/"
    if not v.startswith("/"):
        v = "/" + v
    return v


def _select_group(
    body: str, user_agent: str
) -> tuple[list[tuple[str, bool]], float | None] | None:
    """RFC 9309 group selection → (raw allow/disallow rules, crawl-delay).

    Crawl-delay is not in RFC 9309 but is widely emitted and honored
    (Bing/Yandex semantics: seconds between requests); it attaches to the
    group like the path rules do. Returns None when no group matches."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            in_agent_run = False
            try:
                d = float(value)
            except ValueError:
                d = None  # malformed delay: ignore the line, keep group
            if d is not None and math.isfinite(d):
                cur_delay = d  # 'nan'/'inf' would poison budget math
        else:
            in_agent_run = False  # sitemap/unknown: group ends UA run
    flush()

    # group selection: exact UA token match beats '*'; longest match
    # wins — and ALL groups at the winning specificity are COMBINED
    # (RFC 9309 §2.2.1: machine-appended files often carry several
    # 'User-agent: *' blocks; keeping only the first would silently
    # drop the later blocks' disallows and over-fetch)
    def gscore(agents: list[str]) -> int:
        s = -1
        for a in agents:
            if a == "*":
                s = max(s, 0)
            elif a and a in ua:
                s = max(s, len(a))
        return s

    scored = [(gscore(agents), rules, delay) for agents, rules, delay in groups]
    best_score = max((s for s, _, _ in scored), default=-1)
    if best_score < 0:
        return None
    merged_rules: list[tuple[str, bool]] = []
    merged_delay: float | None = None
    for s, rules, delay in scored:
        if s == best_score:
            merged_rules.extend(rules)
            if merged_delay is None:
                merged_delay = delay
    return (merged_rules, merged_delay)


def parse_robots_txt(
    host: str,
    body: str,
    user_agent: str = "*",
    wildcards: str = "conservative",
) -> list[tuple[str, str, bool]]:
    """Compile one robots.txt body into (host, pattern, allow) rules for
    ``user_agent`` (RFC 9309 group selection). ``wildcards="exact"``
    preserves ``*``/``$`` patterns for exact §2.2.2 matching."""
    best = _select_group(body, user_agent)
    if best is None:
        return []
    out = []
    for value, allow in best[0]:
        prefix = _clean_pattern(value, allow, wildcards)
        if prefix is not None:
            out.append((host, prefix, allow))
    return out


def parse_crawl_delay(
    body: str, user_agent: str = "*"
) -> float | None:
    """The selected group's Crawl-delay in seconds (None if absent)."""
    best = _select_group(body, user_agent)
    return best[1] if best is not None else None


def rules_from_bodies(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
    wildcards: str = "conservative",
) -> DataFrame:
    """(host, body) → (host, rule, allow) rule table, parsed distributed."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"host": [], "rule": [], "allow": []}
            for h, b in zip(pdf[host_col], pdf[body_col]):
                for host, rule, allow in parse_robots_txt(
                    h or "", b or "", user_agent, wildcards
                ):
                    rows["host"].append(host)
                    rows["rule"].append(rule)
                    rows["allow"].append(allow)
            pdf_out = pd.DataFrame(rows)
            pdf_out["allow"] = pdf_out["allow"].astype(bool)
            yield pdf_out

    return robots.select(host_col, body_col).mapInPandas(
        parse, ROBOTS_RULE_SCHEMA
    )


def delays_from_bodies(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """(host, body) → (host, crawl_delay) for hosts that declare one —
    dimension-sized (≤ one row per host), parsed distributed."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"host": [], "crawl_delay": []}
            for h, b in zip(pdf[host_col], pdf[body_col]):
                d = parse_crawl_delay(b or "", user_agent)
                if d is not None and d > 0:
                    rows["host"].append(h or "")
                    rows["crawl_delay"].append(float(d))
            yield pd.DataFrame(rows)

    return robots.select(host_col, body_col).mapInPandas(
        parse, "host string, crawl_delay double"
    )


def budgets_from_delays(
    delays: list[tuple[str, float]],
    round_seconds: float,
    default_budget: int,
    cap: int | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """Crawl-delays → the ``(budgets, budget_periods)`` pair the crawl
    driver consumes (``CrawlConfig``): a host allowing one fetch per
    ``delay`` seconds gets ``floor(round_seconds / delay)`` URLs per
    round (never more than ``default_budget``/``cap``). Hosts without a
    declared delay fall through to the ``'*'`` default.

    A delay LONGER than the round becomes a PERIODIC budget — 1 URL
    every ``ceil(delay / round_seconds)`` rounds — which never exceeds
    the declared rate (fetches are at least ``delay`` seconds apart)
    instead of either violating it (flooring to 1/round) or starving the
    host forever (budget 0). Non-finite or non-positive delays never
    reach here (``_select_group`` filters them)."""
    budgets: dict[str, int] = {"*": default_budget}
    periods: dict[str, int] = {}
    limit = default_budget if cap is None else cap
    for host, delay in delays:
        if delay <= 0:
            continue
        per_round = int(round_seconds // delay)
        if per_round >= 1:
            budgets[host] = min(limit, per_round)
        else:
            budgets[host] = min(limit, 1)
            periods[host] = math.ceil(delay / round_seconds)
    return budgets, periods


def sitemaps_from_bodies(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) → (host, sitemap_url): the ``Sitemap:`` directives.

    RFC 9309 §2.3 sitemap lines are group-independent (any casing,
    optional ``#`` comment tails), so this needs no user-agent group
    selection and — unlike the group parsers above — runs as pure column
    algebra: split lines, strip comments, regex-extract. The output
    bridges robots discovery into ``functions.sitemaps.urls_from_
    sitemaps``, closing the robots → sitemap → URL-ingest loop; it is
    dimension-sized (a few rows per host) like the rule table.
    """
    from pyspark.sql import functions as F

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), r"\r\n|\r|\n")
        ).alias("_line"),
    )
    clean = F.regexp_replace(F.col("_line"), r"#.*$", "")
    url = F.regexp_extract(clean, r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1)
    return (
        lines.select("host", url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )
