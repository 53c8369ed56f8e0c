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
  wildcards are handled conservatively — never fetch what a plain prefix
  rule denies: a ``Disallow`` pattern is truncated at its first ``*``
  (and a trailing ``$`` dropped), which can only over-block; an ``Allow``
  pattern containing ``*`` or ``$`` is dropped entirely (truncating it
  would WIDEN the allow and could override a plain ``Disallow`` via
  allow-wins-ties), which can only under-fetch.
- empty ``Disallow:`` means allow-all (emitted as no rule); comments
  (``#``), CRLF, and case-insensitive field names handled.

``parse_robots_txt`` is the pure kernel (driver-side, config building);
``rules_from_bodies`` maps a DataFrame of fetched robots bodies
``(host, body)`` to the rule table distributed (one pandas UDF pass) —
the table is dimension-sized (rules per host), i.e. broadcast-sized by
construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_RULE_SCHEMA = "host string, rule string, allow boolean"


def _clean_pattern(value: str, allow: bool) -> str | None:
    """Robots path pattern → enforceable prefix (None = unenforceable).

    Wildcards/anchors are resolved in the never-over-fetch direction:
    truncating a Disallow over-blocks (safe); truncating an Allow would
    widen it past what RFC 9309 grants, so wildcarded Allows are dropped.
    """
    v = value.strip()
    if not v:
        return None  # empty Disallow: allow all ⇒ no rule
    has_wild = "*" in v or v.endswith("$")
    if has_wild and allow:
        return None
    star = v.find("*")
    if star >= 0:
        v = v[:star]
    if v.endswith("$"):
        v = v[:-1]
    if not v:
        return None
    if not v.startswith("/"):
        v = "/" + v
    return v


def parse_robots_txt(
    host: str, body: str, user_agent: str = "*"
) -> list[tuple[str, str, bool]]:
    """Compile one robots.txt body into (host, prefix, allow) rules for
    ``user_agent`` (RFC 9309 group selection)."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False

    def flush():
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

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
        else:
            in_agent_run = False  # sitemap/crawl-delay/unknown: group ends UA run
    flush()

    # group selection: exact UA token match beats '*'; longest match wins
    best: list[tuple[str, bool]] | None = None
    best_score = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a and a in ua:
                score = len(a)
            else:
                continue
            if score > best_score:
                best_score, best = score, rules
    if best is None:
        return []

    out = []
    for value, allow in best:
        prefix = _clean_pattern(value, allow)
        if prefix is not None:
            out.append((host, prefix, allow))
    return out


def rules_from_bodies(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "*",
) -> DataFrame:
    """(host, body) → (host, rule, allow) rule table, parsed distributed."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"host": [], "rule": [], "allow": []}
            for h, b in zip(pdf[host_col], pdf[body_col]):
                for host, rule, allow in parse_robots_txt(
                    h or "", b or "", user_agent
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
