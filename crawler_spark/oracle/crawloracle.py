"""Pure-Python round-synchronous crawl oracle — the executable spec.

Serial, single-threaded implementation of the crawl semantics the Spark
engine must reproduce EXACTLY (same visit set, same ``(round, seq)``
ordering, same URL-seen membership, same cooldown behavior). It re-expresses
the reference's serial FIFO loop (``storage.ts:137-200`` pop order,
``crawl.ts:41-71`` driver, ``workers/crawler.ts:10-45`` 429 handling,
``page.ts:136-219`` fetch/extract, ``storage.ts:82-112`` queue update) as
round-synchronous BFS:

- **Round model.** Round ``r`` schedules, per eligible host, up to
  ``budget(host)`` frontier URLs in priority order; priority is
  ``(discovered_round, discovery_seq)`` — FIFO discovery order. With an
  unlimited budget and no cooldowns this visits URLs in exactly the
  reference's FIFO ``_id`` order (verified by ``tests/test_crawl_golden.py``
  against a direct transliteration of the serial loop).
- **Fetch is simulated**: a lookup into the Common-Crawl-style corpus
  table. URL missing → error page status -100 (reference ``page.ts:20-27``
  catch-all). Non-``text/html`` content type → error page with the
  response status (``okToStoreResponse``, ``utils.ts:73-90``). A
  ``text/html`` row is processed as a normal page REGARDLESS of status —
  the reference only checks content-type (``page.ts:76``), so 404/500 HTML
  pages are crawled; quirk preserved.
- **429 → cooldown** (``workers/crawler.ts:21-32``): host enters cooldown
  for ``retry_after`` seconds (default 3600, ``crawler.ts:22-25``) unless
  already cooling (add-if-absent, ``storage.ts:216``). Wall-clock TTL maps
  to rounds: ``ceil(retry_after / round_seconds)`` rounds starting at
  ``r+1``. The 429 URL itself is still consumed (the reference saves an
  error page and removes it from the queue).
- **Seen set**: a URL is seen iff it is in ``pages`` (any type, incl.
  errors) or already in the frontier. The reference allows queue
  duplicates and purges them on pop (``storage.ts:120-128``); keeping the
  first-discovery priority is observably identical (SURVEY §2.4 J7).
- **Supersets** (north rule, absent in reference, flagged): only http(s)
  URLs enter the frontier; robots.txt allow/deny longest-prefix rules are
  applied at discovery time; query params are canonical-sorted; per-host
  budget generalizes the serial pop's ≥1-url spacing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from crawler_spark.functions.html import (
    extract_links_from,
    extract_text_blocks,
)
from crawler_spark.functions.urls import get_hostname, is_fetchable

DEFAULT_COOLDOWN_SECONDS = 3600  # reference workers/crawler.ts:22-25


@dataclass
class CrawlConfig:
    budgets: dict[str, int] = field(default_factory=dict)  # host -> k, '*' def
    robots: list[tuple[str, str, bool]] = field(default_factory=list)
    limit_to: str = ""  # reference crawl.ts:44 limitTo
    round_seconds: int = 3600  # wall-clock per round, for cooldown TTL→rounds
    max_rounds: int = 1000
    # host -> fetch only every N rounds (rounds where rnd % N != 0 get
    # budget 0) — how sub-1-URL-per-round rates (Crawl-delay longer than
    # a round) are expressed; periods key off the ABSOLUTE round number
    # so resume preserves the cadence
    budget_periods: dict[str, int] = field(default_factory=dict)
    # priority-queue extension (north rule; the reference pops pure FIFO,
    # storage.ts:179): host -> score, higher scheduled first; missing
    # hosts score 0.0 and ties fall back to BFS (disc_round, disc_seq),
    # so an empty dict IS the reference ordering. Typically fed by
    # operators.graphrank.host_ranks_from_links on a prior session's
    # link table. round_capacity caps TOTAL pages fetched per round
    # (0 = unlimited) — overflow keeps its discovery priority and stays
    # in the frontier for a later round; per-host budgets still bound
    # every host within the capacity cut.
    priority: dict[str, float] = field(default_factory=dict)
    round_capacity: int = 0
    # fair-share alternative to round_capacity: ONE global page budget
    # per round apportioned across eligible hosts by Hamilton largest
    # remainder (weight = each host's consumable demand = min(pending,
    # politeness budget)), so hot hosts cannot starve the tail the way
    # the strict priority cut of round_capacity can. 0 = off. Grants are
    # capped at demand; unconsumed slots roll to the next round's
    # allocation rather than re-apportioning mid-round.
    global_budget: int = 0
    # DUST canonicalization (north-rule superset, operators/dust.py):
    # (host, seg_from, seg_to) single-segment URL rewrite rules mined
    # from content-equal page pairs. Applied to every discovered link
    # AFTER the limit_to host gate and BEFORE the robots check (robots
    # must judge the URL that will actually be fetched), exactly where
    # the Spark driver applies them; the first matching rule per URL in
    # (seg_from, seg_to) order rewrites every occurrence of its source
    # segment. Seeds are taken verbatim — operators only canonicalize
    # what the crawl itself discovers.
    dust_rules: list[tuple[str, str, str]] = field(default_factory=list)

    def dust_canonical(self, url: str, host: str) -> str:
        """Mirror of ``operators.dust.apply_dust_rules`` for one URL."""
        if not self.dust_rules:
            return url
        # memo keyed on the rule list's CONTENT — a test mutating
        # config.dust_rules between calls must not keep the stale index
        rules_key = tuple(self.dust_rules)
        cached = getattr(self, "_dust_by_host", None)
        if cached is not None and cached[0] == rules_key:
            by_host = cached[1]
        else:
            by_host = {}
            for h, f, t in sorted(self.dust_rules, key=lambda r: (r[1], r[2])):
                by_host.setdefault(h, []).append((f, t))
            self._dust_by_host = (rules_key, by_host)
        rl = by_host.get(host)
        if not rl:
            return url
        import re as _re

        # same decomposition as the Spark side: scheme://authority by
        # case-insensitive regex (ORIGINAL spelling preserved), path =
        # the rest up to the first ? or #, suffix untouched
        m = _re.match(r"(?i)^([a-z][a-z0-9+.-]*://[^/]*)", url)
        prefix = m.group(1) if m else ""
        rest = url[len(prefix):]
        cut = len(rest)
        for ch in "?#":
            p = rest.find(ch)
            if p != -1:
                cut = min(cut, p)
        path, suffix = rest[:cut], rest[cut:]
        # exactly ONE leading slash stripped (parity with the Spark
        # side's regexp_replace(path, '^/', '')): '//a' -> ['', 'a']
        trimmed = path[1:] if path.startswith("/") else path
        segs = trimmed.split("/") if trimmed else []
        for f, t in rl:
            if f in segs:
                new_path = "/" + "/".join(t if s == f else s for s in segs)
                return prefix + new_path + suffix
        return url

    def budget(self, host: str) -> int:
        return self.budgets.get(host, self.budgets.get("*", 1 << 30))

    def budget_at(self, host: str, rnd: int) -> int:
        p = self.budget_periods.get(host)
        if p and rnd % p != 0:
            return 0
        return self.budget(host)

    def robots_allowed(self, host: str, path: str) -> bool:
        """Longest-pattern rule wins; allow wins length ties; default
        allow. Plain prefixes match by ``startswith``; rules carrying
        RFC 9309 wildcards (``parse_robots_txt(wildcards="exact")``)
        match per §2.2.2 with precedence = pattern octet length."""
        from crawler_spark.functions.robots import path_matches

        best_len, best_allow = -1, True
        for rhost, rule, allow in self.robots:
            if rhost != host and rhost != "*":
                continue
            if path_matches(rule, path):
                if len(rule) > best_len or (len(rule) == best_len and allow):
                    best_len, best_allow = len(rule), allow
        return best_allow


@dataclass
class CrawlResult:
    crawl_order: pd.DataFrame  # round, seq, url, host, status, type
    seen: pd.DataFrame  # canon_url
    links: pd.DataFrame  # source, source_host, url, host, link_pos, round
    cooldown_events: pd.DataFrame  # round, host, expire_round
    text: pd.DataFrame  # url, text (extracted blocks newline-joined)


def hamilton_grants(demand: dict[str, int], budget: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``budget`` across hosts.

    Serial twin of ``operators.allocate.allocate_budget`` (the driver's
    distributed path): quota = B·w/W in IEEE doubles, floor first, the
    leftover units go to the largest fractional remainders (ties → host
    ascending), every grant capped at the host's demand. Both sides do
    the identical double arithmetic, so the golden tests can assert the
    schedules match row-for-row.
    """
    live = {h: w for h, w in demand.items() if w > 0}
    total_w = float(sum(live.values()))
    if not live or total_w <= 0 or budget <= 0:
        return {h: 0 for h in demand}
    base: dict[str, int] = {}
    rem: dict[str, float] = {}
    for h, w in live.items():
        quota = float(budget) * float(w) / total_w
        base[h] = int(math.floor(quota))
        rem[h] = quota - math.floor(quota)
    leftover = max(0, budget - sum(base.values()))
    order = sorted(live, key=lambda h: (-rem[h], h))
    grants = {h: 0 for h in demand}
    for i, h in enumerate(order):
        alloc = base[h] + (1 if i < leftover else 0)
        grants[h] = min(alloc, live[h])
    return grants


def _url_path(url: str) -> str:
    i = url.find("://")
    if i < 0:
        return "/"
    rest = url[i + 3 :]
    j = rest.find("/")
    return rest[j:].split("?", 1)[0] if j >= 0 else "/"


def crawl_oracle(
    corpus: pd.DataFrame,
    seeds: list[str],
    config: CrawlConfig,
) -> CrawlResult:
    """Run the serial round-synchronous crawl over a corpus DataFrame.

    ``corpus`` columns: url (canonical), html (bytes|None), content_type,
    status, retry_after. ``seeds`` are canonical URLs, priority = list
    order.
    """
    if config.round_capacity < 0:
        raise ValueError(
            f"round_capacity must be >= 0, got {config.round_capacity}"
        )
    by_url = {
        r.url: r for r in corpus.itertuples(index=False)
    }

    # frontier: canon_url -> (disc_round, disc_seq, host)
    frontier: dict[str, tuple[int, int, str]] = {}
    pages: dict[str, tuple] = {}  # canon_url -> row already crawled
    cooldown: dict[str, int] = {}  # host -> last blocked round
    order_rows: list[tuple] = []
    link_rows: list[tuple] = []
    cooldown_rows: list[tuple] = []
    text_rows: list[tuple] = []

    for i, url in enumerate(seeds):
        host = get_hostname(url)
        if not is_fetchable(url):
            continue
        if not config.robots_allowed(host, _url_path(url)):
            continue
        if config.limit_to and host != config.limit_to:
            continue
        frontier.setdefault(url, (-1, i, host))

    empty_streak = 0  # consecutive rounds scheduling nothing (period wait)
    for rnd in range(config.max_rounds):
        if not frontier:
            break
        # -- schedule: eligible hosts, per-host budget, priority order ----
        eligible = [
            (pr, ps, host, url)
            for url, (pr, ps, host) in frontier.items()
            if cooldown.get(host, -1) < rnd
        ]
        eligible.sort()  # (disc_round, disc_seq)
        caps: dict[str, int] | None = None
        if config.global_budget:
            # fair-share mode: each host's cap becomes its Hamilton grant
            # (already ≤ its politeness budget via the demand cap)
            pend: dict[str, int] = {}
            for _, _, host, _ in eligible:
                pend[host] = pend.get(host, 0) + 1
            demand = {
                h: min(n, config.budget_at(h, rnd))
                for h, n in pend.items()
            }
            caps = hamilton_grants(demand, config.global_budget)
        taken: dict[str, int] = {}
        scheduled: list[tuple[int, int, str, str]] = []
        for pr, ps, host, url in eligible:
            k = taken.get(host, 0)
            cap = (
                caps.get(host, 0)
                if caps is not None
                else config.budget_at(host, rnd)
            )
            if k >= cap:
                continue
            taken[host] = k + 1
            scheduled.append((pr, ps, host, url))
        if not scheduled:
            # Frontier non-empty but nothing schedulable ⇒ every remaining
            # host is cooling, or periodic budgets are configured and this
            # may be an off round for what's left. Advance the round so
            # the cooldown/period can come due — but only wait for a
            # period while fewer than max(period) consecutive rounds have
            # scheduled nothing: after a full fruitless cycle the rest of
            # the frontier is permanently unschedulable. (Deliberately
            # coarse — it must match what the distributed driver decides
            # without a per-round frontier-host scan.)
            cooling = any(
                cooldown.get(h, -1) >= rnd for _, _, h in frontier.values()
            )
            pending_periodic = (
                bool(config.budget_periods)
                and empty_streak < max(config.budget_periods.values())
            )
            if not cooling:
                # cooling rounds don't consume the period-wait allowance
                empty_streak += 1
            if cooling or pending_periodic:
                continue
            break
        empty_streak = 0

        # -- priority order + global round capacity (north-rule superset;
        # default config reduces to the BFS order above) ------------------
        if config.priority or config.round_capacity:
            scheduled.sort(
                key=lambda t: (-config.priority.get(t[2], 0.0), t[0], t[1])
            )
            if config.round_capacity:
                # overflow is NOT popped — it keeps its discovery
                # priority in the frontier for a later round
                scheduled = scheduled[: config.round_capacity]

        # -- fetch + extract ---------------------------------------------
        new_links: list[tuple[int, str, str, str, str, int]] = []
        for seq, (pr, ps, host, url) in enumerate(scheduled):
            del frontier[url]
            row = by_url.get(url)
            if row is None:
                ptype, status = "error", -100
            elif "text/html" not in (row.content_type or ""):
                ptype, status = "error", int(row.status)
                if status == 429 and cooldown.get(host, -1) < rnd:
                    retry = (
                        int(row.retry_after)
                        if row.retry_after is not None
                        and not (
                            isinstance(row.retry_after, float)
                            and math.isnan(row.retry_after)
                        )
                        else DEFAULT_COOLDOWN_SECONDS
                    )
                    n_rounds = max(1, math.ceil(retry / config.round_seconds))
                    expire = rnd + n_rounds  # blocked while round <= expire
                    cooldown[host] = expire
                    cooldown_rows.append((rnd, host, expire))
            else:
                ptype, status = "html", int(row.status)
                html = row.html
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                links = extract_links_from(html or "", url)
                for link_url, link_host, pos in links:
                    new_links.append((seq, url, host, link_url, link_host, pos))
                # serial extraction from html — the corpus need not carry a
                # golden text column (generator-vs-extraction independence
                # is asserted separately in tests against webgen's text)
                text_rows.append(
                    (url, "\n".join(extract_text_blocks(html or "")))
                )
            pages[url] = (rnd, seq, url, host, status, ptype)
            order_rows.append((rnd, seq, url, host, status, ptype))

        # -- merge discoveries into frontier ------------------------------
        disc_seq = 0
        for seq, src, src_host, link_url, link_host, pos in sorted(
            new_links, key=lambda t: (t[0], t[5])
        ):
            link_rows.append((src, src_host, link_url, link_host, pos, rnd))
            if not is_fetchable(link_url):
                continue
            if config.limit_to and link_host != config.limit_to:
                continue
            # DUST rewrite before robots: robots judges the URL that
            # will actually be fetched (host is never rewritten)
            link_url = config.dust_canonical(link_url, link_host)
            if not config.robots_allowed(link_host, _url_path(link_url)):
                continue
            if link_url in pages or link_url in frontier:
                continue
            frontier[link_url] = (rnd, disc_seq, link_host)
            disc_seq += 1

    return CrawlResult(
        crawl_order=pd.DataFrame(
            order_rows,
            columns=["round", "seq", "url", "host", "status", "type"],
        ),
        seen=pd.DataFrame({"canon_url": sorted(pages)}),
        links=pd.DataFrame(
            link_rows,
            columns=["source", "source_host", "url", "host", "link_pos", "round"],
        ),
        cooldown_events=pd.DataFrame(
            cooldown_rows, columns=["round", "host", "expire_round"]
        ),
        text=pd.DataFrame(text_rows, columns=["url", "text"]),
    )


def fifo_reference_oracle(
    corpus: pd.DataFrame,
    seeds: list[str],
) -> list[str]:
    """Direct transliteration of the reference's serial FIFO loop.

    One URL per iteration, queue ordered by insertion ``_id``
    (``storage.ts:179``), queue-duplicate purge on pop
    (``storage.ts:120-128``), enqueue filtered only against ``pages``
    (``storage.ts:90-106``). No cooldown/robots/budget — used to prove the
    round model's visit ORDER equals the reference's under unlimited
    budget (tests/test_crawl_golden.py).
    """
    by_url = {r.url: r for r in corpus.itertuples(index=False)}
    queue: list[str] = []
    pages: set[str] = set()
    visit_order: list[str] = []

    def enqueue(urls: list[str]) -> None:
        for u in urls:
            if u not in pages and is_fetchable(u):
                queue.append(u)  # duplicates allowed, as in the reference

    enqueue(list(seeds))
    i = 0
    while i < len(queue):
        url = queue[i]
        i += 1
        if url in pages:
            continue  # deleteMany-on-pop purged duplicates
        pages.add(url)
        visit_order.append(url)
        row = by_url.get(url)
        if row is None or "text/html" not in (row.content_type or ""):
            continue
        html = row.html
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", errors="replace")
        links = extract_links_from(html or "", url)
        enqueue([u for (u, _h, _p) in links])
    return visit_order
