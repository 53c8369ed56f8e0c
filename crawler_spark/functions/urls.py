"""URL canonicalization kernel.

Re-implements the reference crawler's URL handling (reference:
``src/lib/utils.ts:19-104`` — ``normalizeUrl`` / ``removeHash`` /
``getHostname`` / ``hasProto`` / ``isBadExtension``) with WHATWG-URL
semantics on top of ``urllib``, exposed both as pure-Python kernels (used by
the golden-test oracle) and as vectorized pandas UDFs (the engine hot path).

WHATWG behaviors replicated (the reference uses the ``whatwg-url`` npm
package):

- scheme and host lowercased;
- default ports stripped (http:80, https:443, ws:80, wss:443, ftp:21);
- empty path becomes ``/`` for *special* schemes (``new URL('http://A.com')
  .href === 'http://a.com/'``);
- dot segments removed (``/a/../b`` → ``/b``);
- fragment stripped (the reference sets ``full.hash = ''``,
  ``utils.ts:24``);
- parse failure → ``''`` (``utils.ts:27-29``).

Deliberate superset required by the north rule (NOT in the reference,
flagged here): **query parameters are sorted** (stable, by key then value).

Faithful quirk preserved from the reference: ``isBadExtension``
(``utils.ts:6-10, 99-104``) compares ``path.extname`` output (``'.json'``,
with a leading dot) against a dot-less deny list (``['json','csv','xml']``)
so it NEVER matches — the faithful mode is a no-op; pass
``corrected=True`` for the intended behavior.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import urlsplit, urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# WHATWG "special" schemes and their default ports.
SPECIAL_SCHEMES: dict[str, int | None] = {
    "http": 80,
    "https": 443,
    "ws": 80,
    "wss": 443,
    "ftp": 21,
    "file": None,
}

# Extensions the reference *intends* to reject (utils.ts:6-10).
BAD_EXTENSIONS = ("json", "csv", "xml")

# Characters allowed un-escaped in the path / query per the WHATWG percent
# encode sets: paths escape C0 controls, space, ", <, >, `, #, ?, {, }
# (so |, [, ], ^ stay VERBATIM — the whatwg-url serializer the reference
# uses does not touch them); queries escape only C0, space, ", #, <, >
# plus ' for special schemes. Backslashes never reach the path encoder
# for special schemes (normalize_url converts them to '/' first).
_PATH_SAFE = re.compile(r"[^A-Za-z0-9\-._~!$&'()*+,;=:@/%|\[\]^\\]")
_QUERY_SAFE = re.compile(r"[^A-Za-z0-9\-._~!$&()*+,;=:@/?%|\[\]^\\`{}]")
_PCT_OK = re.compile(r"%[0-9A-Fa-f]{2}")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _pct_encode(s: str, unsafe: re.Pattern[str]) -> str:
    """Percent-encode chars matching ``unsafe``; keep valid %XX untouched."""
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "%" and _PCT_OK.match(s, i):
            out.append(s[i : i + 3])
            i += 3
            continue
        if unsafe.match(ch):
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — WHATWG applies this to special-scheme paths."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve trailing slash semantics of '.'/'..' final segments
    last = path.rsplit("/", 1)[-1]
    if last in (".", "..") and (not output or output[-1] != ""):
        output.append("")
    norm = "/".join(output)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _sort_query(query: str) -> str:
    """Stable-sort query params by (key, value). North-rule superset."""
    if not query:
        return query
    parts = query.split("&")
    keyed = []
    for p in parts:
        k, sep, v = p.partition("=")
        keyed.append((k, v, p))
    keyed.sort(key=lambda t: (t[0], t[1]))
    return "&".join(t[2] for t in keyed)


# ubiquitous click/campaign trackers whose presence forks otherwise
# identical URLs in the frontier and the seen set. Deliberately
# conservative: only parameters that are pure telemetry everywhere
# (utm_* and the big ad/click ids) — ambiguous names like `ref` or `s`
# can be load-bearing on some sites and stay. Anchored so a bare
# parameter without '=' matches too.
TRACKING_PARAM_RE = (
    "^(utm_[^=]*|gclid|dclid|gbraid|wbraid|fbclid|msclkid|yclid|igshid|"
    "mc_cid|mc_eid|_hsenc|_hsmi|vero_conv|vero_id|oly_anon_id|oly_enc_id)"
    "(=.*)?$"
)


def strip_tracking_params(url):
    """Column expression dropping tracking query params from a URL.

    The frontier-dedup complement of ``normalize_url``'s query sort:
    ``?utm_source=feed`` vs ``?utm_source=tw`` would otherwise enqueue
    (and crawl, and store) the same page twice. Pure JVM column algebra
    — split on the first ``?``, filter the param array against
    ``TRACKING_PARAM_RE``, rejoin — no UDF, stays in codegen; the
    DuckDB oracle runs the same split/filter/rejoin. Non-tracking
    params keep their original relative order; a URL whose params are
    all trackers loses the ``?`` entirely. Fragments are assumed
    already stripped (run after canonicalization).
    """
    url = F.col(url) if isinstance(url, str) else url
    parts = F.split(url, r"\?", 2)
    base = parts.getItem(0)
    kept = F.filter(
        F.split(parts.getItem(1), "&"),
        lambda p: ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)
    return F.when(F.size(parts) > 1, rebuilt).otherwise(url)


def normalize_url(url: str, base: str = "", sort_query: bool = True) -> str:
    """WHATWG-style canonical ``href`` with fragment stripped.

    Mirrors ``normalizeUrl`` (reference ``utils.ts:19-30``): resolves ``url``
    against ``base`` when ``base`` is non-empty, sets ``hash = ''``, returns
    ``''`` on parse failure. Superset: sorts query params when
    ``sort_query``.
    """
    try:
        raw = urljoin(base, url) if base else url
        m = _SCHEME_RE.match(raw)
        if not m:
            return ""
        scheme0 = raw[: m.end() - 1].lower()
        if scheme0 in SPECIAL_SCHEMES and scheme0 != "file":
            # WHATWG slash recovery for special schemes: after
            # 'scheme:' ANY run of / and \ (including none at all —
            # 'http:example.com/x', 'https:/h/x') starts the authority,
            # and \ acts as / through authority+path ('http://h\p').
            # urlsplit alone would yield an empty netloc (link dropped)
            # or a backslash inside the hostname (garbage politeness
            # key). file: keeps its genuinely different slash rules.
            remainder = raw[m.end():]
            cut = len(remainder)
            for ch in "?#":
                p = remainder.find(ch)
                if p != -1:
                    cut = min(cut, p)
            pre = remainder[:cut].replace("\\", "/")
            raw = f"{scheme0}://{pre.lstrip('/')}{remainder[cut:]}"
        parts = urlsplit(raw)
        scheme = parts.scheme.lower()
        if not scheme:
            return ""
        special = scheme in SPECIAL_SCHEMES
        if special:
            host = (parts.hostname or "").lower()
            if not host and scheme != "file":
                return ""  # WHATWG: special schemes require a host
            port = parts.port
            netloc = host
            if parts.username:
                userinfo = parts.username + (
                    f":{parts.password}" if parts.password else ""
                )
                netloc = f"{userinfo}@{netloc}"
            if port is not None and port != SPECIAL_SCHEMES[scheme]:
                netloc = f"{netloc}:{port}"
            path = _remove_dot_segments(parts.path) or "/"
            path = _pct_encode(path, _PATH_SAFE)
            query = _pct_encode(parts.query, _QUERY_SAFE)
            if sort_query:
                query = _sort_query(query)
            return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")
        # non-special scheme (mailto:, javascript:, data:): opaque path,
        # minimal normalization — lowercase scheme, drop fragment.
        rest = raw.split(":", 1)[1]
        rest = rest.split("#", 1)[0]
        return f"{scheme}:{rest}"
    except ValueError:
        return ""


def remove_hash(url: str) -> str:
    """Strip the fragment only (reference ``utils.ts:32-36``)."""
    return normalize_url(url, "", sort_query=False)


def get_hostname(url: str) -> str:
    """Lowercased hostname; ``''`` on failure (reference ``utils.ts:44-48``).

    NOTE the reference's ``getHostname`` *throws* on a bad URL; it is only
    ever called after ``hasProto``/``normalizeUrl`` succeeded, so '' is the
    observable-equivalent total function.
    """
    try:
        parts = urlsplit(url)
        return (parts.hostname or "").lower()
    except ValueError:
        return ""


def has_proto(url: str) -> bool:
    """True when the URL parses with a scheme (reference ``utils.ts:56-63``).

    Faithful quirk: ``mailto:x`` / ``javascript:void(0)`` parse under WHATWG
    and therefore pass this check in the reference too.
    """
    try:
        if not _SCHEME_RE.match(url):
            return False
        # share normalize_url's WHATWG slash recovery: the reference's
        # hasProto is "new URL() succeeds", and WHATWG recovers
        # 'http:example.com' / 'https:/h/x' to a parsed special URL —
        # rejecting them here would drop links the reference crawls
        return bool(normalize_url(url, "", sort_query=False))
    except ValueError:
        return False


def is_fetchable(url: str) -> bool:
    """Engine superset: only http(s) URLs enter the frontier.

    The reference would enqueue ``mailto:``/``javascript:`` links (they pass
    ``hasProto``, ``page.ts:122``) and fail them at fetch time; we drop them
    at discovery time — same visited-HTML set, less junk in the frontier.
    """
    try:
        return urlsplit(url).scheme.lower() in ("http", "https")
    except ValueError:
        return False


def path_extension(url: str) -> str:
    """``path.extname(parsed.pathname)`` equivalent (``utils.ts:101``)."""
    try:
        path = urlsplit(url).path
    except ValueError:
        return ""
    base = posixpath.basename(path)
    i = base.rfind(".")
    return base[i:] if i > 0 else ""


def is_bad_extension(url: str, corrected: bool = False) -> bool:
    """Reference ``isBadExtension`` (``utils.ts:99-104``).

    Faithful mode compares ``'.json' in ('json','csv','xml')`` → always
    False (reference bug, documented in SURVEY.md §2.8 U8). ``corrected``
    strips the dot first, enabling the intended filter.
    """
    ext = path_extension(url)
    if corrected:
        return ext.lstrip(".") in BAD_EXTENSIONS
    return ext in BAD_EXTENSIONS  # always False: ext carries a leading dot


# --------------------------------------------------------------------------
# Vectorized pandas UDFs (Arrow-batched; the engine hot path).
# --------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """canon_url per url; empty-string failures become None for filtering."""
    out = [normalize_url(u) if isinstance(u, str) else "" for u in urls]
    return pd.Series([v if v else None for v in out])


@F.pandas_udf(T.StringType())
def canonicalize_rel_udf(urls: pd.Series, bases: pd.Series) -> pd.Series:
    out = [
        normalize_url(u, b or "") if isinstance(u, str) else ""
        for u, b in zip(urls, bases)
    ]
    return pd.Series([v if v else None for v in out])


@F.pandas_udf(T.StringType())
def hostname_udf(urls: pd.Series) -> pd.Series:
    return pd.Series([get_hostname(u) if isinstance(u, str) else "" for u in urls])


@F.pandas_udf(T.BooleanType())
def fetchable_udf(urls: pd.Series) -> pd.Series:
    return pd.Series([is_fetchable(u) if isinstance(u, str) else False for u in urls])
