"""WARC source/sink — Common-Crawl-style ingest for the corpus table.

The engine's canonical input (BASELINE.json input_hint) is an Iceberg/
parquet table ``(url, warc_ts, html, text, lang, …)``; real Common Crawl
ships WARC files (ISO 28500). This module converts between the two,
fully distributed:

- ``write_warc``: one ``.warc`` file per partition (the same layout a
  fetcher fleet produces), written by the executors via ``mapInPandas`` —
  no driver collect. Returns a (path, n_records) manifest DataFrame.
- ``read_warc``: ``binaryFile`` scan → per-file record parser in
  ``mapInPandas`` → corpus-shaped rows. Each WARC file is one split
  (WARC members are not block-splittable without an index; Common Crawl
  solves scale with many ~1 GB files, which maps 1:1 onto Spark tasks).

Only ``WARC-Type: response`` records with an HTTP payload are emitted;
others (warcinfo, request, metadata) are skipped, as a Common-Crawl
consumer does. The parser is byte-exact on Content-Length (payloads may
contain ``\\r\\n\\r\\n``) and tolerant of a missing trailing CRLF pair.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_ROW_SCHEMA = (
    "url string, warc_ts timestamp, html binary, content_type string, "
    "status int"
)

_CRLF = b"\r\n"


def _fmt_ts(ts) -> str:
    if ts is None or pd.isna(ts):  # None or pandas NaT
        return "1970-01-01T00:00:00Z"
    if isinstance(ts, str):
        return ts
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_bytes(url: str, ts, payload: bytes, content_type: str,
                  status: int) -> bytes:
    http = (
        f"HTTP/1.1 {status} X\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8") + payload
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_fmt_ts(ts)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
        # UTF-8, not ascii: crawl corpora carry IRIs (the canonicalizer
        # passes non-ASCII hosts/paths through) and WARC/1.1 permits
        # UTF-8 header values — an ascii encode would throw inside the
        # executor and fail the whole write task
    ).encode("utf-8")
    return head + http + _CRLF + _CRLF


def write_warc(
    corpus: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    ct_col: str = "content_type",
    status_col: str = "status",
) -> DataFrame:
    """Write the corpus as one WARC file per partition; returns the
    (path, n_records) manifest. Executors write their own partitions."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [url_col, ts_col, html_col, ct_col, status_col]

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    url, ts, html, ct, status = r
                    payload = bytes(html) if html is not None else b""
                    f.write(_record_bytes(
                        url, ts, payload, ct or "application/octet-stream",
                        int(status) if status is not None else 200,
                    ))
                    n += 1
        if n == 0:
            os.remove(path)
            return
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    return corpus.select(*cols).mapInPandas(dump, "path string, n_records long")


def _parse_warc_member(buf: bytes, pos: int):
    """Parse one WARC record at ``pos``; returns (record dict | None,
    next_pos) or (None, -1) at end of stream."""
    # skip inter-record CRLFs
    while buf.startswith(_CRLF, pos):
        pos += 2
    if pos >= len(buf):
        return None, -1
    head_end = buf.find(_CRLF + _CRLF, pos)
    if head_end < 0:
        return None, -1
    headers: dict[str, str] = {}
    # utf-8 first (what we write, what WARC/1.1 allows), latin-1 fallback
    # so arbitrary third-party bytes still parse
    raw_head = buf[pos:head_end]
    try:
        head = raw_head.decode("utf-8")
    except UnicodeDecodeError:
        head = raw_head.decode("iso-8859-1")
    lines = head.split("\r\n")
    if not lines or not lines[0].startswith("WARC/"):
        return None, -1
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    try:
        length = int(headers.get("content-length", "0"))
    except ValueError:
        length = 0
    body_start = head_end + 4
    body = buf[body_start : body_start + length]
    return (
        {"headers": headers, "body": body},
        body_start + length,
    )


def _parse_http_payload(body: bytes):
    """(status, content_type, payload) from an HTTP response block."""
    sep = body.find(_CRLF + _CRLF)
    if sep < 0:
        return 200, "", body
    head = body[:sep].decode("iso-8859-1", errors="replace")
    lines = head.split("\r\n")
    status = 200
    if lines and lines[0].startswith("HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ct = ""
    for line in lines[1:]:
        if line.lower().startswith("content-type:"):
            ct = line.split(":", 1)[1].strip()
            break
    return status, ct, body[sep + 4 :]


def _parse_warc_date(s: str):
    try:
        return (
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
        )
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → corpus rows (url, warc_ts, html, content_type, status).

    One task per file (``binaryFile`` scan); record parsing is pure bytes
    work inside the executor's Arrow batch.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("url", "warc_ts", "html", "content_type", "status")}
            for content in pdf["content"]:
                buf = bytes(content)
                pos = 0
                while True:
                    rec, pos = _parse_warc_member(buf, pos)
                    if rec is None:
                        break
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    status, ct, payload = _parse_http_payload(rec["body"])
                    rows["url"].append(h.get("warc-target-uri", ""))
                    rows["warc_ts"].append(
                        _parse_warc_date(h.get("warc-date", ""))
                    )
                    rows["html"].append(payload)
                    rows["content_type"].append(ct)
                    rows["status"].append(status)
            pdf = pd.DataFrame(rows)
            # coerce dtypes explicitly: a file with zero response records
            # (warcinfo-only) otherwise yields float64 columns that Arrow
            # cannot cast to timestamp/int
            pdf["warc_ts"] = (
                pd.to_datetime(pdf["warc_ts"], utc=True)
                .dt.tz_localize(None)
                .astype("datetime64[us]")
            )
            pdf["status"] = pdf["status"].astype("int32")
            yield pdf

    return files.select("content").mapInPandas(parse, WARC_ROW_SCHEMA)
