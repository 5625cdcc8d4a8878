"""WARC source: read ISO 28500 / WARC 1.0-1.1 web-archive files (the native
Common-Crawl interchange format) into the engine's change-event schema.

Public-spec parser written from the WARC record grammar (version line,
CRLF-delimited named headers, Content-Length octet block, two-CRLF record
separator); ``response`` records with an ``application/http`` block yield one
``insert`` event each: ``WARC-Target-URI`` → url, ``WARC-Date`` → warc_ts,
the HTTP payload (bytes after the HTTP header section) → html, and the HTTP
``Content-Language`` header (when present) → lang. ``warcinfo`` / ``request``
/ ``metadata`` / ``revisit`` records are skipped. Per-record-member and
whole-file gzip (``*.warc.gz``) are both handled — Python's gzip reader
concatenates members, which is exactly Common Crawl's layout.

Physical shape:

- files arrive via ``spark.read.format("binaryFile")`` (one row per file,
  whole bytes); parsing runs in ``mapInPandas`` so Python touches each FILE
  once — the repo's sanctioned Python boundary (same as multimodal decode);
  there are no per-row UDFs and record bytes never round-trip the JVM
  per-record.
- ordering is deterministic without any global shuffle: each file gets a
  rank from the sorted file listing (one tiny driver-side metadata listing,
  same bookkeeping the event-log reader does for epochs), and
  ``seq = rank << 32 | record_index`` / ``epoch = rank``. Common Crawl's
  segment/file naming is already totally ordered, so rank is stable across
  re-listings of a grown archive.
- a 100 TB archive is just more files: parallelism is per-file, the parser
  is O(file bytes), and nothing aggregates until the CDC apply.

Parity anchor: this plays the role of the reference's raw-block fetcher
(`/root/reference/collector/datastore/datastore.go:404-424`) for archive
backfills — batch bootstrap from an interchange dump, after which the
ordered event log takes over (same division as `sources/failover.py`).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from cosmwasm_etl_spark.sources.eventlog import EVENT_SCHEMA

_SEQ_STRIDE = 1 << 32  # records per file rank; seq = rank << 32 | index


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # GzipFile over the stream concatenates members (CC's per-record gzip)
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


def _unfold(lines: list[str]) -> list[str]:
    """Join ISO 28500 folded continuation lines (leading SP/HT) onto the
    previous header value — without this, a folded value is mis-parsed as a
    bogus standalone header (r5 ADVICE #5; real Common Crawl dumps fold)."""
    out: list[str] = []
    for line in lines:
        if line[:1] in (" ", "\t") and out:
            out[-1] += " " + line.strip()
        else:
            out.append(line)
    return out


def parse_warc_bytes(
    data: bytes, on_error: str = "fail", skips: list[int] | None = None
) -> list[dict]:
    """Parse one WARC file's bytes into a list of response-record dicts
    ``{url, warc_ts (ISO str), html (bytes), lang}`` in file order.

    ``on_error='skip'`` drops malformed records (and keeps scanning from the
    next well-formed version line); ``'fail'`` raises ValueError with the
    byte offset. ``skips`` (optional list) receives the byte offset of every
    skipped record so callers can SURFACE drop counts instead of losing
    records silently (r5 ADVICE #3). Pure function — unit-testable without
    Spark.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"unknown on_error: {on_error}")
    data = _maybe_gunzip(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLFs / trailing junk whitespace
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        try:
            if not data[pos : pos + 5] == b"WARC/":
                raise ValueError(f"expected WARC version line at offset {pos}")
            hdr_end = data.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                raise ValueError(f"unterminated WARC header at offset {pos}")
            header_block = data[pos:hdr_end].decode("utf-8", errors="replace")
            headers: dict[str, str] = {}
            for line in _unfold(header_block.split("\r\n")[1:]):
                k, _, v = line.partition(":")
                if _:
                    headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(f"missing/invalid Content-Length at offset {pos}") from None
            block_start = hdr_end + 4
            block_end = block_start + length
            if block_end > n:
                raise ValueError(f"truncated record block at offset {pos}")
            block = data[block_start:block_end]
            next_pos = block_end  # leading-CRLF skip above consumes the separator
            rtype = headers.get("warc-type", "")
            if rtype == "response" and headers.get("content-type", "").startswith(
                "application/http"
            ):
                url = headers.get("warc-target-uri")
                ts = headers.get("warc-date")
                if not url or not ts:
                    raise ValueError(f"response record missing URI/Date at offset {pos}")
                http_hdr_end = block.find(b"\r\n\r\n")
                if http_hdr_end < 0:
                    raise ValueError(f"response block has no HTTP header end at offset {pos}")
                http_headers = block[:http_hdr_end].decode("latin-1")
                lang = None
                for line in _unfold(http_headers.split("\r\n")[1:]):
                    k, _, v = line.partition(":")
                    if _ and k.strip().lower() == "content-language":
                        lang = v.strip().split(",")[0].split("-")[0].lower() or None
                        break
                out.append(
                    {
                        "url": url.strip("<>"),
                        "warc_ts": ts,
                        "html": block[http_hdr_end + 4 :],
                        "lang": lang,
                    }
                )
            pos = next_pos
        except ValueError:
            if on_error == "fail":
                raise
            if skips is not None:
                skips.append(pos)
            nxt = data.find(b"\r\nWARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt + 2
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    on_error: str = "fail",
    base_epoch: int = 0,
    skip_counter=None,
) -> DataFrame:
    """Read a directory (or glob) of ``*.warc`` / ``*.warc.gz`` files as
    change events (EVENT_SCHEMA): every response record becomes one
    ``insert`` with a deterministic total order — ``epoch = base_epoch +
    file rank`` (rank from the sorted file listing) and ``seq = epoch <<
    32 | in-file record index``. Feed the result to
    ``CdcPipeline.run_replay`` (or write it with ``write_event_log``) for
    an archive bootstrap; latest-wins dedup handles recrawled urls exactly
    like live updates.

    Rank stability caveat (r5 ADVICE #4): ranks come from the sorted
    listing of the CURRENT directory, so re-ingesting a grown archive only
    preserves committed epochs when the archive is APPEND-ONLY with
    lexically increasing names (Common Crawl's segment/file naming is).
    Inserting a file that sorts before existing ones shifts every later
    rank — treat that as a new archive (fresh table), not a resume.

    ``skip_counter``: optional Spark accumulator; with ``on_error='skip'``
    it receives the number of malformed records dropped, so callers can
    surface the loss instead of silently swallowing it (r5 ADVICE #3).
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # one tiny metadata listing for stable ranks (paths only, no bytes)
    ordered = sorted(r["path"] for r in files.select("path").collect())
    rank = {p: i for i, p in enumerate(ordered)}

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for p, content in zip(b["path"], b["content"]):
                ep = base_epoch + rank[p]
                skips: list[int] = []
                recs = parse_warc_bytes(bytes(content), on_error=on_error, skips=skips)
                if skips and skip_counter is not None:
                    skip_counter.add(len(skips))
                for i, rec in enumerate(recs):
                    ts = pd.Timestamp(rec["warc_ts"])
                    if ts.tzinfo is not None:
                        ts = ts.tz_convert("UTC").tz_localize(None)
                    rows.append(
                        {
                            "seq": (ep << 32) | i,
                            "epoch": ep,
                            "op": "insert",
                            "url": rec["url"],
                            "warc_ts": ts,
                            "html": rec["html"],
                            "lang": rec["lang"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["seq", "epoch", "op", "url", "warc_ts", "html", "lang"]
            )

    return files.mapInPandas(_parse, schema=EVENT_SCHEMA)


def write_warc_bytes(records: list[dict]) -> bytes:
    """Serialize response records (``{url, warc_ts, html, lang?, status?}``)
    to WARC/1.1 bytes — the fixture writer for tests and round-trip checks
    (no external data; deterministic)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        http = b"HTTP/1.1 %d OK\r\nContent-Type: text/html" % r.get("status", 200)
        if r.get("lang"):
            http += b"\r\nContent-Language: " + r["lang"].encode()
        http += b"\r\n\r\n" + r["html"]
        hdr = (
            f"WARC/1.1\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:test:{i}>\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        out.write(hdr + http + b"\r\n\r\n")
    return out.getvalue()
