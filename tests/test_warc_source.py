"""WARC source: public-spec parser round-trip, gzip handling, deterministic
ordering, malformed-record policy, and end-to-end replay into the CDC
pipeline (archive-bootstrap path)."""

from __future__ import annotations

import gzip

import pytest

from cosmwasm_etl_spark.sources.warc import parse_warc_bytes, read_warc, write_warc_bytes

RECS_A = [
    {"url": "http://a.example/1", "warc_ts": "2026-01-01T00:00:00Z",
     "html": b"<html><body>page one</body></html>", "lang": "en"},
    {"url": "http://a.example/2", "warc_ts": "2026-01-01T00:00:01Z",
     "html": b"<html><body>page two</body></html>"},
]
RECS_B = [
    # recrawl of a/1 with newer content — latest-wins fodder
    {"url": "http://a.example/1", "warc_ts": "2026-01-02T00:00:00Z",
     "html": b"<html><body>page one v2</body></html>", "lang": "en"},
]


def test_parse_round_trip_plain_and_gzip():
    raw = write_warc_bytes(RECS_A)
    for data in (raw, gzip.compress(raw)):
        got = parse_warc_bytes(data)
        assert [r["url"] for r in got] == [r["url"] for r in RECS_A]
        assert got[0]["html"] == RECS_A[0]["html"]  # byte-identical payload
        assert got[0]["lang"] == "en" and got[1]["lang"] is None


def test_parse_skips_non_response_records():
    info = (
        b"WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    req = (
        b"WARC/1.1\r\nWARC-Type: request\r\nWARC-Target-URI: http://a.example/1\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        b"Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\n"
    )
    data = info + req + write_warc_bytes(RECS_A[:1])
    got = parse_warc_bytes(data)
    assert len(got) == 1 and got[0]["url"] == "http://a.example/1"


def test_parse_malformed_policy():
    good = write_warc_bytes(RECS_A[:1])
    bad = b"WARC/1.1\r\nWARC-Type: response\r\nContent-Type: application/http\r\n\r\nnope"
    data = bad + b"\r\n" + good
    with pytest.raises(ValueError):
        parse_warc_bytes(data, on_error="fail")
    got = parse_warc_bytes(data, on_error="skip")
    assert [r["url"] for r in got] == ["http://a.example/1"]


def test_read_warc_deterministic_order_and_types(spark, tmp_path):
    (tmp_path / "crawl-00000.warc").write_bytes(write_warc_bytes(RECS_A))
    (tmp_path / "crawl-00001.warc.gz").write_bytes(gzip.compress(write_warc_bytes(RECS_B)))
    df = read_warc(spark, str(tmp_path)).orderBy("seq")
    rows = df.collect()
    assert [r.url for r in rows] == ["http://a.example/1", "http://a.example/2", "http://a.example/1"]
    assert [r.epoch for r in rows] == [0, 0, 1]  # rank from sorted listing
    assert rows[0].seq == 0 and rows[1].seq == 1 and rows[2].seq == (1 << 32)
    assert all(r.op == "insert" for r in rows)
    assert bytes(rows[2].html) == RECS_B[0]["html"]
    assert rows[0].warc_ts.year == 2026 and rows[0].warc_ts.tzinfo is None


def test_warc_bootstrap_replays_into_pipeline(spark, tmp_path):
    """Archive bootstrap end-to-end: WARC files -> events -> run_replay;
    latest-wins picks the recrawl, audit closes."""
    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table

    (tmp_path / "crawl-00000.warc").write_bytes(write_warc_bytes(RECS_A))
    (tmp_path / "crawl-00001.warc.gz").write_bytes(gzip.compress(write_warc_bytes(RECS_B)))
    events = read_warc(spark, str(tmp_path)).persist()
    events.count()
    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=4)
    pipe = CdcPipeline(spark, table, str(tmp_path / "work"))
    pipe.run_replay(events, epochs_per_batch=1)
    pages = {r.url: r.text for r in pipe.pages().collect()}
    assert pages["http://a.example/1"] == "page one v2"
    assert pages["http://a.example/2"] == "page two"
    assert pipe.audit(events).count() == 0
    events.unpersist()
