"""Property-based tests (hypothesis): adversarial inputs for the pure
parsers and randomized cross-checks of Spark operators against brute-force
Python references.

Spark-backed properties batch each hypothesis example into ONE job over a
generated corpus and cap example counts (a Spark job per example is the
unit cost); pure-Python properties run at full example counts.
"""

from __future__ import annotations

import gzip
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cosmwasm_etl_spark.sources.warc import parse_warc_bytes, write_warc_bytes

# ---------------------------------------------------------------- WARC

_url = st.from_regex(r"http://[a-z]{1,8}\.example/[a-z0-9/]{0,12}", fullmatch=True)
_ts = st.integers(min_value=0, max_value=2_000_000_000).map(
    lambda s: __import__("datetime").datetime.utcfromtimestamp(s).strftime("%Y-%m-%dT%H:%M:%SZ")
)
# adversarial bodies: empty, CRLF-CRLF inside (must not split the record —
# Content-Length framing owns the block), fake version lines, NUL bytes
_body = st.binary(min_size=0, max_size=200) | st.sampled_from(
    [b"", b"\r\n\r\n", b"x\r\n\r\nWARC/1.1\r\n", b"WARC/9.9", b"\x00" * 32]
)
_record = st.fixed_dictionaries(
    {"url": _url, "warc_ts": _ts, "html": _body},
    optional={"lang": st.sampled_from(["en", "de", "fr", "zh"])},
)


@given(st.lists(_record, min_size=0, max_size=8), st.booleans())
@settings(max_examples=200, deadline=None)
def test_warc_write_parse_round_trip(records, use_gzip):
    data = write_warc_bytes(records)
    if use_gzip:
        data = gzip.compress(data)
    got = parse_warc_bytes(data)
    assert len(got) == len(records)
    for want, have in zip(records, got):
        assert have["url"] == want["url"]
        assert have["warc_ts"] == want["warc_ts"]
        assert have["html"] == want["html"]  # byte-identical through framing
        assert have["lang"] == want.get("lang")


@given(st.lists(_record, min_size=1, max_size=4), st.binary(min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_warc_skip_mode_recovers_after_garbage_prefix(records, garbage):
    data = garbage + b"\r\n" + write_warc_bytes(records)
    got = parse_warc_bytes(data, on_error="skip")
    # skip mode never raises and never invents records
    assert len(got) <= len(records)
    assert all(any(g["url"] == r["url"] for r in records) for g in got)


# ------------------------------------------------- substring spans vs brute force


def _ref_substring_spans(texts: dict[int, str], k: int) -> dict[int, tuple[int, int, int, int]]:
    """Brute-force reference: whitespace corpora (ASCII word alphabet keeps
    Spark's unicode tokenizer and str.split trivially identical)."""
    toks = {i: t.split() for i, t in texts.items()}
    counts: dict[str, int] = {}
    wins: dict[int, list[str]] = {}
    for i, ts in toks.items():
        ws = [" ".join(ts[p : p + k]) for p in range(max(len(ts) - k + 1, 0))]
        wins[i] = ws
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    out = {}
    for i, ws in wins.items():
        dup_pos = [p for p, w in enumerate(ws) if counts[w] > 1]
        spans: list[list[int]] = []
        for p in dup_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        out[i] = (
            len(ws),
            len(dup_pos),
            len(spans),
            sum(e - s for s, e in spans),
        )
    return out


_word = st.sampled_from(["alpha", "bravo", "carol", "delta", "echo1", "fox"])
_text = st.lists(_word, min_size=0, max_size=14).map(" ".join)


@given(corpora=st.lists(_text, min_size=1, max_size=8), k=st.integers(min_value=2, max_value=4))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_substring_spans_match_brute_force(spark, corpora, k):
    from cosmwasm_etl_spark.functions.dedup import substring_span_stats

    texts = dict(enumerate(corpora))
    docs = spark.createDataFrame(list(texts.items()), "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.n_dup_spans, r.dup_tokens)
        for r in substring_span_stats(docs, k=k).collect()
    }
    assert got == _ref_substring_spans(texts, k)


# ------------------------------------------------- 40-digit exact decimal sum

_wide = st.decimals(
    min_value=Decimal(0),
    max_value=Decimal(10) ** 22 - 1,
    allow_nan=False,
    allow_infinity=False,
    places=18,
)


def _canon(d: Decimal) -> str:
    import decimal

    with decimal.localcontext(decimal.Context(prec=80)):
        q = d.quantize(Decimal(1).scaleb(-18))
        s = f"{q:f}"
    return s if "." in s else s + "." + "0" * 18


@given(amounts=st.lists(_wide, min_size=1, max_size=30))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_exact_wide_sum_matches_python_decimal(spark, amounts):
    from cosmwasm_etl_spark.functions.decimal40 import exact_wide_sum

    df = spark.createDataFrame([("g", _canon(a)) for a in amounts], "g: string, amt: string")
    row = exact_wide_sum(df, ["g"], "amt").collect()[0]
    assert row.n_bad == 0 and row.n_rows == len(amounts)
    import decimal

    with decimal.localcontext(decimal.Context(prec=80)):
        want = _canon(sum(amounts, Decimal(0)))
    assert row.sum_exact == want
