"""Byte-identical extraction golden tests.

Parity anchor: the reference's table-driven mapper golden-output tests
(`/root/reference/parser/dex/dezswap/mappers_test.go:16-80`) — exact expected
output per input, including error cases. Here the invariant is BASELINE.json's
"byte-identical extracted text per url": the pure-python core defines the
bytes; the Spark/Arrow path must reproduce them exactly.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.extraction import (
    check_quarantine_bytes,
    extract_text_bytes,
    with_extracted_text,
)

# ~golden corpus: (name, html bytes, expected text, expected err)
GOLDEN = [
    ("empty", b"", "", None),
    ("plain", b"hello world", "hello world", None),
    ("simple_tags", b"<html><body><p>a b</p></body></html>", "a b", None),
    ("nested", b"<div><span>x<BR/>y</span><b><i>z</i></b></div>", "x y z", None),
    ("script_stripped", b"<p>keep</p><script>var x='<b>no</b>';</script><p>tail</p>", "keep tail", None),
    ("style_stripped", b"<style>p{color:red}</style><p>body</p>", "body", None),
    ("comment", b"a<!-- hidden <b>bold</b> -->b", "a b", None),
    # &nbsp; -> U+00A0 which \s+ (unicode) collapses into a single space
    ("entities", b"x &amp; y &lt;z&gt; &quot;q&quot; &#65;&#x42; &nbsp;.", 'x & y <z> "q" AB .', None),
    ("ws_collapse", b"  a\t\tb\n\n\nc  ", "a b c", None),
    ("cjk", "<p>中文 測試</p>".encode(), "中文 測試", None),
    ("rtl", "<p>שלום עולם</p>".encode(), "שלום עולם", None),
    ("emoji", "<p>🎉 party</p>".encode(), "🎉 party", None),
    ("null_byte", b"a\x00b", "a\x00b", None),
    ("few_bad_bytes", b"ok " + b"\xff" + b" tail and much more clean text here", "ok � tail and much more clean text here", None),
    ("mostly_bad", b"\xff\xfe\xfd" * 20, "", "invalid_encoding"),
    ("unclosed_tag", b"<p>text <b unfinished", "text", None),
    ("attr_gt", b'<a href="x>y">link</a>', 'y">link', None),  # naive tag strip: documented behavior
    ("long", b"<p>" + b"word " * 5000 + b"</p>", ("word " * 5000).strip(), None),
]


@pytest.mark.parametrize("name,html,want_text,want_err", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_pure_core_golden(name, html, want_text, want_err):
    text, err = extract_text_bytes(html)
    assert err == want_err
    assert text == want_text
    # byte identity, not just str equality
    assert text.encode("utf-8") == want_text.encode("utf-8")


def test_determinism_repeated():
    for html in [g[1] for g in GOLDEN]:
        a = extract_text_bytes(html)
        b = extract_text_bytes(bytes(html))
        assert a == b


def test_spark_arrow_path_matches_pure_core(spark):
    """The Arrow round-trip must not perturb a single byte."""
    rows = [Row(url=f"u{i}", html=g[1]) for i, g in enumerate(GOLDEN)]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: (r.text, r["__extract_err"])
        for r in with_extracted_text(df).collect()
    }
    for i, (name, html, want_text, want_err) in enumerate(GOLDEN):
        text, err = got[f"u{i}"]
        assert err == want_err, name
        if want_err is None:
            assert text == want_text, name
            assert hashlib.sha256(text.encode("utf-8")).hexdigest() == hashlib.sha256(
                want_text.encode("utf-8")
            ).hexdigest(), name


def test_quarantine_check_agrees_with_extraction(spark):
    for _, html, _, want_err in GOLDEN:
        assert check_quarantine_bytes(html) == want_err
