"""PII redaction for web-scale training corpora.

Training-data pipelines scrub personally-identifiable strings (emails,
phone numbers, IP addresses) from crawled text before the corpus ships.
This module does it as pure Column expressions — ``regexp_replace`` /
``regexp_count`` run JVM-side inside whole-stage codegen, ZERO shuffle
(redaction is a projection), so the op costs one scan at any scale.

Reference parity: the reference normalizes/strips attribute strings
inside its mappers (`parser/dex/dezswap/mappers.go`) but has no PII
surface; this is part of the webtext payload the graft adds.

Pattern notes — the same regex string is shared verbatim by the Spark
(Java regex) and DuckDB (RE2) twins, so patterns are restricted to the
dialect intersection: character classes, bounded repetition, ``\\b``
word boundaries, no look-around, no back-references. Patterns are
deliberately conservative (recall over precision is NOT the goal of a
redactor that must not mangle code/markup):

- email: RFC-ish local@domain.tld
- ipv4: four dotted octet-shaped groups, word-bounded
- phone: international ``+`` prefix followed by 8+ digits with
  space/dash separators (the unambiguous form; bare local numbers
  collide with ids/quantities and are left to site-specific layers)

Order matters and is fixed: emails first (their local part may contain
digits that the phone pattern would otherwise eat), then IPs (dotted
digits), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+[0-9][0-9 \\-]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# applied in this order — see module docstring
_RULES = (
    ("emails", EMAIL_RE, EMAIL_TOKEN),
    ("ips", IPV4_RE, IPV4_TOKEN),
    ("phones", PHONE_RE, PHONE_TOKEN),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (on the ORIGINAL text, before redaction).

    Counts use the same patterns as :func:`redact_pii`. They are
    diagnostics, not an exact token tally: a phone-shaped digit run
    nested inside an email's local part counts under both kinds even
    though redaction (emails first) inserts only one token.
    """
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in _RULES
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder token.

    A projection — no shuffle, no Python. Replacement tokens contain no
    characters any pattern matches, so the three passes compose without
    re-matching each other's output.
    """
    out = text
    for _, pat, tok in _RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts` (RE2 dialect, same patterns)."""
    return {
        name: (
            f"CAST(len(regexp_extract_all({text_expr}, '{_sql_quote(pat)}')) AS BIGINT)"
        )
        for name, pat, _ in _RULES
    }


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (global replace, same order)."""
    out = text_expr
    for _, pat, tok in _RULES:
        out = f"regexp_replace({out}, '{_sql_quote(pat)}', '{tok}', 'g')"
    return out


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")
