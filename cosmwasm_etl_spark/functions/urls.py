"""URL canonicalization for web-scale corpora.

A Common-Crawl-style pipeline keyed by ``url`` (BASELINE input hint) sees
the same page under many spellings: scheme/host case, explicit default
ports, tracking query parameters, param order, fragments, trailing
slashes. Canonicalizing BEFORE the latest-wins dedup collapses those
variants into one CDC key — otherwise "hot" pages fragment into several
keys and re-crawls of ``?utm_source=...`` variants survive dedup as
near-duplicate rows.

Reference parity: the reference keys rows by exact address strings
(contract/pair addresses, ``parser/dex/types.go``) and never needs URL
normalization; this module is part of the webtext payload surface the
graft adds on top.

Everything here is pure Column expressions (JVM-side, whole-stage
codegen, ZERO shuffle — canonicalization is a projection). The DuckDB
oracle twin is generated from the same constants by
:func:`canonical_url_sql_expr`, so the driver verifies every rule
value-for-value.

Canonical form (applied in order):

1. scheme and host lowercased;
2. explicit default port stripped (``http:80``, ``https:443``);
3. fragment dropped;
4. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``igshid``, ``mc_eid``);
5. remaining query params sorted bytewise (param order never changes
   the page; sorting makes equality decidable);
6. empty path becomes ``/``; a trailing slash on a non-root path is
   dropped;
7. reassembled as ``scheme://host[:port]path[?query]``.

The rules are deliberately conservative: no percent-decoding, no
``www.`` stripping, no IDN/punycode mapping — those change identity for
some sites and belong in a site-specific layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking params dropped during canonicalization. One anchored regex,
# shared verbatim by the Spark and DuckDB twins (Java regex and RE2 agree
# on this subset: alternation, character classes, anchors only).
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid)="

_SCHEME_STRIP_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def url_parts(url: Column) -> Column:
    """Split a URL into a struct of (scheme, host, port, path, query).

    The fragment is parsed past but intentionally not returned — no
    canonical form keeps it. Missing pieces are empty strings (never
    NULL) so downstream concatenation stays total.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_STRIP_RE, "")
    authority = F.regexp_extract(rest, "^([^/?#]*)", 1)
    path_qf = F.substring(rest, F.length(authority) + F.lit(1), F.lit(2_147_483_647))
    host = F.lower(F.regexp_replace(authority, ":[0-9]*$", ""))
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    path = F.regexp_extract(path_qf, "^([^?#]*)", 1)
    query = F.regexp_extract(path_qf, "[?]([^#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def canonical_query(query: Column) -> Column:
    """Tracking params dropped, the rest sorted bytewise and re-joined."""
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a single Column expression (no UDF, no shuffle)."""
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    default_port = (
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
        | (port == F.lit(""))
    )
    portpart = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = p["path"]
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    q = canonical_query(p["query"])
    qpart = F.when(q == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)


def host_of(url: Column) -> Column:
    """Lowercased host (for registrable-domain rollups / per-domain stats)."""
    return url_parts(url)["host"]


def host_sql_expr(col: str) -> str:
    """DuckDB twin of :func:`host_of`."""
    rest = f"regexp_replace(trim({col}), '{_SCHEME_STRIP_RE}', '')"
    authority = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    return f"lower(regexp_replace({authority}, ':[0-9]*$', ''))"


def canonical_url_sql_expr(col: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` over the SQL expression
    ``col``. Generated from the same constants so the two dialects cannot
    drift rule-by-rule; the driver oracle verifies them value-for-value.
    """
    u = f"trim({col})"
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_STRIP_RE}', '')"
    authority = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    path_qf = f"substring({rest}, length({authority}) + 1)"
    host = f"lower(regexp_replace({authority}, ':[0-9]*$', ''))"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    raw_path = f"regexp_extract({path_qf}, '^([^?#]*)', 1)"
    query = f"regexp_extract({path_qf}, '[?]([^#]*)', 1)"
    default_port = (
        f"(({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443') OR {port} = '')"
    )
    portpart = f"(CASE WHEN {default_port} THEN '' ELSE ':' || {port} END)"
    path1 = f"(CASE WHEN {raw_path} = '' THEN '/' ELSE {raw_path} END)"
    path = (
        f"(CASE WHEN length({path1}) > 1 AND {path1} LIKE '%/' "
        f"THEN substring({path1}, 1, length({path1}) - 1) ELSE {path1} END)"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))"
    )
    # DuckDB's array_to_string([]) is NULL where Spark's array_join is ''
    q = f"coalesce(array_to_string({params}, '&'), '')"
    qpart = f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    return f"({scheme} || '://' || {host} || {portpart} || {path} || {qpart})"
