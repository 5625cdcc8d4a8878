"""Every queries() entry vs its DuckDB oracle at sf0.01 — the local replica
of the driver's CORRECTNESS gate (row count + schema-width + order-insensitive
value comparison, columns sorted by name).

Parametrization uses the static ORACLE_NAMES key list; the SQL map itself is
built lazily through a module fixture (build_oracles embeds fixture paths —
multimodal media parquet and the pure-Python-XXH64 expected outputs — whose
materialization must not run at collection time)."""

from __future__ import annotations

import math

import duckdb
import pytest

from cosmwasm_etl_spark.queries import ORACLE_NAMES, QUERIES, build_oracles

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def oracles(sf_dir):
    return build_oracles(sf_dir)


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_normalize(r[i]) for i in order) for r in rows)
    return out


def test_every_query_has_an_oracle():
    assert set(ORACLE_NAMES) == set(QUERIES), (
        "queries() and oracles diverged: "
        f"missing={set(QUERIES) - set(ORACLE_NAMES)} stale={set(ORACLE_NAMES) - set(QUERIES)}"
    )


@pytest.mark.parametrize("name", sorted(ORACLE_NAMES))
def test_query_matches_oracle(name, spark, sf_dir, ddb, oracles):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    cur = ddb.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a, b = _canon(srows, scols), _canon(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first mismatches at {mism}: {[(a[i], b[i]) for i in mism]}"
