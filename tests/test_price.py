"""G4 price pipeline: route-price parity with the driver-side comparator.

Parity anchors: optimal-route pick (`pkg/dex/price/price.go:296-353`),
route-price math (`price.go:358-404`), direct price (`price.go:124-172`),
swap-price fix (`price.go:235-284`).
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from cosmwasm_etl_spark.price import price_series, reserves_by_height, route_price_table
from cosmwasm_etl_spark.routing import best_route, enumerate_routes

# diamond market: base <- x <- top and base <- y <- top, plus a direct
# base <- top pair: 'top' has THREE routes to base with different shapes
EDGES = [("base", "x"), ("x", "top"), ("base", "y"), ("y", "top"), ("base", "top")]


def _swaps_df(spark, rows):
    return spark.createDataFrame(
        rows, "a string, b string, height long, a0 double, a1 double, swap_id long"
    )


def _mk_swaps(spark):
    # deposits per pair per height; deliberately asymmetric so the three
    # routes for 'top' have distinct prices and liquidity vectors
    rows = []
    sid = 0
    for h in (1, 2, 3):
        for (a, b), (d0, d1) in {
            ("base", "x"): (100.0, 50.0),
            ("top", "x"): (30.0, 80.0),
            ("base", "y"): (400.0, 100.0),
            ("top", "y"): (10.0, 200.0),
            ("base", "top"): (5.0, 4.0) if h >= 3 else (0.5, 0.4),
        }.items():
            aa, bb = (a, b) if a < b else (b, a)
            aa0, aa1 = (d0, d1) if a < b else (d1, d0)
            rows.append((aa, bb, h, aa0 * h, aa1 * h, sid))
            sid += 1
    return _swaps_df(spark, rows)


def _brute_force_best(reserves_pd: pd.DataFrame, token: str, height: int, thr: float):
    """Reference arbiter: enumerate routes, score exactly like the engine's
    picker, pick with routing.best_route."""
    res = {}
    for r in reserves_pd.itertuples():
        if r.height == height:
            res[(r.a, r.b)] = (r.r0, r.r1)
    candidates = []
    for src, dst, route, hops in enumerate_routes(EDGES, 4):
        if src != token or dst != "base":
            continue
        price, liqs, dead = 1.0, [], False
        for i in reversed(range(hops)):
            frm, to = route[i], route[i + 1]
            key = (frm, to) if frm < to else (to, frm)
            if key not in res:
                dead = True
                break
            r0, r1 = res[key]
            r_from = r0 if frm == key[0] else r1
            r_to = r0 if to == key[0] else r1
            if r_from < thr or r_to < thr or r_from <= 0 or r_to <= 0:
                dead = True
                break
            liqs.insert(0, 2.0 * r_to * price)
            price = r_to / r_from * price
        if not dead and price != 0.0:
            candidates.append({"route": route[1:], "liquidities": liqs, "price": price})
    return best_route(candidates, 0.0)


def test_route_price_matches_brute_force_comparator(spark):
    swaps = _mk_swaps(spark)
    reserves = reserves_by_height(swaps)
    rpd = reserves.toPandas()
    out = route_price_table(spark, reserves, EDGES, "base", threshold=10.0).toPandas()

    for token in ("x", "y", "top"):
        for h in (1, 2, 3):
            got = out[(out.token == token) & (out.height == h)]
            want = _brute_force_best(rpd, token, h, 10.0)
            if want is None:
                assert got.empty, (token, h)
            else:
                assert len(got) == 1, (token, h)
                assert got.price.iloc[0] == pytest.approx(want["price"], rel=1e-12)


def test_threshold_kills_direct_pair_route(spark):
    """At h<3 the direct base-top pair is under the threshold, so 'top' must
    be priced via a 2-hop route; at h=3 the direct pair stays under 10.0*3
    only on one side — the comparator must still pick a live route."""
    swaps = _mk_swaps(spark)
    reserves = reserves_by_height(swaps)
    out = route_price_table(spark, reserves, EDGES, "base", threshold=10.0).toPandas()
    top1 = out[(out.token == "top") & (out.height == 1)]
    assert len(top1) == 1 and top1.hops.iloc[0] == 2  # direct pair dead at h=1


def test_price_series_direct_and_fix_rows(spark):
    swaps = _mk_swaps(spark)
    out = price_series(swaps, spark, EDGES, "base", threshold=10.0).toPandas()
    # every pair touching base yields direct rows at every height
    d = out[out.method == "direct"]
    assert set(zip(d.token, d.height)) >= {("x", 1), ("y", 2), ("top", 3)}
    # the (x, top) and (y, top) pairs are indirect: route + route_fixed rows
    assert (out.method == "route").any() and (out.method == "route_fixed").any()
    # fix rule: fixed price = amount ratio x anchor route price
    # (x,top): a='top'? lex: ('top','x') -> a='top', b='x'; anchor = shorter route
    r = out[(out.method == "route")]
    f = out[(out.method == "route_fixed")]
    assert len(r) == len(f)  # one fixed row per route row


def test_direct_price_orientation(spark):
    """isReverse semantics (price.go:166-172): when base is the lex-smaller
    token (asset0), price = a0/a1; otherwise a1/a0."""
    rows = [
        ("base", "z", 1, 10.0, 40.0, 0),  # base is asset0 -> price = 10/40
        ("alpha", "base", 1, 30.0, 10.0, 1),  # base is asset1 -> price = 10/30
    ]
    out = price_series(_swaps_df(spark, rows), spark, [("base", "z"), ("alpha", "base")],
                       "base", threshold=0.0).toPandas()
    d = {t: p for t, p in zip(out[out.method == "direct"].token,
                              out[out.method == "direct"].price)}
    assert d["z"] == pytest.approx(0.25)
    assert d["alpha"] == pytest.approx(1.0 / 3.0)


def _mk_swaps_rows(heights):
    rows = []
    sid = 0
    for h in heights:
        for (a, b), (d0, d1) in {
            ("base", "x"): (100.0, 50.0),
            ("top", "x"): (30.0, 80.0),
            ("base", "y"): (400.0, 100.0),
            ("top", "y"): (10.0, 200.0),
            ("base", "top"): (5.0, 4.0) if h >= 3 else (0.5, 0.4),
        }.items():
            aa, bb = (a, b) if a < b else (b, a)
            aa0, aa1 = (d0, d1) if a < b else (d1, d0)
            rows.append((aa, bb, h, aa0 * h, aa1 * h, sid + h * 100))
            sid += 1
    return rows


def test_incremental_price_equals_one_shot(spark, tmp_path):
    """Cursor-seeded incremental price advance == the one-shot price_series
    over the full swap log, across batch splits, replays, and restarts
    (`pkg/dex/price/repository.go:69-90` NextHeight analog)."""
    from cosmwasm_etl_spark.price import IncrementalPrice

    heights = [1, 2, 3, 4, 5, 6]
    all_rows = _mk_swaps_rows(heights)
    full = _swaps_df(spark, all_rows)
    want = {
        (r.height, r.token, r.method): round(r.price, 9)
        for r in price_series(full, spark, EDGES, "base", threshold=10.0).collect()
    }

    inc = IncrementalPrice(spark, str(tmp_path / "price"), EDGES, "base", threshold=10.0)
    splits = [(1, 2), (3, 4), (5, 6)]
    for b, hs in enumerate(splits):
        batch = _swaps_df(spark, [r for r in all_rows if r[2] in hs])
        inc.advance(batch, batch_id=b)

    got = {
        (r.height, r.token, r.method): round(r.price, 9)
        for r in inc.price_rows().collect()
    }
    assert got == want

    # replayed batch: no duplicate price rows, reserves unchanged
    res = inc.advance(_swaps_df(spark, [r for r in all_rows if r[2] in splits[0]]), 0)
    assert res["skipped"]
    assert {
        (r.height, r.token, r.method): round(r.price, 9)
        for r in inc.price_rows().collect()
    } == want

    # restart: a NEW instance over the same dir continues from the cursor
    inc2 = IncrementalPrice(spark, str(tmp_path / "price"), EDGES, "base", threshold=10.0)
    more = _mk_swaps_rows([7, 8])
    inc2.advance(_swaps_df(spark, more), batch_id=3)
    want_full = {
        (r.height, r.token, r.method): round(r.price, 9)
        for r in price_series(
            _swaps_df(spark, all_rows + more), spark, EDGES, "base", threshold=10.0
        ).collect()
    }
    got_full = {
        (r.height, r.token, r.method): round(r.price, 9)
        for r in inc2.price_rows().collect()
    }
    assert got_full == want_full
