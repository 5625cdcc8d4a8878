"""G2 route-cache invalidation (`pkg/dex/router/router.go:106-143`):
recompute only when the pair set changes."""

from __future__ import annotations

from cosmwasm_etl_spark.routing import RouteCache, enumerate_routes


def test_route_cache_recomputes_only_on_pair_set_change():
    cache = RouteCache(max_hops=4)
    edges = [("a", "b"), ("b", "c"), ("c", "d")]

    r1 = cache.routes(edges)
    assert cache.recompute_count == 1
    assert r1 == enumerate_routes(edges, 4)

    # same set, different order / duplicate / reversed edge: cache hit
    r2 = cache.routes([("b", "c"), ("d", "c"), ("a", "b"), ("a", "b")])
    assert cache.recompute_count == 1
    assert r2 is r1

    # a new pair invalidates (the reference's count-change trigger)
    r3 = cache.routes(edges + [("a", "d")])
    assert cache.recompute_count == 2
    assert r3 != r1

    # add+remove keeping the count: stricter than the reference -> recompute
    cache2 = RouteCache(max_hops=4)
    cache2.routes([("a", "b"), ("b", "c")])
    cache2.routes([("a", "b"), ("b", "d")])
    assert cache2.recompute_count == 2
