"""Bounded-DFS route enumeration — G1-G3 in SURVEY.md §2.11.

Parity anchor: the reference enumerates all token-swap routes up to
``MAX_ROUTE_HOP_COUNT = 4`` hops with a visited-set DFS
(`/root/reference/pkg/dex/router/route_info.go:108-181`,
`/root/reference/pkg/dex/router/constants.go:3`), keeps them in a ``route``
table ordered by hop count then lexicographically
(`/root/reference/pkg/dex/price/repository.go:136-140`), and recomputes when
the pair set changes (`pkg/dex/router/router.go:106-143`).

The graph (pairs × tokens) is tiny relative to the data, so — per SURVEY §2.11
— this is a *driver-side* computation whose result is broadcast/written as a
dimension table, never a distributed graph op.
"""

from __future__ import annotations

from collections.abc import Iterable

MAX_ROUTE_HOP_COUNT = 4


def enumerate_routes(
    edges: Iterable[tuple[str, str]],
    max_hops: int = MAX_ROUTE_HOP_COUNT,
) -> list[tuple[str, str, list[str], int]]:
    """All simple paths (no node revisits) up to ``max_hops`` edges between
    every ordered node pair, as (src, dst, route, hops), sorted by
    (src, dst, hops, route) — the reference's route-table ordering.

    Edges are undirected (a pair is swappable both ways in the reference).
    """
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    out: list[tuple[str, str, list[str], int]] = []

    def dfs(path: list[str], visited: set[str]) -> None:
        cur = path[-1]
        if len(path) > 1:
            out.append((path[0], cur, list(path), len(path) - 1))
        if len(path) - 1 >= max_hops:
            return
        for nxt in sorted(adj.get(cur, ())):
            if nxt in visited:
                continue
            visited.add(nxt)
            path.append(nxt)
            dfs(path, visited)
            path.pop()
            visited.remove(nxt)

    for start in sorted(adj):
        dfs([start], {start})
    out.sort(key=lambda r: (r[0], r[1], r[3], r[2]))
    return out


def best_route(
    candidates: list[dict],
    liquidity_threshold: float = 0.0,
) -> dict | None:
    """Optimal-route selection — G3/G4 analog
    (`/root/reference/pkg/dex/price/price.go:296-408`; threshold check at
    `:396`): among candidate routes (each {"route": [...], "liquidities":
    [per-hop floats], "price": float}), drop routes whose weakest hop is
    below ``liquidity_threshold``, then pick by comparing the ascending-
    sorted per-hop liquidity vectors lexicographically (greater weakest hop
    wins), tie-breaking on lower price, then fewer hops, then lexicographic
    route — fully deterministic.
    """
    eligible = [
        c for c in candidates if c["liquidities"] and min(c["liquidities"]) >= liquidity_threshold
    ]
    if not eligible:
        return None

    def key(c: dict):
        liq = sorted(c["liquidities"])  # weakest hop first
        return (
            [-x for x in liq],  # larger liquidity sorts first
            c["price"],
            len(c["route"]),
            c["route"],
        )

    return min(eligible, key=key)


def routes_df(spark, edges: Iterable[tuple[str, str]], max_hops: int = MAX_ROUTE_HOP_COUNT):
    """Route dimension table (src, dst, route string, hops) — broadcast-sized."""
    rows = [
        (src, dst, "->".join(route), hops)
        for src, dst, route, hops in enumerate_routes(edges, max_hops)
    ]
    return spark.createDataFrame(rows, "src string, dst string, route string, hops int")


class RouteCache:
    """G2 route-cache invalidation — the analog of the reference's router
    refresh (`/root/reference/pkg/dex/router/router.go:106-143`): routes are
    recomputed only when the PAIR SET changes (the reference compares the
    pair count against the cached one); an unchanged edge set returns the
    cached enumeration with zero recomputation.

    The edge set is dimension data, so the fingerprint is an order-
    insensitive hash of the normalized edges — cheap enough to evaluate per
    refresh call, and stricter than the reference's count-only check (an
    add+remove that keeps the count now still invalidates)."""

    def __init__(self, max_hops: int = MAX_ROUTE_HOP_COUNT):
        self.max_hops = max_hops
        self._fingerprint: int | None = None
        self._routes: list[tuple[str, str, list[str], int]] = []
        self.recompute_count = 0

    @staticmethod
    def _fp(edges: Iterable[tuple[str, str]]) -> int:
        norm = frozenset((a, b) if a <= b else (b, a) for a, b in edges if a != b)
        return hash(norm)

    def routes(self, edges: Iterable[tuple[str, str]]):
        edges = list(edges)
        fp = self._fp(edges)
        if fp != self._fingerprint:
            self._routes = enumerate_routes(edges, self.max_hops)
            self._fingerprint = fp
            self.recompute_count += 1
        return self._routes

    def routes_df(self, spark, edges: Iterable[tuple[str, str]]):
        rows = [
            (src, dst, "->".join(route), hops)
            for src, dst, route, hops in self.routes(edges)
        ]
        return spark.createDataFrame(rows, "src string, dst string, route string, hops int")
