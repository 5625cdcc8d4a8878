"""Deterministic dataset splitting & sampling for training pipelines.

A training-data pipeline needs REPRODUCIBLE train/val/test assignment:
the split of a document must be a pure function of its key, stable across
runs, cluster sizes, and partitionings (``df.randomSplit`` is none of
those — it is partition-order dependent). Both splitters here are pure
Column expressions (JVM-side, whole-stage codegen, zero shuffle).

Two hash families:

- :func:`split_assign` (default) — mixes the key with ``xxhash64``; best
  dispersion, the production path.
- ``hash_family="lcg"`` — an overflow-safe affine mix whose arithmetic is
  exactly expressible in ANSI SQL (see :func:`lcg_sql_expr`), so the
  driver's DuckDB oracle can recompute assignments value-for-value. The
  multiplications are bounded far below 2^63: safe under Spark's ANSI
  overflow checking and identical in DuckDB's int64 semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Overflow-safe affine mix: key -> [0, 2^31). Two rounds of
# (x * a + c) mod m with m1 = 1_000_003 (prime) then m2 = 2^31;
# max intermediate 1_000_002 * 69_069 + 12_345 < 7e10 << 2^63.
_M1 = 1_000_003
_A1, _C1 = 69_069, 12_345
_M2 = 2_147_483_648  # 2^31


def _lcg_frac(key: Column) -> Column:
    r1 = F.pmod(key.cast("bigint"), F.lit(_M1))
    r2 = F.pmod(r1 * F.lit(_A1) + F.lit(_C1), F.lit(_M2))
    # second scramble so consecutive keys don't map to consecutive fracs
    r3 = F.pmod(r2 * F.lit(_A1) + F.lit(_C1), F.lit(_M2))
    return r3 / F.lit(float(_M2))


def lcg_sql_expr(key_sql: str) -> str:
    """The ANSI-SQL twin of the ``lcg`` hash family (DuckDB oracle)."""
    r1 = f"(({key_sql}) % {_M1})"
    r2 = f"(({r1} * {_A1} + {_C1}) % {_M2})"
    r3 = f"(({r2} * {_A1} + {_C1}) % {_M2})"
    return f"({r3} / {float(_M2)})"


def split_frac(key: Column, seed: int = 42, hash_family: str = "xxhash64") -> Column:
    """Deterministic uniform [0,1) fraction from a key column."""
    if hash_family == "xxhash64":
        h = F.xxhash64(key, F.lit(seed))
        # map signed 64-bit to [0,1): shift into unsigned range via the
        # exact double ladder (2^63 offsets are exactly representable)
        return (h.cast("double") + F.lit(9.223372036854776e18)) / F.lit(1.8446744073709552e19)
    if hash_family == "lcg":
        return _lcg_frac(key)
    raise ValueError(f"unknown hash_family: {hash_family}")


def split_assign(
    key: Column,
    weights: dict[str, float],
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> Column:
    """Assign each row to a named split with probability proportional to
    ``weights`` (need not sum to 1 — they are normalized). Assignment is a
    pure function of (key, seed): re-running, re-partitioning, or scaling
    the cluster never moves a row between splits, and adding NEW rows
    never re-assigns old ones — the property that keeps eval sets
    uncontaminated across dataset versions."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    frac = split_frac(key, seed=seed, hash_family=hash_family)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def resample_copies(
    key: Column,
    weight: Column,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> Column:
    """Deterministic weighted resampling: expected ``weight`` copies per row.

    ``floor(weight)`` guaranteed copies plus one more iff the row's hash
    fraction falls below ``frac(weight)`` — stochastic rounding with the
    same determinism contract as :func:`split_assign` (pure function of
    (key, seed); re-runs, re-partitionings and dataset growth never change
    a row's copy count). This is the source-temperature upsampling step of
    corpus mixing (weight >1 upsamples, <1 downsamples; 0 drops).

    Returns an int Column; materialize copies with
    ``F.explode(copy_sequence(n_copies))`` — a projection, no shuffle,
    and the explode output is what feeds the pack/shuffle stages.
    """
    base = F.floor(weight).cast("long")
    frac_w = weight - F.floor(weight)
    draw = split_frac(key, seed=seed, hash_family=hash_family)
    return (base + (draw < frac_w).cast("long")).alias("n_copies")


def copy_sequence(n_copies: Column) -> Column:
    """[1..n] copy indices, EMPTY when n is 0 — ``F.sequence(1, 0)``
    infers step -1 and yields [1, 0], which an explode would turn into
    two phantom copies of a dropped row."""
    return F.when(
        n_copies > 0, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<bigint>"))


def shard_order(
    key: Column,
    n_shards: int = 1024,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> Column:
    """Deterministic training-order shard assignment.

    Global shuffling of a 10^10-doc corpus by a single total order is a
    scale-killer (one sort, one writer tail); the standard shape is
    sharded: hash each doc to one of ``n_shards`` shards, then order
    WITHIN shards — every shard is an independent, parallel unit and the
    concatenation of shards in shard order is the training order. Returns
    the shard id; pair with a window partitioned by shard (rank by the
    in-shard hash fraction, then key for tie-stability) for the in-shard
    position.
    """
    frac = split_frac(key, seed=seed, hash_family=hash_family)
    return F.least(
        F.floor(frac * F.lit(n_shards)).cast("int"), F.lit(n_shards - 1)
    ).alias("shard")
