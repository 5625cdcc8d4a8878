"""Greedy sequence packing: bin documents into fixed-budget training rows.

LLM training consumes fixed-length token windows; packing short documents
into shared windows (instead of padding each to the max) is a standard
corpus-prep step. This operator assigns every document a ``bin_id`` by
first-fit-in-order greedy packing: scan the group's documents in a
deterministic order, keep a running fill, start a new bin when the next
document would overflow the budget. A document larger than the budget
gets a bin of its own (truncation/splitting is a tokenizer-side concern,
not the packer's).

Scale design: packing is sequential BY DEFINITION (bin N+1 exists only
because bins 1..N are full), so the parallel unit is the *group* —
``applyInPandas`` over the group column. At 10^10 docs the group key is
(source, shard) where shard is a hash bucket: packing parallelism equals
shard count while determinism per shard is preserved. Groups stream
through Arrow batches; inside the group the recurrence runs as a tight
loop over a numpy array (no per-row pandas overhead). The output is a
projection of the input — no extra shuffle beyond the one groupBy
exchange.

Reference parity: the reference has no training surface; the pattern
matches its per-key ordered fold (collector replay,
`collector/collector.go`) applied to corpus prep.

The recurrence (cost c_i, budget B, fill f, in order):
    new bin  iff  f + c_i > B     (first doc always opens bin 0)
    f <- c_i on new bin else f + c_i
which the DuckDB oracle replays exactly as a recursive CTE — see
``pack_sql`` in queries.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    *,
    cost_col: str,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    n_shards: int = 1,
) -> DataFrame:
    """Assign ``bin_id`` per group by first-fit-in-order greedy packing.

    Returns (order_col, group_col, bin_id, bin_fill) — ``bin_fill`` is
    the running fill AFTER placing the row, so the final row of each bin
    carries the bin's total cost (handy for packing-efficiency stats and
    it makes every step of the recurrence oracle-checkable).

    ``n_shards > 1`` is the 10^10-doc path: the packing unit becomes
    (group, xxhash64(order_col) % n_shards) — parallelism × n_shards and
    every pandas group is bounded at ~|group|/n_shards rows, at the cost
    of (n_shards − 1) extra partially-filled final bins per group.
    Deterministic: the shard of a row is a pure function of its key, so
    assignments never move between runs or cluster sizes. Shards pack
    independently; bin ids are made globally unique per group as
    ``shard + bin_within_shard * n_shards``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out_schema = (
        f"{order_col} long, {group_col} string, bin_id long, bin_fill long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(order_col, kind="mergesort")
        costs = pdf[cost_col].to_numpy()
        bins = []
        fills = []
        bin_id, fill = -1, budget  # forces a new bin on the first row
        for c in costs:
            c = int(c)
            if fill + c > budget:
                bin_id += 1
                fill = c
            else:
                fill += c
            bins.append(shard + bin_id * n_shards)
            fills.append(fill)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "bin_id": bins,
                "bin_fill": fills,
            }
        )

    sel = df.select(
        F.col(order_col).cast("long").alias(order_col),
        F.col(group_col),
        F.col(cost_col),
        F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards)).alias("__shard"),
    )
    return sel.groupBy(group_col, "__shard").applyInPandas(_pack, schema=out_schema)
