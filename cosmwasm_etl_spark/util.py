"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint an expensive intermediate that downstream
    plans reference MORE THAN ONCE (self-joins, verify joins, union
    branches).

    Without the cut, Catalyst inlines the producing plan into every
    consumer — a frame referenced by two join sides or two union branches
    re-executes per consumer (the price assembly re-ran its applyInPandas
    route-scoring subtree 4x; the minhash band self-join re-tokenized the
    corpus 6x). localCheckpoint stores the computed rows on executors
    (MEMORY_AND_DISK, no driver collect) — the guide-§8 "compute the
    fingerprint pass once" materialization, scoped to the query's
    lifetime."""
    return df.localCheckpoint(eager=True)
