"""Custom stateful streaming operator: per-url running latest-wins state via
``applyInPandasWithState``.

This is the streaming-native form of the engine's W5 operator — the per-key
state the reference keeps implicitly in Postgres rows
(`/root/reference/parser/dex/repo/repository.go:98-122`) held instead in
Spark's streaming state store: each micro-batch updates one (warc_ts, seq)
tuple per url and EMITS only urls whose latest version changed (a change
feed of winners). Use when the downstream wants deltas-of-state rather than
the replay/MERGE path (e.g. feeding a cache invalidation topic).

Scale shape: state is (url → 16-byte tuple), hash-partitioned by url across
executors by the state store itself; per-batch work is one shuffle of the
batch's key columns (payloads excluded, exactly like the batch pipeline's
phase A). Timeouts/expiry are left to the retention layer (tombstones),
matching the engine's no-TTL key semantics.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "warc_ts long, seq long"
OUTPUT_SCHEMA = "url string, warc_ts timestamp, seq long, changed boolean"


def latest_wins_change_feed(events: DataFrame) -> DataFrame:
    """Streaming change feed of per-url winners (update output mode).

    ``events`` must be a STREAMING DataFrame with (url, warc_ts, seq).
    Payload columns are dropped before the stateful exchange — fetch them
    downstream by seq, exactly like the batch pipeline."""
    keys = events.select("url", events.warc_ts.cast("long").alias("warc_ts"), "seq")
    # re-cast keeps the state tuple numeric; output restores TimestampType
    return (
        keys.groupBy("url")
        .applyInPandasWithState(
            _update_latest_long,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _update_latest_long(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best_ts, best_seq = state.get if state.exists else (None, None)
    changed = False
    for pdf in pdfs:
        for t, s in zip(pdf["warc_ts"], pdf["seq"]):
            t, s = int(t), int(s)
            if best_ts is None or (t, s) > (best_ts, best_seq):
                best_ts, best_seq, changed = t, s, True
    if changed:
        state.update((best_ts, best_seq))
        yield pd.DataFrame(
            {
                "url": [key[0]],
                "warc_ts": [pd.Timestamp(best_ts, unit="s")],
                "seq": [best_seq],
                "changed": [True],
            }
        )
