"""A minimal ACID lakehouse table format on parquet.

The sandbox ships no Iceberg/Delta runtime jars, so the engine implements the
(public, well-documented) lakehouse commit protocol itself:

- versioned JSON commit log under ``_log/`` with atomic put-if-absent commits
  (hard-link CAS — the optimistic-concurrency protocol described in the Delta
  Lake VLDB'20 paper and the Iceberg spec),
- data files bucketed by key hash (Iceberg ``bucket(N, url)``-style layout) so
  MERGE rewrites only affected buckets,
- per-file key min/max stats for file skipping,
- field-id based schema evolution (add / rename / type-widen),
- snapshot isolation + time travel by version,
- epoch-tagged idempotent commits: the exactly-once analog of the reference's
  synced-height compare-and-swap (``parser/dex/repo/repository.go:117``).
"""

from cosmwasm_etl_spark.lakehouse.log import CommitConflict, TableLog
from cosmwasm_etl_spark.lakehouse.schema import TableSchema, evolve
from cosmwasm_etl_spark.lakehouse.table import LakeTable

__all__ = ["CommitConflict", "TableLog", "TableSchema", "evolve", "LakeTable"]
