"""Versioned JSON commit log with atomic put-if-absent semantics.

Layout::

    <table>/_log/00000000000000000001.json   # commit v1
    <table>/_log/00000000000000000002.json
    <table>/_log/_checkpoint.<v>.json        # compacted state at v (every K commits)
    <table>/_log/_last_checkpoint            # pointer to newest checkpoint

Atomicity: the commit winner is decided by a pluggable put-if-absent
backend. The default (:class:`HardlinkCommitBackend`) stages a temp file and
publishes with ``os.link``, which fails with EEXIST if another writer won the
version — the optimistic protocol Delta Lake uses on HDFS/ABFS. For object
stores whose PUT is last-writer-wins (S3), :class:`SqliteCommitBackend`
implements the DynamoDB-style conditional-put coordinator (claim row carries
the payload; files are healed from claims after a crash) — select it with
``SPARK_GRAFT_COMMIT_BACKEND=sqlite`` or ``TableLog(root, backend=...)``.

Checkpoints bound log replay to O(K) instead of O(n-commits) — at the 10^10
design point the log would otherwise dominate planning time.

Commit payload schema (dict):
    operation: str                  # create|append|merge|delete|evolve_schema
    summary:   dict                 # epoch, watermark, counts, ...
    schema:    dict | None          # full TableSchema dict when it changes
    add:       [ {path, bucket, rows, bytes, schema_version, min_key, max_key} ]
    remove:    [ path, ... ]
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid


class CommitConflict(Exception):
    """Another writer committed this version first (optimistic CAS lost)."""


CHECKPOINT_INTERVAL = 25


class HardlinkCommitBackend:
    """Default put-if-absent: ``os.link`` fails with EEXIST if another writer
    won the version — valid on local/HDFS/ABFS-style filesystems whose
    create-if-absent is atomic."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def put_if_absent(self, version: int, payload: bytes, final_path: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, prefix=".tmp-commit-", suffix=".json")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, final_path)  # atomic put-if-absent
            except FileExistsError as e:
                raise CommitConflict(f"version {version} already committed") from e
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def recover(self, version: int, final_path: str) -> bool:
        return False  # nothing to recover: publish is the file itself

    def max_version(self) -> int:
        return 0

    def forget_before(self, version: int) -> None:
        pass


class SqliteCommitBackend:
    """Conditional-put COORDINATOR deciding the commit winner — the
    config-level stand-in for DynamoDB/S3-conditional-put on object stores
    whose plain PUT is last-writer-wins (the swap documented in the module
    docstring, made real).

    Protocol (Delta's S3DynamoDBLogStore shape): the claim row carries the
    FULL payload and is inserted atomically (unique version key ⇒ exactly
    one winner; losers get ``CommitConflict``); the JSON commit file is then
    materialized as a plain overwrite — safe because the claim owns the
    version. A crash between claim and materialize is healed by
    :meth:`recover` (readers re-materialize from the coordinator) and by
    ``latest_version`` consulting :meth:`max_version`, so a half-published
    commit is never lost and never double-assigned."""

    def __init__(self, log_dir: str, db_path: str | None = None):
        self.log_dir = log_dir
        self.db_path = db_path or os.path.join(log_dir, "_coordinator.sqlite")

    def _con(self):
        import sqlite3

        con = sqlite3.connect(self.db_path, timeout=30.0)
        con.execute(
            "CREATE TABLE IF NOT EXISTS commits"
            " (version INTEGER PRIMARY KEY, payload BLOB NOT NULL)"
        )
        return con

    def put_if_absent(self, version: int, payload: bytes, final_path: str) -> None:
        import sqlite3

        os.makedirs(self.log_dir, exist_ok=True)
        con = self._con()
        try:
            try:
                con.execute(
                    "INSERT INTO commits (version, payload) VALUES (?, ?)",
                    (version, payload),
                )
                con.commit()
            except sqlite3.IntegrityError as e:
                raise CommitConflict(f"version {version} already committed") from e
        finally:
            con.close()
        self._materialize(payload, final_path)

    @staticmethod
    def _materialize(payload: bytes, final_path: str) -> None:
        d = os.path.dirname(final_path)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-commit-", suffix=".json")
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final_path)  # we own the version: overwrite is safe

    def recover(self, version: int, final_path: str) -> bool:
        con = self._con()
        try:
            row = con.execute(
                "SELECT payload FROM commits WHERE version = ?", (version,)
            ).fetchone()
        finally:
            con.close()
        if row is None:
            return False
        self._materialize(row[0], final_path)
        return True

    def max_version(self) -> int:
        if not os.path.exists(self.db_path):
            return 0
        con = self._con()
        try:
            row = con.execute("SELECT MAX(version) FROM commits").fetchone()
        finally:
            con.close()
        return int(row[0] or 0)

    def forget_before(self, version: int) -> None:
        if not os.path.exists(self.db_path):
            return
        con = self._con()
        try:
            con.execute("DELETE FROM commits WHERE version < ?", (version,))
            con.commit()
        finally:
            con.close()


def _default_backend(log_dir: str):
    if os.environ.get("SPARK_GRAFT_COMMIT_BACKEND", "hardlink") == "sqlite":
        return SqliteCommitBackend(log_dir)
    return HardlinkCommitBackend(log_dir)


class TableLog:
    def __init__(self, table_root: str, backend=None):
        self.root = table_root
        self.log_dir = os.path.join(table_root, "_log")
        self.backend = backend or _default_backend(self.log_dir)

    # ---------- paths ----------

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"_checkpoint.{version:020d}.json")

    def exists(self) -> bool:
        return os.path.isdir(self.log_dir) and self.latest_version() > 0

    # ---------- read ----------

    def latest_version(self) -> int:
        if not os.path.isdir(self.log_dir):
            return 0
        best = 0
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and not name.startswith("_"):
                try:
                    best = max(best, int(name[:-5]))
                except ValueError:
                    continue
        # a coordinator-backed commit may be claimed but not yet
        # materialized (crash between claim and file write) — it still
        # owns its version
        return max(best, self.backend.max_version())

    def last_checkpoint_version(self) -> int:
        ptr = os.path.join(self.log_dir, "_last_checkpoint")
        try:
            with open(ptr) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 0

    def min_version(self) -> int:
        """Oldest version still reconstructible (1 unless vacuum raised it).
        Vacuum drops commit files below this and guarantees a checkpoint AT
        it, so state(v >= min_version) always replays; below it, the history
        is gone by design (Iceberg expire_snapshots semantics)."""
        try:
            with open(os.path.join(self.log_dir, "_min_version")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 1

    def available_checkpoints(self) -> list[int]:
        """All checkpoint versions on disk, ascending — lets time travel pick
        the newest checkpoint <= the target version instead of relying only
        on the _last_checkpoint pointer."""
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("_checkpoint.") and name.endswith(".json"):
                try:
                    out.append(int(name[len("_checkpoint.") : -5]))
                except ValueError:
                    continue
        return sorted(out)

    def read_commit(self, version: int) -> dict:
        path = self._commit_path(version)
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            # coordinator-backed commit whose file write crashed mid-publish:
            # heal it from the claim row, then read normally
            if self.backend.recover(version, path):
                with open(path) as f:
                    return json.load(f)
            raise

    def read_checkpoint(self, version: int) -> dict | None:
        try:
            with open(self._checkpoint_path(version)) as f:
                return json.load(f)
        except OSError:
            return None

    def commits_since(self, after_version: int, until_version: int | None = None) -> list[tuple[int, dict]]:
        until = until_version if until_version is not None else self.latest_version()
        out = []
        for v in range(after_version + 1, until + 1):
            out.append((v, self.read_commit(v)))
        return out

    # ---------- write ----------

    def write_commit(self, version: int, payload: dict) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        data = json.dumps(payload, separators=(",", ":")).encode()
        self.backend.put_if_absent(version, data, self._commit_path(version))

    def write_checkpoint(self, version: int, state: dict) -> None:
        path = self._checkpoint_path(version)
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, prefix=".tmp-ckpt-", suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # checkpoint is derivative — overwrite is fine
        # the pointer names the NEWEST checkpoint; vacuum writes a horizon
        # checkpoint older than the pointer and must not move it backward
        if version >= self.last_checkpoint_version():
            ptr_tmp = os.path.join(self.log_dir, f".tmp-ptr-{uuid.uuid4().hex}")
            with open(ptr_tmp, "w") as f:
                f.write(str(version))
            os.replace(ptr_tmp, os.path.join(self.log_dir, "_last_checkpoint"))

    def write_min_version(self, version: int) -> None:
        """Atomically raise the reconstructibility horizon (vacuum only)."""
        tmp = os.path.join(self.log_dir, f".tmp-minv-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.log_dir, "_min_version"))

    def drop_before(self, version: int) -> tuple[int, int]:
        """Physically delete commit and checkpoint JSON older than
        ``version``. Caller must FIRST ensure a checkpoint exists at
        ``version`` and the _min_version marker is raised — this is the last,
        purely-space-freeing step of vacuum. Returns (commits, checkpoints)
        deleted."""
        nc = nk = 0
        for name in os.listdir(self.log_dir):  # O(dir), not O(version range)
            if name.endswith(".json") and not name.startswith("_"):
                try:
                    v = int(name[:-5])
                except ValueError:
                    continue
                if v < version:
                    try:
                        os.unlink(os.path.join(self.log_dir, name))
                        nc += 1
                    except OSError:
                        pass
        for cv in self.available_checkpoints():
            if cv < version:
                try:
                    os.unlink(self._checkpoint_path(cv))
                    nk += 1
                except OSError:
                    pass
        self.backend.forget_before(version)
        return nc, nk
