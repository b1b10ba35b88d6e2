"""Transactional parquet table — a Delta-style commit log.

The reference's strongest consistency tool is the processing ledger
(scripts/bronze_incremental.py:111-155) plus full-directory CTAS swaps
(etl/tasks/gold.py:51-65); a partially-written directory is observable
between those steps. This module provides the missing piece for a real
lake: ACID table semantics over plain parquet, the way Delta Lake /
Iceberg do it, built from public primitives only.

Layout::

    <table>/
      data/part-<uuid>.parquet        immutable data files
      _txlog/00000000000.json         one JSON commit per version
      _txlog/checkpoint-<v>.json      periodic full snapshot of live files

Each commit lists ``add`` / ``remove`` file actions. Readers resolve a
snapshot by replaying commits (from the newest checkpoint forward) and
pass the live file list straight to ``spark.read.parquet(*files)`` —
writers never block readers and a reader never sees a half commit.

Commit atomicity = ``O_CREAT | O_EXCL`` on the next version's file name
(the same primitive Delta uses on HDFS/ABFS; on S3 it would be a
conditional PUT). Losing a race raises; ``append`` retries automatically
since appends commute, while ``overwrite``/``compact`` surface a
``ConcurrentWriteError`` so the caller re-reads and re-decides.

At 100 TB: the log grows by one small JSON per commit, readers replay
only since the last checkpoint (O(commits since checkpoint), not
O(files)), and ``compact()`` folds the small-file problem (a streaming
sink's worst enemy) into bounded-size files without pausing readers.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

try:  # pyarrow is baked into the environment; guard anyway
    import pyarrow.parquet as _pq
except ImportError:  # pragma: no cover
    _pq = None

CHECKPOINT_EVERY = 10


class ConcurrentWriteError(RuntimeError):
    """A non-commuting commit (overwrite/compact) lost an optimistic race."""


def _rows_in(path: str) -> int | None:
    if _pq is None:
        return None
    return _pq.ParquetFile(path).metadata.num_rows


class TransactionalTable:
    """Versioned parquet table with snapshot reads and atomic commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_txlog")
        self.data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------- log

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.startswith("checkpoint-")
        )

    def latest_version(self) -> int | None:
        versions = self._versions()
        return versions[-1] if versions else None

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:011d}.json")

    def _read_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as fh:
            return json.load(fh)

    def _latest_checkpoint(self, at: int) -> tuple[int, list[str]] | None:
        if not os.path.isdir(self.log_dir):
            return None
        best = None
        for f in os.listdir(self.log_dir):
            if f.startswith("checkpoint-") and f.endswith(".json"):
                v = int(f[len("checkpoint-") : -5])
                if v <= at and (best is None or v > best):
                    best = v
        if best is None:
            return None
        with open(os.path.join(self.log_dir, f"checkpoint-{best:011d}.json")) as fh:
            return best, json.load(fh)["live"]

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Live data files at ``version`` (default: latest), replaying
        the log from the newest checkpoint at or below it."""
        latest = self.latest_version()
        if latest is None:
            return []
        at = latest if version is None else version
        if at > latest or at < 0:
            raise ValueError(f"version {at} out of range [0, {latest}]")
        ckpt = self._latest_checkpoint(at)
        live: set[str] = set()
        start = 0
        if ckpt is not None:
            start = ckpt[0] + 1
            live = set(ckpt[1])
        for v in range(start, at + 1):
            commit = self._read_commit(v)
            live.difference_update(commit.get("remove", []))
            live.update(a["path"] for a in commit.get("add", []))
        return sorted(live)

    def _try_commit(self, version: int, payload: dict) -> bool:
        os.makedirs(self.log_dir, exist_ok=True)
        path = self._commit_path(version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            json.dump({"version": version, **payload}, fh)
        if version > 0 and version % CHECKPOINT_EVERY == 0:
            ckpt = os.path.join(self.log_dir, f"checkpoint-{version:011d}.json")
            tmp = ckpt + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump({"version": version, "live": self.snapshot_files(version)}, fh)
            os.replace(tmp, ckpt)
        return True

    def _txn_ids(self) -> set[tuple[str, str]]:
        ids = set()
        for v in self._versions():
            commit = self._read_commit(v)
            txn = commit.get("txn")
            if txn:
                ids.add((txn["app_id"], str(txn["batch_id"])))
        return ids

    # ----------------------------------------------------------- write

    def _stage(self, df: DataFrame) -> list[dict]:
        """Write df's partitions as immutable files under data/ (not yet
        visible — only a commit publishes them)."""
        staging = os.path.join(self.path, f"_staged_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(self.data_dir, exist_ok=True)
        adds = []
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{uuid.uuid4().hex}.parquet"
            dst = os.path.join(self.data_dir, name)
            os.replace(os.path.join(staging, f), dst)
            adds.append({"path": f"data/{name}", "rows": _rows_in(dst)})
        shutil.rmtree(staging)
        return adds

    def _abandon(self, adds: list[dict]) -> None:
        for a in adds:
            try:
                os.remove(os.path.join(self.path, a["path"]))
            except OSError:  # pragma: no cover
                pass

    def append(
        self,
        df: DataFrame,
        app_id: str | None = None,
        batch_id: int | str | None = None,
    ) -> int | None:
        """Atomically append. With (app_id, batch_id) the commit is
        idempotent — replaying an already-committed batch is a no-op —
        which makes this a correct exactly-once ``foreachBatch`` sink.
        Returns the committed version, or None for a skipped replay."""
        if app_id is not None and (app_id, str(batch_id)) in self._txn_ids():
            return None
        adds = self._stage(df)
        payload: dict = {"operation": "append", "add": adds, "remove": []}
        if app_id is not None:
            payload["txn"] = {"app_id": app_id, "batch_id": str(batch_id)}
        while True:
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
            if app_id is not None and (app_id, str(batch_id)) in self._txn_ids():
                self._abandon(adds)
                return None  # concurrent replay beat us
            if self._try_commit(version, payload):
                return version

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table's full contents in one commit (CTAS swap,
        etl/tasks/gold.py:51-65 — but readers of older snapshots keep
        working: the old files stay until vacuum)."""
        base = self.latest_version()
        removed = self.snapshot_files()
        adds = self._stage(df)
        version = 0 if base is None else base + 1
        ok = self._try_commit(
            version, {"operation": "overwrite", "add": adds, "remove": removed}
        )
        if not ok:
            self._abandon(adds)
            raise ConcurrentWriteError(f"version {version} was taken")
        return version

    def compact(self, target_files: int = 1) -> int | None:
        """Rewrite current live files into ``target_files`` larger ones
        (remove+add in one commit). Readers pinned to older versions are
        unaffected; concurrent appends lose nothing — on a race we back
        off and the caller may retry."""
        files = self.snapshot_files()
        if len(files) <= target_files:
            return None
        base = self.latest_version()
        df = self.read().coalesce(target_files)
        adds = self._stage(df)
        ok = self._try_commit(
            (base or 0) + 1, {"operation": "compact", "add": adds, "remove": files}
        )
        if not ok:
            self._abandon(adds)
            raise ConcurrentWriteError("concurrent commit during compact")
        return (base or 0) + 1

    def vacuum(self, retain_versions: int = 0) -> list[str]:
        """Delete data files unreferenced by the latest ``1 +
        retain_versions`` snapshots. Time travel older than that stops
        working — same contract as ``delta VACUUM``."""
        latest = self.latest_version()
        if latest is None:
            return []
        keep: set[str] = set()
        for v in range(max(0, latest - retain_versions), latest + 1):
            keep.update(self.snapshot_files(v))
        removed = []
        for f in sorted(os.listdir(self.data_dir)):
            rel = f"data/{f}"
            if rel not in keep:
                os.remove(os.path.join(self.data_dir, f))
                removed.append(rel)
        return removed

    # ------------------------------------------------------------ read

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot (optionally time-travel) read."""
        files = self.snapshot_files(version)
        if not files:
            raise FileNotFoundError(f"no snapshot at {self.path} v={version}")
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def history(self) -> list[dict]:
        """Commit history, newest first (``DESCRIBE HISTORY``)."""
        return [self._read_commit(v) for v in reversed(self._versions())]

    def count_rows(self, version: int | None = None) -> int:
        """Exact live row count at ``version`` from commit metadata —
        zero Spark jobs (r14, guide §5). Every staged file's commit
        record carries its parquet-footer row count (``_stage``), so
        the snapshot count is a driver-side sum over the live file
        set — the same metadata shortcut Delta's ``numRecords``
        provides. Identical to ``read().count()`` by construction."""
        rows_by_path: dict[str, int] = {}
        for v in self._versions():
            for a in self._read_commit(v).get("add", []):
                rows_by_path[a["path"]] = a["rows"]
        return sum(rows_by_path[f] for f in self.snapshot_files(version))
