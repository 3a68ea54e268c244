"""DeltaLog: the table handle — snapshot management, time travel, change
feed, transaction entry point.

Reference: log.go, snapshot_reader.go:279-317 (cached snapshot +
invalidation by segment equality).
"""

from __future__ import annotations

import os
import threading

from delta_go_spark import checkpoint as ckpt
from delta_go_spark.config import Clock
from delta_go_spark.history import HistoryManager
from delta_go_spark.snapshot import (
    DeltaError,
    Snapshot,
    get_log_segment_for_version,
)
from delta_go_spark.store import LogStore, store_for


class DeltaLog:
    """reference: log.go:18-94."""

    def __init__(self, table_path: str, clock: Clock | None = None, store: LogStore | None = None):
        if "://" in table_path and not table_path.startswith("file://"):
            # cloud URI: keep it verbatim — abspath would mangle the scheme
            self.table_path = table_path.rstrip("/")
            self.log_path = f"{self.table_path}/_delta_log"  # log.go:55-58
        else:
            self.table_path = os.path.abspath(table_path.removeprefix("file://"))
            self.log_path = os.path.join(self.table_path, "_delta_log")
        self.store = store or store_for(self.table_path)
        self.clock = clock or Clock()
        self.history = HistoryManager(self.store, self.log_path)
        self._lock = threading.Lock()
        self._snapshot: Snapshot | None = None

    # -- construction ------------------------------------------------------
    @classmethod
    def for_table(cls, table_path: str, clock: Clock | None = None) -> "DeltaLog":
        log = cls(table_path, clock)
        try:
            log.update()
        except DeltaError:
            pass  # table may not exist yet; snapshot() will raise
        return log

    # -- snapshots ---------------------------------------------------------
    def snapshot(self) -> Snapshot:
        """Cached current snapshot (reference: log.go:148-150)."""
        with self._lock:
            if self._snapshot is None:
                raise DeltaError(f"no snapshot loaded; table {self.table_path} may not exist")
            return self._snapshot

    def update(self) -> Snapshot:
        """Refresh to the latest version (reference: log.go:152-154,
        snapshot_reader.go:279-317).  A log directory that has vanished
        invalidates the cache and reads as nonexistent (version -1
        semantics of log_test.go:403-421), not as the stale snapshot."""
        with self._lock:
            try:
                meta = ckpt.load_last_checkpoint(self.store, self.log_path)
                segment = get_log_segment_for_version(
                    self.store, self.log_path, meta.version if meta else None, None
                )
            except FileNotFoundError as e:
                self._snapshot = None
                raise DeltaError(f"table {self.table_path} does not exist") from e
            if self._snapshot is None or self._snapshot.segment != segment:
                self._snapshot = Snapshot(self.store, segment, self.table_path, self.clock)
            return self._snapshot

    def table_exists(self) -> bool:
        """reference: log.go:283-285 (checked against a fresh Update, so a
        deleted table reads as gone)."""
        try:
            return self.update().version >= 0
        except DeltaError:
            return False

    # -- time travel -------------------------------------------------------
    def snapshot_for_version_as_of(self, version: int) -> Snapshot:
        """reference: log.go:156-158, snapshot_reader.go:116-122."""
        latest = self.update().version
        self.history.checked_version_bounds(version, latest)
        segment = get_log_segment_for_version(
            self.store,
            self.log_path,
            self._anchor_for(version),
            version,
        )
        return Snapshot(self.store, segment, self.table_path, self.clock)

    def snapshot_for_timestamp_as_of(self, timestamp_millis: int) -> Snapshot:
        """Last commit with mtime <= ts (reference: log.go:160-162,
        snapshot_reader.go:124-131)."""
        latest = self.update().version
        commit = self.history.active_commit_at_time(latest, timestamp_millis)
        return self.snapshot_for_version_as_of(commit.version)

    def version_before_or_at_timestamp(self, timestamp_millis: int) -> int:
        """reference: log.go:232-255."""
        latest = self.update().version
        c = self.history.active_commit_at_time(
            latest, timestamp_millis, can_return_last_commit=True
        )
        return c.version

    def version_at_or_after_timestamp(self, timestamp_millis: int) -> int:
        """reference: log.go:257-281."""
        latest = self.update().version
        c = self.history.active_commit_at_time(
            latest,
            timestamp_millis,
            can_return_last_commit=True,
            can_return_earliest_commit=True,
        )
        # active_commit_at_time returns the last commit <= ts; the at-or-
        # after boundary is that commit unless its timestamp < ts, in which
        # case it's the next one.
        commits = sorted(
            (x for x in self.history._list_commits(0) if x.version <= latest),
            key=lambda x: x.version,
        )
        for x in commits:
            if x.timestamp >= timestamp_millis:
                return x.version
        return commits[-1].version if commits else c.version

    def _anchor_for(self, version: int) -> int | None:
        found = ckpt.find_last_complete_checkpoint_before(self.store, self.log_path, version)
        return found.version if found else None

    # -- change feed -------------------------------------------------------
    def changes(self, start_version: int, fail_on_data_loss: bool = False):
        """reference: log.go:188-226."""
        return self.history.changes(start_version, fail_on_data_loss)

    def commit_info_at(self, version: int):
        """reference: log.go:173-180."""
        return self.history.commit_info_at(version)

    # -- transactions ------------------------------------------------------
    def start_transaction(self):
        """reference: log.go:164-171."""
        from delta_go_spark.transaction import OptimisticTransaction

        try:
            snap = self.update()
        except DeltaError:
            snap = None
        return OptimisticTransaction(self, snap)
