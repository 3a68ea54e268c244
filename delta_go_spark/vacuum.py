"""VACUUM: physically delete data files no longer referenced by the table.

The reference carries `deletedFileRetentionDuration` (config.go:69-73) and
expires tombstones on replay (replay_action.go:53-61) but, being
metadata-only, never deletes the bytes — the `snapshot-vacuumed` golden
table was produced by an engine-side vacuum exactly like this one.

Semantics (Delta's contract):
- A file is deletable iff it is NOT in the current active set AND is not a
  tombstone younger than the retention window (concurrent readers of old
  snapshots may still be reading recent tombstones).
- Directories are walked relative to the table root; `_delta_log` and
  staging/hidden paths are never touched.
- dry_run lists what would be deleted, deleting nothing.

Scale note: the on-disk walk is O(files-on-disk). On object stores this is
one LIST per prefix; the active/tombstone sets come from the already-loaded
snapshot state, so no data is read.
"""

from __future__ import annotations

import os

from delta_go_spark import config as cfg
from delta_go_spark.log import DeltaLog
from delta_go_spark.snapshot import canonicalize_path


def vacuum(
    table_path: str,
    retention_millis: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete unreferenced data files older than the retention window.
    Returns the list of deleted (or would-be-deleted) absolute paths."""
    from delta_go_spark.store import is_cloud_uri

    if is_cloud_uri(table_path):
        return _vacuum_cloud(table_path, retention_millis, dry_run)
    table_path = os.path.abspath(table_path)
    log = DeltaLog.for_table(table_path)
    snap = log.update()
    if retention_millis is None:
        retention_millis = cfg.get_millis(
            snap.metadata().configuration or {}, cfg.TOMBSTONE_RETENTION
        )
    horizon = log.clock.now_millis() - retention_millis

    def norm(p: str) -> str:
        return canonicalize_path(p, table_path).replace("file://", "")

    active = {norm(a.path) for a in snap.all_files()}
    # Tombstones still inside the retention window are protected; expired
    # ones are fair game (their readers' snapshots are stale by contract).
    protected = {
        norm(r.path)
        for r in snap.state().tombstones.values()
        if (r.deletion_timestamp or 0) >= horizon
    }

    doomed: list[str] = []
    for root, dirs, files in os.walk(table_path):
        # _change_data files are referenced by AddCDCFile actions, never by
        # the active set — they expire with their commits (log retention),
        # not with VACUUM.
        dirs[:] = [
            d
            for d in dirs
            if d not in ("_delta_log", "_change_data") and not d.startswith(".")
        ]
        for name in files:
            if name.startswith((".", "_")):
                continue
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            if full in active or full in protected:
                continue
            # Modification-time retention (Delta's VACUUM contract): a file
            # younger than the horizon is never deleted even if unreferenced —
            # it may be staged by an in-flight transaction whose commit hasn't
            # landed yet; deleting it would corrupt that commit (data loss).
            try:
                if os.path.getmtime(full) * 1000 >= horizon:
                    continue
            except OSError:
                continue
            doomed.append(full)

    if not dry_run:
        for path in doomed:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        # prune now-empty partition directories
        for root, dirs, files in os.walk(table_path, topdown=False):
            if "_delta_log" in root:
                continue
            if root != table_path and not dirs and not files:
                try:
                    os.rmdir(root)
                except OSError:
                    pass
    return sorted(doomed)


def _vacuum_cloud(
    table_uri: str, retention_millis: int | None, dry_run: bool
) -> list[str]:
    """Cloud-table VACUUM: object-store LISTs are flat key-prefix scans, so
    one list_from over the table prefix enumerates every object recursively
    (the reference's store contract, store/base.go paging).  Same deletable
    rule as local: not active, not a young tombstone, older than the
    retention horizon by the store's LastModified.  No directory pruning —
    object stores have no directories."""
    from delta_go_spark.store import normalize_table_uri

    table_uri = normalize_table_uri(table_uri)
    log = DeltaLog.for_table(table_uri)
    snap = log.update()
    if retention_millis is None:
        retention_millis = cfg.get_millis(
            snap.metadata().configuration or {}, cfg.TOMBSTONE_RETENTION
        )
    horizon = log.clock.now_millis() - retention_millis

    def norm(p: str) -> str:
        return canonicalize_path(p, table_uri)

    active = {norm(a.path) for a in snap.all_files()}
    protected = {
        norm(r.path)
        for r in snap.state().tombstones.values()
        if (r.deletion_timestamp or 0) >= horizon
    }

    prefix = f"{table_uri}/"
    doomed: list[str] = []
    for meta in log.store.list_from(prefix):
        rel = meta.path[len(prefix):] if meta.path.startswith(prefix) else None
        if rel is None or not rel.endswith(".parquet"):
            continue
        # log, change data and staging/hidden objects are never touched —
        # a dot-prefixed segment at ANY depth protects the object, the
        # same rule the local walk applies by pruning hidden directories
        segments = rel.split("/")
        if segments[0] in ("_delta_log", "_change_data"):
            continue
        if any(s.startswith(".") for s in segments[:-1]):
            continue
        if segments[-1].startswith((".", "_")):
            continue
        if meta.path in active or meta.path in protected:
            continue
        if meta.modification_time >= horizon:
            continue  # possibly staged by an in-flight commit
        doomed.append(meta.path)

    if not dry_run:
        for path in doomed:
            log.store.delete(path)
    return sorted(doomed)
