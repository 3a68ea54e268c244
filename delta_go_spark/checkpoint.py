"""Parquet checkpoints: _last_checkpoint discovery, complete-checkpoint
selection, columnar read/write via pyarrow.

Reference: checkpoint.go (metadata + discovery), checkpoint_reader.go:87-216
(the fixed nested action schema), checkpoint_writer.go:19-94.  The writer
must emit a SINGLE parquet file with that exact schema — pyarrow gives
byte-level control that df.write.parquet (part-files + _SUCCESS) does not.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from delta_go_spark import filenames
from delta_go_spark.actions import (
    Action,
    AddFile,
    Format,
    Metadata,
    Protocol,
    RemoveFile,
    SetTransaction,
)
from delta_go_spark.store import LogStore


@dataclass(frozen=True)
class CheckpointInstance:
    """Identity of a checkpoint (version, parts); ordering = (version,
    parts) (reference: checkpoint.go:28-66)."""

    version: int
    parts: int | None = None  # None = single-file

    def key(self) -> tuple[int, int]:
        return (self.version, self.parts or 0)


@dataclass(frozen=True)
class CheckpointMetadata:
    """_last_checkpoint contents (reference: checkpoint.go:16-26)."""

    version: int
    size: int
    parts: int | None = None


def last_checkpoint_path(log_path: str) -> str:
    import os

    return os.path.join(log_path, filenames.LAST_CHECKPOINT)


def load_last_checkpoint(
    store: LogStore, log_path: str, retries: int = 3, retry_sleep_sec: float = 1.0
) -> CheckpointMetadata | None:
    """Read _last_checkpoint with retries (object stores can briefly expose
    partial writes; reference: checkpoint.go:95-141).  Returns None when
    absent or unparseable after retries — callers fall back to a full
    listing search."""
    path = last_checkpoint_path(log_path)
    for attempt in range(retries):
        if not store.exists(path):
            return None
        try:
            lines = store.read(path)
            o = json.loads("".join(lines))
            return CheckpointMetadata(o["version"], o.get("size", 0), o.get("parts"))
        except (ValueError, KeyError, OSError):
            if attempt < retries - 1:
                time.sleep(retry_sleep_sec)
    return None


def checkpoint_files_of(instance: CheckpointInstance, log_path: str) -> list[str]:
    if instance.parts:
        return filenames.checkpoint_file_parts(log_path, instance.version, instance.parts)
    return [filenames.checkpoint_file_single(log_path, instance.version)]


def latest_complete_checkpoint(
    candidates: list[str], not_later_than: int | None = None
) -> CheckpointInstance | None:
    """Pick the newest checkpoint (<= bound) with ALL its parts present
    (reference: checkpoint.go:214-245)."""
    singles: list[int] = []
    parts_seen: dict[tuple[int, int], set[int]] = {}
    for p in candidates:
        if not filenames.is_checkpoint_file(p):
            continue
        v = filenames.checkpoint_version(p)
        if not_later_than is not None and v > not_later_than:
            continue
        part, total = filenames.checkpoint_part(p)
        if part is None:
            singles.append(v)
        else:
            parts_seen.setdefault((v, total), set()).add(part)
    complete: list[CheckpointInstance] = [CheckpointInstance(v) for v in singles]
    complete += [
        CheckpointInstance(v, total)
        for (v, total), seen in parts_seen.items()
        if len(seen) == total
    ]
    if not complete:
        return None
    return max(complete, key=CheckpointInstance.key)


def find_last_complete_checkpoint_before(
    store: LogStore, log_path: str, version_bound: int | None = None
) -> CheckpointInstance | None:
    """Full-listing fallback search, walking down in 1000-version strides
    (reference: checkpoint.go:156-196)."""
    import os

    cur = version_bound if version_bound is not None else (1 << 62)
    while cur >= 0:
        start_v = max(0, cur - 1000)
        start = os.path.join(log_path, f"{start_v:020d}")
        try:
            names = [m.path for m in store.list_from(start)]
        except FileNotFoundError:
            return None
        cands = [
            p
            for p in names
            if filenames.is_checkpoint_file(p)
            and (version_bound is None or filenames.checkpoint_version(p) <= version_bound)
            and filenames.checkpoint_version(p) <= cur
        ]
        found = latest_complete_checkpoint(cands, not_later_than=cur)
        if found:
            return found
        if start_v == 0:
            return None
        cur = start_v - 1


# ---------------------------------------------------------------------------
# Parquet read/write

def _open_fs(path: str):
    """Route parquet I/O through the right pyarrow filesystem: local paths
    stay local; cloud URIs (s3://, gs://, ...) resolve via
    pyarrow.fs.FileSystem.from_uri so checkpoints work against object
    stores with the same code path."""
    import pyarrow.fs as pafs

    if "://" in path and not path.startswith("file://"):
        fs, rel = pafs.FileSystem.from_uri(path)
        return fs, rel
    return pafs.LocalFileSystem(), path.replace("file://", "")


def _row_to_action(row: dict) -> Action | None:
    """One checkpoint parquet row -> action (reference:
    checkpoint_reader.go:43-85).  commitInfo / cdc rows return None (they
    don't contribute to state, matching the reference's fold)."""
    if row.get("add") is not None:
        a = row["add"]
        return AddFile(
            path=a["path"],
            partition_values=_map_to_dict(a.get("partitionValues")),
            size=a.get("size") or 0,
            modification_time=a.get("modificationTime") or 0,
            data_change=bool(a.get("dataChange")),
            stats=a.get("stats"),
            tags=_map_to_dict(a.get("tags")) or None,
        )
    if row.get("remove") is not None:
        r = row["remove"]
        return RemoveFile(
            path=r["path"],
            deletion_timestamp=r.get("deletionTimestamp"),
            data_change=bool(r.get("dataChange")),
            extended_file_metadata=bool(r.get("extendedFileMetadata", False)),
            partition_values=_map_to_dict(r.get("partitionValues")) or None,
            size=r.get("size"),
        )
    if row.get("metaData") is not None:
        m = row["metaData"]
        fmt = m.get("format") or {}
        return Metadata(
            id=m.get("id", ""),
            name=m.get("name"),
            description=m.get("description"),
            format=Format(
                (fmt.get("provider") or "parquet"),
                _map_to_dict(fmt.get("options")) or {},
            ),
            schema_string=m.get("schemaString", ""),
            partition_columns=list(m.get("partitionColumns") or []),
            configuration=_map_to_dict(m.get("configuration")) or {},
            created_time=m.get("createdTime"),
        )
    if row.get("protocol") is not None:
        p = row["protocol"]
        return Protocol(p.get("minReaderVersion", 0), p.get("minWriterVersion", 0))
    if row.get("txn") is not None:
        t = row["txn"]
        return SetTransaction(t.get("appId", ""), t.get("version", 0), t.get("lastUpdated"))
    return None


class _RangedStoreFile:
    """pyarrow-compatible random-access file over LogStore ranged reads:
    each read() is one ranged GET, so ParquetFile streams footer + row
    groups without ever materializing the whole object."""

    def __init__(self, store: LogStore, path: str):
        self._store = store
        self._path = path
        self._size = store.size_of(path)
        self._pos = 0
        self.closed = False

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._size + offset
        return self._pos

    def read(self, nbytes: int = -1) -> bytes:
        if nbytes is None or nbytes < 0:
            nbytes = self._size - self._pos
        nbytes = max(0, min(nbytes, self._size - self._pos))
        if nbytes == 0:
            return b""
        data = self._store.read_range(self._path, self._pos, nbytes)
        self._pos += len(data)
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def flush(self) -> None:
        pass


def _open_checkpoint_parquet(path: str, store: LogStore | None):
    """ParquetFile over a checkpoint part, routed through the store's
    cheapest streaming surface (ranged cloud GETs / one buffered download
    for abstract stores / the local filesystem)."""
    from delta_go_spark.store import LocalStore, LogStore as _Base

    if store is not None and not isinstance(store, LocalStore):
        if type(store).read_range is not _Base.read_range:
            # Cloud store with a real ranged read: stream row groups
            # through per-read GETs.
            return pq.ParquetFile(
                pa.PythonFile(_RangedStoreFile(store, path), mode="r")
            )
        # Custom store with only the abstract surface: its default
        # read_range re-downloads the WHOLE object per read call —
        # one buffered download is strictly better there.
        return pq.ParquetFile(pa.BufferReader(store.read_bytes(path)))
    # Local (or no store): stream from the file.
    fs, rel = _open_fs(path)
    return pq.ParquetFile(fs.open_input_file(rel))


def checkpoint_num_rows(paths: list[str], store: LogStore | None = None) -> int:
    """Total action rows across checkpoint parts from the parquet FOOTERS
    alone — an O(bytes-of-footer) upper bound on the table's active-file
    count (rows also cover removes/txns/protocol/metadata), used to route
    state reconstruction to the distributed tier without folding
    anything."""
    return sum(
        _open_checkpoint_parquet(p, store).metadata.num_rows for p in paths
    )


def iter_checkpoint_actions(
    paths: list[str],
    store: LogStore | None = None,
    batch_size: int = 10_000,
    columns: list[str] | None = None,
):
    """Stream checkpoint actions row-group-batch by batch — the memory
    ceiling is one arrow batch, never the whole checkpoint (mirrors the
    reference's streaming replay, replay_file.go:70-140).  Cloud stores
    stream through ranged GETs (_RangedStoreFile); local tables stream
    from the filesystem — neither path materializes a multi-GB checkpoint
    as one bytes object on the driver.

    `columns` projects top-level action columns (parquet column pruning):
    a caller that only needs protocol/metadata/txn rows reads those
    columns' pages only, never the add/remove payload — the difference
    between O(KB) and O(checkpoint) I/O on a million-file table."""
    import pyarrow.compute as pc

    for path in paths:
        pf = _open_checkpoint_parquet(path, store)
        avail = set(pf.schema_arrow.names)
        cols = [c for c in columns if c in avail] if columns is not None else None
        if columns is not None and not cols:
            continue
        for batch in pf.iter_batches(batch_size, columns=cols):
            if cols is not None:
                # Projected read: drop rows where every projected column is
                # null BEFORE building Python objects — a P&M resolution
                # over a million-add checkpoint must not allocate ~1M empty
                # dicts (the I/O is already pruned; this prunes the CPU).
                keep = pc.is_valid(batch.column(0))
                for c in range(1, batch.num_columns):
                    keep = pc.or_(keep, pc.is_valid(batch.column(c)))
                batch = batch.filter(keep)
            for row in batch.to_pylist():
                a = _row_to_action(row)
                if a is not None:
                    yield a


def iter_checkpoint_actions_pruned(
    paths: list[str],
    store: LogStore | None,
    column: str,
    batch_size: int = 10_000,
):
    """Actions of ONE top-level kind (e.g. 'txn', 'remove'): a readability
    alias for the single-column projected read — parquet column pruning +
    Arrow-side null drop both live in iter_checkpoint_actions, so there is
    exactly one implementation of 'pruned checkpoint action read'."""
    yield from iter_checkpoint_actions(
        paths, store, batch_size=batch_size, columns=[column]
    )


def read_checkpoint_actions(
    paths: list[str],
    store: LogStore | None = None,
    columns: list[str] | None = None,
) -> list[Action]:
    """Materialized variant of iter_checkpoint_actions (reverse P&M search
    needs a concrete batch)."""
    return list(iter_checkpoint_actions(paths, store, columns=columns))


def _map_to_dict(v):
    if v is None:
        return {}
    if isinstance(v, dict):
        return v
    return dict(v)  # pyarrow map -> list of (k, v) tuples


_STR_MAP = pa.map_(pa.string(), pa.string())

CHECKPOINT_SCHEMA = pa.schema(
    [
        pa.field(
            "txn",
            pa.struct(
                [
                    pa.field("appId", pa.string()),
                    pa.field("version", pa.int64()),
                    pa.field("lastUpdated", pa.int64()),
                ]
            ),
        ),
        pa.field(
            "add",
            pa.struct(
                [
                    pa.field("path", pa.string()),
                    pa.field("partitionValues", _STR_MAP),
                    pa.field("size", pa.int64()),
                    pa.field("modificationTime", pa.int64()),
                    pa.field("dataChange", pa.bool_()),
                    pa.field("stats", pa.string()),
                    pa.field("tags", _STR_MAP),
                ]
            ),
        ),
        pa.field(
            "remove",
            pa.struct(
                [
                    pa.field("path", pa.string()),
                    pa.field("deletionTimestamp", pa.int64()),
                    pa.field("dataChange", pa.bool_()),
                ]
            ),
        ),
        pa.field(
            "metaData",
            pa.struct(
                [
                    pa.field("id", pa.string()),
                    pa.field("name", pa.string()),
                    pa.field("description", pa.string()),
                    pa.field(
                        "format",
                        pa.struct(
                            [
                                pa.field("provider", pa.string()),
                                pa.field("options", _STR_MAP),
                            ]
                        ),
                    ),
                    pa.field("schemaString", pa.string()),
                    pa.field("partitionColumns", pa.list_(pa.string())),
                    pa.field("configuration", _STR_MAP),
                    pa.field("createdTime", pa.int64()),
                ]
            ),
        ),
        pa.field(
            "protocol",
            pa.struct(
                [
                    pa.field("minReaderVersion", pa.int32()),
                    pa.field("minWriterVersion", pa.int32()),
                ]
            ),
        ),
    ]
)


def _small_action_rows(
    protocol: Protocol,
    metadata: Metadata,
    set_transactions: list[SetTransaction],
    tombstones: list[RemoveFile],
) -> list[dict]:
    """Checkpoint rows for everything EXCEPT the add actions: protocol,
    metaData, txns, removes — bounded by the tombstone retention window
    and app count, never by table size."""
    rows: list[dict] = []
    rows.append({"protocol": {"minReaderVersion": protocol.min_reader_version,
                              "minWriterVersion": protocol.min_writer_version}})
    rows.append(
        {
            "metaData": {
                "id": metadata.id,
                "name": metadata.name,
                "description": metadata.description,
                "format": {
                    "provider": metadata.format.provider,
                    "options": list((metadata.format.options or {}).items()),
                },
                "schemaString": metadata.schema_string,
                "partitionColumns": metadata.partition_columns,
                "configuration": list((metadata.configuration or {}).items()),
                "createdTime": metadata.created_time,
            }
        }
    )
    for t in set_transactions:
        rows.append({"txn": {"appId": t.app_id, "version": t.version,
                             "lastUpdated": t.last_updated}})
    for r in tombstones:
        rows.append(
            {
                "remove": {
                    "path": r.path,
                    "deletionTimestamp": r.deletion_timestamp,
                    "dataChange": r.data_change,
                }
            }
        )
    return rows


def _emit_part(store: LogStore, tbl: pa.Table, target: str) -> None:
    from delta_go_spark.store import LocalStore

    if isinstance(store, LocalStore):
        # Stream to a temp file + atomic rename — no in-memory copy of
        # the serialized part.
        import os

        tmp = target + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, target)
    else:
        # Object stores: serialize and hand bytes to the LogStore
        # (single PUT, atomic at object level) — raw-path
        # pq.write_table would crash cloud tables.
        sink = pa.BufferOutputStream()
        pq.write_table(tbl, sink)
        store.write_bytes(target, sink.getvalue().to_pybytes(), overwrite=True)


def write_checkpoint(
    store: LogStore,
    log_path: str,
    version: int,
    protocol: Protocol,
    metadata: Metadata,
    active_files: list[AddFile],
    tombstones: list[RemoveFile],
    set_transactions: list[SetTransaction],
    max_actions_per_part: int | None = 500_000,
) -> CheckpointMetadata:
    """Write a single-file checkpoint + _last_checkpoint pointer
    (reference: checkpoint.go:247-276, checkpoint_writer.go:19-94)."""
    rows = _small_action_rows(protocol, metadata, set_transactions, tombstones)
    for a in active_files:
        rows.append(
            {
                "add": {
                    "path": a.path,
                    "partitionValues": list((a.partition_values or {}).items()),
                    "size": a.size,
                    "modificationTime": a.modification_time,
                    "dataChange": a.data_change,
                    "stats": a.stats,
                    "tags": list(a.tags.items()) if a.tags else None,
                }
            }
        )
    table = pa.Table.from_pylist(rows, schema=CHECKPOINT_SCHEMA)

    def emit(tbl: pa.Table, target: str) -> None:
        _emit_part(store, tbl, target)

    # Multi-part when the state outgrows one comfortable parquet file
    # (reference reads multi-part checkpoints: checkpoint.go:214-245,
    # filename.go:73-79; at 100 TB a single file serializes the write and
    # the subsequent reads).  Every part is written before _last_checkpoint
    # flips, so readers either see the complete group or fall back to the
    # previous anchor.
    parts = None
    if max_actions_per_part and len(rows) > max_actions_per_part:
        parts = -(-len(rows) // max_actions_per_part)  # ceil
        targets = filenames.checkpoint_file_parts(log_path, version, parts)
        per = -(-len(rows) // parts)
        for i, target in enumerate(targets):
            emit(table.slice(i * per, per), target)
    else:
        emit(table, filenames.checkpoint_file_single(log_path, version))
    meta = CheckpointMetadata(version=version, size=len(rows), parts=parts)
    payload = {"version": meta.version, "size": meta.size}
    if parts:
        payload["parts"] = parts
    store.write(
        last_checkpoint_path(log_path),
        [json.dumps(payload, separators=(",", ":"))],
        overwrite=True,
    )
    return meta


# Checkpoint column DDLs for the Spark-job writer (mirrors CHECKPOINT_SCHEMA;
# Spark's parquet MAP/LIST encodings match pyarrow's, so parts written by
# either path read back through the same iter_checkpoint_actions).
_TXN_DDL = "struct<appId:string,version:bigint,lastUpdated:bigint>"
_REMOVE_DDL = "struct<path:string,deletionTimestamp:bigint,dataChange:boolean>"
_META_DDL = (
    "struct<id:string,name:string,description:string,"
    "format:struct<provider:string,options:map<string,string>>,"
    "schemaString:string,partitionColumns:array<string>,"
    "configuration:map<string,string>,createdTime:bigint>"
)
_PROTOCOL_DDL = "struct<minReaderVersion:int,minWriterVersion:int>"


def write_checkpoint_spark(
    spark,
    store: LogStore,
    log_path: str,
    version: int,
    snapshot,
    protocol: Protocol,
    metadata: Metadata,
    set_transactions: list[SetTransaction],
    tombstones: list[RemoveFile],
    max_actions_per_part: int = 500_000,
    n_adds: int | None = None,
) -> CheckpointMetadata:
    """Multi-part checkpoint written AS A SPARK JOB — the million-file
    scale path.

    The add actions (the only O(table-size) component) are reconstructed
    distributively from the previous checkpoint + log tail
    (snapshot.checkpoint_adds_df) and written by executors straight into
    the multi-part form (filename.go:73-79); the driver handles only the
    bounded small actions (protocol/metaData/txn/removes, part 1) and
    O(parts) renames.  This moves the checkpoint's pyarrow row-building
    and parquet serialization off the driver; the TRANSACTION's own
    replay state (the AddFile dict conflict checking needs) remains a
    driver cost for now — pairing this writer with a fully distributed
    state fold is the documented next frontier.  write_checkpoint stays
    the exact single-file contract for ordinary tables.

    Part layout: part 1 = small actions (driver pyarrow), parts 2..N =
    adds (Spark, renamed from a staging dir under _delta_log; names
    starting with '_' are outside the log's delta/checkpoint patterns so
    a crashed staging dir can never corrupt replay, and the next attempt
    clears it).  All parts land before the _last_checkpoint pointer
    flips, so readers see the complete group or the previous anchor.
    """
    import math
    import os
    import shutil

    from pyspark.sql import functions as F

    from delta_go_spark.snapshot import DeltaError, checkpoint_adds_df

    adds = checkpoint_adds_df(spark, snapshot)
    full = adds.select(
        F.lit(None).cast(_TXN_DDL).alias("txn"),
        F.col("add"),
        F.lit(None).cast(_REMOVE_DDL).alias("remove"),
        F.lit(None).cast(_META_DDL).alias("metaData"),
        F.lit(None).cast(_PROTOCOL_DDL).alias("protocol"),
    )
    # The caller usually knows the add count from its own state fold —
    # counting here would execute the whole distributed reconstruction a
    # second time (count + write), doubling the dominant cost.
    if n_adds is None:
        n_adds = full.count()
    if n_adds == 0:
        # nothing to distribute — the pyarrow path is strictly better
        return write_checkpoint(
            store, log_path, version, protocol, metadata, [],
            tombstones, set_transactions,
        )
    n_add_parts = max(1, math.ceil(n_adds / max_actions_per_part))

    local = "://" not in log_path
    staging = os.path.join(log_path, f"_staging_checkpoint_{version:020d}")
    if local and os.path.isdir(staging):
        shutil.rmtree(staging)  # debris from a crashed earlier attempt
    full.repartition(n_add_parts).write.mode("overwrite").parquet(staging)
    if local:
        part_files = sorted(
            os.path.join(staging, f)
            for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
    else:
        from delta_go_spark.datacloud import hadoop_list_files

        part_files = sorted(
            p
            for p, _, _ in hadoop_list_files(spark, staging)
            if os.path.basename(p).startswith("part-")
            and p.endswith(".parquet")
        )
    # Spark skips part files for empty shuffle partitions, so when the
    # caller passed an ESTIMATED n_adds (the distributed-state tier does)
    # the actual file count can come in BELOW the estimate-derived target
    # — e.g. right after a mass DELETE.  The checkpoint group is named for
    # what was actually written; the estimate only sized the repartition.
    if not part_files:
        raise DeltaError("distributed checkpoint wrote no part files")
    if len(part_files) > n_add_parts:
        raise DeltaError(
            f"distributed checkpoint wrote {len(part_files)} parts, "
            f"expected at most {n_add_parts}"
        )
    n_add_parts = len(part_files)
    n_parts = 1 + n_add_parts
    targets = filenames.checkpoint_file_parts(log_path, version, n_parts)
    if local:
        for src, dst in zip(part_files, targets[1:]):
            os.replace(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
    else:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.Path(log_path).getFileSystem(conf)
        for src, dst in zip(part_files, targets[1:]):
            if not fs.rename(
                jvm.org.apache.hadoop.fs.Path(src),
                jvm.org.apache.hadoop.fs.Path(dst),
            ):
                raise DeltaError(f"checkpoint part rename failed: {src}")
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

    small = _small_action_rows(protocol, metadata, set_transactions, tombstones)
    _emit_part(
        store, pa.Table.from_pylist(small, schema=CHECKPOINT_SCHEMA), targets[0]
    )
    # _last_checkpoint.size must be exact even when the caller passed an
    # ESTIMATED n_adds for part sizing (the distributed-state tier does,
    # to avoid running the add reconstruction twice): the written parts'
    # parquet footers give the true row count for free.
    n_adds_written = checkpoint_num_rows(list(targets[1:]), store)
    meta = CheckpointMetadata(
        version=version, size=len(small) + n_adds_written, parts=n_parts
    )
    store.write(
        last_checkpoint_path(log_path),
        [
            json.dumps(
                {"version": meta.version, "size": meta.size, "parts": n_parts},
                separators=(",", ":"),
            )
        ],
        overwrite=True,
    )
    return meta
