"""Data-plane writer: DataFrame -> parquet files -> AddFile actions ->
committed Delta version.

The reference never writes data (README.md:14-16); this is the compute
side it delegates.  Files are written by Spark executors into a staging
directory, moved (same-filesystem rename) into the table root, and the
driver commits the log entry — executors never touch _delta_log, which
preserves the storage contract's single-writer rule (store.go:16-27).

Per-file stats (numRecords/minValues/maxValues/nullCount) are read from
the parquet footers — no second data scan.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from urllib.parse import unquote

import pyarrow.parquet as pq

from pyspark.sql import DataFrame

from delta_go_spark import ops
from delta_go_spark.actions import AddFile, Metadata, encode_path
from delta_go_spark.log import DeltaLog
from delta_go_spark.snapshot import DeltaError
from delta_go_spark.types import schema_to_json

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _partition_values_from_rel(rel_dir: str, partition_cols: list[str]) -> dict[str, str | None]:
    values: dict[str, str | None] = {}
    parts = [p for p in rel_dir.split(os.sep) if p]
    for part in parts:
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        k = unquote(k)
        values[k] = None if v == HIVE_NULL else unquote(v)
    return {c: values.get(c) for c in partition_cols}


def _stats_from_footer(path: str) -> str | None:
    """Delta stats JSON from parquet row-group statistics."""
    try:
        meta = pq.ParquetFile(path).metadata
    except Exception:
        return None
    return _stats_from_metadata(meta)


def _stats_from_remote_footer(uri: str, store) -> str | None:
    """Footer-only stats for a natively-written cloud object: the footer
    (KBs) streams through the LogStore's ranged GETs — the log store is
    always configured (commits require it, store.go:16-27), so the native
    write path keeps file-skipping stats without pulling data bytes
    through the driver.  Stores lacking a real ranged read would download
    the whole object per call; stats are skipped there (they're an
    optional optimization, never a correctness dependency)."""
    from delta_go_spark.store import LogStore as _Base

    if type(store).read_range is _Base.read_range:
        return None
    try:
        import pyarrow as pa

        from delta_go_spark.checkpoint import _RangedStoreFile

        pf = pq.ParquetFile(
            pa.PythonFile(_RangedStoreFile(store, uri), mode="r")
        )
        return _stats_from_metadata(pf.metadata)
    except Exception:
        return None


def _stats_from_metadata(meta) -> str | None:
    num_records = meta.num_rows
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    # A column's stat is only trustworthy when EVERY row group provides it:
    # a partial aggregate would claim nullCount=0 or a too-narrow min/max,
    # making stats_may_match prune files that actually contain matching rows
    # (silently wrong results) and letting NOT NULL enforcement pass bad data.
    no_nulls: set = set()
    no_minmax: set = set()
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested stats omitted (top-level only, like Spark)
            st = col.statistics
            if st is None or not st.has_null_count:
                no_nulls.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if st is None or not st.has_min_max or isinstance(st.min, bytes):
                no_minmax.add(name)  # absent or binary (not JSON-representable)
            else:
                mn, mx = st.min, st.max
                mins[name] = mn if name not in mins else min(mins[name], mn)
                maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    for name in no_nulls:
        nulls.pop(name, None)
    for name in no_minmax:
        mins.pop(name, None)
        maxs.pop(name, None)
    return json.dumps(
        {
            "numRecords": num_records,
            "minValues": {k: _json_safe(v) for k, v in mins.items()},
            "maxValues": {k: _json_safe(v) for k, v in maxs.items()},
            "nullCount": nulls,
        },
        default=str,
        separators=(",", ":"),
    )


def _json_safe(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def stage_files(
    df: DataFrame, table_path: str, partition_by: list[str]
) -> list[AddFile]:
    """Executors write `df` as parquet into a staging dir; files are then
    moved into the table root (hive layout preserved) and returned as
    AddFile actions with footer-derived stats.  Shared by append/overwrite
    and the DML rewrites (delete/update/merge).

    Cloud table roots route through _stage_files_cloud: same layout and
    stats, objects PUT through the LogStore abstraction."""
    from delta_go_spark.store import is_cloud_uri

    if is_cloud_uri(table_path):
        from delta_go_spark.datacloud import use_native_cloud

        if use_native_cloud(df.sparkSession, table_path):
            return _stage_files_native(df, table_path, partition_by)
        return _stage_files_cloud(df, table_path, partition_by)
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    new_files: list[AddFile] = []
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            rel_dir = os.path.relpath(root, staging)
            rel_dir = "" if rel_dir == "." else rel_dir
            target_dir = os.path.join(table_path, rel_dir)
            os.makedirs(target_dir, exist_ok=True)
            dst = os.path.join(target_dir, name)
            os.rename(src, dst)
            rel_path = os.path.join(rel_dir, name) if rel_dir else name
            new_files.append(
                AddFile(
                    path=encode_path(rel_path.replace(os.sep, "/")),
                    partition_values=_partition_values_from_rel(rel_dir, partition_by),
                    size=os.path.getsize(dst),
                    modification_time=int(os.path.getmtime(dst) * 1000),
                    data_change=True,
                    stats=_stats_from_footer(dst),
                )
            )
    shutil.rmtree(staging, ignore_errors=True)
    return new_files


def _upload_scratch(scratch: str, table_uri: str, rel_prefix: str, make_action):
    """Walk a local scratch tree and PUT every parquet file under
    `table_uri/rel_prefix/<hive dirs>/<name>` through the LogStore; PUTs
    run on a thread pool (latency-bound, same pattern as the read-side
    cache fill).  make_action(src, rel_dir, rel_path, n_bytes) builds the
    log action for each uploaded object.  Shared by data and cdc staging."""
    from delta_go_spark.store import store_for

    store = store_for(table_uri)
    staged: list[tuple[str, str, str]] = []  # (src, rel_dir, rel_path)
    for root, _dirs, files in os.walk(scratch):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, scratch)
            rel_dir = "" if rel_dir == "." else rel_dir
            rel_path = "/".join(
                p
                for p in (rel_prefix, rel_dir.replace(os.sep, "/"), name)
                if p
            )
            staged.append((os.path.join(root, name), rel_dir, rel_path))

    def _put(item: tuple[str, str, str]):
        src, rel_dir, rel_path = item
        with open(src, "rb") as f:
            data = f.read()
        store.write_bytes(f"{table_uri.rstrip('/')}/{rel_path}", data)
        return make_action(src, rel_dir, rel_path, len(data))

    if len(staged) <= 1:
        return [_put(item) for item in staged]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(16, len(staged))) as pool:
        return list(pool.map(_put, staged))


def _stage_files_native(
    df: DataFrame,
    table_uri: str,
    partition_by: list[str],
    sub_dir: str = "",
    make_action=None,
) -> list:
    """Connector-present write path: EXECUTORS stream parquet directly to
    the object store under a unique per-commit prefix inside the table —
    no driver staging, no uploads through the driver, and no renames
    (object-store renames are copies; none are needed because file
    visibility is governed by the log commit, and AddFile.path is
    arbitrary — readers take partition values from the LOG's
    partitionValues, not the directory layout, so files under
    commit-<id>/ read identically to hive-rooted ones).  Post-write
    enumeration goes through the JVM Hadoop FileSystem; footer stats
    stream as ranged GETs through the LogStore (KBs per file).

    sub_dir places the prefix under a table subdirectory (``_change_data``
    for cdc files); make_action overrides the default AddFile builder.
    """
    import time

    from delta_go_spark.datacloud import hadoop_list_files
    from delta_go_spark.store import store_for

    spark = df.sparkSession
    prefix = "/".join(
        p for p in (sub_dir, f"commit-{uuid.uuid4().hex}") if p
    )
    staging_uri = f"{table_uri.rstrip('/')}/{prefix}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging_uri)

    try:
        store = store_for(table_uri)
    except Exception:
        store = None
    now_ms = int(time.time() * 1000)

    if make_action is None:

        def make_action(abs_uri, rel_dir, rel_path, size, mtime):
            return AddFile(
                path=encode_path(rel_path),
                partition_values=_partition_values_from_rel(
                    rel_dir, partition_by
                ),
                size=size,
                modification_time=mtime or now_ms,
                data_change=True,
                stats=(
                    _stats_from_remote_footer(abs_uri, store)
                    if store is not None
                    else None
                ),
            )

    out = []
    # Anchor on the unique per-write "commit-<uuid>" marker rather than
    # string-prefix-matching the full staging URI: Hadoop's Path.toString
    # may normalize scheme case/authority ('S3A://', fully-qualified
    # URIs), which would fail a startswith(base) check — and a bare-
    # filename guess would fabricate a WRONG AddFile path (and empty
    # partition values) that commits silently and 404s on every read.
    marker = "/" + prefix.split("/")[-1] + "/"
    for abs_uri, size, mtime in hadoop_list_files(spark, staging_uri):
        if not abs_uri.endswith(".parquet"):
            continue  # _SUCCESS markers etc.
        idx = abs_uri.rfind(marker)
        if idx < 0:
            raise DeltaError(
                f"native staging listing returned {abs_uri!r}, which does "
                f"not contain the staging prefix {marker!r}; refusing to "
                "guess an AddFile path"
            )
        rel = abs_uri[idx + len(marker):]
        rel_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
        rel_path = f"{prefix}/{rel}"
        out.append(
            make_action(abs_uri, rel_dir.replace("/", os.sep), rel_path, size, mtime)
        )
    return out


def _stage_files_cloud(
    df: DataFrame, table_uri: str, partition_by: list[str]
) -> list[AddFile]:
    """Cloud staging: executors write parquet to local scratch (hive layout
    preserved), then the driver PUTs each object into the table prefix via
    the LogStore.  With the scheme's Hadoop connector on the classpath a
    deployment should instead configure Spark to write the staging prefix
    directly in the object store — executors upload, the driver only
    commits — but the SDK-only fallback keeps every write path (append,
    DML rewrite, CDF) correct without the connector.  No renames needed:
    object visibility is governed by the log commit, not the filesystem."""
    import tempfile
    import time

    scratch = tempfile.mkdtemp(prefix="dgs-stage-")
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(scratch)
        now_ms = int(time.time() * 1000)

        def make(src, rel_dir, rel_path, n_bytes) -> AddFile:
            return AddFile(
                path=encode_path(rel_path),
                partition_values=_partition_values_from_rel(rel_dir, partition_by),
                size=n_bytes,
                modification_time=now_ms,
                data_change=True,
                stats=_stats_from_footer(src),
            )

        return _upload_scratch(scratch, table_uri, "", make)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


CDC_DIR = "_change_data"
CHANGE_TYPE_COL = "_change_type"

CONSTRAINT_PREFIX = "delta.constraints."
GENERATION_EXPRESSION_KEY = "delta.generationExpression"


def apply_generated_columns(df: DataFrame, table_schema) -> DataFrame:
    """Generated columns (public Delta layout: the expression lives in the
    field metadata under `delta.generationExpression`).  A generated
    column ABSENT from the written frame is computed; one the writer
    supplies is validated against the expression (null-safe equality) —
    Delta's contract that stored values always agree with the formula."""
    from pyspark.sql import functions as F

    generated = {
        f.name: f.metadata[GENERATION_EXPRESSION_KEY]
        for f in table_schema.fields
        if f.metadata and GENERATION_EXPRESSION_KEY in f.metadata
    }
    if not generated:
        return df
    have = {c.lower() for c in df.columns}
    for name, expr_sql in generated.items():
        field = table_schema[name]
        if name.lower() not in have:
            df = df.withColumn(name, F.expr(expr_sql).cast(field.dataType))
        else:
            mismatch = df.filter(
                ~F.col(name).eqNullSafe(F.expr(expr_sql).cast(field.dataType))
            ).limit(1).collect()
            if mismatch:
                raise DeltaError(
                    f"generated column {name} does not match its expression "
                    f"{expr_sql!r}; example row: {mismatch[0].asDict()}"
                )
    return df


def recompute_generated_columns(
    df: DataFrame, table_schema, assigned: frozenset[str] | set[str] = frozenset()
) -> DataFrame:
    """DML-rewrite variant of apply_generated_columns: stored generated
    values may be STALE after a base-column assignment, so every generated
    column is overwritten with its expression — except columns the
    statement explicitly assigned, which are validated against the formula
    instead (assigning a non-conforming value is an error, the same
    contract as a conflicting explicit write)."""
    from pyspark.sql import functions as F

    generated = {
        f.name: f.metadata[GENERATION_EXPRESSION_KEY]
        for f in table_schema.fields
        if f.metadata and GENERATION_EXPRESSION_KEY in f.metadata
    }
    assigned_lower = {a.lower() for a in assigned}
    for name, expr_sql in generated.items():
        field = table_schema[name]
        value = F.expr(expr_sql).cast(field.dataType)
        if name.lower() in assigned_lower:
            mismatch = df.filter(~F.col(name).eqNullSafe(value)).limit(1).collect()
            if mismatch:
                raise DeltaError(
                    f"generated column {name} does not match its expression "
                    f"{expr_sql!r}; example row: {mismatch[0].asDict()}"
                )
        else:
            df = df.withColumn(name, value)
    return df


def check_constraints(
    df: DataFrame,
    configuration: dict[str, str] | None,
    table_schema=None,
) -> None:
    """Enforce CHECK constraints (public Delta writer-v3 semantics, stored
    as `delta.constraints.<name>` table properties — exceeds the
    reference): a row violates iff the expression evaluates to FALSE
    (NULL satisfies, like SQL CHECK).  One combined filter job regardless
    of constraint count; raises before anything is staged.

    table_schema: when given, table columns absent from `df` are added as
    typed NULLs before evaluation — a frame legitimately missing a
    nullable column (it reads back as NULL) must satisfy-or-violate by
    CHECK's NULL rules, not crash on an unresolved column."""
    from pyspark.sql import functions as F

    constraints = {
        k[len(CONSTRAINT_PREFIX):]: v
        for k, v in (configuration or {}).items()
        if k.startswith(CONSTRAINT_PREFIX)
    }
    if not constraints:
        return
    if table_schema is not None:
        have = {c.lower() for c in df.columns}
        for f in table_schema.fields:
            if f.name.lower() not in have:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))

    def violates(expr_sql: str):
        return ~F.coalesce(F.expr(expr_sql), F.lit(True))

    combined = None
    for expr_sql in constraints.values():
        cond = violates(expr_sql)
        combined = cond if combined is None else (combined | cond)
    bad = df.filter(combined).limit(1).collect()
    if bad:
        # Identify which constraint(s) the SAMPLE row breaks by evaluating
        # each expression against a local 1-row frame — no re-scan of df.
        row = bad[0]
        spark = df.sparkSession
        one = spark.createDataFrame([row], df.schema)
        broken = [
            f"{name} ({expr_sql})"
            for name, expr_sql in constraints.items()
            if one.filter(violates(expr_sql)).count()
        ] or [f"{n} ({e})" for n, e in constraints.items()]
        raise DeltaError(
            f"CHECK constraint violated: {', '.join(broken)}; "
            f"example row: {row.asDict()}"
        )


def stage_cdc_files(
    df: DataFrame, table_path: str, partition_by: list[str] | None = None
) -> list:
    """Write change-data rows (schema + `_change_type`) as parquet under
    `_change_data/` and return AddCDCFile actions (Delta CDF layout:
    change files live beside the data, referenced only by cdc actions —
    they never join the active file set).  With partition_by, cdc files
    use the table's hive layout and carry partitionValues — exactly like
    data files — so a partition-filtered CDF read skips whole cdc files.
    Executors write; same stage-then-move pattern as stage_files."""
    from delta_go_spark.actions import AddCDCFile
    from delta_go_spark.store import is_cloud_uri

    partition_by = [c for c in (partition_by or []) if c in df.columns]

    def _write(target_dir: str) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_dir)

    if is_cloud_uri(table_path):
        import tempfile

        from delta_go_spark.datacloud import use_native_cloud

        if use_native_cloud(df.sparkSession, table_path):

            def make_cdc(_abs_uri, rel_dir, rel_path, size, _mtime):
                return AddCDCFile(
                    path=encode_path(rel_path),
                    partition_values=_partition_values_from_rel(
                        rel_dir, partition_by
                    ),
                    size=size,
                )

            return _stage_files_native(
                df,
                table_path,
                partition_by,
                sub_dir=CDC_DIR,
                make_action=make_cdc,
            )

        scratch = tempfile.mkdtemp(prefix="dgs-stage-cdc-")
        try:
            _write(scratch)

            def make(_src, rel_dir, rel_path, n_bytes) -> AddCDCFile:
                return AddCDCFile(
                    path=encode_path(rel_path),
                    partition_values=_partition_values_from_rel(
                        rel_dir, partition_by
                    ),
                    size=n_bytes,
                )

            return _upload_scratch(scratch, table_path, CDC_DIR, make)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    staging = os.path.join(table_path, f".staging-cdc-{uuid.uuid4().hex}")
    _write(staging)
    out: list[AddCDCFile] = []
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            rel_dir = os.path.relpath(root, staging)
            rel_dir = "" if rel_dir == "." else rel_dir
            target_dir = os.path.join(table_path, CDC_DIR, rel_dir)
            os.makedirs(target_dir, exist_ok=True)
            dst = os.path.join(target_dir, name)
            os.rename(src, dst)
            rel = "/".join(
                p for p in (CDC_DIR, rel_dir.replace(os.sep, "/"), name) if p
            )
            out.append(
                AddCDCFile(
                    path=encode_path(rel),
                    partition_values=_partition_values_from_rel(
                        rel_dir, partition_by
                    ),
                    size=os.path.getsize(dst),
                )
            )
    shutil.rmtree(staging, ignore_errors=True)
    return out


def commit_staged_adds(
    table_path: str,
    adds: list[AddFile],
    schema,
    mode: str = "append",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int | None:
    """Commit ALREADY-STAGED files as one transaction — the driver half of
    the DataSource write path, where executors have produced the parquet
    (DataSourceWriter.write) and only the log commit remains.  Mirrors
    write_dataframe's semantics (reference trnx.go:144-224: blind append
    vs logical replace): bootstrap Metadata on first write, evolve the
    schema for unknown columns when merge_schema, enforce NOT NULL from
    the staged footer stats, remove the previous active set on overwrite,
    and ride an optional SetTransaction token (idempotent replays return
    None without committing).

    Runs without a SparkSession on purpose: Spark 4 executes Python
    DataSource commit() in a worker process that has no JVM handle, so
    everything here is pure-Python log machinery."""
    import dataclasses

    from pyspark.sql.types import StructField, StructType

    from delta_go_spark.store import normalize_table_uri

    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    table_path = normalize_table_uri(table_path)
    log = DeltaLog.for_table(table_path)
    txn = log.start_transaction()
    exists = txn.snapshot is not None and txn.read_version >= 0
    if txn_app_id is not None and txn_version is not None and exists:
        if txn.txn_version(txn_app_id) >= txn_version:
            return None  # replayed batch: staged files stay orphaned
                         # until VACUUM, nothing commits twice
    partition_by = list(partition_by or [])
    clock_ms = log.clock.now_millis()
    actions: list = []

    if exists:
        meta = txn.snapshot.metadata()
        # Delta field lookup is case-insensitive (type_utils.go:100-107);
        # the partitioning comparison must be too
        if partition_by and [p.lower() for p in partition_by] != [
            c.lower() for c in meta.partition_columns
        ]:
            raise DeltaError(
                f"partitionBy {partition_by} does not match table "
                f"partitioning {meta.partition_columns}"
            )
        table_schema = meta.schema()
        known = {f.name.lower() for f in table_schema.fields}
        extras = [
            f for f in schema.fields if f.name.lower() not in known
        ]
        if extras and not merge_schema:
            raise DeltaError(
                f"DataFrame columns {[f.name for f in extras]} do not exist "
                "in the table schema; set mergeSchema=true to evolve it"
            )
        if extras:
            evolved = StructType(
                [
                    *table_schema.fields,
                    *[
                        StructField(f.name, f.dataType, True, f.metadata)
                        for f in extras
                    ],
                ]
            )
            txn.update_metadata(
                dataclasses.replace(meta, schema_string=schema_to_json(evolved))
            )
        required = {f.name for f in table_schema.fields if not f.nullable}
        # Footer stats are keyed by the FRAME's spelling (the write path
        # admits case-different spellings), and a required column absent
        # from the frame altogether materializes as NULL — both must
        # violate, not silently pass a nulls.get(c, 0) default.
        frame_cols = {f.name.lower() for f in schema.fields}
        absent = sorted(
            c
            for c in required
            if c.lower() not in frame_cols
            and c.lower() not in {p.lower() for p in partition_by}
        )
        if absent:
            raise DeltaError(
                f"NOT NULL columns {absent} are missing from the written "
                "DataFrame"
            )
        for add in adds:
            if not add.stats or not required:
                continue
            nulls = {
                k.lower(): v
                for k, v in (
                    json.loads(add.stats).get("nullCount") or {}
                ).items()
            }
            violated = [c for c in required if nulls.get(c.lower(), 0) > 0]
            if violated:
                raise DeltaError(
                    f"NOT NULL invariant violated for column(s) {violated} "
                    f"in {add.path}"
                )
    else:
        txn.update_metadata(
            Metadata(
                schema_string=schema_to_json(schema),
                partition_columns=partition_by,
                created_time=clock_ms,
            )
        )

    actions.extend(adds)
    if mode == "overwrite" and exists:
        # The remove set is "everything active in MY snapshot" — declare
        # the whole-table read so a file appended by a concurrent winner
        # conflicts (rule 3) instead of silently surviving the overwrite;
        # require_serializable because an empty-over-emptied overwrite
        # commits no data-change action (see read_whole_table).
        txn.read_whole_table(require_serializable=True)
        actions.extend(a.remove(clock_ms) for a in txn.snapshot.all_files())
    if txn_app_id is not None and txn_version is not None:
        from delta_go_spark.actions import SetTransaction

        actions.append(SetTransaction(txn_app_id, txn_version, clock_ms))
    op = ops.CREATE_TABLE if not exists else ops.WRITE
    return txn.commit(
        actions,
        op,
        operation_parameters={
            "mode": "Append" if mode == "append" else "Overwrite",
            "partitionBy": json.dumps(partition_by),
        },
    )


def write_dataframe(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    configuration: dict[str, str] | None = None,
    operation: str | None = None,
    merge_schema: bool = False,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Write `df` into the Delta table at `table_path`; returns the committed
    version.  mode: append | overwrite (overwrite removes the previous
    active set in the same transaction — reference semantics of the
    snapshot-data2 golden table).

    merge_schema: columns present in `df` but not in the table evolve the
    table schema in the SAME commit (appended as nullable — the only
    change the write-compat rules allow, type_utils.go:109-133); without
    it, unknown columns raise instead of being silently dropped on read.

    txn_app_id/txn_version: idempotent writes (SetTransaction,
    trnx.go TxnVersion semantics) — a retried job with the same
    (app_id, version) is skipped, returning the current table version
    without staging anything, so at-least-once schedulers get
    exactly-once commits.
    """
    import dataclasses

    from pyspark.sql.types import StructType

    from delta_go_spark.store import normalize_table_uri

    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    table_path = normalize_table_uri(table_path)
    log = DeltaLog.for_table(table_path)
    txn = log.start_transaction()

    exists = txn.snapshot is not None and txn.read_version >= 0
    if txn_app_id is not None and txn_version is not None and exists:
        if txn.txn_version(txn_app_id) >= txn_version:
            return txn.read_version  # already committed by a previous attempt
    partition_by = list(partition_by or [])
    schema_evolution: Metadata | None = None
    if exists:
        meta = txn.snapshot.metadata()
        # case-insensitive, like every Delta field lookup
        # (type_utils.go:100-107) and the DataSource write path
        if partition_by and [p.lower() for p in partition_by] != [
            c.lower() for c in meta.partition_columns
        ]:
            raise DeltaError(
                f"partitionBy {partition_by} does not match table partitioning "
                f"{meta.partition_columns}"
            )
        partition_by = meta.partition_columns
        table_schema = meta.schema()
        df = apply_generated_columns(df, table_schema)
        # NOT NULL columns absent from the frame would materialize as
        # NULLs — fail BEFORE staging (same guard as commit_staged_adds)
        frame_cols = {f.name.lower() for f in df.schema.fields}
        absent_required = sorted(
            f.name
            for f in table_schema.fields
            if not f.nullable and f.name.lower() not in frame_cols
        )
        if absent_required:
            raise DeltaError(
                f"NOT NULL columns {absent_required} are missing from the "
                "written DataFrame"
            )
        known = {f.name.lower() for f in table_schema.fields}
        extras = [f for f in df.schema.fields if f.name.lower() not in known]
        if extras and not merge_schema:
            raise DeltaError(
                f"DataFrame columns {[f.name for f in extras]} do not exist "
                "in the table schema; pass merge_schema=True to evolve it"
            )
        if extras:
            from pyspark.sql.types import StructField

            evolved = StructType(
                [
                    *table_schema.fields,
                    *[
                        StructField(f.name, f.dataType, True, f.metadata)
                        for f in extras
                    ],
                ]
            )
            schema_evolution = dataclasses.replace(
                meta, schema_string=schema_to_json(evolved)
            )

    if exists:
        meta0 = txn.snapshot.metadata()
        check_constraints(df, meta0.configuration, meta0.schema())
    else:
        check_constraints(df, configuration)

    clock_ms = log.clock.now_millis()
    new_files = stage_files(df, table_path, partition_by)

    # NOT NULL invariant enforcement (minWriterVersion 2 requires it):
    # verified from the parquet footer stats of the just-staged files —
    # zero extra compute over the data.  On violation the staged files are
    # removed and nothing commits.
    if exists:
        table_schema = txn.snapshot.metadata().schema()
        required = {f.name for f in table_schema.fields if not f.nullable}
        for add in new_files:
            if not add.stats or not required:
                continue
            # footer stats carry the frame's spelling; compare
            # case-insensitively like every other field lookup
            nulls = {
                k.lower(): v
                for k, v in (
                    json.loads(add.stats).get("nullCount") or {}
                ).items()
            }
            violated = [c for c in required if nulls.get(c.lower(), 0) > 0]
            if violated:
                from delta_go_spark.store import is_cloud_uri, store_for

                cloud = is_cloud_uri(table_path)
                cleaner = store_for(table_path) if cloud else None
                for a in new_files:
                    try:
                        if cloud:
                            cleaner.delete(
                                f"{table_path.rstrip('/')}/{a.decoded_path()}"
                            )
                        else:
                            os.remove(os.path.join(table_path, a.decoded_path()))
                    except FileNotFoundError:
                        pass
                raise DeltaError(
                    f"NOT NULL invariant violated for column(s) {violated} "
                    f"in {add.path}"
                )

    # 3. build the action list
    actions: list = []
    if not exists:
        txn.update_metadata(
            Metadata(
                schema_string=schema_to_json(df.schema),
                partition_columns=partition_by,
                configuration=configuration or {},
                created_time=clock_ms,
            )
        )
    elif schema_evolution is not None:
        txn.update_metadata(schema_evolution)
    removed = []
    if mode == "overwrite" and exists:
        # See the DataSource writer above: a whole-table overwrite must
        # read the whole table so concurrent appends conflict, under
        # Serializable even when the commit carries no data change.
        txn.read_whole_table(require_serializable=True)
        removed = [a.remove(clock_ms) for a in txn.snapshot.all_files()]
    actions.extend(new_files)
    actions.extend(removed)

    if txn_app_id is not None and txn_version is not None:
        from delta_go_spark.actions import SetTransaction

        actions.append(
            SetTransaction(txn_app_id, txn_version, clock_ms)
        )

    op = operation or (ops.CREATE_TABLE if not exists else ops.WRITE)
    return txn.commit(
        actions,
        op,
        operation_parameters={
            "mode": "Append" if mode == "append" else "Overwrite",
            "partitionBy": json.dumps(partition_by),
        },
    )


def replace_table(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
    configuration: dict[str, str] | None = None,
) -> int:
    """CREATE OR REPLACE TABLE (op/names.go REPLACE_TABLE): ONE atomic
    commit swaps the data, the SCHEMA, the partitioning and the
    configuration — unlike overwrite, which keeps the table's identity
    and only replaces rows.  Allowed to change the schema arbitrarily
    because the commit removes every active file (the reference's
    whole-table-rewrite escape, trnx.go:417-419 — enforced by
    _verify_schema_compat, not trusted here).  History survives: readers
    can still time-travel to pre-replace versions.  Creates the table
    when absent (CREATE OR REPLACE semantics)."""
    from delta_go_spark.store import normalize_table_uri

    table_path = normalize_table_uri(table_path)
    log = DeltaLog.for_table(table_path)
    txn = log.start_transaction()
    # One transaction for BOTH branches: delegating the create path to a
    # second write_dataframe transaction would re-probe existence there, so
    # a table created concurrently in the gap would be silently APPENDED to
    # (keeping the other writer's schema) instead of replaced.  Staying on
    # this txn makes the race a put-if-absent loss -> conflict-checker
    # ConcurrentMetadataUpdate, never a semantic downgrade.
    exists = txn.snapshot is not None and txn.read_version >= 0
    partition_by = list(partition_by or [])
    check_constraints(df, configuration or {})
    clock_ms = log.clock.now_millis()
    new_files = stage_files(df, table_path, partition_by)
    txn.update_metadata(
        Metadata(
            schema_string=schema_to_json(df.schema),
            partition_columns=partition_by,
            configuration=configuration or {},
            created_time=clock_ms,
        )
    )
    if exists:
        # REPLACE promises "the table is now exactly df": that promise
        # reads the whole active set, so a concurrent append must surface
        # as ConcurrentAppend on retry, never survive under the swapped
        # schema — under Serializable even when the commit carries no data
        # change (empty frame over an emptied table).
        # (_verify_schema_compat's rewrite escape also escalates, but only
        # when the schema is incompatible — a same-schema replace needs
        # the declaration here.)
        txn.read_whole_table(require_serializable=True)
    removed = (
        [a.remove(clock_ms) for a in txn.snapshot.all_files()] if exists else []
    )
    return txn.commit(
        [*new_files, *removed],
        ops.REPLACE_TABLE,
        operation_parameters={"partitionBy": json.dumps(partition_by)},
    )
