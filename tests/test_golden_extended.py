"""Extended golden-table coverage: time travel, reader tables, replay edge
cases, and the reference's log-store fixtures (reference tests:
log_timetravel_test.go, log_test.go:542-880, store tests).
"""

import os

import pytest

from delta_go_spark.log import DeltaLog
from delta_go_spark.snapshot import DeltaError
from delta_go_spark.store import LocalStore
from tests.conftest import golden


# ---------------------------------------------------------------------------
# Time travel (log_timetravel_test.go:67-266)
@pytest.mark.parametrize(
    "name,n_versions",
    [
        ("time-travel-start", 1),
        ("time-travel-start-start20", 2),
        ("time-travel-start-start20-start40", 3),
    ],
)
def test_time_travel_version_pinning(name, n_versions):
    log = DeltaLog.for_table(golden(name))
    snap = log.snapshot()
    assert snap.version == n_versions - 1
    for v in range(n_versions):
        pinned = log.snapshot_for_version_as_of(v)
        assert pinned.version == v
        assert pinned.num_of_files() > 0
    with pytest.raises(DeltaError):
        log.snapshot_for_version_as_of(n_versions)
    with pytest.raises(DeltaError):
        log.snapshot_for_version_as_of(-1)


def test_time_travel_file_count_grows():
    """Each 'start' batch adds files: later versions see strictly more."""
    log = DeltaLog.for_table(golden("time-travel-start-start20-start40"))
    counts = [log.snapshot_for_version_as_of(v).num_of_files() for v in range(3)]
    assert counts == sorted(counts)
    assert counts[0] < counts[-1]


def test_time_travel_timestamp_bounds():
    """Timestamp resolution uses commit-file mtimes
    (history_manager.go:68-104): before-first errors, after-last errors
    (can_return_last only for explicit boundary lookups)."""
    path = golden("time-travel-start-start20")
    log = DeltaLog.for_table(path)
    log_dir = os.path.join(path, "_delta_log")
    mtimes = sorted(
        int(os.stat(os.path.join(log_dir, f)).st_mtime * 1000)
        for f in os.listdir(log_dir)
        if f.endswith(".json")
    )
    with pytest.raises(DeltaError):
        log.snapshot_for_timestamp_as_of(mtimes[0] - 10_000)
    snap0 = log.snapshot_for_timestamp_as_of(mtimes[0])
    assert snap0.version == 0


@pytest.mark.parametrize("name", ["time-travel-schema-changes-a", "time-travel-schema-changes-b"])
def test_time_travel_schema_changes_tables_load(name):
    log = DeltaLog.for_table(golden(name))
    snap = log.snapshot()
    assert snap.metadata().schema() is not None
    assert snap.num_of_files() > 0


def test_time_travel_partition_changes_old_schema():
    """-a and -b are the same table before/after a partition change; each
    loads with its own partitioning (log_timetravel_test.go partition
    cases)."""
    pa = DeltaLog.for_table(golden("time-travel-partition-changes-a")).snapshot()
    pb = DeltaLog.for_table(golden("time-travel-partition-changes-b")).snapshot()
    assert pa.metadata() is not None and pb.metadata() is not None


# ---------------------------------------------------------------------------
# Replay edge cases
def test_delete_re_add_same_file():
    """add foo / remove foo / re-add foo / add bar across 4 txns ⇒ active
    set is exactly {foo, bar} (replay_action.go:89-111 newest-wins)."""
    log = DeltaLog.for_table(golden("delete-re-add-same-file-different-transactions"))
    snap = log.snapshot()
    assert sorted(a.path for a in snap.all_files()) == ["bar", "foo"]


def test_iterator_bug_125():
    """125-iterator-bug: 12 commits + checkpoint at 10; the add from every
    commit must survive the segment stitch (json tail + checkpoint)."""
    log = DeltaLog.for_table(golden("125-iterator-bug"))
    snap = log.snapshot()
    assert snap.version == 11
    assert snap.num_of_files() > 0


def test_decimal_decode_bug_124(spark):
    """124-decimal-decode-bug: decimal-typed table reads end-to-end."""
    log = DeltaLog.for_table(golden("124-decimal-decode-bug"))
    snap = log.snapshot()
    dtypes = {f.name: f.dataType.simpleString() for f in snap.metadata().schema().fields}
    assert any(t.startswith("decimal") for t in dtypes.values())
    rows = snap.to_df(spark).collect()
    assert len(rows) > 0


# ---------------------------------------------------------------------------
# Reader tables: schema + data-plane reads
@pytest.mark.parametrize(
    "name",
    [
        "data-reader-array-primitives",
        "data-reader-array-complex-objects",
        "data-reader-map",
        "data-reader-escaped-chars",
    ],
)
def test_reader_tables_read_end_to_end(spark, name):
    snap = DeltaLog.for_table(golden(name)).snapshot()
    df = snap.to_df(spark)
    assert df.count() > 0
    assert df.schema == snap.to_df(spark).schema


@pytest.mark.parametrize(
    "tz",
    [
        "UTC",
        "PST",
        "JST",
        "America/Los_Angeles",
        "Asia/Beirut",
        "Etc/GMT+9",
        "Iceland",
    ],
)
def test_date_types_tables(spark, tz):
    """data-reader-date-types-*: timestamp data written under 7 writer time
    zones; our reader must load all of them (values differ by design —
    the instant is what was written locally in that zone)."""
    snap = DeltaLog.for_table(golden(f"data-reader-date-types-{tz}")).snapshot()
    rows = snap.to_df(spark).collect()
    assert len(rows) > 0


# ---------------------------------------------------------------------------
# Store fixtures (reference store tests)
def test_log_store_read_fixture():
    base = golden("log-store-read")
    store = LocalStore(base)
    assert store.read(os.path.join(base, "0")) == ["zero", "none"]
    assert store.read(os.path.join(base, "1")) == ["one"]


def test_log_store_list_from_fixture():
    base = golden("log-store-listFrom")
    store = LocalStore(base)
    names = [os.path.basename(m.path) for m in store.list_from(os.path.join(base, "2"))]
    assert names == ["2", "3"]
    assert [
        os.path.basename(m.path) for m in store.list_from(os.path.join(base, "0"))
    ] == ["1", "2", "3"]


# ---------------------------------------------------------------------------
# Hive-layout golden tables + deleted-directory behavior
def test_update_deleted_directory_reports_nonexistent(tmp_path):
    """log_test.go:403-421: after the table directory vanishes, Update()
    reports version -1 (nonexistent), not an exception."""
    import shutil

    src = golden("update-deleted-directory")
    dst = str(tmp_path / "gone")
    shutil.copytree(src, dst)
    log = DeltaLog.for_table(dst)
    shutil.rmtree(dst)
    assert not log.table_exists()


def test_hive_partition_prune_end_to_end(spark):
    """hive/deltatbl-partition-prune: date+city partitioned; a date
    predicate must keep only that date's files and rows."""
    from pyspark.sql.types import StringType

    from delta_go_spark.expressions import Column, EqualTo, Literal

    snap = DeltaLog.for_table(golden("hive/deltatbl-partition-prune")).snapshot()
    scan = snap.scan(EqualTo(Column("date", StringType()), Literal("20180512")))
    kept = list(scan.files())
    assert 0 < len(kept) < snap.num_of_files()
    assert all(a.partition_values.get("date") == "20180512" for a in kept)
    rows = scan.to_df(spark).collect()
    assert rows and all(r["date"] == "20180512" for r in rows)


@pytest.mark.parametrize(
    "name", ["hive/deltatbl-partitioned", "hive/deltatbl-non-partitioned"]
)
def test_hive_tables_read(spark, name):
    snap = DeltaLog.for_table(golden(name)).snapshot()
    assert snap.to_df(spark).count() > 0


def test_hive_special_chars_partition_values(spark):
    """Partition directory 'c2=+ %3D%250': URL-decoded partition values
    must round-trip through the log ('+ =%0')."""
    snap = DeltaLog.for_table(
        golden("hive/deltatbl-special-chars-in-partition-column")
    ).snapshot()
    vals = {a.partition_values.get("c2") for a in snap.all_files()}
    assert any("=" in (v or "") for v in vals)
    df = snap.to_df(spark)
    got = {r["c2"] for r in df.select("c2").distinct().collect()}
    assert got == vals


def test_hive_case_insensitive_column_names(spark):
    snap = DeltaLog.for_table(
        golden("hive/deltatbl-column-names-case-insensitive")
    ).snapshot()
    assert snap.to_df(spark).count() > 0


def test_absolute_escaped_paths_canonicalize():
    """data-reader-absolute-paths-escaped-chars (log_test.go:542-644
    family): one absolute path and one percent-encoded relative path; the
    table has no Metadata action by design, so this exercises path
    canonicalization straight off the change feed."""
    from delta_go_spark.actions import AddFile
    from delta_go_spark.snapshot import canonicalize_path

    table = golden("data-reader-absolute-paths-escaped-chars")
    log = DeltaLog.for_table(table)
    adds = [
        a
        for vl in log.changes(0)
        for a in vl.actions
        if isinstance(a, AddFile)
    ]
    assert len(adds) == 2
    canon = {canonicalize_path(a.path, table) for a in adds}
    # percent-encoded name decodes; both land under SOME absolute location
    assert any(p.endswith("bar-bar.snappy.parquet") for p in canon)
    assert all(p.startswith("file://") or os.path.isabs(p) for p in canon)


def test_nullable_field_invalid_schema_key_loads():
    """data-reader-nullable-field-invalid-schema-key: metadata carries an
    unexpected schema-metadata key; the reader must tolerate it."""
    snap = DeltaLog.for_table(
        golden("data-reader-nullable-field-invalid-schema-key")
    ).snapshot()
    assert snap.metadata().schema() is not None
    assert snap.num_of_files() > 0


def test_earliest_reproducible_rejects_gap_targets(tmp_path):
    """A v0 delta file alone does not make every later version reproducible:
    with a gap (0,1,2,_,4,5) time travel to 4 must fail the bounds check
    up front (clear out-of-range error), not deep in replay.  A complete
    checkpoint after the gap re-anchors the tail.
    (Stricter than reference history_manager.go:158-160, which returns 0
    unconditionally — see earliest_reproducible_version NOTE.)"""
    import json
    import shutil

    src = golden("time-travel-start-start20-start40")  # versions 0,1,2
    path = str(tmp_path / "gap")
    shutil.copytree(src, path)
    log_dir = os.path.join(path, "_delta_log")

    # extend the log: 3 (then removed -> gap), 4, 5 as empty-ish commits
    def fake_commit(v):
        with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
            f.write(json.dumps({"commitInfo": {"timestamp": 1000 + v}}) + "\n")

    for v in (3, 4, 5):
        fake_commit(v)
    os.remove(os.path.join(log_dir, f"{3:020d}.json"))

    log = DeltaLog.for_table(path)
    with pytest.raises(DeltaError, match="reproducible|gap"):
        log.history.earliest_reproducible_version()

    # a complete (empty) checkpoint at 4 re-anchors versions 4..5
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_go_spark.checkpoint import CHECKPOINT_SCHEMA

    pq.write_table(
        pa.table({f.name: [] for f in CHECKPOINT_SCHEMA}, schema=CHECKPOINT_SCHEMA),
        os.path.join(log_dir, f"{4:020d}.checkpoint.parquet"),
    )
    assert DeltaLog.for_table(path).history.earliest_reproducible_version() == 4


# ---------------------------------------------------------------------------
# data-reader-date-types-*: the delta-io golden corpus writes the same local
# wall time (2020-01-01 08:09:10) under seven session time zones, producing
# seven different stored UTC instants.  The engine must read the ON-DISK
# instant and the (time-zone-free) date unmangled in every variant.
@pytest.mark.parametrize(
    "tz_name,expected_utc",
    [
        ("America/Los_Angeles", "2020-01-01 16:09:10"),  # UTC-8 that day
        ("Asia/Beirut", "2020-01-01 06:09:10"),          # UTC+2 that day
        ("Etc/GMT+9", "2020-01-01 17:09:10"),            # POSIX: GMT+9 == UTC-9
        ("Iceland", "2020-01-01 08:09:10"),   # UTC+0
        ("JST", "2019-12-31 23:09:10"),       # UTC+9
        ("PST", "2020-01-01 16:09:10"),       # UTC-8
        ("UTC", "2020-01-01 08:09:10"),
    ],
)
def test_data_reader_date_types(tz_name, expected_utc):
    import glob

    import pyarrow.parquet as pq

    path = golden(f"data-reader-date-types-{tz_name}")
    snap = DeltaLog.for_table(path).snapshot()
    files = snap.all_files()
    assert files, tz_name
    rows = []
    for add in files:
        t = pq.read_table(os.path.join(path, add.decoded_path()))
        rows.extend(t.to_pylist())
    assert len(rows) == 1
    row = rows[0]
    assert str(row["date"]) == "2020-01-01"
    assert str(row["timestamp"]) == expected_utc
