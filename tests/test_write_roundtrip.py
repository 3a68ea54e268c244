"""End-to-end data plane: DataFrame -> Delta table -> DataFrame, with
overwrite, partitioning, time travel (explicit commit mtimes), stats."""

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_go_spark.expressions import Column, EqualTo, Literal
from delta_go_spark.log import DeltaLog
from delta_go_spark.snapshot import DeltaError
from delta_go_spark.table import DeltaTable
from delta_go_spark.writer import write_dataframe


def test_append_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    v = write_dataframe(df, path)
    assert v == 0
    t = DeltaTable.for_path(spark, path)
    out = t.to_df()
    assert out.count() == 100
    assert {f.name for f in out.schema.fields} == {"k", "v"}
    v2 = t.append(df.filter(F.col("k") < 10))
    assert v2 == 1
    assert t.to_df().count() == 110


def test_overwrite_replaces_active_set(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = DeltaTable.create(spark, path, df)
    t.overwrite(spark.range(100, 120).select(F.col("id").alias("k")))
    rows = sorted(r["k"] for r in t.to_df().collect())
    assert rows == list(range(100, 120))
    # old files tombstoned, not active
    snap = t.log.update()
    assert snap.num_of_files() > 0
    assert len(snap.tombstones()) > 0


def test_partitioned_write_and_prune(spark, tmp_path):
    from pyspark.sql.types import LongType

    path = str(tmp_path / "t3")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    write_dataframe(df, path, partition_by=["p"])
    log = DeltaLog.for_table(path)
    snap = log.snapshot()
    assert snap.metadata().partition_columns == ["p"]
    assert all(set(a.partition_values) == {"p"} for a in snap.all_files())

    scan = snap.scan(EqualTo(Column("p", LongType()), Literal(2)))
    pruned = list(scan.files())
    assert 0 < len(pruned) < snap.num_of_files()
    out = scan.to_df(spark)
    assert {r["p"] for r in out.select("p").collect()} == {2}
    assert out.count() == 25


def test_stats_recorded(spark, tmp_path):
    path = str(tmp_path / "t4")
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    write_dataframe(df, path)
    snap = DeltaLog.for_table(path).snapshot()
    stats = [json.loads(a.stats) for a in snap.all_files() if a.stats]
    assert stats
    assert sum(s["numRecords"] for s in stats) == 1000
    assert min(s["minValues"]["k"] for s in stats) == 0
    assert max(s["maxValues"]["k"] for s in stats) == 999


def test_time_travel_versions_and_timestamps(spark, tmp_path):
    path = str(tmp_path / "t5")
    t = None
    for i in range(3):
        df = spark.range(i * 10, (i + 1) * 10).select(F.col("id").alias("k"))
        if t is None:
            t = DeltaTable.create(spark, path, df)
        else:
            t.append(df)
    log = DeltaLog.for_table(path)
    # pin commit mtimes 20 minutes apart (fixture F10 pattern)
    base = 1_540_415_658
    for v in range(3):
        p = os.path.join(log.log_path, f"{v:020d}.json")
        os.utime(p, (base + v * 1200, base + v * 1200))

    assert t.version_as_of(0).count() == 10
    assert t.version_as_of(1).count() == 20
    assert t.version_as_of(2).count() == 30
    with pytest.raises(DeltaError):
        log.snapshot_for_version_as_of(3)
    with pytest.raises(DeltaError):
        log.snapshot_for_version_as_of(-1)

    ms = lambda s: s * 1000
    # between v0 and v1 -> v0; exactly v1 -> v1; after last -> error
    assert log.snapshot_for_timestamp_as_of(ms(base + 600)).version == 0
    assert log.snapshot_for_timestamp_as_of(ms(base + 1200)).version == 1
    with pytest.raises(DeltaError):
        log.snapshot_for_timestamp_as_of(ms(base + 3 * 1200))
    with pytest.raises(DeltaError):
        log.snapshot_for_timestamp_as_of(ms(base - 100))


def test_checkpoint_roundtrip_with_data(spark, tmp_path):
    path = str(tmp_path / "t6")
    df0 = spark.range(0, 10).select(F.col("id").alias("k"))
    t = DeltaTable.create(spark, path, df0)
    # drive past the default checkpoint interval? use explicit interval
    for i in range(12):
        t.append(spark.range(100 + i, 101 + i).select(F.col("id").alias("k")))
    log = DeltaLog.for_table(path)
    snap = log.snapshot()
    assert snap.version == 12
    assert snap.segment.checkpoint_version == 10
    assert t.to_df().count() == 22
    history = t.history()
    assert history[0].operation in ("CREATE TABLE", "WRITE")


def test_changes_feed_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t7")
    t = DeltaTable.create(spark, path, spark.range(0, 5).select(F.col("id").alias("k")))
    t.append(spark.range(5, 9).select(F.col("id").alias("k")))
    log = DeltaLog.for_table(path)
    logs = list(log.changes(0))
    assert [vl.version for vl in logs] == [0, 1]
    from delta_go_spark.actions import AddFile

    adds1 = [a for a in logs[1].actions if isinstance(a, AddFile)]
    assert adds1 and all(a.data_change for a in adds1)


def test_tombstone_retention_expiry(spark, tmp_path):
    """Tombstones expire after deletedFileRetentionDuration
    (replay_action.go:53-61): with the clock advanced past the window,
    state() no longer carries them; active files are unaffected."""
    from delta_go_spark.config import FixedClock

    path = str(tmp_path / "texp")
    df = spark.range(10).select(F.col("id").alias("k"))
    write_dataframe(df, path)
    t = DeltaTable.for_path(spark, path)
    t.overwrite(spark.range(5).select(F.col("id").alias("k")))

    now = DeltaLog.for_table(path).clock.now_millis()
    fresh = DeltaLog(path, clock=FixedClock(now)).update()
    assert len(fresh.tombstones()) > 0

    week = 7 * 24 * 3600 * 1000
    later = DeltaLog(path, clock=FixedClock(now + week + 60_000)).update()
    assert later.tombstones() == []
    assert later.num_of_files() == fresh.num_of_files()
    assert later.to_df(spark).count() == 5


def test_not_null_invariant_enforced(spark, tmp_path):
    """minWriterVersion 2 requires NOT NULL enforcement: an append with
    nulls in a non-nullable column must abort (no new version, staged
    files cleaned up)."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    path = str(tmp_path / "tnn")
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("note", StringType(), True),
        ]
    )
    ok = spark.createDataFrame([(1, "a"), (2, None)], schema)
    write_dataframe(ok, path)
    v0_files = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }

    bad = spark.createDataFrame([(None, "x")], StructType(
        [StructField("k", LongType(), True), StructField("note", StringType(), True)]
    ))
    with pytest.raises(DeltaError, match="NOT NULL"):
        write_dataframe(bad, path)
    log = DeltaLog.for_table(path)
    assert log.update().version == 0  # nothing committed
    # staged files from the failed write were removed
    on_disk = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert on_disk == v0_files
    # nullable column may carry nulls freely
    write_dataframe(spark.createDataFrame([(3, None)], schema), path)
    assert log.update().version == 1


def test_merge_schema_append_evolves_table(spark, tmp_path):
    """mergeSchema: appending a frame with a new column evolves the table
    schema in the same commit (new column nullable; old files read null);
    without the flag, unknown columns raise instead of silently vanishing
    at read time."""
    import pytest

    from delta_go_spark.snapshot import DeltaError
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tms")
    base = spark.range(0, 10).select(F.col("id").alias("k"))
    DeltaTable.create(spark, path, base)
    t = DeltaTable.for_path(spark, path)
    wide = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
    )
    with pytest.raises(DeltaError, match="merge_schema"):
        t.append(wide)
    t.append(wide, merge_schema=True)

    t2 = DeltaTable.for_path(spark, path)
    fields = {f.name: f for f in t2.log.update().metadata().schema().fields}
    assert set(fields) == {"k", "extra"}
    assert fields["extra"].nullable
    got = {r["k"]: r["extra"] for r in t2.to_df().collect()}
    assert len(got) == 15
    assert got[0] is None and got[12] == 24  # old files read null


def test_idempotent_write_with_txn_version(spark, tmp_path):
    """(app_id, version) dedup: a retried job commit is a no-op, like the
    reference's TxnVersion idempotency (trnx.go)."""
    from delta_go_spark.table import DeltaTable
    from delta_go_spark.writer import write_dataframe

    path = str(tmp_path / "tidem")
    base = spark.range(0, 10).select(F.col("id").alias("k"))
    DeltaTable.create(spark, path, base)
    batch = spark.range(10, 20).select(F.col("id").alias("k"))
    v1 = write_dataframe(batch, path, txn_app_id="job-7", txn_version=1)
    # the retry: same tokens, must not duplicate rows or advance the log
    v2 = write_dataframe(batch, path, txn_app_id="job-7", txn_version=1)
    t = DeltaTable.for_path(spark, path)
    assert t.to_df().count() == 20
    assert t.log.update().version == v1 and v2 <= v1
    # the NEXT batch id commits normally
    write_dataframe(
        spark.range(20, 25).select(F.col("id").alias("k")),
        path, txn_app_id="job-7", txn_version=2,
    )
    assert DeltaTable.for_path(spark, path).to_df().count() == 25


def test_not_null_case_spelling_and_absent_column(spark, tmp_path):
    """NOT NULL enforcement must survive the case-insensitive field
    contract: a frame spelling the required column differently, or
    omitting it entirely, must still violate — footer stats are keyed by
    the FRAME's spelling and a missing column materializes as NULL."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from delta_go_spark.writer import commit_staged_adds, stage_files

    path = str(tmp_path / "tnn_case")
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("note", StringType(), True),
        ]
    )
    write_dataframe(spark.createDataFrame([(1, "a")], schema), path)

    # case-different spelling with NULLs: stats carry key 'K'
    bad = spark.createDataFrame(
        [(None, "x")],
        StructType(
            [
                StructField("K", LongType(), True),
                StructField("note", StringType(), True),
            ]
        ),
    )
    adds = stage_files(bad, path, [])
    with pytest.raises(DeltaError, match="NOT NULL"):
        commit_staged_adds(path, adds, bad.schema)

    # required column absent from the frame altogether
    only_note = spark.createDataFrame(
        [("y",)], StructType([StructField("note", StringType(), True)])
    )
    adds2 = stage_files(only_note, path, [])
    with pytest.raises(DeltaError, match="missing from the written"):
        commit_staged_adds(path, adds2, only_note.schema)
    assert DeltaLog.for_table(path).update().version == 0


def test_replace_table_swaps_schema_and_partitioning(spark, tmp_path):
    """CREATE OR REPLACE: one commit changes data, schema AND partitioning;
    history keeps the pre-replace generation readable."""
    from pyspark.sql import functions as F

    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "rep")
    v0 = spark.range(0, 10).select("id", (F.col("id") * 2).alias("a"))
    DeltaTable.create(spark, path, v0)
    new = spark.range(0, 6).select(
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 100).alias("metric"),
    )
    t = DeltaTable.replace(spark, path, new, partition_by=["p"])
    meta = t.log.snapshot().metadata()
    assert meta.partition_columns == ["p"]
    assert {f.name for f in meta.schema().fields} == {"p", "metric"}
    assert t.to_df().count() == 6
    # time travel to the pre-replace schema still works
    old = t.version_as_of(0)
    assert {c for c in old.columns} == {"id", "a"} and old.count() == 10
    hist = [h.operation for h in t.history()]
    assert hist[-1] == "REPLACE TABLE"
    # replace on a missing path CREATES (CREATE OR REPLACE semantics),
    # in ONE transaction (no second existence probe a racer could exploit)
    path2 = str(tmp_path / "rep2")
    t2 = DeltaTable.replace(spark, path2, new, partition_by=["p"])
    assert t2.to_df().count() == 6
    assert [h.operation for h in t2.history()] == ["REPLACE TABLE"]


def test_replace_table_on_emptied_table(spark, tmp_path):
    """A table whose rows were ALL deleted has zero active files; replacing
    it with an incompatible schema is trivially a whole-table rewrite and
    must succeed (regression: the removes == all_files escape used to
    require a non-empty remove set)."""
    from pyspark.sql import functions as F

    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "rep_empty")
    v0 = spark.range(0, 4).select("id", (F.col("id") * 2).alias("a"))
    DeltaTable.create(spark, path, v0)
    t = DeltaTable.for_path(spark, path)
    t.delete_where("id >= 0")
    assert t.to_df().count() == 0
    new = spark.range(0, 3).select(F.col("id").cast("string").alias("label"))
    t2 = DeltaTable.replace(spark, path, new)
    assert t2.to_df().columns == ["label"] and t2.to_df().count() == 3


def test_upgrade_protocol_guards_and_commits(spark, tmp_path):
    from delta_go_spark.snapshot import DeltaError
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "proto")
    DeltaTable.create(spark, path, spark.range(0, 3))
    t = DeltaTable.for_path(spark, path)
    cur = t.log.snapshot().protocol()
    assert (cur.min_reader_version, cur.min_writer_version) == (1, 2)
    # no-op re-assert of the same floor commits cleanly
    v = t.upgrade_protocol(1, 2)
    assert v == t.log.update().version
    assert t.log.snapshot().protocol().min_writer_version == 2
    with pytest.raises(DeltaError, match="downgrade"):
        t.upgrade_protocol(1, 1)
    # mixed raise/lower is STILL a downgrade for the lowered component
    # (regression: lexicographic tuple compare let (2, 1) past a (1, 2)
    # table because (2, 1) > (1, 2))
    with pytest.raises(DeltaError, match="downgrade"):
        t.upgrade_protocol(2, 1)
    # raising past the engine's own support is refused (backstop pin)
    with pytest.raises(DeltaError, match="pinned|unsupported"):
        t.upgrade_protocol(3, 7)
    # table remains fully usable after the protocol commit
    assert DeltaTable.for_path(spark, path).to_df().count() == 3


def test_replace_and_overwrite_conflict_with_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """REPLACE and whole-table OVERWRITE promise 'the table is now exactly
    df'; both must declare a whole-table read so a file appended by a
    concurrent winner raises ConcurrentAppend on retry instead of
    silently surviving the rewrite (regression: neither set read flags,
    so conflict rule 3 never fired)."""
    import delta_go_spark.writer as W
    from delta_go_spark.table import DeltaTable
    from delta_go_spark.transaction import ConcurrentAppendError

    path = str(tmp_path / "race")
    DeltaTable.create(spark, path, spark.range(0, 4).select("id"))

    real = W.stage_files
    state = {"armed": True}

    def sneaky(df, table_path, partition_by):
        # fire once: a concurrent append lands between the rewriting txn's
        # snapshot and its commit
        if state["armed"]:
            state["armed"] = False
            W.write_dataframe(spark.range(100, 102).select("id"), path)
        return real(df, table_path, partition_by)

    monkeypatch.setattr(W, "stage_files", sneaky)
    with pytest.raises(ConcurrentAppendError):
        W.replace_table(spark.range(0, 2).select("id"), path)

    state["armed"] = True
    with pytest.raises(ConcurrentAppendError):
        W.write_dataframe(spark.range(0, 2).select("id"), path, mode="overwrite")

    # only the winners' appends are visible (4 seed + 2 + 2); the losers'
    # staged-but-uncommitted rewrites must not be
    monkeypatch.setattr(W, "stage_files", real)
    assert DeltaTable.for_path(spark, path).to_df().count() == 8

    # hardest variant: replace an EMPTIED table with an EMPTY frame — the
    # commit carries no data-change action, so only the Serializable
    # escalation makes the concurrent append conflict
    path2 = str(tmp_path / "race2")
    t2 = DeltaTable.create(spark, path2, spark.range(0, 3).select("id"))
    t2.delete_where("id >= 0")
    state["armed"] = True

    def sneaky2(df, table_path, partition_by):
        if state["armed"]:
            state["armed"] = False
            W.write_dataframe(spark.range(50, 52).select("id"), path2)
        return real(df, table_path, partition_by)

    monkeypatch.setattr(W, "stage_files", sneaky2)
    with pytest.raises(ConcurrentAppendError):
        W.replace_table(spark.range(0, 0).select("id"), path2)


def test_truncate_and_restore_conflict_with_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """TRUNCATE of an already-empty table and a no-op-diff RESTORE commit
    zero data-change actions; only the require_serializable escalation in
    read_whole_table makes a concurrent append conflict (regression guard
    for the isolation auto-pick gap)."""
    from delta_go_spark.transaction import (
        ConcurrentAppendError,
        OptimisticTransaction,
    )

    path = str(tmp_path / "trc")
    t = DeltaTable.create(spark, path, spark.range(0, 4).select("id"))
    t.delete_where("id >= 0")  # table now empty: truncate stages no removes

    real = OptimisticTransaction.read_whole_table
    state = {"armed": False}

    def sneaky(self, require_serializable=False):
        real(self, require_serializable=require_serializable)
        if state["armed"]:
            state["armed"] = False
            write_dataframe(spark.range(50, 52).select("id"), path)

    monkeypatch.setattr(OptimisticTransaction, "read_whole_table", sneaky)
    state["armed"] = True
    with pytest.raises(ConcurrentAppendError):
        DeltaTable.for_path(spark, path).truncate()

    # RESTORE to the current version: empty diff, no data-change action
    cur = DeltaLog.for_table(path).update().version
    state["armed"] = True
    with pytest.raises(ConcurrentAppendError):
        DeltaTable.for_path(spark, path).restore(cur)
