"""spark.read / readStream format("delta_go") — the Python Data Source
(delta_go_spark/datasource.py)."""

import os

import pytest
from pyspark.sql import functions as F

from delta_go_spark.datasource import register
from delta_go_spark.table import DeltaTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _make_table(spark, path, partitioned=True):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    )
    t = DeltaTable.create(
        spark, path, df, partition_by=["p"] if partitioned else None
    )
    return t


def test_batch_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    _make_table(spark, path)
    got = spark.read.format("delta_go").load(path)
    assert got.count() == 100
    assert {f.name for f in got.schema.fields} == {"k", "p", "v"}
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(100))
    # Partition column materialized with its declared type and values.
    assert got.filter(F.col("p") == "3").count() == 25


def test_batch_partition_pruning_skips_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    _make_table(spark, path)
    pruned = spark.read.format("delta_go").load(path).filter(F.col("p") == "2")
    rows = pruned.collect()
    assert len(rows) == 25 and all(r["k"] % 4 == 2 for r in rows)
    # The scan plans only the matching partition's files.
    from delta_go_spark.datasource import DeltaGoBatchReader, _filter_to_expression
    from pyspark.sql.datasource import EqualTo

    reader = DeltaGoBatchReader(
        spark.read.format("delta_go").load(path).schema, {"path": path}
    )
    list(reader.pushFilters([EqualTo(("p",), "2")]))
    planned = [f for part in reader.partitions() for f in part.files]
    assert 0 < len(planned) < len(DeltaTable(spark, path).log.update().all_files())
    assert all("p=2" in fp or "/p%3D2" in fp for fp, _ in planned)


def test_partition_packing_bounds_task_count(spark, tmp_path):
    path = str(tmp_path / "t_pack")
    _make_table(spark, path, partitioned=True)
    from delta_go_spark.datasource import DeltaGoBatchReader

    schema = spark.read.format("delta_go").load(path).schema
    one_per_file = DeltaGoBatchReader(schema, {"path": path, "maxpartitionbytes": "1"})
    packed = DeltaGoBatchReader(schema, {"path": path})
    n_files = len(one_per_file.partitions())
    assert n_files > 1
    # Tiny files coalesce into far fewer tasks at the default 128MB target.
    assert len(packed.partitions()) < n_files
    # Packing never drops or duplicates a file.
    assert sorted(
        f[0] for part in packed.partitions() for f in part.files
    ) == sorted(f[0] for part in one_per_file.partitions() for f in part.files)


def test_batch_time_travel_option(spark, tmp_path):
    path = str(tmp_path / "t3")
    t = _make_table(spark, path, partitioned=False)
    t.append(spark.range(100, 150).select(
        F.col("id").alias("k"), F.lit("9").alias("p"), F.lit(0.0).alias("v")
    ))
    v0 = spark.read.format("delta_go").option("versionAsOf", 0).load(path)
    assert v0.count() == 100
    latest = spark.read.format("delta_go").load(path)
    assert latest.count() == 150


def test_stream_read_exactly_once_across_commits(spark, tmp_path):
    path = str(tmp_path / "t4")
    t = _make_table(spark, path, partitioned=False)
    t.append(spark.range(100, 130).select(
        F.col("id").alias("k"), F.lit("x").alias("p"), F.lit(1.0).alias("v")
    ))
    t.append(spark.range(130, 140).select(
        F.col("id").alias("k"), F.lit("y").alias("p"), F.lit(2.0).alias("v")
    ))
    out_dir = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = (
        spark.readStream.format("delta_go")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 140
    assert got.select(F.sum("k")).collect()[0][0] == sum(range(140))
    # Restart with no new commits: nothing re-emitted (exactly-once).
    q2 = (
        spark.readStream.format("delta_go")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 140


def test_nopushdown_reader_is_detected_as_unimplemented():
    # Spark treats a reader as "implements pushFilters" iff the bound
    # method's __func__ differs from the base class's; the fallback reader
    # must NOT trip that check (plan_data_source_read.py contract).
    from pyspark.sql.datasource import DataSourceReader

    from delta_go_spark.datasource import _NoPushdownReader

    assert (
        _NoPushdownReader.pushFilters is DataSourceReader.pushFilters
    )


@pytest.mark.parametrize(
    "name",
    [
        "data-reader-primitives",
        "snapshot-data2-deleted",
        "data-reader-partition-values",
    ],
)
def test_datasource_matches_engine_scan_on_goldens(spark, name):
    """format('delta_go') must return exactly what the engine's own
    DeltaScan data plane returns on the reference's golden tables —
    including removed-file exclusion and partition-value typing."""
    from tests.conftest import golden
    from delta_go_spark.log import DeltaLog

    path = golden(name)
    snap = DeltaLog.for_table(path).update()
    want = snap.scan().to_df(spark)
    got = spark.read.format("delta_go").load(path)
    assert got.schema == want.schema
    key = want.columns
    def norm(df):
        return sorted(
            (tuple(str(r[c]) for c in key) for r in df.collect())
        )
    assert norm(got) == norm(want)


def test_stream_partitioned_reader_multi_file_batch(spark, tmp_path):
    """The partitioned DataSourceStreamReader: one trigger spanning several
    commits must plan multiple InputPartitions (executors read per file
    group) and emit each version's rows exactly once, including partition
    columns materialized from AddFile metadata."""
    path = str(tmp_path / "t5")
    t = _make_table(spark, path, partitioned=True)  # several part dirs
    for lo in (100, 200, 300):  # three more commits before the trigger
        t.append(
            spark.range(lo, lo + 50).select(
                F.col("id").alias("k"),
                (F.col("id") % 3).cast("string").alias("p"),
                F.lit(float(lo)).alias("v"),
            )
        )
    # driver-side plan check: the pending range packs into >1 partition
    from delta_go_spark.datasource import DeltaGoStreamReader

    reader = DeltaGoStreamReader(
        spark.read.format("delta_go").load(path).schema,
        {"path": path, "maxpartitionbytes": "1"},  # force one file per task
    )
    start, end = reader.initialOffset(), reader.latestOffset()
    parts = reader.partitions(start, end)
    assert len(parts) > 1
    assert sum(len(p.files) for p in parts) >= 4  # >= one file per commit

    out_dir = str(tmp_path / "sink5")
    chk = str(tmp_path / "chk5")
    q = (
        spark.readStream.format("delta_go")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 100 + 150
    assert got.select(F.sum("k")).collect()[0][0] == (
        sum(range(100)) + sum(range(100, 150)) + sum(range(200, 250)) + sum(range(300, 350))
    )


def test_stream_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger bounds each micro-batch: a 4-commit backlog with
    the limit set drains in multiple batches (availableNow), each advancing
    the version offset, with every row delivered exactly once."""
    path = str(tmp_path / "t6")
    t = _make_table(spark, path, partitioned=False)
    for lo in (100, 200, 300):
        t.append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), F.lit("z").alias("p"), F.lit(1.0).alias("v")
            )
        )
    out_dir = str(tmp_path / "sink6")
    chk = str(tmp_path / "chk6")
    q = (
        spark.readStream.format("delta_go")
        .option("maxFilesPerTrigger", "1")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    assert got.count() == 130
    assert got.select(F.sum("k")).collect()[0][0] == (
        sum(range(100)) + sum(range(100, 110)) + sum(range(200, 210)) + sum(range(300, 310))
    )
    # (availableNow snapshots ONE end offset up front in Spark's wrapper,
    # so the e2e drain above may run as a single batch regardless of the
    # limit; the throttle governs processing-time triggers, whose
    # latestOffset-per-trigger mechanics are asserted below.)

    # Throttle mechanics at the reader level: after initialOffset the
    # offset advances at most ~maxFilesPerTrigger files per trigger; a
    # RESTARTED reader (no initialOffset call) is unthrottled for its
    # first batch by design (position unknown until partitions/commit).
    from delta_go_spark.datasource import DeltaGoStreamReader

    schema = spark.read.format("delta_go").load(path).schema
    reader = DeltaGoStreamReader(schema, {"path": path, "maxfilespertrigger": "1"})
    tip = reader.log.update().version + 1
    assert reader.latestOffset() == {"version": tip}  # restart: unthrottled
    reader.partitions({"version": 0}, {"version": 1})  # engine replays v0
    bounded = reader.latestOffset()["version"]
    assert 1 < bounded < tip  # one version's worth of files, not the tip
    reader.commit({"version": bounded})
    assert reader.latestOffset()["version"] > bounded  # keeps advancing

    fresh = DeltaGoStreamReader(schema, {"path": path, "maxfilespertrigger": "1"})
    fresh.initialOffset()
    assert fresh.latestOffset()["version"] < tip  # fresh stream throttles


def test_restart_catch_up_batch_is_admission_controlled(spark, tmp_path):
    """A restarted reader's first batch covers the whole backlog in ONE
    offset range (the API cannot throttle it), but partitions() caps files
    per task at maxFilesPerTrigger — the catch-up executes as ceil(n/cap)
    bounded tasks, never one unbounded scan."""
    import math

    from delta_go_spark.datasource import DeltaGoStreamReader

    path = str(tmp_path / "t7")
    t = _make_table(spark, path, partitioned=False)
    for lo in (100, 200, 300, 400):
        t.append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"),
                F.lit("z").alias("p"),
                F.lit(1.0).alias("v"),
            )
        )
    schema = spark.read.format("delta_go").load(path).schema
    cap = 2
    reader = DeltaGoStreamReader(
        schema, {"path": path, "maxfilespertrigger": str(cap)}
    )
    tip = reader.log.update().version + 1
    # restart: latestOffset jumps to the tip (offset range unthrottled)
    assert reader.latestOffset() == {"version": tip}
    parts = reader.partitions({"version": 0}, {"version": tip})
    n_files = sum(len(p.files) for p in parts)
    assert n_files >= 5  # the whole backlog is in this one batch
    assert all(len(p.files) <= cap for p in parts)
    assert len(parts) == math.ceil(n_files / cap)
    # every row still delivered exactly once across the partitions
    seen = [f for p in parts for f in p.files]
    assert len(seen) == len({f[0] for f in seen})


def test_starting_timestamp_resolves_first_commit_at_or_after(spark, tmp_path):
    """startingTimestamp (epoch millis) picks the first commit at or after
    the time — Delta's streaming option — for both the stream reader and
    the CDF batch reader; a future timestamp yields an empty stream."""
    import os
    import time

    from delta_go_spark.datasource import DeltaGoStreamReader, _starting_version
    from delta_go_spark.log import DeltaLog

    path = str(tmp_path / "t8")
    t = _make_table(spark, path, partitioned=False)
    # space the commits out in mtime so timestamps are distinguishable
    log_dir = os.path.join(path, "_delta_log")
    for lo in (100, 200):
        t.append(
            spark.range(lo, lo + 5).select(
                F.col("id").alias("k"), F.lit("z").alias("p"), F.lit(1.0).alias("v")
            )
        )
    # force distinct, known commit mtimes: v0=1000s, v1=2000s, v2=3000s
    for v, ts in ((0, 1000), (1, 2000), (2, 3000)):
        f = os.path.join(log_dir, f"{v:020d}.json")
        os.utime(f, (ts, ts))

    log = DeltaLog.for_table(path)
    assert _starting_version(log, {"startingtimestamp": str(1500 * 1000)}) == (1, True)
    assert _starting_version(log, {"startingtimestamp": str(2000 * 1000)}) == (1, True)
    assert _starting_version(log, {"startingtimestamp": str(2500 * 1000)}) == (2, True)
    # future timestamp: starts past the tip
    future = int((time.time() + 3600) * 1000)
    assert _starting_version(log, {"startingtimestamp": str(future)}) == (log.update().version + 1, True)
    # conflicting options are rejected, not silently resolved
    with pytest.raises(ValueError, match="mutually exclusive"):
        _starting_version(
            log, {"startingversion": "0", "startingtimestamp": str(2500 * 1000)}
        )

    schema = spark.read.format("delta_go").load(path).schema
    reader = DeltaGoStreamReader(
        schema, {"path": path, "startingtimestamp": str(2500 * 1000)}
    )
    assert reader.initialOffset() == {"version": 2}


def test_cdf_reader_past_tip_semantics(spark, tmp_path):
    """Batch CDF via format('delta_go'): a startingTimestamp past the tip
    is a legitimate empty feed, but an EXPLICIT startingVersion past the
    tip must raise (a typo'd version must never read as empty) — and
    localization of change files is deferred until after pruning."""
    from delta_go_spark.datasource import DeltaGoCDFReader
    from delta_go_spark.snapshot import DeltaError

    path = str(tmp_path / "cdf_tip")
    DeltaTable.create(
        spark,
        path,
        spark.range(5).select(F.col("id").alias("k")),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    schema = (
        spark.read.format("delta_go")
        .option("readChangeFeed", "true")
        .load(path)
        .schema
    )
    future_ts = str(4102444800 * 1000)  # year 2100
    empty = DeltaGoCDFReader(
        schema, {"path": path, "startingtimestamp": future_ts}
    )
    assert [f for p in empty.partitions() for f in p.files] == []
    with pytest.raises(DeltaError):
        DeltaGoCDFReader(schema, {"path": path, "startingversion": "99"})
    # in-range explicit version still plans files
    ok = DeltaGoCDFReader(schema, {"path": path, "startingversion": "0"})
    assert len([f for p in ok.partitions() for f in p.files]) > 0


def _fast_commits(table_path, lo, hi):
    """Append commits [lo, hi) directly through the log machinery — one
    tiny single-row parquet per commit, no Spark jobs — so depth-100
    backlogs build in seconds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_go_spark.actions import AddFile, Metadata
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.types import schema_to_json
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType(), True)])
    log = DeltaLog.for_table(table_path)
    for i in range(lo, hi):
        name = f"part-{i:05d}.parquet"
        local = os.path.join(table_path, name)
        pq.write_table(pa.table({"k": pa.array([i], pa.int64())}), local)
        txn = log.start_transaction()
        if txn.snapshot is None or txn.read_version < 0:
            txn.update_metadata(Metadata(schema_string=schema_to_json(schema)))
        txn.commit(
            [
                AddFile(
                    path=name,
                    size=os.path.getsize(local),
                    modification_time=0,
                    data_change=True,
                )
            ],
            "WRITE",
        )


def _offset_versions(chk):
    """The per-batch end offsets Spark checkpointed (offsets/<batchId>)."""
    import json

    out = []
    odir = os.path.join(chk, "offsets")
    for name in sorted(os.listdir(odir), key=lambda n: int(n) if n.isdigit() else -1):
        if not name.isdigit():
            continue
        with open(os.path.join(odir, name)) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        out.append((int(name), json.loads(lines[-1])["version"]))
    return out


def test_deep_backlog_restart_bounded_batches_exactly_once(spark, tmp_path):
    """Depth test for the streaming admission control: a 100-commit
    backlog that builds up WHILE the stream runs drains in
    maxFilesPerTrigger-bounded offset steps; 100 more commits land while
    the stream is down; the restarted stream's single catch-up range is
    size-packed into capped tasks (the Python DS API cannot throttle the
    first offset of a (re)start — see latestOffset), and every row
    arrives exactly once."""
    import time

    path = str(tmp_path / "deep")
    os.makedirs(path)
    _fast_commits(path, 0, 1)

    out_dir = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def drain_until(target):
        q = (
            spark.readStream.format("delta_go")
            .option("maxFilesPerTrigger", "10")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 240
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out_dir).count() >= target:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(0.5)
        finally:
            q.stop()

    # backlog builds WHILE the stream runs: after batch 0 the reader
    # knows its position, so every subsequent batch is offset-throttled
    def drain_and_backfill():
        q = (
            spark.readStream.format("delta_go")
            .option("maxFilesPerTrigger", "10")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out_dir).count() >= 1:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
            _fast_commits(path, 1, 101)
            deadline = time.time() + 240
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out_dir).count() >= 101:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()

    drain_and_backfill()
    got = spark.read.parquet(out_dir)
    assert got.count() == 101
    assert got.select("k").distinct().count() == 101

    # post-batch-0 offsets advanced <= ~cap versions each (1 file per
    # commit): the deep backlog drained as many bounded batches
    offs = _offset_versions(chk)
    assert len(offs) >= 9, offs
    prev = None
    for _batch, v in offs:
        if prev is not None and prev >= 1:
            assert v - prev <= 11, offs
        prev = v

    # stream down; 100 more commits pile up
    _fast_commits(path, 101, 201)

    # the restarted reader's single catch-up offset range is planned as
    # capped tasks (admission control at partitions())
    from delta_go_spark.datasource import DeltaGoStreamReader

    schema = spark.read.format("delta_go").load(path).schema
    reader = DeltaGoStreamReader(
        schema, {"path": path, "maxfilespertrigger": "10"}
    )
    tip = reader.log.update().version + 1
    parts = reader.partitions({"version": 101}, {"version": tip})
    assert sum(len(pt.files) for pt in parts) == 100
    assert all(len(pt.files) <= 10 for pt in parts)
    assert len(parts) >= 10

    n_batches_before = len(offs)
    drain_until(201)
    got = spark.read.parquet(out_dir)
    assert got.count() == 201                     # exactly once, no loss
    assert got.select("k").distinct().count() == 201
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(201))
    assert len(_offset_versions(chk)) > n_batches_before
