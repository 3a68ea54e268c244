"""Native cloud pass-through (datacloud.py): with a Hadoop connector
present for the table's scheme, data bytes NEVER cross the driver-side
SDK cache — scans plan the remote URIs directly and writes stream from
executors straight into the store.

The "cloud" here is real from Spark's perspective: a viewfs:// mount
(hadoop-common's ViewFileSystem — a genuine non-file scheme resolved
through the same FileSystem machinery as s3a/gs/abfss) backed by a local
directory, so the whole path — per-scheme auto-probe, native
executor-side write under a per-commit prefix, JVM recursive listing,
ranged-GET footer stats, native scan, DML touched-file detection, CDF —
executes for real with no engine mocking.  datacache.localize is
monkeypatched to raise, so ANY fallback into the driver cache fails the
test loudly.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from delta_go_spark.store import FileMeta, LocalStore, register_store
from delta_go_spark.table import DeltaTable


class ViewfsStore(LocalStore):
    """LogStore adapter mapping viewfs://<ns>/... URIs onto the local
    directory the mount table points at.  The LOG plane always goes
    through the LogStore abstraction (store.go:16-27 single-writer
    contract); only data bytes take the native connector path."""

    def __init__(self, prefix: str, local_root: str):
        super().__init__(local_root)
        self._prefix = prefix.rstrip("/")
        self._local = os.path.abspath(local_root).rstrip("/")

    def _to_local(self, path: str) -> str:
        assert path.startswith(self._prefix), path
        return self._local + path[len(self._prefix):]

    def _to_uri(self, path: str) -> str:
        return self._prefix + path[len(self._local):]

    def read(self, path):
        return super().read(self._to_local(path))

    def list_from(self, path):
        for m in super().list_from(self._to_local(path)):
            yield FileMeta(self._to_uri(m.path), m.size, m.modification_time)

    def write(self, path, lines, overwrite=False):
        return super().write(self._to_local(path), lines, overwrite)

    def exists(self, path):
        return super().exists(self._to_local(path))

    def read_bytes(self, path):
        return super().read_bytes(self._to_local(path))

    def write_bytes(self, path, data, overwrite=True):
        return super().write_bytes(self._to_local(path), data, overwrite)

    def delete(self, path):
        return super().delete(self._to_local(path))

    def read_range(self, path, start, length):
        return super().read_range(self._to_local(path), start, length)

    def size_of(self, path):
        return super().size_of(self._to_local(path))


@pytest.fixture()
def viewfs_table(spark, tmp_path, monkeypatch):
    local_root = str(tmp_path / "bucket")
    os.makedirs(local_root)
    # unique namespace per test: FileSystem instances are cached by
    # (scheme, authority), so reusing one would pin a stale mount table
    ns = f"dgs{uuid.uuid4().hex[:10]}"
    hc = spark._jsc.hadoopConfiguration()
    hc.set(f"fs.viewfs.mounttable.{ns}.link./data", f"file://{local_root}")
    prefix = f"viewfs://{ns}/data"
    root = f"{prefix}/table"
    register_store(prefix, ViewfsStore(prefix, local_root))

    # any fallback into the SDK cache is a failure of the native branch
    import delta_go_spark.datacache as datacache

    def _no_localize(*a, **k):
        raise AssertionError("datacache.localize must not run in native mode")

    monkeypatch.setattr(datacache, "localize", _no_localize)
    yield root, local_root
    register_store(prefix, None)


def _data_parquet(local_root):
    out = []
    for dirpath, _dirs, files in os.walk(local_root):
        if "_delta_log" in dirpath:
            continue
        for name in files:
            if name.endswith(".parquet"):
                out.append(os.path.join(dirpath, name))
    return out


def test_native_write_then_scan_never_touches_cache(spark, viewfs_table):
    root, local_root = viewfs_table
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(60)], "k long, p string, v double"
    )
    t = DeltaTable.create(spark, root, df, partition_by=["p"])

    # executors wrote parquet directly under a per-commit prefix — no
    # driver staging dir, no uploads, hive layout preserved inside it
    files = _data_parquet(local_root)
    assert files and all("/commit-" in f for f in files)
    assert any("/p=1/" in f for f in files)

    # AddFiles carry partition values from the layout and footer stats
    # streamed via the store's ranged reads (no whole-object download)
    adds = list(t.log.update().all_files())
    assert {a.partition_values["p"] for a in adds} == {"0", "1", "2"}
    assert all(a.stats for a in adds)
    assert all(a.size > 0 and a.modification_time > 0 for a in adds)

    # the scan plans the remote URIs (localize would raise)
    got = t.to_df()
    assert got.count() == 60
    assert got.filter(F.col("p") == "1").count() == 20
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(60))


def test_native_dml_and_cdf_roundtrip(spark, viewfs_table):
    from pyspark.sql.types import LongType

    from delta_go_spark.expressions import Column, EqualTo, Literal

    root, local_root = viewfs_table
    t = DeltaTable.create(
        spark,
        root,
        spark.createDataFrame([(i, i % 2) for i in range(20)], "k long, v long"),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(100, 7)], "k long, v long"))
    assert t.to_df().count() == 21

    # touched-file detection compares input_file_name against the native
    # remote URIs — an UPDATE must rewrite only the matched file set
    t.update(
        EqualTo(Column("k", LongType()), Literal(5)),
        {"v": F.lit(99).cast("long")},
    )
    assert t.to_df().filter(F.col("v") == 99).first()["k"] == 5
    t.delete(EqualTo(Column("k", LongType()), Literal(100)))
    assert t.to_df().count() == 20

    # CDF: cdc files were written natively under _change_data/commit-*
    cdc = [
        f
        for f in _data_parquet(local_root)
        if f"{os.sep}_change_data{os.sep}" in f
    ]
    assert cdc and all("/commit-" in f for f in cdc)
    changes = t.table_changes(start_version=1).collect()
    assert {r["_change_type"] for r in changes} >= {
        "insert",
        "update_preimage",
        "update_postimage",
        "delete",
    }

    # time travel re-plans older native URIs
    assert t.version_as_of(0).count() == 20


def test_use_native_cloud_flag_precedence(spark, monkeypatch):
    from delta_go_spark import datacloud

    # explicit per-call option beats everything
    assert datacloud.use_native_cloud(None, "s3://b/t", option="true") is True
    assert datacloud.use_native_cloud(spark, "s3://b/t", option="false") is False
    # env var drives planning workers that have no JVM handle
    monkeypatch.setenv("DGS_NATIVE_CLOUD", "true")
    assert datacloud.use_native_cloud(None, "s3://b/t") is True
    monkeypatch.setenv("DGS_NATIVE_CLOUD", "false")
    assert datacloud.use_native_cloud(None, "s3://b/t") is False
    monkeypatch.delenv("DGS_NATIVE_CLOUD")
    # auto mode: no connector for s3 in this sandbox -> SDK fallback;
    # viewfs ships in hadoop-common -> native
    datacloud._probe_cache.pop("s3://b", None)
    assert datacloud.use_native_cloud(spark, "s3://b/t") is False
    # probe result is cached per (scheme, authority)
    assert datacloud._probe_cache["s3://b"] is False
