"""Cloud log-store contract tests against an in-memory fake S3 client.

The storage contract (store.py; reference store/store.go:16-27) is what
transactions rely on: atomic create-if-absent (mutual exclusion), ordered
inclusive list_from, read-what-was-written.  The fake implements the boto3
surface S3Store touches, including `If-None-Match: *` conditional-PUT
semantics, so the store logic (not the SDK) is what's under test.
"""

import datetime

import pytest

from delta_go_spark.cloud_stores import S3Store
from delta_go_spark.store import FileAlreadyExistsError, store_for


class _ClientError(Exception):
    def __init__(self, code):
        super().__init__(f"http {code} PreconditionFailed")
        self.response = {"ResponseMetadata": {"HTTPStatusCode": code}}


class _Exceptions:
    ClientError = _ClientError


class _Page(dict):
    pass


class _Paginator:
    def __init__(self, objects):
        self._objects = objects

    def paginate(self, Bucket, Prefix, StartAfter=""):
        contents = [
            {
                "Key": k,
                "Size": len(v),
                "LastModified": datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
            }
            for k, v in sorted(self._objects.get(Bucket, {}).items())
            if k.startswith(Prefix) and k > StartAfter
        ]
        yield _Page(Contents=contents)


class FakeS3Client:
    exceptions = _Exceptions()

    def __init__(self):
        self.objects: dict[str, dict[str, bytes]] = {}

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        bucket = self.objects.setdefault(Bucket, {})
        if IfNoneMatch == "*" and Key in bucket:
            raise _ClientError(412)
        bucket[Key] = Body

    def get_object(self, Bucket, Key, Range=None):
        import io

        data = self.objects[Bucket][Key]
        if Range is not None:  # "bytes=a-b", b inclusive (S3 semantics)
            a, b = Range.removeprefix("bytes=").split("-")
            data = data[int(a): int(b) + 1]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket, Key):
        if Key not in self.objects.get(Bucket, {}):
            raise KeyError(Key)
        return {"ContentLength": len(self.objects[Bucket][Key])}

    def delete_object(self, Bucket, Key):
        self.objects.get(Bucket, {}).pop(Key, None)

    def get_paginator(self, name):
        assert name == "list_objects_v2"
        return _Paginator(self.objects)


@pytest.fixture
def s3():
    return S3Store("s3://bucket/table", client=FakeS3Client())


def test_atomic_create_if_absent(s3):
    path = "s3://bucket/table/_delta_log/00000000000000000000.json"
    s3.write(path, ['{"commitInfo":{}}'])
    with pytest.raises(FileAlreadyExistsError):
        s3.write(path, ["other"])
    # overwrite=True replaces (checkpoint rewrite path)
    s3.write(path, ["replaced"], overwrite=True)
    assert s3.read(path) == ["replaced"]


def test_read_write_roundtrip_and_exists(s3):
    path = "s3://bucket/table/_delta_log/00000000000000000001.json"
    assert not s3.exists(path)
    s3.write(path, ["a", "b"])
    assert s3.exists(path)
    assert s3.read(path) == ["a", "b"]


def test_list_from_is_inclusive_and_ordered(s3):
    base = "s3://bucket/table/_delta_log/"
    for v in (0, 1, 2, 10):
        s3.write(f"{base}{v:020d}.json", [str(v)])
    names = [m.path.rsplit("/", 1)[-1] for m in s3.list_from(f"{base}{1:020d}.json")]
    assert names == [
        "00000000000000000001.json",
        "00000000000000000002.json",
        "00000000000000000010.json",
    ]
    sizes = {m.path.rsplit("/", 1)[-1]: m.size for m in s3.list_from(f"{base}{0:020d}.json")}
    assert len(sizes) == 4 and all(s > 0 for s in sizes.values())


def test_store_for_dispatch():
    s = store_for("/tmp/sometable")
    assert type(s).__name__ == "LocalStore"
    with pytest.raises(NotImplementedError):
        store_for("ftp://host/table")
    # cloud schemes dispatch to cloud_stores (construction may raise
    # ImportError when the SDK is absent — that IS the gate)
    for scheme in ("s3://b/t", "gs://b/t", "abfss://c@a.dfs.core.windows.net/t"):
        try:
            store_for(scheme)
        except ImportError:
            pass


# ---------------------------------------------------------------------------
# GCS fake: generation-0 precondition semantics
class FakeBlob:
    def __init__(self, bucket, name):
        self._bucket = bucket
        self._name = name

    @property
    def name(self):
        return self._name

    def exists(self):
        return self._name in self._bucket.objects

    def download_as_bytes(self):
        return self._bucket.objects[self._name]

    def upload_from_string(self, data, if_generation_match=None):
        if if_generation_match == 0 and self._name in self._bucket.objects:
            raise RuntimeError("412 conditionNotMet")
        self._bucket.objects[self._name] = data


class FakeBucket:
    def __init__(self):
        self.objects = {}

    def blob(self, name):
        return FakeBlob(self, name)


class FakeGCSClient:
    def __init__(self):
        self.buckets = {}

    def bucket(self, name):
        return self.buckets.setdefault(name, FakeBucket())

    def list_blobs(self, bucket, prefix=""):
        import types

        b = self.buckets.setdefault(bucket, FakeBucket())
        for k in sorted(b.objects):
            if k.startswith(prefix):
                yield types.SimpleNamespace(
                    name=k, size=len(b.objects[k]), updated=None
                )


def test_gcs_store_contract():
    from delta_go_spark.cloud_stores import GCSStore

    gs = GCSStore("gs://bucket/table", client=FakeGCSClient())
    path = "gs://bucket/table/_delta_log/00000000000000000000.json"
    gs.write(path, ["a"])
    with pytest.raises(FileAlreadyExistsError):
        gs.write(path, ["b"])
    gs.write(path, ["c"], overwrite=True)
    assert gs.read(path) == ["c"]
    assert gs.exists(path)
    gs.write("gs://bucket/table/_delta_log/00000000000000000002.json", ["z"])
    names = [
        m.path.rsplit("/", 1)[-1]
        for m in gs.list_from("gs://bucket/table/_delta_log/00000000000000000001.json")
    ]
    assert names == ["00000000000000000002.json"]


# ---------------------------------------------------------------------------
# Azure fake: ResourceExistsError on non-overwrite upload of existing blob
class FakeAzBlobClient:
    def __init__(self, container, name):
        self._c = container
        self._name = name

    def exists(self):
        return self._name in self._c

    def download_blob(self):
        import io
        import types

        data = self._c[self._name]
        return types.SimpleNamespace(readall=lambda: data)

    def upload_blob(self, data, overwrite=False):
        if not overwrite and self._name in self._c:
            exc = type("ResourceExistsError", (Exception,), {})
            raise exc("BlobAlreadyExists")
        self._c[self._name] = data


class FakeAzService:
    def __init__(self):
        self.containers = {}

    def get_blob_client(self, container, key):
        return FakeAzBlobClient(self.containers.setdefault(container, {}), key)

    def get_container_client(self, container):
        import types

        c = self.containers.setdefault(container, {})

        def list_blobs(name_starts_with=""):
            for k in sorted(c):
                if k.startswith(name_starts_with):
                    yield types.SimpleNamespace(
                        name=k, size=len(c[k]), last_modified=None
                    )

        return types.SimpleNamespace(list_blobs=list_blobs)


def test_azure_store_contract():
    from delta_go_spark.cloud_stores import AzureBlobStore

    az = AzureBlobStore(
        "abfss://cont@acct.dfs.core.windows.net/table", service_client=FakeAzService()
    )
    base = "abfss://cont@acct.dfs.core.windows.net/table/_delta_log"
    path = f"{base}/00000000000000000000.json"
    az.write(path, ["a"])
    with pytest.raises(FileAlreadyExistsError):
        az.write(path, ["b"])
    az.write(path, ["c"], overwrite=True)
    assert az.read(path) == ["c"]
    assert az.exists(path)
    az.write(f"{base}/00000000000000000003.json", ["z"])
    names = [
        m.path.rsplit("/", 1)[-1]
        for m in az.list_from(f"{base}/00000000000000000001.json")
    ]
    assert names == ["00000000000000000003.json"]


def test_full_transaction_protocol_over_fake_s3():
    """The whole metadata plane — create, append, conflict-checked commits,
    time travel, change feed — through the S3 store (fake client), never
    touching the local filesystem for the log.  Proves the transaction
    layer is store-agnostic."""
    import json

    from delta_go_spark import ops
    from delta_go_spark.actions import AddFile, Metadata
    from delta_go_spark.log import DeltaLog

    client = FakeS3Client()
    root = "s3://bucket/tables/t1"
    store = S3Store(root, client=client)
    log = DeltaLog(root, store=store)

    schema = json.dumps(
        {"type": "struct",
         "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    )
    txn = log.start_transaction()
    txn.update_metadata(Metadata(schema_string=schema,
                                 configuration={"delta.checkpointInterval": "1000"}))
    assert txn.commit([], ops.CREATE_TABLE) == 0

    for i in range(5):
        t = DeltaLog(root, store=store).start_transaction()
        t.commit(
            [AddFile(path=f"part-{i}.parquet", partition_values={}, size=1,
                     modification_time=1, data_change=True)],
            ops.WRITE,
        )

    log2 = DeltaLog(root, store=store)
    snap = log2.update()
    assert snap.version == 5
    assert {a.path for a in snap.all_files()} == {f"part-{i}.parquet" for i in range(5)}
    # time travel + change feed through the same store
    assert DeltaLog(root, store=store).snapshot_for_version_as_of(2).num_of_files() == 2
    assert [vl.version for vl in log2.changes(0)] == list(range(6))
    # the log lives in the fake bucket, not on disk
    assert any("_delta_log" in k for k in client.objects["bucket"])


def test_checkpoint_write_read_and_cleanup_over_fake_s3():
    """Checkpoints are parquet: they must flow through the LogStore too.
    checkpointInterval=2 forces a checkpoint on a fake-S3 table (raw-path
    pq.write_table would crash here), the next snapshot must reconstruct
    FROM that cloud checkpoint, and expired-log cleanup must list/delete
    via the store, never os.listdir."""
    import json

    from delta_go_spark import ops
    from delta_go_spark.actions import AddFile, Metadata
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.maintenance import cleanup_expired_logs

    client = FakeS3Client()
    root = "s3://bucket/tables/tckpt"
    store = S3Store(root, client=client)
    log = DeltaLog(root, store=store)

    schema = json.dumps(
        {"type": "struct",
         "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    )
    txn = log.start_transaction()
    txn.update_metadata(Metadata(schema_string=schema,
                                 configuration={"delta.checkpointInterval": "2"}))
    txn.commit([], ops.CREATE_TABLE)
    for i in range(4):
        t = DeltaLog(root, store=store).start_transaction()
        t.commit(
            [AddFile(path=f"part-{i}.parquet", partition_values={}, size=1,
                     modification_time=1, data_change=True)],
            ops.WRITE,
        )
    keys = client.objects["bucket"]
    ckpts = [k for k in keys if k.endswith(".checkpoint.parquet")]
    assert ckpts, "postCommit must have written a checkpoint into the bucket"
    assert any(k.endswith("_last_checkpoint") for k in keys)

    # a fresh log must anchor its snapshot on the cloud checkpoint
    log2 = DeltaLog(root, store=store)
    snap = log2.update()
    assert snap.version == 4
    assert snap.segment.checkpoint_version == 4
    assert {a.path for a in snap.all_files()} == {f"part-{i}.parquet" for i in range(4)}

    # Expired-log cleanup already ran through the store during postCommit:
    # the fake bucket's mtimes (fixed 2026-01-01) are past the default
    # logRetentionDuration, so every version file below the checkpoint was
    # deleted from the bucket — and the table still reads fine from the
    # checkpoint anchor.  (Before checkpoints went through the LogStore,
    # this whole flow crashed on raw-path os I/O.)
    version_jsons = {k for k in keys if k.endswith(".json")}
    assert version_jsons == {"tables/tckpt/_delta_log/00000000000000000004.json"}
    assert cleanup_expired_logs(log2, retention_millis=0) == []  # nothing left
    assert DeltaLog(root, store=store).update().version == 4


def test_concurrent_commits_race_on_fake_s3():
    """Eight threads race version commits through the conditional-PUT fake:
    every commit must land exactly once at a distinct version (the same
    contract the 8-thread LocalStore stress pins, now over the S3 path)."""
    import json
    import threading

    from delta_go_spark import ops
    from delta_go_spark.actions import AddFile, Metadata
    from delta_go_spark.log import DeltaLog

    client = FakeS3Client()
    root = "s3://bucket/tables/trace"
    store = S3Store(root, client=client)
    log = DeltaLog(root, store=store)
    schema = json.dumps(
        {"type": "struct",
         "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    )
    txn = log.start_transaction()
    txn.update_metadata(Metadata(schema_string=schema,
                                 configuration={"delta.checkpointInterval": "1000"}))
    txn.commit([], ops.CREATE_TABLE)

    errors: list = []

    def worker(i: int) -> None:
        try:
            t = DeltaLog(root, store=S3Store(root, client=client)).start_transaction()
            t.commit(
                [AddFile(path=f"w-{i}.parquet", partition_values={}, size=1,
                         modification_time=1, data_change=True)],
                ops.WRITE,
            )
        except Exception as e:  # pragma: no cover - should not happen
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    snap = DeltaLog(root, store=store).update()
    assert snap.version == 8
    assert {a.path for a in snap.all_files()} == {f"w-{i}.parquet" for i in range(8)}


def test_data_plane_over_fake_s3(spark, tmp_path):
    """The DATA plane — append, read-back, UPDATE, DELETE, CDF read — on a
    cloud-URI table through the store abstraction (fake S3 client): staged
    parquet is PUT into the bucket (no local renames), scans read via the
    deterministic local cache, and DML touched-file detection matches
    cloud paths correctly."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    from delta_go_spark.datacache import CACHE_ROOT
    from delta_go_spark.expressions import Column, EqualTo, Literal
    from delta_go_spark.store import register_store
    from delta_go_spark.table import DeltaTable

    client = FakeS3Client()
    root = "s3://bucket/tables/tdata"
    register_store("s3://bucket/tables/tdata", S3Store(root, client=client))
    try:
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(100)], "k long, v long"
        )
        t = DeltaTable.create(
            spark, root, df,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        # data objects live in the bucket, none in any local table dir
        keys = client.objects["bucket"]
        data_keys = [k for k in keys if k.endswith(".parquet") and "_delta_log" not in k]
        assert data_keys, "staged parquet must be PUT into the bucket"
        assert t.to_df().count() == 100

        # append + filtered read
        t.append(spark.createDataFrame([(100, 7)], "k long, v long"))
        assert t.to_df().count() == 101
        assert t.to_df().filter(F.col("v") == 7).count() == 1

        # UPDATE rewrites only touched cloud objects
        t.update(EqualTo(Column("k", LongType()), Literal(5)),
                 {"v": F.lit(99).cast("long")})
        assert t.to_df().filter(F.col("v") == 99).first()["k"] == 5

        # DELETE
        t.delete(EqualTo(Column("k", LongType()), Literal(100)))
        assert t.to_df().count() == 100

        # CDF read attributes versions across the cloud range
        changes = t.table_changes(start_version=1).collect()
        assert {r["_change_type"] for r in changes} >= {
            "insert", "update_preimage", "update_postimage", "delete",
        }
        assert all(r["_commit_version"] is not None for r in changes)
        # cdc objects landed under _change_data/ in the bucket
        assert any("_change_data/" in k for k in client.objects["bucket"])
        assert os.path.isdir(CACHE_ROOT)

        # cloud VACUUM: unreferenced rewritten-away objects leave the
        # bucket (fake LastModified is past the horizon); active data,
        # the log and cdc objects survive; the table still reads.
        from delta_go_spark.vacuum import vacuum

        n_parquet_before = sum(
            1 for k in client.objects["bucket"]
            if k.endswith(".parquet") and "_delta_log" not in k
            and "_change_data" not in k
        )
        would = vacuum(root, retention_millis=0, dry_run=True)
        assert would, "rewritten-away objects should be deletable"
        deleted = vacuum(root, retention_millis=0)
        assert deleted == would
        n_parquet_after = sum(
            1 for k in client.objects["bucket"]
            if k.endswith(".parquet") and "_delta_log" not in k
            and "_change_data" not in k
        )
        assert n_parquet_after == n_parquet_before - len(deleted)
        assert any("_change_data/" in k for k in client.objects["bucket"])
        assert t.to_df().count() == 100
        # NOTE: spark.read.format("delta_go") on a cloud URI is exercised
        # in the opt-in emulator smoke only — Spark 4 runs DataSource
        # planning in a separate Python worker, where driver-process
        # register_store bindings (this fake client) do not exist; that
        # path needs real SDK config (credentials/endpoint env).
    finally:
        register_store("s3://bucket/tables/tdata", None)


def test_datacache_prune_lru(tmp_path, monkeypatch):
    """Cache eviction: over-budget entries go oldest-atime-first, the
    current working set survives, under-budget caches are untouched."""
    import os
    import time

    from delta_go_spark import datacache

    cache = str(tmp_path / "cache")
    monkeypatch.setattr(datacache, "CACHE_ROOT", cache)
    os.makedirs(cache)
    paths = []
    for i in range(5):
        p = os.path.join(cache, f"f{i}.parquet")
        with open(p, "wb") as f:
            f.write(b"x" * 100)
        t = time.time() - (100 - i)  # f0 oldest
        os.utime(p, (t, t))
        paths.append(p)
    # budget 250 -> need to free >= 250 bytes; f0, f1 evicted first but f1
    # is in the working set, so f0 and f2 go
    freed = datacache.prune(budget_bytes=250, keep={paths[1]}, grace_seconds=0)
    assert freed == 300
    assert not os.path.exists(paths[0])
    assert os.path.exists(paths[1])
    survivors = {p for p in paths if os.path.exists(p)}
    assert len(survivors) == 2 or len(survivors) == 3
    # under budget: nothing further evicted
    assert datacache.prune(budget_bytes=10**9, grace_seconds=0) == 0
    # grace window: over-budget but recently-touched entries survive
    for p in survivors:
        os.utime(p, None)
    assert datacache.prune(budget_bytes=0, grace_seconds=3600) == 0


def test_chunk_stream_full_reads_and_tell():
    """SDK streaming uploads treat a short read as EOF — read(n) must
    return exactly n bytes across chunk boundaries until the stream is
    truly exhausted, and tell() must track position (GCS's resumable
    initiator calls it before the first byte moves)."""
    from delta_go_spark.store import ChunkStream

    chunks = [b"a" * 10, b"b" * 3, b"", b"c" * 20]
    s = ChunkStream(iter(chunks))
    assert s.tell() == 0
    first = s.read(16)  # spans three chunks; must NOT stop at 10
    assert first == b"a" * 10 + b"b" * 3 + b"c" * 3
    assert s.tell() == 16
    rest = s.read()  # read-to-EOF
    assert rest == b"c" * 17
    assert s.tell() == 33
    assert s.read(8) == b"" and s.tell() == 33  # stable EOF
    # empty stream
    e = ChunkStream(iter([]))
    assert e.read(4) == b"" and e.tell() == 0
