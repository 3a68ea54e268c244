"""Opt-in wire-level smoke tests against real store emulators
(docker-compose.yaml: LocalStack S3, fake-gcs-server, Azurite).

Skipped unless DGS_EMULATOR_SMOKE=1 AND the matching SDK is installed —
the default suite covers the same store contract with in-process fake
clients (test_cloud_stores.py); this adds wire fidelity where a network
and Docker exist.  Endpoints match the compose file's ports.
"""

import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DGS_EMULATOR_SMOKE") != "1",
    reason="emulator smoke is opt-in: set DGS_EMULATOR_SMOKE=1 with docker compose up",
)


def _skip_unless(importable: str):
    return pytest.importorskip(importable)


def test_s3_localstack_log_roundtrip():
    boto3 = _skip_unless("boto3")

    from delta_go_spark.cloud_stores import S3Store
    from delta_go_spark.store import FileAlreadyExistsError

    client = boto3.client(
        "s3",
        endpoint_url=os.environ.get("DGS_S3_ENDPOINT", "http://localhost:4566"),
        region_name="us-east-1",
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )
    bucket = f"dgs-smoke-{uuid.uuid4().hex[:8]}"
    client.create_bucket(Bucket=bucket)
    store = S3Store(f"s3://{bucket}/t", client=client)
    path = f"s3://{bucket}/t/_delta_log/00000000000000000000.json"
    store.write(path, ['{"commitInfo":{}}'])
    assert store.read(path) == ['{"commitInfo":{}}']
    with pytest.raises(FileAlreadyExistsError):
        store.write(path, ["other"])
    names = [m.path.rsplit("/", 1)[-1] for m in store.list_from(path)]
    assert names == ["00000000000000000000.json"]
    # ranged read (checkpoint streaming path)
    assert store.read_range(path, 2, 10) == store.read_bytes(path)[2:12]


def test_s3_localstack_transaction_protocol():
    boto3 = _skip_unless("boto3")

    import json

    from delta_go_spark import ops
    from delta_go_spark.actions import AddFile, Metadata
    from delta_go_spark.cloud_stores import S3Store
    from delta_go_spark.log import DeltaLog

    client = boto3.client(
        "s3",
        endpoint_url=os.environ.get("DGS_S3_ENDPOINT", "http://localhost:4566"),
        region_name="us-east-1",
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )
    bucket = f"dgs-smoke-{uuid.uuid4().hex[:8]}"
    client.create_bucket(Bucket=bucket)
    root = f"s3://{bucket}/tables/t1"
    store = S3Store(root, client=client)
    log = DeltaLog(root, store=store)
    schema = json.dumps(
        {"type": "struct",
         "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    )
    txn = log.start_transaction()
    txn.update_metadata(Metadata(schema_string=schema))
    assert txn.commit([], ops.CREATE_TABLE) == 0
    t = DeltaLog(root, store=store).start_transaction()
    t.commit(
        [AddFile(path="part-0.parquet", partition_values={}, size=1,
                 modification_time=1, data_change=True)],
        ops.WRITE,
    )
    assert DeltaLog(root, store=store).update().version == 1


def test_gcs_emulator_log_roundtrip():
    storage = _skip_unless("google.cloud.storage")

    from delta_go_spark.cloud_stores import GCSStore

    client = storage.Client(
        client_options={
            "api_endpoint": os.environ.get(
                "DGS_GCS_ENDPOINT", "http://localhost:4443"
            )
        },
        project="smoke",
    )
    bucket = client.create_bucket(f"dgs-smoke-{uuid.uuid4().hex[:8]}")
    store = GCSStore(f"gs://{bucket.name}/t", client=client)
    path = f"gs://{bucket.name}/t/_delta_log/00000000000000000000.json"
    store.write(path, ["a"])
    assert store.read(path) == ["a"]


def test_azurite_log_roundtrip():
    _skip_unless("azure.storage.blob")
    from azure.storage.blob import BlobServiceClient

    from delta_go_spark.cloud_stores import AzureBlobStore

    conn = os.environ.get(
        "DGS_AZURE_CONN",
        "DefaultEndpointsProtocol=http;AccountName=devstoreaccount1;"
        "AccountKey=Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/"
        "K1SZFPTOtr/KBHBeksoGMGw==;BlobEndpoint=http://localhost:10000/devstoreaccount1;",
    )
    svc = BlobServiceClient.from_connection_string(conn)
    container = f"dgs-smoke-{uuid.uuid4().hex[:8]}"
    svc.create_container(container)
    store = AzureBlobStore(
        f"wasbs://{container}@devstoreaccount1.blob.core.windows.net/t",
        service_client=svc,
    )
    path = (
        f"wasbs://{container}@devstoreaccount1.blob.core.windows.net"
        "/t/_delta_log/00000000000000000000.json"
    )
    store.write(path, ["a"])
    assert store.read(path) == ["a"]
