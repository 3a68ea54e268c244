"""Cloud log-store backends: S3, GCS, Azure Blob.

Each implements the LogStore contract (store.py; reference:
store/store.go:16-27) with the backend's native atomic create-if-absent
primitive:

- S3    — conditional PUT with `If-None-Match: *` (supported by S3 since
          2024, so unlike the reference's single-writer S3 store
          (store/s3.go:17-20) this is SAFE FOR CONCURRENT WRITERS across
          processes and clusters).
- GCS   — object generation precondition `if_generation_match=0`
          (reference: store/gcs.go:33-47).
- Azure — blob ETag precondition `If-None-Match: *`
          (reference: store/azure.go:35-53).

The SDKs (boto3 / google-cloud-storage / azure-storage-blob) are not
bundled; each class raises a clear ImportError at construction when its
SDK is absent.  Only the Spark DRIVER writes the log (executors write data
files), so listing consistency is the only cross-node requirement — all
three stores list strongly-consistently today.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from urllib.parse import urlparse

from delta_go_spark.store import FileAlreadyExistsError, FileMeta, LogStore


def _split_bucket_key(uri: str) -> tuple[str, str]:
    p = urlparse(uri)
    return p.netloc, p.path.lstrip("/")


def _encode(lines: Iterable[str]) -> bytes:
    return "".join(line + "\n" for line in lines).encode("utf-8")


def _decode(data: bytes) -> list[str]:
    return [line for line in data.decode("utf-8").splitlines() if line.strip()]


# Default SDK clients cached per process (keyed by scheme / account):
# store_for() constructs a store per URI, and the distributed clone /
# stats-backfill jobs call it PER FILE on executors — rebuilding a boto3 /
# GCS / Azure client per file would cost ~50-100 ms each, hours of pure
# construction overhead at a million files.  Explicitly injected clients
# (tests, emulators) bypass the cache entirely.
_default_clients: dict = {}


def _cached_default(key: str, build):
    if key not in _default_clients:
        _default_clients[key] = build()
    return _default_clients[key]


class S3Store(LogStore):
    """reference: store/s3.go — upgraded to multi-writer via conditional PUT."""

    def __init__(self, root_uri: str, client=None):
        if client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover - SDK not bundled
                raise ImportError("S3Store requires boto3 (pip install boto3)") from e
            client = _cached_default("s3", lambda: boto3.client("s3"))
        self._client = client
        self._root = root_uri.rstrip("/")

    def root(self) -> str:
        return self._root

    def read(self, path: str) -> list[str]:
        bucket, key = _split_bucket_key(path)
        obj = self._client.get_object(Bucket=bucket, Key=key)
        return _decode(obj["Body"].read())

    def list_from(self, path: str) -> Iterator[FileMeta]:
        bucket, key = _split_bucket_key(path)
        parent = key.rsplit("/", 1)[0] + "/"
        start = key.rsplit("/", 1)[-1]
        paginator = self._client.get_paginator("list_objects_v2")
        # StartAfter (exclusive) primed just below the target key gives
        # server-side skipping of the log prefix before the checkpoint —
        # the reference pages 500 at a time (store/base.go:81); V2
        # pagination is the S3-native equivalent.  The client-side guard
        # re-establishes the contract's inclusive ">= basename".
        for page in paginator.paginate(
            Bucket=bucket, Prefix=parent, StartAfter=key[:-1] if key else key
        ):
            for obj in page.get("Contents", []):
                if obj["Key"].rsplit("/", 1)[-1] < start:
                    continue
                yield FileMeta(
                    f"s3://{bucket}/{obj['Key']}",
                    obj["Size"],
                    int(obj["LastModified"].timestamp() * 1000),
                )

    def write(self, path: str, lines: Iterable[str], overwrite: bool = False) -> None:
        bucket, key = _split_bucket_key(path)
        kwargs = {} if overwrite else {"IfNoneMatch": "*"}
        try:
            self._client.put_object(
                Bucket=bucket, Key=key, Body=_encode(lines), **kwargs
            )
        except self._client.exceptions.ClientError as e:  # pragma: no cover
            code = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code == 412 or "PreconditionFailed" in str(e):
                raise FileAlreadyExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        bucket, key = _split_bucket_key(path)
        try:
            self._client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def read_bytes(self, path: str) -> bytes:
        bucket, key = _split_bucket_key(path)
        return self._client.get_object(Bucket=bucket, Key=key)["Body"].read()

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        bucket, key = _split_bucket_key(path)
        kwargs = {} if overwrite else {"IfNoneMatch": "*"}
        try:
            self._client.put_object(Bucket=bucket, Key=key, Body=data, **kwargs)
        except self._client.exceptions.ClientError as e:  # pragma: no cover
            code = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code == 412 or "PreconditionFailed" in str(e):
                raise FileAlreadyExistsError(path) from e
            raise

    def delete(self, path: str) -> None:
        bucket, key = _split_bucket_key(path)
        self._client.delete_object(Bucket=bucket, Key=key)

    def write_stream(
        self, path: str, chunks: Iterable[bytes], overwrite: bool = True
    ) -> None:
        # boto3's managed transfer does a true multipart upload from a
        # file-like object; fall back to the buffered base path for fake
        # clients (contract tests) or create-if-absent semantics, which
        # multipart cannot express.
        up = getattr(self._client, "upload_fileobj", None)
        if up is None or not overwrite:
            super().write_stream(path, chunks, overwrite)
            return
        from delta_go_spark.store import ChunkStream

        bucket, key = _split_bucket_key(path)
        up(ChunkStream(chunks), bucket, key)

    def read_range(self, path: str, start: int, length: int) -> bytes:
        bucket, key = _split_bucket_key(path)
        return self._client.get_object(
            Bucket=bucket, Key=key, Range=f"bytes={start}-{start + length - 1}"
        )["Body"].read()

    def size_of(self, path: str) -> int:
        bucket, key = _split_bucket_key(path)
        return self._client.head_object(Bucket=bucket, Key=key)["ContentLength"]


class GCSStore(LogStore):
    """reference: store/gcs.go:33-47 (generation-0 precondition)."""

    def __init__(self, root_uri: str, client=None):
        if client is None:
            try:
                from google.cloud import storage
            except ImportError as e:  # pragma: no cover - SDK not bundled
                raise ImportError(
                    "GCSStore requires google-cloud-storage"
                ) from e
            client = _cached_default("gs", storage.Client)
        self._client = client
        self._root = root_uri.rstrip("/")

    def root(self) -> str:
        return self._root

    def read(self, path: str) -> list[str]:
        bucket, key = _split_bucket_key(path)
        blob = self._client.bucket(bucket).blob(key)
        return _decode(blob.download_as_bytes())

    def list_from(self, path: str) -> Iterator[FileMeta]:
        bucket, key = _split_bucket_key(path)
        parent = key.rsplit("/", 1)[0] + "/"
        start = key.rsplit("/", 1)[1]
        for blob in self._client.list_blobs(bucket, prefix=parent):
            if blob.name.rsplit("/", 1)[-1] < start:
                continue
            yield FileMeta(
                f"gs://{bucket}/{blob.name}",
                blob.size,
                int(blob.updated.timestamp() * 1000) if blob.updated else 0,
            )

    def write(self, path: str, lines: Iterable[str], overwrite: bool = False) -> None:
        bucket, key = _split_bucket_key(path)
        blob = self._client.bucket(bucket).blob(key)
        try:
            blob.upload_from_string(
                _encode(lines),
                if_generation_match=None if overwrite else 0,
            )
        except Exception as e:  # google.api_core PreconditionFailed (412)
            if "412" in str(e) or "conditionNotMet" in str(e):
                raise FileAlreadyExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        bucket, key = _split_bucket_key(path)
        return self._client.bucket(bucket).blob(key).exists()

    def read_bytes(self, path: str) -> bytes:
        bucket, key = _split_bucket_key(path)
        return self._client.bucket(bucket).blob(key).download_as_bytes()

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        bucket, key = _split_bucket_key(path)
        blob = self._client.bucket(bucket).blob(key)
        try:
            blob.upload_from_string(
                data, if_generation_match=None if overwrite else 0
            )
        except Exception as e:  # google.api_core PreconditionFailed (412)
            if "412" in str(e) or "conditionNotMet" in str(e):
                raise FileAlreadyExistsError(path) from e
            raise

    def delete(self, path: str) -> None:
        self._client.bucket(_split_bucket_key(path)[0]).blob(
            _split_bucket_key(path)[1]
        ).delete()

    def write_stream(
        self, path: str, chunks: Iterable[bytes], overwrite: bool = True
    ) -> None:
        bucket, key = _split_bucket_key(path)
        blob = self._client.bucket(bucket).blob(key)
        # resumable streaming upload on the real SDK; buffered fallback
        # for fake clients (contract tests)
        if not hasattr(blob, "upload_from_file"):
            super().write_stream(path, chunks, overwrite)
            return
        from delta_go_spark.store import ChunkStream

        try:
            blob.upload_from_file(
                ChunkStream(chunks),
                if_generation_match=None if overwrite else 0,
            )
        except Exception as e:  # google.api_core PreconditionFailed (412)
            if "412" in str(e) or "conditionNotMet" in str(e):
                raise FileAlreadyExistsError(path) from e
            raise

    def read_range(self, path: str, start: int, length: int) -> bytes:
        bucket, key = _split_bucket_key(path)
        # download_as_bytes end is INCLUSIVE
        return self._client.bucket(bucket).blob(key).download_as_bytes(
            start=start, end=start + length - 1
        )

    def size_of(self, path: str) -> int:
        bucket, key = _split_bucket_key(path)
        blob = self._client.bucket(bucket).get_blob(key)
        if blob is None:  # get_blob returns None for missing objects
            raise FileNotFoundError(path)
        return blob.size


class AzureBlobStore(LogStore):
    """reference: store/azure.go:35-53 (If-None-Match: * ETag precondition).

    URI form: abfss://container@account.dfs.core.windows.net/path or
    wasbs://container@account.blob.core.windows.net/path.
    """

    def __init__(self, root_uri: str, service_client=None):
        if service_client is None:
            try:
                from azure.identity import DefaultAzureCredential
                from azure.storage.blob import BlobServiceClient
            except ImportError as e:  # pragma: no cover - SDK not bundled
                raise ImportError(
                    "AzureBlobStore requires azure-storage-blob + azure-identity"
                ) from e
            account = urlparse(root_uri).netloc.split("@", 1)[-1].split(".")[0]
            service_client = _cached_default(
                f"azure:{account}",
                lambda: BlobServiceClient(
                    account_url=f"https://{account}.blob.core.windows.net",
                    credential=DefaultAzureCredential(),
                ),
            )
        self._svc = service_client
        self._root = root_uri.rstrip("/")

    def root(self) -> str:
        return self._root

    @staticmethod
    def _container_key(path: str) -> tuple[str, str]:
        p = urlparse(path)
        container = p.netloc.split("@", 1)[0]
        return container, p.path.lstrip("/")

    def read(self, path: str) -> list[str]:
        container, key = self._container_key(path)
        blob = self._svc.get_blob_client(container, key)
        return _decode(blob.download_blob().readall())

    def list_from(self, path: str) -> Iterator[FileMeta]:
        container, key = self._container_key(path)
        parent = key.rsplit("/", 1)[0] + "/"
        start = key.rsplit("/", 1)[1]
        cc = self._svc.get_container_client(container)
        scheme_host = path.split(parent, 1)[0]
        for blob in cc.list_blobs(name_starts_with=parent):
            if blob.name.rsplit("/", 1)[-1] < start:
                continue
            yield FileMeta(
                f"{scheme_host}{blob.name}",
                blob.size,
                int(blob.last_modified.timestamp() * 1000) if blob.last_modified else 0,
            )

    def write(self, path: str, lines: Iterable[str], overwrite: bool = False) -> None:
        container, key = self._container_key(path)
        blob = self._svc.get_blob_client(container, key)
        try:
            blob.upload_blob(_encode(lines), overwrite=overwrite)
        except Exception as e:  # azure ResourceExistsError
            if type(e).__name__ == "ResourceExistsError":
                raise FileAlreadyExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        container, key = self._container_key(path)
        return self._svc.get_blob_client(container, key).exists()

    def read_bytes(self, path: str) -> bytes:
        container, key = self._container_key(path)
        return self._svc.get_blob_client(container, key).download_blob().readall()

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        container, key = self._container_key(path)
        blob = self._svc.get_blob_client(container, key)
        try:
            blob.upload_blob(data, overwrite=overwrite)
        except Exception as e:  # azure ResourceExistsError
            if type(e).__name__ == "ResourceExistsError":
                raise FileAlreadyExistsError(path) from e
            raise

    def delete(self, path: str) -> None:
        container, key = self._container_key(path)
        self._svc.get_blob_client(container, key).delete_blob()

    def write_stream(
        self, path: str, chunks: Iterable[bytes], overwrite: bool = True
    ) -> None:
        # upload_blob accepts file-like streams (block upload) on the real
        # SDK; fake clients in the contract tests expect bytes, so gate on
        # the client actually coming from the azure package.
        if not type(self._svc).__module__.startswith("azure."):
            super().write_stream(path, chunks, overwrite)
            return
        from delta_go_spark.store import ChunkStream

        container, key = self._container_key(path)
        blob = self._svc.get_blob_client(container, key)
        try:
            blob.upload_blob(ChunkStream(chunks), overwrite=overwrite)
        except Exception as e:  # azure ResourceExistsError
            if type(e).__name__ == "ResourceExistsError":
                raise FileAlreadyExistsError(path) from e
            raise

    def read_range(self, path: str, start: int, length: int) -> bytes:
        container, key = self._container_key(path)
        blob = self._svc.get_blob_client(container, key)
        return blob.download_blob(offset=start, length=length).readall()

    def size_of(self, path: str) -> int:
        container, key = self._container_key(path)
        return self._svc.get_blob_client(container, key).get_blob_properties().size
