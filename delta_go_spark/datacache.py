"""Driver-coordinated local cache of cloud data files.

Spark reads a cloud table's parquet natively when the scheme's Hadoop
connector (hadoop-aws, gcs-connector, hadoop-azure) is on the classpath —
that is the production path at scale: executors stream ranged reads
straight from the object store and nothing here runs.  When the connector
is absent (SDK-only environments, the fake-client tests), this module
keeps the engine CORRECT by materializing the referenced objects into a
deterministic local cache and pointing the scan there.

The cache path is a pure function of the remote URI, so every layer (scan,
DML touched-file detection, CDF version attribution) independently computes
the same local name for the same object — no shared state to thread
through.  Objects are immutable in a Delta table (copy-on-write), so a
size-matching cached copy is always valid.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from delta_go_spark.store import LogStore, is_cloud_uri, store_for

CACHE_ROOT = os.path.join(tempfile.gettempdir(), "dgs_data_cache")
# Cache budget (bytes) before least-recently-used entries are evicted;
# override with DGS_DATA_CACHE_BYTES.  Objects are immutable, so eviction
# only costs a re-download on next touch.
CACHE_BUDGET_BYTES = int(os.environ.get("DGS_DATA_CACHE_BYTES", 10 * 1024**3))
# Entries touched within the grace window are NEVER evicted: a concurrent
# query plans local paths at localize() time and its executors read them a
# moment later — eviction in that window would fail the in-flight job.
CACHE_EVICTION_GRACE_SECONDS = int(
    os.environ.get("DGS_DATA_CACHE_GRACE_SECONDS", 1800)
)


def cache_path(uri: str) -> str:
    """Deterministic local path for a remote object (md5 of the URI keeps
    it flat and collision-free; extension preserved for format sniffing)."""
    digest = hashlib.md5(uri.encode("utf-8")).hexdigest()
    ext = os.path.splitext(uri)[1] or ".bin"
    return os.path.join(CACHE_ROOT, f"{digest}{ext}")


def localize(
    uris: list[str], store: LogStore | None = None, max_workers: int = 16
) -> list[str]:
    """Ensure every remote object has a local copy; returns the local paths
    in input order.  Delta files are immutable, so an existing non-empty
    cache entry is trusted without a round trip.  Missing objects download
    on a thread pool — object-store GETs are latency-bound, so a wide
    range (a month-long CDF read) fills the cache in parallel instead of
    one sequential GET per file."""
    if not uris:
        return []
    os.makedirs(CACHE_ROOT, exist_ok=True)
    store = store or store_for(uris[0])
    out = [cache_path(u) for u in uris]
    missing = []
    for u, local in dict(zip(uris, out)).items():
        if os.path.exists(local) and os.path.getsize(local) > 0:
            # refresh the LRU clock explicitly (atime is unreliable under
            # relatime/noatime mounts; mtime is ours to manage — objects
            # are immutable so a touch never lies about content)
            try:
                os.utime(local, None)
            except OSError:
                pass
        else:
            missing.append((u, local))

    def _fetch(pair: tuple[str, str]) -> None:
        import uuid

        uri, local = pair
        data = store.read_bytes(uri)
        # unique tmp per fetch: two concurrent queries caching the same
        # object must not interleave writes into one tmp file (pid alone
        # is shared by every thread of the driver)
        tmp = f"{local}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, local)

    if len(missing) <= 1:
        for pair in missing:
            _fetch(pair)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(max_workers, len(missing))) as pool:
            list(pool.map(_fetch, missing))
    if missing:
        prune(keep=set(out))
    return out


def prune(
    budget_bytes: int | None = None,
    keep: set[str] | None = None,
    grace_seconds: int | None = None,
) -> int:
    """Evict least-recently-used cache entries until the cache fits the
    budget; paths in `keep` (the calling query's working set) and ANY
    entry touched within the grace window survive — the window is what
    protects a concurrent query's planned-but-not-yet-read files and
    in-progress .tmp downloads, which this process cannot see in `keep`.
    Recency comes from mtime, refreshed explicitly on every cache hit
    (atime is unreliable under relatime/noatime mounts).  Returns bytes
    freed."""
    import time

    budget = CACHE_BUDGET_BYTES if budget_bytes is None else budget_bytes
    grace = (
        CACHE_EVICTION_GRACE_SECONDS if grace_seconds is None else grace_seconds
    )
    now = time.time()
    entries = []
    total = 0
    try:
        names = os.listdir(CACHE_ROOT)
    except FileNotFoundError:
        return 0
    for name in names:
        full = os.path.join(CACHE_ROOT, name)
        try:
            st = os.stat(full)
        except OSError:
            continue
        entries.append((st.st_mtime, st.st_size, full))
        total += st.st_size
    freed = 0
    keep = keep or set()
    for mtime, size, full in sorted(entries):
        if total - freed <= budget:
            break
        if full in keep or now - mtime < grace:
            continue
        try:
            os.remove(full)
            freed += size
        except OSError:
            pass
    return freed


__all__ = ["CACHE_ROOT", "cache_path", "is_cloud_uri", "localize"]
