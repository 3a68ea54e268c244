"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the configs below are chosen to also be the
right defaults on a large cluster: AQE on (runtime shuffle-partition
coalescing + skew-join splitting), shuffle partitions sized to parallelism,
UTC session time zone (object-store parquet is written timezone-naive), and
Arrow enabled for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "delta-go-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # local[N]: one shuffle partition per core avoids tiny-task overhead.
        # On a real cluster this should scale with executor cores; AQE
        # coalescing makes over-provisioning cheap, so err high there.
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Deliberately KEEPING coalescePartitions.parallelismFirst at its
        # default (true).  r14 A/B'd flipping it to false (+64 MB advisory)
        # to cut 32-way scheduling of kilobyte state frames (r13 verdict
        # item 8): adjacent alternating runs regressed the incremental
        # family 2-5x (minhash_incremental 10 -> 51 s, profile_incremental
        # 3.7 -> 17 s, ngram_jaccard 3.8 -> 7.5 s) because post-shuffle
        # BYTES are a bad proxy for CPU cost — explode/hash-dense stages
        # carry kilobytes but need the cores.  Reverted; evidence in
        # OPTIMIZATION_r14.md.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one driver-generated parquet table (TESTDATA.md).

    events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; read it as long nanos (legacy conf) and convert to a proper
    microsecond timestamp column.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # TIMESTAMP_NTZ, built by integer micros arithmetic: the source
            # value is timezone-naive, so the result must not depend on the
            # session time zone (the driver's session may not be UTC).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def fan_out_small_scan(df, min_parallelism: int | None):
    """Round-robin repartition a DataFrame whose scan produced fewer
    splits than `min_parallelism` — the small-file case: a single-row-
    group parquet file cannot be split, so a CPU-heavy stage inheriting
    that scan (regex scoring, Arrow UDF hashing) serializes on one core.
    At production scale the scan arrives pre-split far beyond any sane
    value and this is a no-op; callers that pin zero-exchange plans
    simply don't opt in.  The shuffled payload is the scan's own columns
    — bytes the downstream stage must read anyway.

    The probe is inputFiles() — a listing-only call; rdd.getNumPartitions()
    would force an RDD conversion of the plan on every query build.  A
    probe that fails or returns NO files means the DataFrame is not a
    plain file scan (a DSv2 relation, an in-memory frame, a post-shuffle
    plan): its parallelism is unknown, so leave it alone — unconditionally
    repartitioning there would bolt a full round-robin shuffle onto an
    arbitrarily large, already-well-partitioned input."""
    if not min_parallelism:
        return df
    try:
        n_inputs = len(df.inputFiles())
    except Exception:
        return df
    if n_inputs == 0 or n_inputs >= min_parallelism:
        return df
    return df.repartition(min_parallelism)


def fixture_cache_path(family: str, sf_dir: str, leaf: str) -> str:
    """<tempdir>/dgs-<family>-cache/<sf key>/<leaf> — THE rendering of the
    derived-fixture cache path scheme (sf key + caller-chosen leaf, which
    should embed fixture_sig).  All cache sites render through this as of
    r10 (scalejoins, stateful x2, windows adopted it; delta_queries keeps
    its _CACHE_ROOT join for the hand-reconstructed test paths but signs
    content via _ensure_built's recipe-signature file instead)."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"dgs-{family}-cache",
        sf_dir.strip("/").replace("/", "_"),
        leaf,
    )


def fixture_sig(sf_dir: str, table: str) -> str:
    """Content signature of a source fixture (relative path + size + mtime
    of every file, directories walked in sorted order).  Cheap — no data
    read — and changes whenever the fixture is regenerated, which is
    exactly when any derived cache (bucketed copies, stream replay splits)
    must be invalidated rather than silently served stale."""
    import hashlib

    p = os.path.join(sf_dir, f"{table}.parquet")
    parts: list[str] = []
    if os.path.isdir(p):
        for root, dirs, files in os.walk(p):
            dirs.sort()  # canonical walk order
            rel = os.path.relpath(root, p)
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                parts.append(f"{rel}/{fn}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:10]
