"""Guarded join hints shared across the operators.

A broadcast hint is how a change-bounded maintainer keeps its corpus-side
state scan shuffle-free: the small batch side ships to every executor and
the big side streams in place.  But a hint is a COMMAND, not a suggestion
— Spark will happily serialize a multi-GB frame and OOM executors if the
"small" side turns out to be a backfill.  Every hot-path hint in this repo
therefore goes through `broadcast_if_small`, which honors the session's
own `spark.sql.autoBroadcastJoinThreshold` as the ceiling: past it the
join degrades to Catalyst's default (sort-merge / shuffled-hash), slower
but bounded.  The threshold <= 0 convention ("user disabled broadcasting")
is honored by never hinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (<=0 means the
    user disabled broadcasting — honor that by never hinting)."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    # Spark accepts both single-letter (k/m/g/t/p) and two-letter (kb/..)
    # suffixes; parse both or the guard silently falls back to 10MB and
    # force-broadcasts past the user's own cap.
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
        ("tb", 1 << 40), ("pb", 1 << 50),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
        ("t", 1 << 40), ("p", 1 << 50), ("b", 1),
    ):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        return int(raw) * mult
    except ValueError:
        return 10 << 20


def byte_estimate_aggs(df: DataFrame, row_overhead: int = 32):
    """(fixed_per_row, agg_exprs) — the measurement rule of
    estimated_df_bytes, exposed separately so a caller that already runs
    an aggregate over `df` (the MERGE source probe) can fold the byte
    sums into that SAME job instead of paying a second pass."""
    from pyspark.sql import types as T

    aggs = []
    fixed_per_row = row_overhead
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.sum(F.length(c) * 2))
        elif isinstance(f.dataType, T.BinaryType):
            aggs.append(F.sum(F.length(c)))
        elif isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ):
            aggs.append(F.sum(F.length(F.to_json(c)) * 2))
        else:
            fixed_per_row += 16
    return fixed_per_row, aggs


def checkpointed_storage_bytes(df: DataFrame):
    """Exact stored bytes of an already-materialized localCheckpoint, read
    from the driver's block-manager registry — ZERO Spark jobs.

    Returns None unless `df` is exactly a (local)checkpointed frame (root
    plan node LogicalRDD) whose RDD is FULLY cached right now; callers
    fall back to the one-job `estimated_df_bytes` measurement.  The value
    is the JVM's own deserialized storage footprint (mem + spilled disk),
    the closest real proxy for what a broadcast of the frame would
    occupy — measured, not assumed, so it honors the same guard
    discipline (a backfill-sized frame reports its true giant size).
    Only the exact-LogicalRDD root qualifies: any projection on top could
    change the payload, so renamed/derived frames pay the aggregate."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.nodeName() != "LogicalRDD":
            return None
        rid = plan.rdd().id()
        for info in df.sparkSession.sparkContext._jsc.sc().getRDDStorageInfo():
            if (
                info.id() == rid
                and info.numCachedPartitions() == info.numPartitions()
            ):
                return int(info.memSize() + info.diskSize())
    except Exception:
        return None
    return None


def estimated_df_bytes(df: DataFrame, row_overhead: int = 32) -> int:
    """Conservative in-memory byte estimate for `df`, measured by ONE
    aggregate job: per-row overhead + a flat 16 bytes per fixed-width
    column + the MEASURED payload of every string/binary/complex column
    (2 bytes/char, the JVM's UTF-16 in-memory width; complex types via
    their JSON rendering).  Measuring instead of assuming a per-row
    constant is the point: a guard fed a flat estimate is defeated by
    exactly the wide-payload backfill it exists for (the
    fold_value_deltas lesson — document text underestimates ~40x).
    Costs one pass over `df`; callers on a hot path hand it an
    already-materialized frame."""
    fixed_per_row, aggs = byte_estimate_aggs(df, row_overhead)
    row = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[a.alias(f"_b{i}") for i, a in enumerate(aggs)],
    ).first()
    payload = sum(row[f"_b{i}"] or 0 for i in range(len(aggs)))
    return int(row["_n"] * fixed_per_row + payload)


def broadcast_measured(df: DataFrame) -> DataFrame:
    """Measure-then-hint for an O(change) frame that joins stored state.

    The incremental maintainers join small netted change frames
    (localCheckpointed — LogicalRDD, whose size Catalyst estimates as
    defaultSizeInBytes = huge) against parquet-backed state, so the
    planner picks a sort-merge join and shuffles the STATE side
    (plans/r13/bm25_incremental_docs_before.txt: 7 SortMergeJoins).  One
    cheap aggregate over the materialized frame gives a real size; under
    the session threshold the hint makes the join broadcast-hash and the
    state side is never shuffled (guide §3.1) — past it (a backfill
    batch) the join degrades to a shuffle as before.  Hand this an
    already-checkpointed frame: the measurement re-executes the plan —
    and an EAGERLY checkpointed frame skips the measurement job entirely
    (its stored size is read off the block manager)."""
    return broadcast_if_small(df, measured_df_bytes(df))


def measured_df_bytes(df: DataFrame) -> int:
    """Real measured size of `df`: the zero-job stored-bytes fast path
    when the frame is an already-materialized checkpoint, else the
    one-aggregate-job estimate."""
    est = checkpointed_storage_bytes(df)
    if est is None:
        est = estimated_df_bytes(df)
    return est


def broadcast_if_small(df: DataFrame, est_bytes: int) -> DataFrame:
    """Hint `df` for broadcast only when the caller's size estimate fits
    under the session threshold; otherwise return it unhinted so the join
    falls back to a shuffle.  The estimate is the caller's job (row count
    x a conservative per-row constant) because computing a real size
    would cost the very materialization the guard exists to bound."""
    threshold = broadcast_threshold_bytes(df.sparkSession)
    # threshold <= 0 is the user's "never broadcast" — honored even for a
    # 0-row estimate (0 <= 0 must NOT hint)
    if 0 < threshold and est_bytes <= threshold:
        return F.broadcast(df)
    return df
