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
