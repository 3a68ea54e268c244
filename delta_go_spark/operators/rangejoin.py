"""Band (range) join — match rows whose timestamps fall within ±band.

ABSENT in the reference (its README.md:14-16 delegates all compute); part
of our §2.B data-plane surface.  DuckDB executes the oracle as a true
inequality join (IEJoin), giving an independent implementation to check
against.

Scale design: Spark turns a bare inequality join condition into
BroadcastNestedLoopJoin — O(|L|·|R|) work and a broadcast of a whole side,
which is unusable at 100 TB.  The canonical fix is bucketing: quantize both
sides' timestamps into band-width buckets, explode the left side into the
three candidate buckets (b-1, b, b+1), hash-join on the bucket id (plus any
equi-keys), and post-filter the exact band predicate.  Cost: one hash
shuffle of 3|L|+|R| rows and an equi-join Catalyst can parallelize — every
candidate pair lands in exactly one bucket, so no dedup pass is needed.

All time arithmetic is integer microseconds from the NTZ epoch
(timezone-free; exact on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.session import load_table

_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"


def _us(col: str):
    return F.expr(_EPOCH_US.format(col=col))


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_seconds: float,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join every left row to the right rows with
    ``|right.right_ts - left.left_ts| <= band_seconds`` (inclusive), plus
    optional equi-``keys``.  Right columns keep their names; callers should
    pre-rename collisions (both ts columns survive as ``left_ts`` /
    ``right_ts``).  ``how='left'`` keeps unmatched left rows with NULLs.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"band_join supports inner/left, got {how!r}")
    band_us = int(band_seconds * 1_000_000)
    lb = F.floor(_us(left_ts) / F.lit(band_us))
    rb = F.floor(_us(right_ts) / F.lit(band_us))
    keys = keys or []

    # The left side is exploded into its three candidate buckets, so the
    # outer-join variant can NOT be expressed as how='left' on the bucket
    # join (every non-matching candidate bucket would emit a spurious NULL
    # row).  Inner-join the buckets, then union back the anti-joined left.
    row_id = "_band_lid"
    lt = left.withColumn(row_id, F.monotonically_increasing_id()).withColumn(
        "_bucket", F.explode(F.sequence(lb - 1, lb + 1))
    )
    rt = right.withColumn("_bucket", rb)
    cond = [lt["_bucket"] == rt["_bucket"]] + [lt[k] == rt[k] for k in keys]
    band_pred = F.abs(_us(right_ts) - _us(left_ts)) <= F.lit(band_us)
    joined = lt.join(rt, cond + [band_pred], "inner").drop(lt["_bucket"])
    for c in [rt["_bucket"]] + [rt[k] for k in keys]:
        joined = joined.drop(c)
    if how == "inner":
        return joined.drop(row_id)
    right_only = [c for c in joined.columns if c not in (*left.columns, row_id)]
    unmatched = (
        lt.drop("_bucket")
        .dropDuplicates([row_id])
        .join(joined.select(row_id), row_id, "left_anti")
        .select(
            *left.columns,
            row_id,
            *[
                F.lit(None).cast(dict(joined.dtypes)[c]).alias(c)
                for c in right_only
            ],
        )
    )
    return joined.unionByName(unmatched).drop(row_id)


# ---------------------------------------------------------------------------
# Registry query: for each purchase, how many error events (any user) landed
# within ±5 minutes?  Reported as a histogram so the output is small and
# stable at every scale factor.
def range_join_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    pairs = band_join(
        purchases, errors, left_ts="ts", right_ts="err_ts",
        band_seconds=300, how="left",
    )
    per_purchase = pairs.groupBy("event_id", "value").agg(
        F.count("err_id").alias("n_nearby_errors")
    )
    # integer cents, same cross-engine hardening as asof/streaming sums
    from delta_go_spark.exact import cents as _cents

    return (
        per_purchase.groupBy("n_nearby_errors")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            _cents(F.sum(F.col("value").cast("decimal(18,6)"))).alias(
                "value_cents"
            ),
        )
        .orderBy("n_nearby_errors")
    )


RANGE_JOIN_SQL = """
WITH p AS (SELECT event_id, ts, value FROM events WHERE event_type = 'purchase'),
     e AS (SELECT event_id AS err_id, ts AS err_ts FROM events
           WHERE event_type = 'error'),
     pairs AS (
       SELECT p.event_id, p.value, e.err_id
       FROM p LEFT JOIN e
         ON abs(epoch_us(e.err_ts) - epoch_us(p.ts)) <= 300000000
     ),
     per_p AS (
       SELECT event_id, value, count(err_id) AS n_nearby_errors
       FROM pairs GROUP BY event_id, value
     )
SELECT n_nearby_errors,
       count(*) AS n_purchases,
       CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100 + 0.5) AS BIGINT)
         AS value_cents
FROM per_p
GROUP BY n_nearby_errors
ORDER BY n_nearby_errors
"""


QUERIES: dict = {
    "range_join_purchase_errors": (range_join_purchase_errors, RANGE_JOIN_SQL),
}
