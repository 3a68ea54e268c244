"""As-of (most-recent-prior) join — a time-series operator Spark lacks
natively.

The reference engine has no data plane at all (reference README.md:14-16
delegates compute); this is part of the §2.B data-plane surface our engine
adds on top of snapshots.  DuckDB (the oracle) ships a native ASOF JOIN,
which gives us an independently-implemented semantics check.

Scale design: the naive formulation — an inequality join
(``l.ts >= r.ts``) followed by a per-left-row argmax — becomes a broadcast
nested-loop join in Spark (O(|L|·|R|) per key, unusable at 100 TB).
Instead we use the canonical distributed as-of plan:

1. tag both sides and union them (no shuffle yet),
2. ONE hash shuffle on the join key,
3. per-partition sort by (ts, side) — right rows sort before left rows at
   equal timestamps, making the join inclusive,
4. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
   window carries the latest right payload forward to each left row.

Cost: exactly one shuffle of |L|+|R| rows, sort within partitions, no join
node, no skewed build side.  This is the plan a hand-written
MergeJoin-with-state would produce, expressed with stock Catalyst
operators (WindowExec after a single Exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_go_spark.session import load_table

_SIDE = "_asof_side"
_PAYLOAD = "_asof_payload"
_ROW = "_asof_row"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    right row with the greatest ``ts_col`` <= the left row's ``ts_col``
    within the same ``on`` group (NULLs when no prior right row exists).

    ``payload_cols`` are right-side columns surfaced as ``{prefix}{col}``;
    the matched right timestamp is surfaced as ``{prefix}{ts_col}``.

    Ties: right rows at exactly the left row's timestamp DO match
    (inclusive).  Multiple right rows at the same (key, ts) resolve to the
    one latest in the window order — supply a unique ts per key for fully
    deterministic output, as DuckDB's ASOF JOIN has the same caveat.
    """
    carried = [ts_col, *payload_cols]
    rt = right.select(
        *on,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in carried]).alias(_PAYLOAD),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{t}" for c, t in left.dtypes) + ">"
        ).alias(_ROW),
    )
    lt = left.select(
        *on,
        F.col(ts_col).alias(ts_col),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(rt.schema[_PAYLOAD].dataType.simpleString()).alias(_PAYLOAD),
        F.struct(*[F.col(c) for c in left.columns]).alias(_ROW),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        rt.unionByName(lt)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )
    out_cols: list[Column] = [
        F.col(f"{_ROW}.`{c}`").alias(c) for c in left.columns
    ]
    out_cols += [
        F.col(f"{_PAYLOAD}.`{c}`").alias(f"{prefix}{c}") for c in carried
    ]
    return matched.select(*out_cols)


# ---------------------------------------------------------------------------
# Registry query: purchase attribution — each purchase joined to the user's
# most recent prior non-purchase event, aggregated by that prior event type.
# Gap arithmetic is integer microseconds (timezone-free on NTZ; exact long
# sums on both engines, divided once at the end).
def asof_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    others = ev.filter(F.col("event_type") != "purchase").withColumnRenamed(
        "event_type", "prior_type"
    )
    joined = asof_join(
        purchases,
        others,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["prior_type"],
    )
    gap_us = F.expr("timestampdiff(MICROSECOND, asof_ts, ts)")
    # integer cents / centiseconds: rounding a DOUBLE at 2dp can flip the
    # last digit cross-engine (Spark HALF_UP on the shortest repr vs
    # DuckDB on the binary value) — same hardening as the streaming sums
    from delta_go_spark.exact import cents as _cents

    return (
        joined.groupBy(F.coalesce("asof_prior_type", F.lit("none")).alias("prior_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            _cents(F.sum(F.col("value").cast("decimal(18,6)"))).alias(
                "value_cents"
            ),
            F.floor(
                F.try_divide(F.sum(gap_us).cast("double"), F.count(gap_us))
                / F.lit(1000000.0)
                * 100
                + 0.5
            ).cast("long").alias("avg_gap_cs"),
        )
        .orderBy("prior_type")
    )


ASOF_ATTRIBUTION_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     o AS (SELECT user_id, ts, event_type AS prior_type
           FROM events WHERE event_type <> 'purchase'),
     j AS (
       SELECT p.value, p.ts, o.prior_type, o.ts AS prior_ts
       FROM p ASOF LEFT JOIN o
         ON p.user_id = o.user_id AND p.ts >= o.ts
     )
SELECT coalesce(prior_type, 'none') AS prior_type,
       count(*) AS n_purchases,
       CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100 + 0.5) AS BIGINT)
         AS value_cents,
       CAST(floor(CAST(sum(epoch_us(ts) - epoch_us(prior_ts)) AS DOUBLE)
                  / count(prior_ts) / 1000000.0 * 100 + 0.5) AS BIGINT)
         AS avg_gap_cs
FROM j
GROUP BY 1
ORDER BY 1
"""


QUERIES: dict = {
    "asof_attribution_events": (asof_attribution_events, ASOF_ATTRIBUTION_SQL),
}
