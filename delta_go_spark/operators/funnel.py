"""Funnel analysis — ordered multi-step conversion over an event stream.

ABSENT in the reference (its README.md:14-16 delegates all compute); a
first-class product-analytics operator every event pipeline needs: how
many users performed step-1, then step-2 AFTER it, then step-3 after
that, all within a window of the first step.

Scale shape: one aggregate per funnel step, every one keyed on the SAME
user column — Catalyst plans a single hash partitioning and REUSES the
exchange across the per-step joins, so a k-step funnel costs one shuffle
of (user, ts) pairs plus k cheap co-partitioned joins, never a per-user
collect or a cross join.  All time arithmetic is integer microseconds
from the NTZ epoch (timezone-free, exact on both engines — the oracle's
sums are BIGINT micro-deltas, never order-dependent float sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.operators.rangejoin import _us
from delta_go_spark.session import load_table


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, event_type, n_users, total_delta_us): users reaching each
    successive step, where step k+1 counts the user's EARLIEST step-k+1
    event at-or-after their step-k time, and every step must land within
    `within_seconds` of the user's step-1 time.  total_delta_us is the
    exact integer sum of (step_ts - step1_ts) microseconds over reaching
    users — a drop-off latency measure that hash-compares exactly.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    win_us = int(within_seconds * 1_000_000)
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        _us(ts_col).alias("us"),
    )
    # step 1: earliest occurrence per user
    reached = ev.filter(F.col("t") == steps[0]).groupBy("u").agg(
        F.min("us").alias("s1")
    ).withColumn("prev", F.col("s1"))
    out_rows = [reached.select(F.lit(1).alias("step"), F.lit(steps[0]).alias("event_type"), "u", (F.col("prev") - F.col("s1")).alias("delta"))]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("t") == step)
            .join(reached.select("u", "s1", "prev"), "u")
            .filter((F.col("us") >= F.col("prev")) & (F.col("us") <= F.col("s1") + F.lit(win_us)))
            .groupBy("u", "s1")
            .agg(F.min("us").alias("cur"))
        )
        reached = nxt.select("u", "s1", F.col("cur").alias("prev"))
        out_rows.append(
            reached.select(
                F.lit(i).alias("step"),
                F.lit(step).alias("event_type"),
                "u",
                (F.col("prev") - F.col("s1")).alias("delta"),
            )
        )
    all_steps = out_rows[0]
    for r in out_rows[1:]:
        all_steps = all_steps.unionByName(r)
    return (
        all_steps.groupBy("step", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("delta").alias("total_delta_us"),
        )
        .orderBy("step")
    )


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the signup -> view -> purchase funnel within 24h of
    signup, over the events table."""
    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["signup", "view", "purchase"], within_seconds=86400)


FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us FROM events
), s1 AS (
  SELECT u, min(us) AS s1 FROM ev WHERE t = 'signup' GROUP BY u
), s2 AS (
  SELECT ev.u, s1.s1, min(ev.us) AS cur
  FROM ev JOIN s1 ON ev.u = s1.u
  WHERE ev.t = 'view' AND ev.us >= s1.s1 AND ev.us <= s1.s1 + 86400000000
  GROUP BY ev.u, s1.s1
), s3 AS (
  SELECT ev.u, s2.s1, min(ev.us) AS cur
  FROM ev JOIN s2 ON ev.u = s2.u
  WHERE ev.t = 'purchase' AND ev.us >= s2.cur
    AND ev.us <= s2.s1 + 86400000000
  GROUP BY ev.u, s2.s1
), steps AS (
  SELECT 1 AS step, 'signup' AS event_type, u, CAST(0 AS BIGINT) AS delta
  FROM s1
  UNION ALL
  SELECT 2, 'view', u, cur - s1 FROM s2
  UNION ALL
  SELECT 3, 'purchase', u, cur - s1 FROM s3
)
SELECT step, event_type,
       count(*) AS n_users,
       CAST(sum(delta) AS BIGINT) AS total_delta_us
FROM steps
GROUP BY step, event_type
ORDER BY step
"""


QUERIES: dict = {
    "funnel_conversion_events": (funnel_conversion_events, FUNNEL_SQL),
}
