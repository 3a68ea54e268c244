"""Funnel analysis — ordered multi-step conversion over an event stream.

ABSENT in the reference (its README.md:14-16 delegates all compute); a
first-class product-analytics operator every event pipeline needs: how
many users performed step-1, then step-2 AFTER it, then step-3 after
that, all within a window of the first step.

Scale shape: ONE scan of the events table and ONE user-keyed shuffle for
the whole k-step funnel.  The per-step "earliest event at-or-after the
previous step" times are chained unbounded window minimums over the same
user partitioning (k Window operators share one Exchange + Sort), the
per-user row collapses in the already-co-partitioned aggregate, and the
final per-step counts land in a single global aggregate unpivoted with
stack() — never a per-user collect, a cross join, or a per-step rescan
(the pre-r13 formulation scanned events once per step and chained
per-step joins: 3 scans and 8 exchanges at k=3, see
plans/r13/funnel_conversion_events_before.txt).  All time arithmetic is
integer microseconds from the NTZ epoch (timezone-free, exact on both
engines — the oracle's sums are BIGINT micro-deltas, never
order-dependent float sums).
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
    from pyspark.sql import Window

    win_us = int(within_seconds * 1_000_000)
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        _us(ts_col).alias("us"),
    )
    # Chained window minimums over ONE user partitioning: _s1 is the
    # user's earliest step-1 time; _sk the earliest step-k event
    # at-or-after _s(k-1) and within the window of _s1.  Each withColumn
    # is its own Window operator but they all share the single Exchange +
    # Sort on u.  The u-NOT-NULL guard on steps >= 2 replicates the old
    # join formulation exactly (an equi-join never matched a NULL user,
    # while step 1's groupBy kept the NULL group).
    w = Window.partitionBy("u")
    df = ev.withColumn(
        "_s1", F.min(F.when(F.col("t") == steps[0], F.col("us"))).over(w)
    )
    prev = "_s1"
    step_cols = ["_s1"]
    for i, step in enumerate(steps[1:], start=2):
        c = f"_s{i}"
        cond = (
            (F.col("t") == step)
            & F.col("u").isNotNull()
            & (F.col("us") >= F.col(prev))
            & (F.col("us") <= F.col("_s1") + F.lit(win_us))
        )
        df = df.withColumn(c, F.min(F.when(cond, F.col("us"))).over(w))
        prev = c
        step_cols.append(c)
    # one row per user (co-partitioned after the window — no new
    # exchange; the step columns are constant within the partition)
    per_user = df.groupBy("u").agg(
        *[F.max(c).alias(c) for c in step_cols]
    )
    # single global aggregate: per-step reach count + exact integer
    # latency sum, unpivoted to one row per step.  count(_sk) skips
    # NULLs, so it counts exactly the users whose step-k event exists;
    # a step nobody reached had NO group in the old union formulation,
    # hence the n_users > 0 filter.
    aggs = []
    for i, c in enumerate(step_cols, start=1):
        aggs.append(F.count(F.col(c)).alias(f"_n{i}"))
        aggs.append(
            F.sum(F.col(c) - F.col("_s1")).alias(f"_d{i}")
        )
    row = per_user.agg(*aggs)
    # Unpivot via explode over an array of literal-tagged structs — pure
    # column expressions, no SQL interpolation (the stack()/selectExpr
    # form escaped step names by doubling single quotes, but Spark SQL
    # concatenates adjacent string literals, so a quote-bearing step name
    # silently lost its quote and a trailing backslash misparsed — the
    # r13 ADVICE finding).  Identical Generate-node plan shape.
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.lit(step).alias("event_type"),
                F.col(f"_n{i}").alias("n_users"),
                F.col(f"_d{i}").alias("total_delta_us"),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return (
        row.select(F.explode(entries).alias("_e"))
        .select("_e.step", "_e.event_type", "_e.n_users", "_e.total_delta_us")
        .filter(F.col("n_users") > 0)
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
