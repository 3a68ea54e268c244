"""Batch sessionization and retention cohorts over the events stream —
the episode-construction and engagement-audit operators an event pipeline
runs before turning interaction logs into training episodes.

(The streaming twin — session windows with watermark state — lives in
streaming/windows.py; these are the batch/backfill formulations with
exact DuckDB oracles.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.exact import cents as _cents
from delta_go_spark.session import load_table

_GAP_MINUTES = 30


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_minutes: int = _GAP_MINUTES,
) -> DataFrame:
    """Tag every event with a per-user session index (1-based): a new
    session starts when the gap to the previous event exceeds
    `gap_minutes`.  Adds `session_id`.

    Determinism: the gap test runs on integer microseconds
    (timestampdiff on the NTZ column — no session-timezone dependence,
    no float), and ordering ties on the timestamp are broken by
    `order_cols`, so the tagging is exactly replayable on any engine.

    Scale shape: ONE shuffle on the user key serves both window passes
    (lag, then the running new-session count — same partitioning, Spark
    plans a single exchange).  State per user is one row — nothing
    accumulates; a power user with millions of events sorts within one
    partition (the standard sessionization cost; pre-bucketing the event
    store by user removes even that exchange)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        ts_col, *[F.col(c) for c in order_cols]
    )
    # ONE window definition serves both passes; the lag lands in a temp
    # column so the gap expression never re-spells the window as a string
    # (ts_col must be a plain identifier — it is interpolated into the
    # timestampdiff call, the one function with no Column API).
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return (
        df.withColumn("_prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "session_id",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("_prev_ts")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 30-minute-gap sessions with per-session stats —
    event count, span in integer microseconds, distinct event types, and
    the value total in exact integer cents (a float sum would merge in
    engine-specific order)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias(
                "span_us"
            ),
            F.count_distinct("event_type").alias("n_types"),
            _cents(F.sum(F.col("value").cast("decimal(18,6)"))).alias(
                "value_cents"
            ),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = f"""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts)
                   > {_GAP_MINUTES} * 60000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  -- the cumsum MUST order by the same (ts, event_id) key as the tagging
  -- window: ts alone leaves tied rows in engine-chosen order
  SELECT user_id, ts, event_type, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM tagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS start_ts,
       date_diff('microsecond', min(ts), max(ts)) AS span_us,
       count(DISTINCT event_type) AS n_types,
       CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100 + 0.5) AS BIGINT)
         AS value_cents
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in each subsequent activity week — the engagement triangle
    every product/data team reads.  Weeks are Monday-truncated on both
    engines; the offset is an exact integer day difference div 7 (both
    dates are week starts, so it divides evenly).

    Scale shape: events reduce to distinct (user, week) pairs first (one
    partial-aggregable shuffle on user) — cohort assignment is a min over
    that already-tiny frame, and the final matrix is a (cohort, offset)
    aggregate over per-user rows, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    # date_trunc returns LTZ; cast back to NTZ then DATE so the week
    # label is identical under any session time zone.
    week = F.date_trunc("week", F.col("ts")).cast("timestamp_ntz").cast("date")
    uw = ev.select("user_id", week.alias("week")).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first, "user_id")
        .groupBy(
            "cohort_week",
            ((F.datediff(F.col("week"), F.col("cohort_week"))) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
), first AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, uw.week) // 7 AS BIGINT)
         AS week_offset,
       count(*) AS n_users
FROM uw JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


QUERIES: dict = {
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "retention_cohorts_events": (retention_cohorts_events, RETENTION_SQL),
}
