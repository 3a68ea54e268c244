"""Custom stateful streaming operators via applyInPandasWithState.

Where windowed aggregation (windows.py) covers time-bucketed state, this
module covers ARBITRARY per-key state machines — the escape hatch the
brief for a training-data pipeline needs (e.g. per-source running quotas,
cross-batch dedup memories, sequence detectors).

Scale design: state lives in Spark's state store partitioned by key (one
shuffle per micro-batch on the grouping key); each executor sees Arrow
batches per key group, so the Python hop is vectorized.  A timeout evicts
idle keys so state is bounded by ACTIVE keys, not all-time keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    StringType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n", LongType(), False),
        StructField("s", DoubleType(), False),
    ]
)


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Each batch emits the key's cumulative totals so far — the classic
    stateful-accumulator shape (quota tracking, per-source byte budgets).
    With a processing-time timeout, keys idle longer than the timeout are
    evicted (their totals emitted once more on eviction would need
    state.hasTimedOut handling; we simply drop them — bounded state).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, float(s)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Registry entry: the stateful accumulator run through the streaming engine
# on the events table.  One source file -> one micro-batch -> the emission
# IS the per-user aggregate, so the DuckDB oracle checks it exactly.
def stateful_running_totals(spark, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "value")
    )
    out = running_user_totals(stream)
    sink = "stateful_running_totals_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("user_id")


STATEFUL_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


QUERIES: dict = {
    "stateful_running_totals": (stateful_running_totals, STATEFUL_TOTALS_SQL),
}


# ---------------------------------------------------------------------------
# Watermarked streaming sessionization: the applyInPandasWithState state
# machine that turns an event stream into CLOSED 30-min-gap sessions —
# the episode-construction step of a behavioural / agent-trajectory
# training pipeline, and the arbitrary-state generalization of Spark's
# built-in session_window (windows.py session_windows pins that one).
#
# Contract (what makes the DuckDB oracle exact):
#   * state per user = OPEN session fragments (start, end, n, cents),
#     merged order-free — any two fragments closer than the gap collapse —
#     so the result is independent of how events split across batches;
#   * a fragment is emitted exactly once, when the event-time watermark
#     passes fragment_end + gap (provably closed: any event that could
#     still extend it would be later than the fragment's reach, or late
#     beyond the watermark);
#   * the registry query filters to sessions whose closure is provable
#     from the BATCH view (end <= floor_sec(max_ts) - gap - delay - 1s),
#     the same closed-window determinism contract the streaming joins pin.
#
# Scale: state is bounded by ACTIVE sessions (watermark evicts closed
# ones), per-batch work is one shuffle of the batch on user_id + an Arrow
# pass per key group; integer micros + cents keep both engines exact.
_SESSION_GAP_US = 1800 * 1_000_000  # 30 minutes
_SESSION_DELAY_US = 1800 * 1_000_000  # watermark delay
# the withWatermark duration string, the closed-session cutoff and the
# oracle's cutoff constant all derive from the two constants above — editing
# any one alone can no longer silently break the provably-closed contract
assert _SESSION_DELAY_US % 60_000_000 == 0
_SESSION_DELAY_STR = f"{_SESSION_DELAY_US // 60_000_000} minutes"
_SESSION_CUTOFF_US = _SESSION_GAP_US + _SESSION_DELAY_US + 1_000_000

SESSIONIZE_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("value_cents", LongType(), False),
    ]
)

SESSIONIZE_STATE = StructType(
    [
        StructField("starts", ArrayType(LongType()), False),
        StructField("ends", ArrayType(LongType()), False),
        StructField("ns", ArrayType(LongType()), False),
        StructField("cents", ArrayType(LongType()), False),
    ]
)


def merge_fragments(frags: list, gap_us: int) -> list:
    """Collapse session fragments [start, end, n, cents] whose gap is
    below `gap_us` — the pure, ORDER-FREE core of the sessionizer (any
    batch split of the same events folds to the same fragments, which is
    what makes multi-batch replay deterministic).  Module-level so the
    hypothesis split-invariance property can drive it directly."""
    merged: list = []
    for f in sorted(frags):
        if merged and f[0] - merged[-1][1] < gap_us:
            m = merged[-1]
            m[1] = max(m[1], f[1])
            m[2] += f[2]
            m[3] += f[3]
        else:
            merged.append(list(f))
    return merged


def sessionize_stream(
    events: DataFrame,
    gap_us: int = _SESSION_GAP_US,
    key_col: str = "user_id",
) -> DataFrame:
    """events(user_id, ts_us, cents, ts_wm watermarked) -> closed sessions.

    Emits (user_id, session_start_us, session_end_us, n_events,
    value_cents) in append mode; open fragments stay in state until the
    watermark closes them (EventTimeTimeout drives emission for keys with
    no new data)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        frags: list[list[int]] = []
        if state.exists:
            s_, e_, n_, c_ = state.get
            frags = [list(x) for x in zip(s_, e_, n_, c_)]
        new = []
        for pdf in pdfs:
            for t, c in zip(pdf["ts_us"], pdf["cents"]):
                new.append([int(t), int(t), 1, int(c)])
        if new:
            frags = merge_fragments(frags + new, gap_us)
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        closed = [f for f in frags if f[1] + gap_us <= wm_us]
        open_ = [f for f in frags if f[1] + gap_us > wm_us]
        if open_:
            state.update(
                (
                    [f[0] for f in open_],
                    [f[1] for f in open_],
                    [f[2] for f in open_],
                    [f[3] for f in open_],
                )
            )
            # earliest instant any open fragment becomes provably closed;
            # must be strictly ahead of the current watermark
            due_ms = (min(f[1] for f in open_) + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(due_ms, wm_ms + 1))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [f[0] for f in closed],
                    "session_end_us": [f[1] for f in closed],
                    "n_events": [f[2] for f in closed],
                    "value_cents": [f[3] for f in closed],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=SESSIONIZE_OUTPUT,
        stateStructType=SESSIONIZE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _time_ordered_event_split(spark, sf_dir: str) -> str:
    """Build (once per fixture content) a 4-file TIME-ORDERED split of the
    events table — ts quartiles with staggered mtimes, so the file stream
    source (oldest-first by default) replays the table as 4 micro-batches
    in event order.  The ordered split is what makes cross-batch lateness
    structurally impossible for the stateful streaming queries."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from delta_go_spark.session import fixture_cache_path, fixture_sig, load_table

    # content signature in the cache name: a regenerated events fixture
    # under the same sf path must rebuild the replay split, never serve
    # stale quartiles against a fresh oracle (same contract as the
    # bucketed-table cache); rendered via fixture_cache_path (r10) —
    # same physical path, one scheme repo-wide
    src = fixture_cache_path(
        "stream", sf_dir, f"ev4t_{fixture_sig(sf_dir, 'events')}"
    )
    if not os.path.isdir(src) or len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    ) != 4:
        shutil.rmtree(src, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        from pyspark.sql import Window

        # fixture build only: the single-task ntile window runs once per
        # (sf, content) cache fill, never in the measured query
        q = F.ntile(4).over(Window.orderBy("ts", "event_id"))
        evq = ev.withColumn("_q", q)
        for i in range(1, 5):
            before = set(os.listdir(src)) if os.path.isdir(src) else set()
            evq.filter(F.col("_q") == i).drop("_q").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            new = [
                f
                for f in os.listdir(src)
                if f.endswith(".parquet") and f not in before
            ]
            # staggered mtimes pin the file source's replay order to event
            # order (oldest-first is the source's default)
            for f in new:
                os.utime(os.path.join(src, f), (1_000_000 + i, 1_000_000 + i))
    return src


def _replay_sessionize(spark, src: str, sink: str) -> None:
    """Run the watermarked sessionizer over a staggered-mtime replay split
    (one micro-batch per file, oldest first) into a memory sink — the
    shared engine body of the in-order and late-data registry queries."""
    from pyspark.sql import functions as F

    _prev_tz = spark.conf.get("spark.sql.session.timeZone")
    _prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the state store materializes one provider per shuffle partition per
    # micro-batch; a vanilla 200-partition session pays 1000 empty state
    # files for a 150-key stream — pin a core-count-scale width (restored
    # below; at real scale this is sized to the key cardinality)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, spark.sparkContext.defaultParallelism)),
    )
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(
                "user_id",
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).alias("ts_us"),
                F.floor(F.col("value") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
                # NTZ -> LTZ cast is uniform under the UTC pin, so the
                # watermark clock and ts_us share one frame
                F.col("ts").cast("timestamp").alias("ts_wm"),
            )
            .withWatermark("ts_wm", _SESSION_DELAY_STR)
        )
        out = sessionize_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", _prev_tz)
        spark.conf.set("spark.sql.shuffle.partitions", _prev_sp)


def _closed_sessions(spark, sink: str, max_us: int) -> DataFrame:
    """Filter a sessionize sink to the batch-provable cutoff below the
    final watermark, making the streaming result deterministic and
    hash-checkable (max_us = max on-time event time in micros)."""
    from pyspark.sql import functions as F

    cutoff_us = (max_us // 1_000_000) * 1_000_000 - _SESSION_CUTOFF_US
    return (
        spark.table(sink)
        .filter(F.col("session_end_us") <= cutoff_us)
        .orderBy("user_id", "session_start_us")
    )


def _max_event_us(df) -> int:
    from pyspark.sql import functions as F

    return df.agg(
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', max(ts))"
        ).alias("m")
    ).first()["m"]


def streaming_sessionize_events(spark, sf_dir: str) -> DataFrame:
    """Registry query: events split into 4 TIME-ORDERED source files (ts
    quartiles, staggered mtimes so the file source replays them in event
    order) -> 4 watermarked micro-batches through the sessionizer ->
    closed sessions, filtered to the batch-provable cutoff so the result
    is deterministic and hash-checkable against the islands-and-gaps SQL."""
    from delta_go_spark.session import load_table

    src = _time_ordered_event_split(spark, sf_dir)
    sink = "streaming_sessionize_sink"
    _replay_sessionize(spark, src, sink)
    return _closed_sessions(
        spark, sink, _max_event_us(load_table(spark, sf_dir, "events"))
    )


def _sessionize_oracle_sql(source: str, prefix_ctes: str = "") -> str:
    """ONE rendering of the islands-and-gaps session oracle, parameterized
    by the event source relation — the in-order and late-data queries can
    never drift apart on session semantics or the cutoff constant."""
    return f"""
WITH {prefix_ctes}o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM {source}
), marked AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= {_SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM o
), numbered AS (
  -- the cumsum MUST order by the same (ts, event_id) key as the tagging
  -- window: ts alone leaves tied rows in engine-chosen order
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sess AS (
  SELECT user_id,
         min(ts_us) AS session_start_us,
         max(ts_us) AS session_end_us,
         count(*) AS n_events,
         CAST(sum(cents) AS BIGINT) AS value_cents
  FROM numbered GROUP BY user_id, sid
), cut AS (
  SELECT (max(epoch_us(ts)) // 1000000) * 1000000 - {_SESSION_CUTOFF_US} AS c
  FROM {source}
)
SELECT user_id, session_start_us, session_end_us, n_events, value_cents
FROM sess WHERE session_end_us <= (SELECT c FROM cut)
ORDER BY user_id, session_start_us
"""


STREAMING_SESSIONIZE_SQL = _sessionize_oracle_sql("events")


QUERIES["streaming_sessionize_events"] = (
    streaming_sessionize_events,
    STREAMING_SESSIONIZE_SQL,
)


# ---------------------------------------------------------------------------
# Late-data watermark contract, hash-verified.  Every other streaming row
# replays in event order, which makes lateness structurally impossible —
# so the DROP side of the watermark semantics was never value-checked.
# This query replays a 5th, OUT-OF-ORDER file after the 4 in-order
# quartiles: a deterministic "late set" L of early events (first decile
# by time, event_id % 7 == 3) is withheld from the quartile files and
# delivered last, when the watermark has advanced weeks past them.
#
# Engine contract (probed, Spark 4): applyInPandasWithState with
# EventTimeTimeout drops input rows at ts <= the LATE-EVENTS watermark,
# which lags eviction by one batch — during batch 5 that is
# max(ts through batch 3) - delay.  L sits in the first decile of a
# 30-day span, weeks below that line, so every L row is provably dropped
# (the build asserts the margin).  The oracle is therefore the SAME
# islands chain over events-minus-L — rendered by the shared
# _sessionize_oracle_sql so the two queries cannot drift.
_LATE_DECILE_DIV = 10  # L's time slice: first (range // 10) of the span
_LATE_MOD = 7
_LATE_RESIDUE = 3


def _late_pred_bounds(spark, sf_dir: str) -> tuple[int, int]:
    """(mn_us, cut_us): the late-set predicate is
    epoch_us(ts) <= cut_us AND event_id % MOD == RESIDUE, with
    cut_us = mn + (mx - mn) // DIV — integer-exact on both engines."""
    from pyspark.sql import functions as F

    from delta_go_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', min(ts))"
        ).alias("mn"),
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', max(ts))"
        ).alias("mx"),
    ).first()
    mn, mx = int(row["mn"]), int(row["mx"])
    return mn, mn + (mx - mn) // _LATE_DECILE_DIV


def _late_replay_event_split(spark, sf_dir: str) -> str:
    """Build (once per fixture content) the 5-file OUT-OF-ORDER replay
    split: files 1-4 = ts quartiles of the on-time events (staggered
    mtimes, in order), file 5 (newest mtime) = the late set L — replayed
    after the watermark has passed it."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from delta_go_spark.session import fixture_cache_path, fixture_sig, load_table

    src = fixture_cache_path(
        "stream", sf_dir, f"ev5late_{fixture_sig(sf_dir, 'events')}"
    )
    if not os.path.isdir(src) or len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    ) != 5:
        shutil.rmtree(src, ignore_errors=True)
        _, cut_us = _late_pred_bounds(spark, sf_dir)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "_us",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
        late_pred = (F.col("_us") <= cut_us) & (
            F.col("event_id") % _LATE_MOD == _LATE_RESIDUE
        )
        ontime = ev.filter(~late_pred)
        late = ev.filter(late_pred)
        # the drop proof needs every late row at or below the late-events
        # watermark of batch 5 = max(ts through batch 3) - delay; quartile
        # 3's max bounds that from below
        from pyspark.sql import Window

        q = F.ntile(4).over(Window.orderBy("ts", "event_id"))
        otq = ontime.withColumn("_q", q)
        q3_max = otq.filter(F.col("_q") <= 3).agg(F.max("_us")).first()[0]
        late_max = late.agg(F.max("_us")).first()[0]
        if late_max is None:
            raise ValueError("late set is empty — tune the predicate")
        if late_max > q3_max - _SESSION_DELAY_US - 2_000_000:
            raise ValueError(
                f"late set not provably late: max(L)={late_max} vs "
                f"batch-5 late watermark floor {q3_max - _SESSION_DELAY_US}"
            )
        for i in range(1, 6):
            before = set(os.listdir(src)) if os.path.isdir(src) else set()
            part = (
                otq.filter(F.col("_q") == i).drop("_q", "_us")
                if i <= 4
                else late.drop("_us")
            )
            part.coalesce(1).write.mode("append").parquet(src)
            new = [
                f
                for f in os.listdir(src)
                if f.endswith(".parquet") and f not in before
            ]
            for f in new:
                os.utime(os.path.join(src, f), (1_000_000 + i, 1_000_000 + i))
    return src


def streaming_late_data_events(spark, sf_dir: str) -> DataFrame:
    """Registry query: the 4 in-order quartiles plus the out-of-order late
    file through the watermarked sessionizer; the engine drops the late
    rows (ts weeks below the watermark), so closed sessions equal the
    islands oracle over events-minus-L — the hash check IS the watermark
    drop contract."""
    from delta_go_spark.session import load_table

    src = _late_replay_event_split(spark, sf_dir)
    sink = "streaming_late_data_sink"
    _replay_sessionize(spark, src, sink)
    # cutoff from the on-time max == global max: the late predicate only
    # selects first-decile timestamps, never the span's maximum
    return _closed_sessions(
        spark, sink, _max_event_us(load_table(spark, sf_dir, "events"))
    )


_LATE_PREFIX_CTES = f"""b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
), ontime AS (
  SELECT e.* FROM events e, b
  WHERE NOT (epoch_us(e.ts) <= b.mn + (b.mx - b.mn) // {_LATE_DECILE_DIV}
             AND e.event_id % {_LATE_MOD} = {_LATE_RESIDUE})
), """

STREAMING_LATE_DATA_SQL = _sessionize_oracle_sql("ontime", _LATE_PREFIX_CTES)


QUERIES["streaming_late_data_events"] = (
    streaming_late_data_events,
    STREAMING_LATE_DATA_SQL,
)


# ---------------------------------------------------------------------------
# Streaming per-key quota gate: accept the FIRST `quota` events of each key
# in event order, reject the rest — the in-flight ingestion-budget
# enforcer (per-source token/byte quotas, per-tenant rate caps) and the
# running-quota state machine this module's docstring promises.  Contrast
# with sessionize_stream: no watermark at all — acceptance depends only on
# the processed PREFIX in (ts, event_id) order, which the time-ordered
# replay split makes identical to the global event order, so the oracle
# is a plain row_number() <= quota.
#
# Scale: state per key is ONE integer — the count of events SEEN so far
# (with in-order replay, seen-prefix == accept-prefix, which is the
# invariant the correctness proof rests on; it is NOT an accepted-only
# counter).  Per-batch work is one shuffle of the batch on the key + an
# Arrow pass that sorts only the key's batch slice; keys past quota emit
# nothing, so output volume is bounded by quota x keys.
_QUOTA_PER_KEY = 500

QUOTA_GATE_OUTPUT = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts_us", LongType(), False),
        StructField("cents", LongType(), False),
        StructField("accept_rank", LongType(), False),
    ]
)

# n = events SEEN for the key so far (not accepted): the accept decision
# is n < quota only because replay is in order, see module comment above
QUOTA_GATE_STATE = StructType([StructField("n", LongType(), False)])


def quota_gate_stream(
    events: DataFrame,
    quota: int = _QUOTA_PER_KEY,
    key_col: str = "event_type",
) -> DataFrame:
    """events(key, event_id, ts_us, cents) -> accepted events with their
    acceptance rank.  Deterministic given in-order batch replay: within a
    batch the key's rows are sorted by (ts_us, event_id) before the
    running counter applies."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if n >= quota or batch.empty:
            state.update((n + len(batch),))
            return
        batch = batch.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        take = min(quota - n, len(batch))
        acc = batch.iloc[:take]
        state.update((n + len(batch),))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * take,
                "event_id": acc["event_id"].astype("int64"),
                "ts_us": acc["ts_us"].astype("int64"),
                "cents": acc["cents"].astype("int64"),
                "accept_rank": range(n + 1, n + take + 1),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=QUOTA_GATE_OUTPUT,
        stateStructType=QUOTA_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quota_gate_events(spark, sf_dir: str) -> DataFrame:
    """Registry query: the 4-batch time-ordered replay through the quota
    gate, then a per-key aggregate of the ACCEPTED set — count, integer
    cents, and an id checksum pinning exactly WHICH events made the cut."""
    from pyspark.sql import functions as F

    src = _time_ordered_event_split(spark, sf_dir)

    _prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, spark.sparkContext.defaultParallelism)),
    )
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(
                "event_type",
                "event_id",
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).alias("ts_us"),
                F.floor(F.col("value") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
            )
        )
        out = quota_gate_stream(stream)
        sink = "streaming_quota_gate_sink"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _prev_sp)

    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_accepted"),
            F.sum("cents").alias("cents_accepted"),
            F.sum("event_id").alias("id_checksum"),
            F.max("ts_us").alias("last_accepted_us"),
            F.max("accept_rank").alias("max_rank"),
        )
        .orderBy("event_type")
    )


STREAMING_QUOTA_GATE_SQL = f"""
WITH r AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS rk
  FROM events
)
SELECT event_type,
       count(*) AS n_accepted,
       CAST(sum(cents) AS BIGINT) AS cents_accepted,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       max(ts_us) AS last_accepted_us,
       CAST(max(rk) AS BIGINT) AS max_rank
FROM r WHERE rk <= {_QUOTA_PER_KEY}
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["streaming_quota_gate_events"] = (
    streaming_quota_gate_events,
    STREAMING_QUOTA_GATE_SQL,
)
