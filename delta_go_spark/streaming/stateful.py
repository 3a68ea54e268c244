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
