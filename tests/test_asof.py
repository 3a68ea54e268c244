"""Unit semantics for the as-of join operator (operators/asof.py).

The registry query asof_attribution_events is hash-checked against DuckDB's
native ASOF JOIN by the driver; these tests pin the edge semantics on a
hand-built frame and the physical plan shape (exactly one shuffle).
"""

import datetime as dt

from pyspark.sql import functions as F

from delta_go_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T10:05:00"), "p2"),
            (1, _ts("2024-01-01T09:00:00"), "p0"),  # before any right row
            (2, _ts("2024-01-01T10:00:00"), "p3"),  # key with no right rows
        ],
        "user_id long, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "click"),  # equal-ts: matches p1
            (1, _ts("2024-01-01T10:01:00"), "view"),
            (3, _ts("2024-01-01T09:59:00"), "other-key"),
        ],
        "user_id long, ts timestamp_ntz, etype string",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["etype"])
    got = {r["tag"]: (r["asof_etype"], r["asof_ts"]) for r in out.collect()}
    assert got["p1"] == ("click", _ts("2024-01-01T10:00:00"))  # ts tie matches
    assert got["p2"] == ("view", _ts("2024-01-01T10:01:00"))  # latest prior wins
    assert got["p0"] == (None, None)  # nothing before it
    assert got["p3"] == (None, None)  # other keys never leak


def test_asof_preserves_left_rowcount_and_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["etype"])
    assert out.count() == left.count()
    assert out.columns == ["user_id", "ts", "tag", "asof_ts", "asof_etype"]


def test_asof_plan_has_single_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["etype"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union+window, never a join node


def test_asof_multi_payload_prefix(spark):
    left, right = _frames(spark)
    right = right.withColumn("score", F.length("etype").cast("double"))
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        payload_cols=["etype", "score"], prefix="prev_",
    )
    row = {r["tag"]: r for r in out.collect()}["p2"]
    assert row["prev_etype"] == "view" and row["prev_score"] == 4.0
