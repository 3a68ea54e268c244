"""Unit semantics for the bucketed band join (operators/rangejoin.py)."""

import datetime as dt

from delta_go_spark.operators.rangejoin import band_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),
            (2, _ts("2024-01-01T12:00:00")),  # isolated: no right row in band
        ],
        "lid long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:55:00")),  # exactly -band (inclusive)
            (11, _ts("2024-01-01T10:04:59")),  # inside
            (12, _ts("2024-01-01T10:05:01")),  # just outside +band
            (13, _ts("2024-01-01T11:00:00")),  # far away
        ],
        "rid long, rts timestamp_ntz",
    )
    return left, right


def test_band_join_inclusive_bounds(spark):
    left, right = _frames(spark)
    out = band_join(left, right, "ts", "rts", band_seconds=300)
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11)]


def test_band_join_left_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = band_join(left, right, "ts", "rts", band_seconds=300, how="left")
    rows = {(r["lid"], r["rid"]) for r in out.collect()}
    assert (2, None) in rows and len(rows) == 3


def test_band_join_no_duplicate_pairs(spark):
    # A right row one bucket below the left's own bucket must match once,
    # not once per exploded candidate bucket.
    left, right = _frames(spark)
    out = band_join(left, right, "ts", "rts", band_seconds=300)
    assert out.count() == out.distinct().count()


def test_band_join_avoids_nested_loop(spark):
    left, right = _frames(spark)
    out = band_join(left, right, "ts", "rts", band_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
