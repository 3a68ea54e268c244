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


def test_funnel_ordering_and_window(spark):
    """Step k+1 must be AFTER the user's step-k time and within the window
    of step 1; out-of-order or late events don't convert."""
    import datetime as dt

    from delta_go_spark.operators.funnel import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1 converts fully in order
        (1, "signup", ts(0)), (1, "view", ts(10)), (1, "purchase", ts(20)),
        # u2: purchase BEFORE view -> stops at view
        (2, "signup", ts(0)), (2, "purchase", ts(5)), (2, "view", ts(10)),
        # u3: view outside the 1h window -> stops at signup
        (3, "signup", ts(0)), (3, "view", ts(120)),
        # u4: no signup -> never enters
        (4, "view", ts(0)), (4, "purchase", ts(1)),
        # u5: converts at the window edge (inclusive)
        (5, "signup", ts(0)), (5, "view", ts(30)), (5, "purchase", ts(60)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        (r["step"], r["event_type"]): (r["n_users"], r["total_delta_us"])
        for r in funnel(ev, ["signup", "view", "purchase"], 3600).collect()
    }
    assert out[(1, "signup")] == (4, 0)
    assert out[(2, "view")] == (3, (10 + 10 + 30) * 60_000_000)
    assert out[(3, "purchase")] == (2, (20 + 60) * 60_000_000)
