"""Round gate for pandas-level dtype parity over every driver-window row.

The driver compares pandas frames (Spark .toPandas() vs duckdb .df()), so a
DuckDB HUGEINT output column materializes as float64 while Spark yields
int64 — a value-hash red with numerically equal cells that the value-level
parity gate (check_parity.normalize_cell folds `x.0` -> `x`) can NEVER see.
Round 9 lost two window slots for two rounds to exactly this
(doremi's un-CAST `excess_milli`).  This test runs scripts/check_dtypes.py's
harmful-class audit over every oracle-backed row inside the driver's
50-query window, at sf0.001; benign width/resolution classes
(int32/int64, datetime64[ns]/[us]) are allowlisted in classify_diff —
rows carrying them have been driver hash-green for many rounds.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

SF_DIR = "/root/testdata/sf0.001"


def _window_names():
    from delta_go_spark.queries import oracle_sql, queries

    osql = oracle_sql()
    return [n for n in list(queries())[:50] if n in osql]


@pytest.fixture(scope="module")
def duck():
    from check_parity import duckdb_for

    return duckdb_for(SF_DIR)


@pytest.mark.parametrize("name", _window_names())
def test_window_dtype_parity(spark, duck, name):
    from check_dtypes import dtype_problems

    from delta_go_spark.queries import registry

    fn, sql = registry()[name]
    sp = fn(spark, SF_DIR).toPandas()
    du = duck.execute(sql).df()
    problems = dtype_problems(sp, du)
    assert not problems, f"{name}: {problems}"


def test_classifier_contract():
    """The classifier itself: the r9 failure class must be harmful, the
    driver-proven-benign classes must pass."""
    from check_dtypes import classify_diff

    assert classify_diff("int64", "float64") == "harmful"  # the doremi class
    assert classify_diff("float64", "int64") == "harmful"
    assert classify_diff("object", "int64") == "harmful"
    assert classify_diff("object", "float64") == "harmful"
    assert classify_diff("bool", "int64") == "harmful"
    assert classify_diff("int32", "int64") == "benign"
    assert classify_diff("datetime64[ns]", "datetime64[us]") == "benign"
    assert classify_diff("float64", "float64") == "benign"
