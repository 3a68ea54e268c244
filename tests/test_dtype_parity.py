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


def _all_names():
    """Every oracle-backed registry row — any of them can rotate into the
    driver window, so the scalar-output lint covers them all.  The three
    rows-only queries are exempt (never hash-canonicalized; policy keeps
    them out of the window)."""
    from delta_go_spark.queries import oracle_sql, queries

    osql = oracle_sql()
    return [n for n in queries() if n in osql]


@pytest.fixture(scope="module")
def duck():
    from check_parity import duckdb_for

    return duckdb_for(SF_DIR)


@pytest.mark.parametrize("name", _window_names())
def test_window_dtype_parity(spark, duck, name):
    from check_dtypes import canon_problems, dtype_problems

    from delta_go_spark.queries import registry

    fn, sql = registry()[name]
    sp = fn(spark, SF_DIR).toPandas()
    du = duck.execute(sql).df()
    problems = dtype_problems(sp, du) + canon_problems(sp, du)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(_all_names()))
def test_registry_output_schema_is_scalar(spark, name):
    """Driver output contract, schema level: EVERY registry query (window
    or not — any row can rotate in) must emit scalar-only columns.  The
    driver canonicalizes results with pandas sort_values over all columns,
    which throws on list/dict cells (array/map/struct) and on bytearray
    (binary) — round 10 lost both inverted_index window slots to an
    array<long> column whose VALUES were parity-proven correct."""
    from pyspark.sql import types as T

    from delta_go_spark.queries import registry

    fn, _ = registry()[name]
    schema = fn(spark, SF_DIR).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output columns {complex_cols} can never "
        "produce a driver hash (pandas sort_values cannot order them)"
    )


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


def test_classifier_date_content():
    """object(datetime.date) vs datetime64 is DRIVER-BENIGN — proven by
    date_functions_orders / retention_cohorts_events hash-green r1/r3/r6 while
    carrying it — but object(str) vs datetime64 stays harmful."""
    import datetime

    import pandas as pd

    from check_dtypes import classify_pair

    dates = pd.Series([datetime.date(1996, 1, 1), None], dtype="object")
    stamps = pd.Series(pd.to_datetime(["1996-01-01", None]))
    strs = pd.Series(["1996-01-01", None], dtype="object")
    ints = pd.Series([1, 2])
    assert classify_pair("object", "datetime64[us]", dates, stamps) == "benign"
    assert classify_pair("datetime64[us]", "object", stamps, dates) == "benign"
    assert classify_pair("object", "datetime64[us]", strs, stamps) == "harmful"
    assert classify_pair("object", "int64", dates, ints) == "harmful"
