"""Audit pandas-level dtype parity between every queries() entry and its
oracle_sql() — the driver compares pandas frames, where DuckDB's HUGEINT
becomes float64 (e.g. sum(CASE..) over integers, or any arithmetic that
descends from an un-CAST sum()) while Spark yields int64, breaking value
hashes even when every cell is numerically equal.  Round 9's two red driver
rows (doremi_weights_docs, doremi_incremental_docs) were exactly this class:
`excess_milli` lacked a CAST AS BIGINT, and check_parity's normalize_cell
folds `x.0` back to `x` so the local value-hash gate can never reproduce it.

Diffs are CLASSIFIED: width/resolution-only differences (int32 vs int64,
datetime64[ns] vs datetime64[us]) are BENIGN — rows carrying them have been
driver hash-green for many rounds, because the driver's value compare sees
equal Python scalars.  float-vs-int and object-vs-numeric are HARMFUL — they
change the normalized value repr in the driver's frame compare.  The exit
code reflects HARMFUL diffs only, making this a round gate:

    python scripts/check_dtypes.py [sf_dir] [query ...]   # 0 = gate green
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_INT_DTYPES = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"}


def classify_diff(spark_dtype: str, duck_dtype: str) -> str:
    """'benign' for width/resolution-only divergence, 'harmful' otherwise.

    Benign classes (proven harmless by rows that are driver hash-green while
    carrying them — e.g. q3, sessionize_events, window_topk_orders):
      * integer width:  int32 vs int64 (DuckDB keeps INTEGER where Spark
        widens to long, or vice versa) — equal Python ints either way.
      * datetime resolution: datetime64[ns] vs datetime64[us] — pandas 2.x
        resolution tags; equal Timestamps either way.
      * object vs object is not a diff at all (both hit str()).

    Harmful classes (each breaks the driver's value hash with numerically
    equal cells):
      * float64 (or float32) vs any integer dtype — `11721.0` vs `11721`.
      * object vs any numeric dtype — str repr vs numeric repr.
      * bool vs numeric, and anything else unrecognized.

    NOTE dtype strings alone cannot classify object-vs-datetime64: Spark
    DATE columns reach pandas as object-of-datetime.date while DuckDB DATE
    becomes datetime64[us] — a class proven driver-benign by
    date_functions_orders (hash-green r1/r3/r6 while carrying it).  Use
    classify_pair (content-aware) when the actual Series are available;
    this string-only path stays conservative and calls it harmful.
    """
    a, b = spark_dtype, duck_dtype
    if a == b:
        return "benign"
    if a in _INT_DTYPES and b in _INT_DTYPES:
        return "benign"
    if a.startswith("datetime64") and b.startswith("datetime64"):
        return "benign"
    return "harmful"


def _all_datelike(series) -> bool:
    """Every non-null value is a datetime.date/datetime — the content check
    behind the object-vs-datetime64 benign class."""
    import datetime as _dt

    vals = series.dropna()
    if len(vals) == 0:
        return False
    return all(isinstance(v, (_dt.date, _dt.datetime)) for v in vals)


def classify_pair(a_dtype: str, b_dtype: str, a_series, b_series) -> str:
    """Content-aware classification: like classify_diff, plus the
    object(datetime.date) vs datetime64 class, which is driver-benign
    (date_functions_orders and retention_cohorts_events carry it and were
    driver hash-green r1/r3/r6 — the driver's value normalizer folds a
    midnight Timestamp and the matching date to the same repr)."""
    base = classify_diff(a_dtype, b_dtype)
    if base == "benign":
        return "benign"
    pairs = ((a_dtype, a_series, b_dtype), (b_dtype, b_series, a_dtype))
    for obj_dtype, obj_series, other_dtype in pairs:
        if obj_dtype == "object" and other_dtype.startswith("datetime64"):
            if _all_datelike(obj_series):
                return "benign"
    return "harmful"


def driver_canon(pdf):
    """Replay the driver's EXACT result canonicalization: select the
    columns in sorted order, then pandas sort_values over ALL of them.
    This is the step that threw `TypeError: unhashable type: 'list'` on
    the round-10 inverted_index pair — pandas cannot factorize list (or
    dict, or Row) cells — so a query whose output this function cannot
    canonicalize can NEVER produce a driver hash, however correct its
    values (check_parity serializes complex cells and is structurally
    blind to the break).  Returns the canonicalized frame; raises
    whatever pandas raises on a non-scalar or non-orderable cell."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=list(cols))
    return pdf.reset_index(drop=True)


def canon_problems(spark_df_pandas, duck_df_pandas) -> list[str]:
    """Driver-canonicalization replay failures for the two frames
    (importable for the pytest gate).  Empty list = both frames survive
    the driver's sort_values canonicalization."""
    out = []
    for side, frame in (("spark", spark_df_pandas), ("duck", duck_df_pandas)):
        try:
            driver_canon(frame)
        except Exception as ex:  # noqa: BLE001 - any raise = driver err row
            out.append(f"{side} driver-canon replay: {type(ex).__name__}: {ex}")
    return out


def dtype_problems(spark_df_pandas, duck_df_pandas) -> list[str]:
    """HARMFUL dtype diffs between the two pandas frames (importable for the
    pytest gate).  Missing-column asymmetries are reported too — the parity
    check catches those anyway, but a dtype audit should not silently skip
    them."""
    sd = {c: str(t) for c, t in spark_df_pandas.dtypes.items()}
    dd = {c: str(t) for c, t in duck_df_pandas.dtypes.items()}
    out = []
    for c in sorted(set(sd) | set(dd)):
        a, b = sd.get(c), dd.get(c)
        if a is None or b is None:
            out.append(f"{c}: spark={a} duck={b} [missing]")
        elif a != b and classify_pair(a, b, spark_df_pandas[c], duck_df_pandas[c]) == "harmful":
            out.append(f"{c}: spark={a} duck={b} [harmful]")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from delta_go_spark.session import get_spark

    spark = get_spark("dtype-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    harmful = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
            du = con.execute(oracles[name]).df()
        except Exception as ex:
            harmful.append(name)
            print(f"ERR   {name}: {ex}")
            continue
        sd = {c: str(t) for c, t in sp.dtypes.items()}
        dd = {c: str(t) for c, t in du.dtypes.items()}
        bad, benign = list(canon_problems(sp, du)), []
        for c in sorted(set(sd) | set(dd)):
            a, b = sd.get(c), dd.get(c)
            if a == b:
                continue
            msg = f"{c}: spark={a} duck={b}"
            if a is None or b is None or classify_pair(a, b, sp[c], du[c]) == "harmful":
                bad.append(msg)
            else:
                benign.append(msg)
        if bad:
            harmful.append(name)
            print(f"DIFF  {name}: " + "; ".join(bad))
        elif benign:
            print(f"ok~   {name} (benign: " + "; ".join(benign) + ")")
        else:
            print(f"ok    {name}")
    print(f"\n{len(harmful)} harmful dtype mismatches" + (f": {harmful}" if harmful else ""))
    return 1 if harmful else 0


if __name__ == "__main__":
    raise SystemExit(main())
