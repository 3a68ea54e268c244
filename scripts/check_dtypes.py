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
    """
    a, b = spark_dtype, duck_dtype
    if a == b:
        return "benign"
    if a in _INT_DTYPES and b in _INT_DTYPES:
        return "benign"
    if a.startswith("datetime64") and b.startswith("datetime64"):
        return "benign"
    return "harmful"


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
        elif a != b and classify_diff(a, b) == "harmful":
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
        bad, benign = [], []
        for c in sorted(set(sd) | set(dd)):
            a, b = sd.get(c), dd.get(c)
            if a == b:
                continue
            msg = f"{c}: spark={a} duck={b}"
            if a is None or b is None or classify_diff(a, b) == "harmful":
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
