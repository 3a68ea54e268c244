"""Audit pandas-level dtype parity between every queries() entry and its
oracle_sql() — the driver compares pandas frames, where DuckDB's HUGEINT
becomes float64 (e.g. sum(CASE..) over integers) while Spark yields int64,
breaking value hashes even when the values are equal.  Usage:

    python scripts/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
            du = con.execute(oracles[name]).df()
        except Exception as ex:
            bad.append(name)
            print(f"ERR   {name}: {ex}")
            continue
        sd = {c: str(t) for c, t in sp.dtypes.items()}
        dd = {c: str(t) for c, t in du.dtypes.items()}
        diffs = []
        for c in sorted(set(sd) | set(dd)):
            a, b = sd.get(c), dd.get(c)
            if a != b:
                diffs.append(f"{c}: spark={a} duck={b}")
        if diffs:
            bad.append(name)
            print(f"DIFF  {name}: " + "; ".join(diffs))
        else:
            print(f"ok    {name}")
    print(f"\n{len(bad)} dtype mismatches" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
