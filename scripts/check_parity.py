"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, column names and
an order-insensitive value hash.  Usage:

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return normalize_cell(f)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def hash_diff_lines(spark_rows, spark_cols, duck_rows, duck_cols, k=5):
    """First k differing normalized result lines (column-sorted, like the
    hash itself) with a header naming the column order — so any future
    value-hash red is attributable to cells, not a mystery (the r8
    doremi driver mismatch left no trail; this is the generalized fix)."""
    order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    ls = sorted(
        "|".join(normalize_cell(r[i]) for i in order_s) for r in spark_rows
    )
    ld = sorted(
        "|".join(normalize_cell(r[i]) for i in order_d) for r in duck_rows
    )
    out = ["cols: " + "|".join(sorted(spark_cols))]
    shown = 0
    for a, b in zip(ls, ld):
        if a != b:
            out.append(f"spark: {a}")
            out.append(f"duck : {b}")
            shown += 1
            if shown >= k:
                break
    if len(ls) != len(ld):
        out.append(f"(row counts differ: {len(ls)} vs {len(ld)})")
    return out


def duckdb_for(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_one(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run one queries() entry on Spark and its oracle on DuckDB; return the
    list of mismatch descriptions (empty = parity).  Importable so pytest
    can gate a sample of the registry without shelling out."""
    df = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if not problems and value_hash(spark_rows, spark_cols) != value_hash(
        duck_rows, duck_cols
    ):
        problems.append("value-hash mismatch")
        problems.extend(
            hash_diff_lines(spark_rows, spark_cols, duck_rows, duck_cols)
        )
    return problems


def main() -> int:
    import os

    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as e

    if vanilla:
        # Mimic the driver: a bare SparkSession with no timezone/Arrow configs
        # (run under TZ=America/New_York to match its JVM default).
        from pyspark.sql import SparkSession

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("parity-check-vanilla")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    else:
        from delta_go_spark.session import get_spark

        spark = get_spark("parity-check")
    con = duckdb_for(sf_dir)

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(spark_rows)} rows ({el:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if not problems:
            hs = value_hash([tuple(r) for r in spark_rows], spark_cols)
            hd = value_hash(duck_rows, duck_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                problems.extend(
                    "  " + line
                    for line in hash_diff_lines(
                        [tuple(x) for x in spark_rows],
                        spark_cols,
                        duck_rows,
                        duck_cols,
                    )
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:3]))
            for p in problems[3:]:
                print(p)
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows ({el:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
