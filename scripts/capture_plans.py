"""Capture .explain("formatted") for registry queries into plans/<round>/.

Usage:
    python scripts/capture_plans.py <round> <tag> [query ...]

Writes plans/<round>/<query>_<tag>.txt for each named query (default: the
bench.py HEADLINE set).  The driver/judge cannot run Spark, so these files
are the committed evidence for any plan-shape claim in OPTIMIZATION_rNN.md.
The repo root derives from this file's location (an r13 review flagged the
hardcoded /root/repo + plans/r13, which would have silently written a later
round's evidence into the r13 directory).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: capture_plans.py <round> [tag] [query ...]")
        return 2
    rnd = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    out_dir = os.path.join(_REPO, "plans", rnd)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from delta_go_spark.queries import queries
    from delta_go_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
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
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    if failures:
        print(f"{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
