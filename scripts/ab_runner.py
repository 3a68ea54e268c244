"""Timed runner for controlled adjacent A/B comparisons (r13 verdict item 1).

Usage:
    python scripts/ab_runner.py <repo_root> <reps> <query> [query ...]

Starts ONE Spark session from <repo_root>'s code, warms the parquet footer
cache, then times each named query `reps` times (fresh plan build + count()
per rep, the bench.py methodology) and prints one JSON line:
    {"repo": ..., "loadavg": [start, end], "runs": {q: [sec, ...]}}

The point of taking <repo_root> as an argument is ALTERNATING builds: a
before-checkout in /tmp and the working tree run back-to-back in the same
minutes see the same box conditions, so min-per-build comparisons cancel
the phantom external load this box is documented to suffer (BENCH_NOTES.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = round(os.getloadavg()[0], 2)

    from delta_go_spark.queries import queries
    from delta_go_spark.session import get_spark

    spark = get_spark("ab-runner")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = queries()
    runs: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        runs[name] = times
    print(
        json.dumps(
            {
                "repo": repo,
                "loadavg": [load0, round(os.getloadavg()[0], 2)],
                "runs": runs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
