"""Phase-split profiler: after one warmup invocation, split a fresh
steady-state invocation of each query into

  fn      — seconds to call the query fn (Python + any eager work inside:
            spark.sql analysis, eager checkpoints, streaming loops),
  plan    — force optimization + physical planning of the returned frame
            (queryExecution().executedPlan()),
  exec    — .collect() (codegen + AQE + run, incl. lazy-checkpoint
            materialization of intermediates built by THIS invocation).

Usage: python scripts/phase_profile.py [--sf=...] name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    qs = e.queries()
    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"phase:{name}")
        qs[name](spark, sf_dir).collect()  # warmup (memo/index builds)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.collect()
        t3 = time.time()
        row = {
            "name": name,
            "fn": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
            "load": round(os.getloadavg()[0], 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(f"{'name':38s} {'fn':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}", file=sys.stderr)
    for r in sorted(rows, key=lambda r: -r["total"]):
        print(
            f"{r['name']:38s} {r['fn']:7.2f} {r['plan']:7.2f}"
            f" {r['exec']:7.2f} {r['total']:7.2f}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
