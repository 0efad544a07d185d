"""Per-query time-split profiler for the bench entries (guide §1: measure
first).  For each requested query it reports

  build    — seconds to CALL the query fn (Python work + eager Catalyst
             analysis of every intermediate op; any .localCheckpoint(eager)
             or streaming work inside the fn lands here too),
  collect1 — first .collect() of the returned frame (optimize+codegen+run),
  collect2 — second .collect() of the SAME frame (pure re-execution; the
             analyzed plan and codegen cache are warm),
  rerun    — a fresh fn() + .collect() pair, i.e. exactly what one timed
             bench run costs in steady state.

``rerun - collect2`` ≈ the per-run plan/analysis overhead that does NOT
scale with data; ``collect2`` ≈ the real distributed work.  Output: one
JSON line per query to stdout + a sorted table to stderr.

Usage:
  python scripts/profile_bench.py [--sf=/root/testdata/sf0.1] name1 name2 ...
  python scripts/profile_bench.py --slowest=20          # from BENCH_RUNS.json
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
    slowest = 0
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--slowest="):
            slowest = int(a.split("=", 1)[1])
        else:
            names.append(a)

    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    qs = e.queries()
    if slowest:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_RUNS.json")) as fh:
            runs = json.load(fh)["runs"]
        best = {k: min(v) for k, v in runs.items() if k in qs}
        names += [
            k for k, _ in sorted(best.items(), key=lambda kv: -kv[1])[:slowest]
        ]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        df.collect()
        t2 = time.time()
        df.collect()
        t3 = time.time()
        df2 = qs[name](spark, sf_dir)
        df2.collect()
        t4 = time.time()
        row = {
            "name": name,
            "build": round(t1 - t0, 3),
            "collect1": round(t2 - t1, 3),
            "collect2": round(t3 - t2, 3),
            "rerun": round(t4 - t3, 3),
            "load": round(os.getloadavg()[0], 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(
        f"{'name':38s} {'build':>7s} {'col1':>7s} {'col2':>7s} {'rerun':>7s}",
        file=sys.stderr,
    )
    for r in sorted(rows, key=lambda r: -r["rerun"]):
        print(
            f"{r['name']:38s} {r['build']:7.2f} {r['collect1']:7.2f}"
            f" {r['collect2']:7.2f} {r['rerun']:7.2f}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
