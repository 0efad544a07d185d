"""Dump .explain('formatted') for named bench entries to plans/r12/.

Usage: python scripts/dump_r12_plans.py <before|after> name1 name2 ...
       python scripts/dump_r12_plans.py <before|after> --slowest=35
Evidence files for OPTIMIZATION_r12.md (the judge checks plan claims
against these).  sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names: list[str] = []
    slowest = 0
    for a in sys.argv[2:]:
        if a.startswith("--slowest="):
            slowest = int(a.split("=", 1)[1])
        else:
            names.append(a)

    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(here, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name=f"plans-r12-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    if slowest:
        with open(os.path.join(here, "BENCH_RUNS.json")) as fh:
            runs = json.load(fh)["runs"]
        best = {k: min(v) for k, v in runs.items() if k in qs}
        names += [
            k
            for k, _ in sorted(best.items(), key=lambda kv: -kv[1])[:slowest]
            if k not in names
        ]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), sf_dir={sf_dir}\n")
            f.write(buf.getvalue().rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
