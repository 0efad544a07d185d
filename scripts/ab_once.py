"""Interleaved A/B of one query under an env toggle, in ONE Spark
session: run (A, B) pairs N times back-to-back and report per-arm min /
median — co-tenant bursts hit both arms alike, so the MIN comparison is
load-robust where isolated runs are not.

Usage: python scripts/ab_once.py <query> <ENVVAR> <valA> <valB> [N] [--sf=...]
(valA/valB of "-" means unset)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf=")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    name, env, va, vb = args[:4]
    n = int(args[4]) if len(args) > 4 else 3

    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    fn = e.queries()[name]

    def setenv(v: str) -> None:
        if v == "-":
            os.environ.pop(env, None)
        else:
            os.environ[env] = v

    # warmup both arms (memo/index builds, codegen caches)
    for v in (va, vb):
        setenv(v)
        fn(spark, sf_dir).collect()

    times: dict[str, list[float]] = {va: [], vb: []}
    for i in range(n):
        for v in (va, vb):
            setenv(v)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            times[v].append(round(time.time() - t0, 2))
    for v in (va, vb):
        ts = times[v]
        print(
            f"{name} {env}={v}: min={min(ts)} med={statistics.median(ts)} "
            f"all={ts}",
            flush=True,
        )
    print(f"load_end={os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
