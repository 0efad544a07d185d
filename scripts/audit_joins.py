"""Non-equi-join audit: compile every registered batch query and scan its
executed plan for CartesianProduct / BroadcastNestedLoopJoin nodes.  Every
hit must be an INTENDED shape (broadcast scalar/query-set, declared ground
truth, bounded label matrix) — the audit table in ARCHITECTURE.md is
regenerated from this output each round.

Usage: python scripts/audit_joins.py [sf_dir]   (default sf0.001 — plan
shape only, nothing executes)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="audit-joins")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    hits, errors, clean = [], [], 0
    for name in sorted(qs):
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # streaming-only entries can't compile batch plans
            errors.append((name, str(ex).splitlines()[0][:120]))
            continue
        nodes = [
            n
            for n in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if n in plan
        ]
        if nodes:
            hits.append((name, "+".join(nodes)))
        else:
            clean += 1
    for name, nodes in hits:
        print(f"HIT  {name}: {nodes}")
    for name, err in errors:
        print(f"SKIP {name}: {err}")
    print(f"\n{clean} clean, {len(hits)} non-equi hits, {len(errors)} skipped")
    spark.stop()


if __name__ == "__main__":
    main()
