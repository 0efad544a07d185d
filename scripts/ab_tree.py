"""Interleaved whole-process A/B between two source TREES (e.g. the
working tree vs a `git worktree add --detach <dir> HEAD` checkout of the
pre-change commit).  Complements ab_once.py (which toggles an env var in
ONE session): tree-level diffs need a fresh interpreter per arm, and
interleaving (NEW, OLD) rounds back-to-back makes co-tenant bursts hit
both arms alike, so the per-arm MIN comparison stays readable on a noisy
box where isolated runs are not.

Usage:
  git worktree add --detach /tmp/dcs-old HEAD   # before editing, or at
                                                # the pre-change commit
  python scripts/ab_tree.py /root/repo /tmp/dcs-old q1,q2 [rounds]
  git worktree remove /tmp/dcs-old --force      # when done

Each arm subprocess: fresh Spark session, one warm call per query, then
two timed fn()+collect() reruns (steady-state bench cost).  Prints one
JSON line per arm per round plus a per-arm min/med summary.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_ARM_SRC = r"""
import sys, time, os, json
repo = sys.argv[1]; names = sys.argv[2].split(","); sf = sys.argv[3]
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as e
from data_catalog_spark.session import get_spark
spark = get_spark(app_name="ab-tree")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()
out = {}
for name in names:
    fn = e.queries()[name]
    fn(spark, sf).collect()
    ts = []
    for _ in range(2):
        t0 = time.time(); fn(spark, sf).collect()
        ts.append(round(time.time() - t0, 3))
    out[name] = ts
print("ARM_RESULT " + json.dumps(
    {"repo": repo, "load": round(os.getloadavg()[0], 1), "r": out}))
"""


def main() -> None:
    new_tree, old_tree, names = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    per_arm: dict[str, dict[str, list[float]]] = {}
    for _ in range(rounds):
        for tree in (new_tree, old_tree):
            p = subprocess.run(
                [sys.executable, "-c", _ARM_SRC, tree, names, sf],
                capture_output=True, text=True,
            )
            line = next(
                (ln for ln in p.stdout.splitlines()
                 if ln.startswith("ARM_RESULT ")),
                None,
            )
            if line is None:
                print(f"ARM FAILED ({tree}):\n{p.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            print(line, flush=True)
            rec = json.loads(line[len("ARM_RESULT "):])
            store = per_arm.setdefault(tree, {})
            for q, ts in rec["r"].items():
                store.setdefault(q, []).extend(ts)
    for tree, qs in per_arm.items():
        for q, ts in sorted(qs.items()):
            print(
                f"SUMMARY {tree} {q}: min={min(ts)} "
                f"med={statistics.median(ts)} n={len(ts)}"
            )


if __name__ == "__main__":
    main()
