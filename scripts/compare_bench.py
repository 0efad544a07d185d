"""Compare two bench.py JSON recordings: per-query ratios on the common
query set, median/total ratios, and the queries added/removed — separates
box variance from real regressions (use the per-run spread recorded since
r4 to judge noise).

Usage: python scripts/compare_bench.py OLD.json NEW.json [--top N]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    def load(path):
        d = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        return d.get("parsed", d)

    old = load(args[0])
    new = load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    ratios = {q: (nq[q] / oq[q] if oq[q] > 0 else float("inf")) for q in common}
    old_total = sum(oq[q] for q in common)
    new_total = sum(nq[q] for q in common)
    print(f"common queries: {len(common)}")
    print(f"  total {old_total:.1f}s -> {new_total:.1f}s "
          f"(x{new_total / old_total:.2f})")
    print(f"  median per-query ratio: x{statistics.median(ratios.values()):.2f}")
    spread = new.get("runs", {})
    print(f"\nbiggest movers (|log ratio|, top {top}):")
    import math

    for q in sorted(common, key=lambda q: -abs(math.log(max(ratios[q], 1e-9))))[:top]:
        note = f"  runs={spread[q]}" if q in spread else ""
        print(f"  {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s (x{ratios[q]:.2f}){note}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded ({len(added)}): "
              + ", ".join(f"{q}={nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    main()
