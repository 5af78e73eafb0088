"""Compare two bench detail records key-by-key.

Usage: python tools/bench_compare.py [old.json] [new.json] [threshold]

Defaults: the r10 driver record (BENCH_r10.json) vs the working-tree
bench_details.json, threshold 1.5.  Prints totals on common keys, the
median per-query ratio, and every key whose ratio exceeds the threshold
(the set the round's SCALING.md adjudication must name causes for).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("queries", doc)


def main() -> None:
    old_p = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "BENCH_r10.json")
    new_p = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(ROOT, "bench_details.json")
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = _queries(old_p), _queries(new_p)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common keys")
        return
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    ratios = {k: (new[k] / old[k] if old[k] else float("inf"))
              for k in common}
    print(f"common keys: {len(common)}  old={so:.1f}s  new={sn:.1f}s  "
          f"sum-ratio={sn / so:.3f}  "
          f"median-ratio={statistics.median(ratios.values()):.3f}")
    flagged = {k: r for k, r in ratios.items()
               if r > thresh and new[k] - old[k] > 0.5}
    print(f"\n>{thresh}x and >0.5s absolute ({len(flagged)}):")
    for k in sorted(flagged, key=lambda k: -ratios[k]):
        print(f"  {k:30s} {old[k]:8.2f} -> {new[k]:8.2f}  ({ratios[k]:.2f}x)")
    improved = {k: r for k, r in ratios.items()
                if r < 1 / thresh and old[k] - new[k] > 0.5}
    print(f"\n<{1/thresh:.2f}x and >0.5s absolute ({len(improved)}):")
    for k in sorted(improved, key=lambda k: ratios[k]):
        print(f"  {k:30s} {old[k]:8.2f} -> {new[k]:8.2f}  ({ratios[k]:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        tot = sum(new[k] for k in only_new)
        print(f"\nnew-only keys ({len(only_new)}, {tot:.1f}s): "
              + ", ".join(f"{k}={new[k]:.1f}" for k in only_new))


if __name__ == "__main__":
    main()
