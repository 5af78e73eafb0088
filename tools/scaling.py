"""Measure per-query wall time across scale factors (sf0.001/0.01/0.1)
and report the 0.01→0.1 scaling ratio.

A query whose time grows ~10× with 10× data is linear (scan-bound); <10×
means fixed overhead dominates at these sizes; >>10× flags a
super-linear plan (all-pairs, unpruned shuffle) that would NOT survive a
100× scale-up.  Writes tools/scaling_results.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from ydb_cdc_processor_spark.registry import QUERIES
    from ydb_cdc_processor_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(QUERIES)
    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        for name in names:
            # warm the plan once at the smallest sf so codegen/plan-compile
            # cost doesn't masquerade as data-scaling
            try:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                results.setdefault(name, {})[sf] = \
                    round(time.perf_counter() - t0, 3)
            except Exception as ex:  # noqa: BLE001
                results.setdefault(name, {})[sf] = float("nan")
                print(f"{name}@{sf}: FAILED {ex}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_results.json")
    # merge into the existing file: a SUBSET run must not clobber the
    # full sweep's entries for queries it did not time
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = json.load(f)
        except ValueError:
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"{'query':24s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'x(.01→.1)':>10s}")
    for name, r in sorted(results.items()):
        a, b, c = (r.get("sf0.001"), r.get("sf0.01"), r.get("sf0.1"))
        ratio = (c / b) if (b and c) else float("nan")
        print(f"{name:24s} {a:8.2f} {b:8.2f} {c:8.2f} {ratio:10.1f}")


if __name__ == "__main__":
    main()
