"""Time a subset of registry entries exactly like bench.py (noop-forced)
— the fast iteration loop for optimization work.

Usage:
    python tools/bench_subset.py [--runs N] name [name ...]
    python tools/bench_subset.py --cdc            # the 3 engine entries

Prints one JSON line per entry and a total.  Same session factory, same
forcing, same per-entry gc as bench.py; RUNS defaults to 1 (iteration
speed) — use --runs 3 to reproduce the committed protocol.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    runs = 1
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    do_cdc = "--cdc" in args
    names = [a for a in args if a != "--cdc"]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from ydb_cdc_processor_spark.session import get_spark
    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark("bench-subset", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    from ydb_cdc_processor_spark.registry import QUERIES
    QUERIES["q_project_retype"](spark, SF_DIR).limit(10).count()  # warm-up

    timings = {}
    if do_cdc:
        import bench
        bench.SF_DIR = SF_DIR
        bench.RUNS = runs
        bench._bench_cdc(spark, timings)
        gc.collect()
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
            gc.collect()
        timings[name] = round(statistics.median(samples), 3)
    for k, v in timings.items():
        print(json.dumps({"query": k, "sec": v}))
    print(json.dumps({"total": round(sum(timings.values()), 3),
                      "n": len(timings), "runs": runs}))


if __name__ == "__main__":
    main()
