"""Measure the range-partitioned view's window-read cost as HISTORY
grows 10×.

The claim range_view.py makes: a fixed time-window read
(:meth:`read_range`) plans and scans only the window's partitions —
O(window), independent of total history — while the layout it replaces
(hash buckets, where every bucket spans the full time range) must read
the whole table for any time predicate.  At 100 TB, "last 7 days over
a year" is 2% of the table vs 100%.

Builds day-partitioned stores at two history lengths (60 and 600 days,
same rows/day), times a fixed 7-day window read through both paths:

- ``range``: RangePartitionedView.read_range (direct-path partitions)
- ``scan``:  full parquet scan + the same filter over a flat twin

and reports ROWS READ, the metric that transfers off a page-cached
local disk.  Also times drop_range retention of the oldest half.

Writes tools/range_view_growth_results.json and prints a table.
Run SOLO (any concurrent Spark skews timings 3-10×).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAYS = [60, 600]
ROWS_PER_DAY = 100_000
WINDOW = ("2020-02-01", "2020-02-07")


def _median3(fn) -> float:
    import statistics
    fn()  # warm — not counted
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.range_view import (
        RangePartitionedView)
    from ydb_cdc_processor_spark.session import get_spark

    days_list = [int(a) for a in sys.argv[1:]] or DAYS
    spark = get_spark("range-view-growth")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for days in days_list:
        n = days * ROWS_PER_DAY
        base = tempfile.mkdtemp(prefix=f"rvg_{days}_")
        try:
            rows = spark.range(n).select(
                F.col("id"),
                F.date_add(F.lit("2020-01-01"),
                           (F.col("id") % days).cast("int")).alias("day"),
                (F.col("id") * 7 % 997).alias("amount"))
            rv = RangePartitionedView(spark, base + "/rv",
                                      keys=["day", "id"], part_col="day",
                                      granularity="day")
            # ingest via the maintained path in a few day-local batches
            # (CDC arrival order), not one bulk write
            for b in range(4):
                rv.apply(rows.where(F.col("id") % 4 == b),
                         action="upsertInto")
            flat = base + "/flat"
            rows.write.parquet(flat)

            lo, hi = WINDOW
            exp = (spark.read.parquet(flat)
                   .where(F.col("day").between(lo, hi)).count())
            got = rv.read_range(lo, hi).count()
            assert got == exp, (got, exp)
            t_range = _median3(lambda: rv.read_range(lo, hi).count())
            t_scan = _median3(
                lambda: spark.read.parquet(flat)
                .where(F.col("day").between(lo, hi)).count())
            # rows actually readable by the pruned plan = the window's
            # partitions' full contents (residual filter sees only these)
            pids = [p for p in rv.existing_partitions()
                    if rv.partition_id(lo) <= p <= rv.partition_id(hi)]
            rows_read = rv.read_touched(pids).count()

            t0 = time.perf_counter()
            dropped = rv.drop_range("2020-01-15")
            t_drop = round(time.perf_counter() - t0, 2)
            results[str(days)] = {
                "total_rows": n, "partitions": days,
                "window_read_s": t_range, "scan_s": t_scan,
                "window_rows_read": rows_read, "scan_rows_read": n,
                "window_hits": got,
                "retention_dropped_parts": dropped,
                "retention_s": t_drop}
            print(f"{days:>4} days ({n:>11,} rows)  "
                  f"range={t_range:5.2f}s ({rows_read:,} rows read)  "
                  f"scan={t_scan:5.2f}s ({n:,} rows read)  "
                  f"retention: {dropped} parts in {t_drop}s")
        finally:
            shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "range_view_growth_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
