"""Measure per-micro-batch maintenance cost as the VIEW grows 10×.

The flagship-CDC scale question (reference hot loop ≙ YqlWriter.java:163-215):
a steady stream of ~1000-row micro-batches (XmlConfig.java:18 default
batchSize) maintains a materialized view that keeps growing.  The flat
view rewrites the whole directory per batch — per-batch cost O(|view|) —
while the hash-bucketed view (operators/bucketed_view.py) reads and
rewrites only the buckets the batch touches — per-batch cost
O(touched_buckets × bucket_size).

The events table at the test SFs is too small to show the divergence
(a full 100k-row rewrite is overhead-dominated), so this tool builds
synthetic keyed views at 10M and 100M rows — the same merge path the
engine drives, with the view size actually moving — and times the SAME
1000-row upsert micro-batch against each.

Sizing rule this measures (and the one a 100 TB deployment must follow):
hold BUCKET SIZE constant and grow ``n_buckets`` with the view.  A
1000-key batch touches at most ~1000 buckets regardless of view size, so
per-batch IO asymptotes to ``batch_keys × bucket_size`` — flat in
|view| — while the flat view's full rewrite grows linearly.  (A FIXED
n_buckets does NOT scale: 1000 uniform keys touch ~63% of 1024 buckets,
so per-batch IO would still grow ∝ |view|.  First version of this tool
measured exactly that mistake: bucketed 4.3× growth vs flat 1.3×.)

Writes tools/view_growth_results.json and prints a table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [10_000_000, 100_000_000]   # override: argv row counts
BUCKET_ROWS = 4000      # constant bucket size; n_buckets = |view| / this
BATCH_ROWS = 1000


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.bucketed_view import (
        BucketedMaterializedView)
    from ydb_cdc_processor_spark.operators.merge import ParquetMaterializedView
    from ydb_cdc_processor_spark.session import get_spark

    global SIZES
    if len(sys.argv) > 1:
        SIZES = [int(a) for a in sys.argv[1:]]

    spark = get_spark("view-growth")
    spark.sparkContext.setLogLevel("ERROR")

    def keyed(n: int, start: int = 0):
        """Keyed rows with a ~130-byte pseudo-random payload, so per-batch
        cost is DATA IO (what a real view's maintenance pays), not task
        overhead — narrow rows made even a 100M-row full rewrite a 3.6 s
        metadata-bound blip, hiding the flat-vs-bucketed divergence.
        (Payload sized to keep the 100M run inside this box's free disk:
        view + swap-tmp + shuffle spill coexist at peak.)"""
        pay = F.concat(*[F.md5(F.concat(F.col("id").cast("string"),
                                        F.lit(f":{i}")))
                         for i in range(4)])
        return (spark.range(start, start + n)
                .select(F.col("id").alias("k"),
                        (F.col("id") % 1000).alias("user_id"),
                        F.concat(F.lit("type_"), F.col("id") % 7)
                         .alias("event_type"),
                        (F.col("id") * 1.5).alias("value"),
                        pay.alias("payload")))

    work = tempfile.mkdtemp(prefix="view_growth_")
    results: dict[str, dict[str, float]] = {"flat": {}, "bucketed": {}}
    try:
        # the same 1000-row micro-batch at every size: half updates of
        # existing keys, half new inserts — the steady-state upsert mix
        for n in SIZES:
            tag = f"{n // 1_000_000}M"
            batch = keyed(BATCH_ROWS, start=n - BATCH_ROWS // 2) \
                .withColumn("value", F.col("value") + 1).persist()
            batch.count()
            for variant in ("flat", "bucketed"):
                path = os.path.join(work, f"view_{variant}_{tag}")
                schema = batch.schema
                if variant == "flat":
                    mv = ParquetMaterializedView(spark, path, ["k"],
                                                 schema=schema)
                else:
                    mv = BucketedMaterializedView(spark, path, ["k"],
                                                  schema=schema,
                                                  n_buckets=n // BUCKET_ROWS)
                mv.apply(keyed(n))                    # build (untimed)
                mv.apply(batch, small_delta=True)     # warm the plan
                t0 = time.perf_counter()
                mv.apply(batch, small_delta=True)
                results[variant][tag] = round(time.perf_counter() - t0, 3)
                shutil.rmtree(path, ignore_errors=True)
            batch.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "view_growth_results.json")
    with open(out, "w") as f:
        json.dump({"per_batch_sec": results, "view_rows": SIZES,
                   "bucket_rows": BUCKET_ROWS, "batch_rows": BATCH_ROWS},
                  f, indent=1, sort_keys=True)

    tags = [f"{n // 1_000_000}M" for n in SIZES]
    print(f"{'variant':10s}" + "".join(f"{t + ' (s)':>12s}" for t in tags)
          + f"{'growth (10x view)':>20s}")
    for variant, r in results.items():
        ratio = (r[tags[-1]] / r[tags[0]]) if r.get(tags[0]) else float("nan")
        print(f"{variant:10s}"
              + "".join(f"{r[t]:12.2f}" for t in tags)
              + f"{ratio:20.1f}")


if __name__ == "__main__":
    main()
