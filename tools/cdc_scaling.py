"""Scale-factor sweep for the CDC ENGINE paths (the non-registry part of
bench.py): full changefeed replay into a fresh view (cdc_apply) and
steady-state incremental maintenance against a built view, flat and
bucketed (cdc_incremental_4b / cdc_incremental_bucketed_4b).

Rows merge into tools/scaling_results.json alongside the registry-query
sweep (tools/scaling.py) so SCALING.md reads one table.  Expected
shapes: cdc_apply ~linear in fixture size; the incremental paths are
DOMINATED by fixed per-batch job overhead at these SFs (4 × ~1000-row
batches regardless of sf), so their ratios should sit well BELOW
linear — the flat variant's O(|view|) rewrite only shows once |view|
dwarfs the overhead (see SCALING.md's view-growth curve for that
regime; this sweep pins the small-view regime).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _median_of(fn) -> float:
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.engine import CdcBatchEngine
    from ydb_cdc_processor_spark.plans.pipeline import ActionMode, CdcPipeline
    from ydb_cdc_processor_spark.session import get_spark
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    spark = get_spark("cdc-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        work = tempfile.mkdtemp(prefix=f"cdc_scaling_{sf}_")
        fixture = os.path.join(work, "events_cdc")
        cdc_json.write_events_cdc_fixture_distributed(spark, sf_dir, fixture)
        schema, pk = describe_table(spark, sf_dir, "events")
        pipe = CdcPipeline(
            name="scaling_view", source_schema=schema, pk=pk,
            members=cdc_json.EVENTS_MEMBERS,
            update_sql=("SELECT event_id, ts, user_id, event_type, value "
                        "FROM rows"),
            delete_sql="SELECT event_id FROM rows",
            action_mode=ActionMode.DIRECT)
        raw = cdc_json.read_cdc_batch(spark, fixture)

        def fresh_apply():
            path = os.path.join(work, "view")
            shutil.rmtree(path, ignore_errors=True)
            CdcBatchEngine(spark, pipe, path).apply_raw_batch(raw)

        results.setdefault("cdc_apply", {})[sf] = _median_of(fresh_apply)

        # 4 micro-batches that upsert/delete the SAME keys each run (view
        # returns to an identical state — identical work per sample);
        # batches pre-materialized so fixture IO isn't charged to
        # view maintenance (same protocol as bench.py)
        eng = CdcBatchEngine(spark, pipe, os.path.join(work, "view"))
        eng.apply_raw_batch(raw)
        batches = [raw.where(F.col("_offset") % 100 == i)
                   .localCheckpoint(eager=True) for i in range(4)]

        def incr(engine):
            for b in batches:
                engine.apply_raw_batch(b)

        results.setdefault("cdc_incremental_4b", {})[sf] = \
            _median_of(lambda: incr(eng))

        eng_b = CdcBatchEngine(spark, pipe,
                               os.path.join(work, "view_bucketed"),
                               n_buckets=64)
        eng_b.apply_raw_batch(raw)
        results.setdefault("cdc_incremental_bucketed_4b", {})[sf] = \
            _median_of(lambda: incr(eng_b))

        shutil.rmtree(work, ignore_errors=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_results.json")
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
    print(f"{'path':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'x(.01→.1)':>10s}")
    for name, r in sorted(results.items()):
        a, b, c = (r.get("sf0.001"), r.get("sf0.01"), r.get("sf0.1"))
        ratio = (c / b) if (b and c) else float("nan")
        print(f"{name:28s} {a:8.2f} {b:8.2f} {c:8.2f} {ratio:10.1f}")


if __name__ == "__main__":
    main()
