"""Solo adjudication of the round-10 driver bench regressions.

The round-10 judge flagged 15 common bench keys >1.5x over round 9, all
in the maintained-store/index family, exonerated the bloom-filter pin by
A/B, and asked this round to NAME a cause for each residual (q_distinct_
view was graded weak pending one).  This script re-times the flagged
queries SOLO (fresh session, 32g driver like bench.py, 3-run medians)
and, for q_distinct_view, breaks the lifecycle into phases so the
regression can be located rather than guessed at.

Usage: python tools/adjudicate_r10_bench.py [sf_dir]
Writes tools/adjudicate_r10_results.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = 3
FLAGGED = [
    "q_distinct_view", "q_cms_view", "q_text_index", "q_hll_lang",
    "q_heavy_hitters", "q_filtered_ann", "q_communities",
    "q_hybrid_index_search",
]


def _driver_numbers() -> dict[str, dict[str, float]]:
    """Per-query driver medians for r9/r10.  BENCH_r*.json holds only a
    truncated tail; the full detail lives in bench_details.json at each
    round's closing commit — read it from git history."""
    import subprocess
    out: dict[str, dict[str, float]] = {}
    for label, ref in (("r09", "652142c"), ("r10", "cad48e8")):
        try:
            txt = subprocess.run(
                ["git", "show", f"{ref}:bench_details.json"],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))).stdout
            out[label] = json.loads(txt).get("queries", {})
        except (OSError, ValueError):
            out[label] = {}
    return out


def _median_of(fn) -> float:
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _distinct_view_phases(spark) -> dict[str, float]:
    """q_distinct_view with per-phase timers: old-image semi-join reads
    (O(|view|) flat scans + eager localCheckpoint), the distinct view's
    +/- refcount maintenance, and the row view's keyed merges."""
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.distinct_view import (
        DistinctCountView)
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    from ydb_cdc_processor_spark.registry import _scratch_dir, load_table

    cols = ["event_id", "user_id", "event_type"]
    ev = load_table(spark, SF_DIR, "events").select(*cols)
    base = _scratch_dir("dcv_adj_")
    mv = ParquetMaterializedView(spark, base + "/rows", ["event_id"],
                                 schema=ev.schema)
    dv = DistinctCountView(spark, base + "/dcv", ["user_id"], "event_type")
    batches = [
        ev.where(F.col("event_id") % 3 != 2),
        ev.where(F.col("event_id") % 3 == 2)
          .withColumn("event_type", F.lit("x-temp")),
        ev.where(F.col("event_id") % 3 == 2),
    ]
    phases = {"old_images": 0.0, "dv_apply": 0.0, "mv_apply": 0.0,
              "serve": 0.0}
    for i, b in enumerate(batches):
        old = None
        if mv.exists():
            t0 = time.perf_counter()
            old = (mv.read().join(b.select("event_id"), on="event_id",
                                  how="left_semi")
                   .localCheckpoint(eager=True))
            phases["old_images"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        dv.apply_delta(b, old, batch_token=f"dcv:{i}")
        phases["dv_apply"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        mv.apply(b, action="upsertInto")
        phases["mv_apply"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    _force(dv.read())
    phases["serve"] = time.perf_counter() - t0
    return {k: round(v, 3) for k, v in phases.items()}


def main() -> None:
    import gc

    from ydb_cdc_processor_spark.registry import QUERIES
    from ydb_cdc_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("adjudicate-r10")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_project_retype"](spark, SF_DIR).limit(10).count()  # warm-up

    drv = _driver_numbers()
    results: dict[str, dict] = {}
    for name in FLAGGED:
        solo = _median_of(lambda name=name: _force(QUERIES[name](spark,
                                                                 SF_DIR)))
        gc.collect()
        r9 = drv["r09"].get(name)
        r10 = drv["r10"].get(name)
        results[name] = {
            "solo_r11": solo, "driver_r9": r9, "driver_r10": r10,
            "solo_vs_r9": (round(solo / r9, 2) if r9 else None),
        }
        print(f"{name:26s} solo={solo:7.2f}s  r9={r9}  r10={r10}")

    print("\nq_distinct_view phase breakdown (medians of 3):")
    runs = [_distinct_view_phases(spark) for _ in range(RUNS)]
    phases = {k: round(statistics.median(r[k] for r in runs), 3)
              for k in runs[0]}
    for k, v in phases.items():
        print(f"  {k:12s} {v:7.2f}s")
    results["q_distinct_view_phases"] = phases

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "adjudicate_r10_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2, sort_keys=True)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
