"""Measure per-batch AggregateView maintenance cost as the ROLLUP grows 10×.

The round-5 verdict's one surviving scale caveat: the flat-backed
AggregateView rewrites the WHOLE rollup per micro-batch — O(|rollup|) —
which silently degrades for large-cardinality rollups (realistic case:
per-URL-domain stats over a web corpus, 10⁷+ groups).  The bucketed
backend (agg_view.py backend="bucketed" → bucketed_view.merge_touched)
reads and rewrites only the buckets the batch's groups touch —
O(delta + touched buckets).

This tool builds rollups at 10M and 100M groups (same ±contribution
maintenance path the engine drives), then times the SAME 1000-row delta
batch against each backend.  Sizing rule, as for the row view: hold
BUCKET SIZE constant and grow n_buckets with the rollup — a 1000-group
batch then touches ≤1000 buckets regardless of rollup size, so per-batch
IO asymptotes to batch_groups × bucket_size, flat in |rollup|, while the
flat backend's full rewrite grows linearly.

Writes tools/agg_growth_results.json and prints a table.
Run SOLO (no concurrent Spark) — timing skews 3-10× otherwise.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [10_000_000, 100_000_000]   # override: argv group counts
BUCKET_GROUPS = 50_000  # constant bucket size; n_buckets = groups / this
BATCH_ROWS = 1000


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.agg_view import AggregateView

    from ydb_cdc_processor_spark.session import get_spark

    global SIZES
    if len(sys.argv) > 1:
        SIZES = [int(a) for a in sys.argv[1:]]

    spark = get_spark("agg-growth")
    spark.sparkContext.setLogLevel("ERROR")

    def rows(n_groups: int, n_rows: int, stride: int = 1):
        """``n_rows`` keyed rows spread over ``n_groups`` groups."""
        return (spark.range(n_rows)
                .select(((F.col("id") * stride) % n_groups).alias("g"),
                        (F.col("id") * 1.5).alias("v")))

    work = tempfile.mkdtemp(prefix="agg_growth_")
    results: dict[str, dict[str, float]] = {"flat": {}, "bucketed": {}}
    try:
        for n in SIZES:
            tag = f"{n // 1_000_000}M"
            # a 1000-row delta touching 1000 distinct groups spread evenly
            # across the rollup — the steady-state maintenance mix
            batch = rows(n, BATCH_ROWS, stride=n // BATCH_ROWS).persist()
            batch.count()
            for variant in ("flat", "bucketed"):
                path = os.path.join(work, f"agg_{variant}_{tag}")
                av = AggregateView(
                    spark, path, ["g"], {"sv": "v"}, count_col="n",
                    backend=variant,
                    n_buckets=max(16, n // BUCKET_GROUPS),
                    max_groups_warn=10**12)
                av.apply_delta(new_rows=rows(n, n), old_rows=None)  # build
                av.apply_delta(new_rows=batch, old_rows=None)   # warm plan
                t0 = time.perf_counter()
                av.apply_delta(new_rows=batch, old_rows=None)
                results[variant][tag] = round(time.perf_counter() - t0, 3)
                shutil.rmtree(path, ignore_errors=True)
            batch.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "agg_growth_results.json")
    with open(out, "w") as f:
        json.dump({"per_batch_sec": results, "rollup_groups": SIZES,
                   "bucket_groups": BUCKET_GROUPS, "batch_rows": BATCH_ROWS},
                  f, indent=1, sort_keys=True)

    tags = [f"{n // 1_000_000}M" for n in SIZES]
    print(f"{'variant':10s}" + "".join(f"{t + ' (s)':>12s}" for t in tags)
          + f"{'growth (10x rollup)':>22s}")
    for variant, r in results.items():
        ratio = (r[tags[-1]] / r[tags[0]]) if r.get(tags[0]) else float("nan")
        print(f"{variant:10s}"
              + "".join(f"{r[t]:12.2f}" for t in tags)
              + f"{ratio:22.1f}")


if __name__ == "__main__":
    main()
