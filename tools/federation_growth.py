"""Measure federated-merge cost as the shard's RAW data grows 10×.

The round-11 federation claim: shard stores combine through their
COLLAPSED state (rollup rows / refcount pairs / sketch cells), so the
merge moves O(|state|) rows regardless of how much raw data each shard
ingested.  This sweep builds a DistinctCountView shard from 1M and 10M
raw rows over a FIXED (group, value) domain (10k groups × 10 values =
≤100k live pairs), then times

* ``merge_from``      — the federated path (state crosses, raw does not)
* ``reingest``        — the naive alternative: apply the shard's raw
                        rows into the union store as a fresh delta

Expected shape: merge_from flat at 10× raw growth (state size is fixed
by the domain); re-ingest grows with the raw row count.  Writes
tools/federation_growth_results.json.  Run SOLO.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [1_000_000, 10_000_000]


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.distinct_view import (
        DistinctCountView)
    from ydb_cdc_processor_spark.session import get_spark

    spark = get_spark("federation-growth")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for n in SIZES:
        work = tempfile.mkdtemp(prefix="fedgrow_")
        try:
            raw = (spark.range(n)
                   .select((F.col("id") % 10_000).cast("string")
                           .alias("grp"),
                           # decorrelated from grp: every group sees all
                           # 10 values once n >= 100k, so live state is
                           # pinned at 100k pairs at BOTH raw sizes
                           ((F.col("id") / 10_000).cast("long") % 10)
                           .cast("string").alias("val"))
                   .localCheckpoint(eager=True))
            shard = DistinctCountView(spark, work + "/shard", ["grp"],
                                      "val", n_buckets=32)
            shard.apply_delta(raw, None, batch_token="b0")
            state_rows = shard.view.read().count()

            base = DistinctCountView(spark, work + "/union_fed",
                                     ["grp"], "val", n_buckets=32)
            base.apply_delta(raw.limit(1000), None, batch_token="seed")
            t0 = time.perf_counter()
            base.merge_from(shard, batch_token="fed")
            t_merge = time.perf_counter() - t0

            naive = DistinctCountView(spark, work + "/union_raw",
                                      ["grp"], "val", n_buckets=32)
            naive.apply_delta(raw.limit(1000), None, batch_token="seed")
            t0 = time.perf_counter()
            naive.apply_delta(raw, None, batch_token="re0")
            t_reingest = time.perf_counter() - t0

            results[str(n)] = {
                "raw_rows": n, "shard_state_rows": int(state_rows),
                "merge_from_sec": round(t_merge, 2),
                "reingest_sec": round(t_reingest, 2)}
            print(f"raw={n:>11,}  state={state_rows:>8,}  "
                  f"merge_from={t_merge:6.2f}s  reingest={t_reingest:6.2f}s",
                  flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "federation_growth_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
