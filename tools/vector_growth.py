"""Measure VectorIndex QUERY cost as the store grows 10× — the IVF
sizing rule at scale.

Query cost is the occupancy of the probed cells:
``|corpus| · n_probe / n_cells`` candidate rows per probe.  Hold
``n_cells`` FIXED while the corpus grows and query latency grows
linearly with the store; grow ``n_cells`` with the corpus (the periodic
:meth:`VectorIndex.build` retrain — cell size constant) and per-query
cost stays ~flat.  Same sizing rule the bucketed view's
``maybe_rebucket`` applies to bucket size (tools/view_growth.py), here
applied to the quantizer.

Synthetic corpus: deterministic hash-derived vectors (dim 8) — the
tool measures maintenance/serving cost as size moves, not semantics
(the semantic path is oracle-gated at the test SFs by q_vector_index*).

Writes tools/vector_growth_results.json and prints a table.
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

SIZES = [50_000, 500_000]   # override via argv
DIM = 8
CELL_ROWS = 3200            # scaled config: n_cells = |corpus| / this
FIXED_CELLS = 16
N_PROBES = 32
RUNS = 3


def synth(spark, n: int):
    from pyspark.sql import functions as F
    cols = [(F.pmod(F.xxhash64(F.col("vec_id") * (k + 1)), F.lit(1000))
             .cast("double") / 1000.0) for k in range(DIM)]
    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .withColumn("embedding", F.array(*cols))
            .repartition(32))


def median_query_sec(spark, idx, probes) -> float:
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        idx.query(probes, k=5, n_probe=4).write \
            .format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    from ydb_cdc_processor_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    spark = get_spark("vector-growth")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    work = tempfile.mkdtemp(prefix="vecgrowth_")
    try:
        for n in sizes:
            corpus = synth(spark, n).localCheckpoint(eager=True)
            probes = (synth(spark, N_PROBES)
                      .withColumnRenamed("vec_id", "probe_id")
                      .localCheckpoint(eager=True))
            row = {}
            for label, n_cells in (("fixed", FIXED_CELLS),
                                   ("scaled", max(8, n // CELL_ROWS))):
                path = os.path.join(work, f"{label}_{n}")
                idx = VectorIndex(spark, path, n_cells=n_cells,
                                  n_buckets=max(8, n_cells // 4))
                t0 = time.perf_counter()
                idx.build(corpus)
                row[f"{label}_build_s"] = round(time.perf_counter() - t0, 3)
                row[f"{label}_cells"] = n_cells
                row[f"{label}_query_s"] = median_query_sec(
                    spark, idx, probes)
                shutil.rmtree(path, ignore_errors=True)
            results[str(n)] = row
            print(f"{n:>12,}  fixed({row['fixed_cells']} cells) "
                  f"query {row['fixed_query_s']:7.3f}s   "
                  f"scaled({row['scaled_cells']} cells) "
                  f"query {row['scaled_query_s']:7.3f}s", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vector_growth_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
