"""Measure the PQ-mode VectorIndex's STORAGE compression and query cost
as the store grows 10× — the IVFADC memory story at scale.

The claim to verify: lists hold ~m_sub small codes per vector instead
of dim doubles, so stored bytes/vector collapse and stay flat as the
corpus grows, while the serving path keeps IVF-flat's bucket pruning
(candidate rows read ∝ probed-cell occupancy, not |corpus|).

Metrics (the ones that transfer off the local box):
- on-disk lists bytes per vector, PQ vs flat twin (same corpus,
  same quantizer geometry);
- candidate rows read per query (cells touched × occupancy) — identical
  between the modes by construction, reported to confirm;
- median query wall seconds (noisy locally; byte/row columns are the
  trustworthy ones — tools/rebucket_growth.py's caveat applies).

Synthetic hash-derived vectors (dim 16) — the tool measures cost as
size moves, not semantics (semantics are oracle-gated by
q_vector_index_pq at the test SFs).

Run SOLO.  Writes tools/pq_store_growth_results.json and prints a table.
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

SIZES = [50_000, 500_000]
DIM = 16
M_SUB = 8
N_CODES = 64
CELL_ROWS = 3200       # n_cells = |corpus| / this (the retrain rule)
N_PROBES = 32
RUNS = 3


def synth(spark, n: int):
    from pyspark.sql import functions as F
    cols = [(F.pmod(F.xxhash64(F.col("vec_id") * (k + 1)), F.lit(1000))
             .cast("double") / 1000.0) for k in range(DIM)]
    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .withColumn("embedding", F.array(*cols))
            .repartition(32))


def disk_bytes(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def median_query_sec(idx, probes) -> float:
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        idx.query(probes, k=5, n_probe=4).write \
            .format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    from ydb_cdc_processor_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("pq-store-growth")
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    results = []
    for n in sizes:
        corpus = synth(spark, n).localCheckpoint(eager=True)
        probes = (corpus.where(F.col("vec_id") % (n // N_PROBES) == 0)
                  .select(F.col("vec_id").alias("probe_id"), "embedding")
                  .localCheckpoint(eager=True))
        n_cells = max(16, n // CELL_ROWS)
        work = tempfile.mkdtemp(prefix="pqgrow_")
        try:
            pq = VectorIndex(spark, work + "/pq", n_cells=n_cells,
                             m_sub=M_SUB, n_codes=N_CODES, n_buckets=16)
            pq.build(corpus, dim=DIM)
            flat = VectorIndex(spark, work + "/flat", n_cells=n_cells,
                               n_buckets=16)
            flat.build(corpus)

            b_pq, b_flat = (disk_bytes(pq.view.path),
                            disk_bytes(flat.view.path))
            # candidate rows a 4-probe query reads: probes' 4 nearest
            # cells' occupancy (identical across modes: same quantizer)
            from ydb_cdc_processor_spark.functions.vector import (
                as_double_array, norm)
            p = (probes.select("probe_id",
                               as_double_array("embedding").alias("_p"))
                 .withColumn("_np", norm(F.col("_p"))))
            pc = pq._assign(p, pq._centroids(), "probe_id",
                            "_p", "_np", 4)
            occ = {r["cell"]: r["n_vectors"]
                   for r in pq.cell_stats().collect()}
            # candidate rows PER PROBE (each query scores only ITS 4
            # cells' occupants — the union over all probes would
            # overstate a single query's read)
            per_probe: dict = {}
            for r in pc.select("probe_id", "cell").collect():
                per_probe.setdefault(r["probe_id"], 0)
                per_probe[r["probe_id"]] += occ.get(r["cell"], 0)
            rows_read = round(sum(per_probe.values()) / len(per_probe))
            row = {
                "n_vectors": n, "n_cells": n_cells,
                "pq_bytes_per_vec": round(b_pq / n, 1),
                "flat_bytes_per_vec": round(b_flat / n, 1),
                "compression": round(b_flat / b_pq, 1),
                "rows_scored_per_probe": rows_read,
                "rows_scored_frac": round(rows_read / n, 4),
                "pq_query_sec": median_query_sec(pq, probes),
                "flat_query_sec": median_query_sec(flat, probes),
            }
            results.append(row)
            print(row)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pq_store_growth_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
