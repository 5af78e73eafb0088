"""Measure the join view's DIM-SIDE refresh cost as the FACT side grows
10×.

The scale claim join_view.py makes: a dim change refreshes only the
changed keys' co-located buckets — O(touched buckets), flat in |fact| —
while the naive alternative (re-run the join, rewrite the view) grows
linearly with the fact table.  At 100 TB the fact side is the 100 TB;
a dimension row update that costs O(|fact|) is a non-starter.

This tool builds synthetic fact stores at two sizes with CONSTANT bucket
size (n_buckets ∝ |fact| — the same sizing rule view_growth.py pins for
the CDC view), then times ONE dim-key update through both paths:

- ``incremental``: JoinView.apply_dim_delta (touched-bucket refresh)
- ``naive``: full fact ⋈ dim re-join + full view rewrite

Writes tools/join_view_growth_results.json and prints a table.
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

SIZES = [2_000_000, 20_000_000]   # override: argv row counts
BUCKET_ROWS = 50_000              # constant bucket size
N_DIM = 1000


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ydb_cdc_processor_spark.operators.join_view import JoinView
    from ydb_cdc_processor_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    spark = get_spark("join-view-growth")
    spark.sparkContext.setLogLevel("ERROR")
    dim_schema = T.StructType([
        T.StructField("cust_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("tier", T.StringType())])
    results = {}
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"jvg_{n}_")
        try:
            n_buckets = 1
            while n_buckets < n // BUCKET_ROWS:
                n_buckets *= 2
            jv = JoinView(spark, base + "/jv", fact_pk=["order_id"],
                          fk_col="cust", dim_pk="cust_id",
                          dim_schema=dim_schema, n_buckets=n_buckets)
            dim = spark.range(N_DIM).select(
                F.col("id").alias("cust_id"),
                F.concat(F.lit("name"), F.col("id")).alias("name"),
                F.lit("std").alias("tier"))
            jv.apply_dim_delta(dim, None)
            fact = spark.range(n).select(
                F.col("id").alias("order_id"),
                (F.col("id") % N_DIM).alias("cust"),
                (F.col("id") * 7 % 997).alias("amount"))
            jv.apply_fact_delta(fact, None)

            # incremental: ONE dim key updated
            upd = dim.where(F.col("cust_id") == 7).withColumn(
                "tier", F.lit("vip"))
            old = dim.where(F.col("cust_id") == 7) \
                .localCheckpoint(eager=True)
            t0 = time.perf_counter()
            jv.apply_dim_delta(upd, old)
            t_inc = time.perf_counter() - t0

            # naive: full re-join + full rewrite of a flat copy
            flat = base + "/naive"
            t0 = time.perf_counter()
            cur_dim = jv.dim_mirror.read()
            (fact.join(F.broadcast(cur_dim.select(
                F.col("cust_id").alias("cust"), "name", "tier")),
                on="cust", how="left")
             .write.mode("overwrite").parquet(flat))
            t_naive = time.perf_counter() - t0

            results[str(n)] = {
                "n_buckets": n_buckets,
                "incremental_s": round(t_inc, 2),
                "naive_rejoin_s": round(t_naive, 2)}
            print(f"{n:>12,} rows  buckets={n_buckets:>5}  "
                  f"incremental={t_inc:6.2f}s  naive={t_naive:6.2f}s")
        finally:
            shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "join_view_growth_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
