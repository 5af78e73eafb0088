"""Measure concurrent derived-view maintenance (engine._fan_out_views).

One CdcBatchEngine with the four-view stack (rollup, checksum,
secondary index, join view — the test_join_view integration shape) at
sf0.1, timed with max_parallel_views=1 (serial loop) vs 4 (default).
Each view's maintenance is a handful of SMALL Spark jobs with
driver-side planning gaps between them; fanning independent views
across driver threads lets the scheduler interleave those jobs, so the
win is the per-batch fixed cost, not data scaling.  Run SOLO — any
concurrent Spark on this box skews results.

Usage: SPARK_DRIVER_MEMORY=16g python tools/parallel_views_bench.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline  # noqa: E402
from ydb_cdc_processor_spark.functions.checksum import ChecksumView  # noqa: E402
from ydb_cdc_processor_spark.operators.agg_view import AggregateView  # noqa: E402
from ydb_cdc_processor_spark.operators.join_view import JoinView  # noqa: E402
from ydb_cdc_processor_spark.operators.secondary_index import (  # noqa: E402
    SecondaryIndex)
from ydb_cdc_processor_spark.session import get_spark  # noqa: E402
from ydb_cdc_processor_spark.sources import cdc_json  # noqa: E402
from ydb_cdc_processor_spark.sources.catalog import describe_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def run_once(spark, p, raw, base: str, workers: int) -> float:
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    dim_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("segment", T.StringType())])
    av = AggregateView(spark, f"{base}/agg", ["event_type"],
                       {"sum_value": "value"}, count_col="n")
    cv = ChecksumView(spark, f"{base}/ck", cols)
    ix = SecondaryIndex(spark, f"{base}/ix", pk=["event_id"],
                        col="event_type", n_buckets=8)
    jv = JoinView(spark, f"{base}/jv", fact_pk=["event_id"],
                  fk_col="user_id", dim_pk="user_id",
                  dim_schema=dim_schema, n_buckets=8)
    jv.apply_dim_delta(spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(5000)], dim_schema), None)
    eng = CdcBatchEngine(spark, p, f"{base}/view",
                         agg_views=[av, cv, ix.feed(), jv.fact_feed()],
                         max_parallel_views=workers)
    t0 = time.perf_counter()
    eng.apply_raw_batch(raw, batch_token=f"pv:{workers}")
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("parallel-views-bench")
    spark.sparkContext.setLogLevel("ERROR")
    schema, pk = describe_table(spark, SF_DIR, "events")
    work = tempfile.mkdtemp(prefix="pvbench_")
    fixture = os.path.join(work, "cdc")
    cdc_json.write_events_cdc_fixture(spark, SF_DIR, fixture)
    raw = cdc_json.read_cdc_batch(spark, fixture).localCheckpoint()
    p = CdcPipeline(
        name="pv_bench", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value"
                   " FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)

    results: dict[str, list[float]] = {"serial": [], "parallel": []}
    # warm-up (JIT/codegen/scheduler) then alternate to share cache state
    run_once(spark, p, raw, os.path.join(work, "warm"), 4)
    shutil.rmtree(os.path.join(work, "warm"))
    for i in range(RUNS):
        for label, workers in (("serial", 1), ("parallel", 4)):
            base = os.path.join(work, f"{label}{i}")
            results[label].append(round(run_once(spark, p, raw, base,
                                                 workers), 3))
            shutil.rmtree(base)
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    out = {"sf_dir": SF_DIR, "runs": RUNS, "samples": results,
           "median_serial_s": med["serial"],
           "median_parallel_s": med["parallel"],
           "speedup": round(med["serial"] / med["parallel"], 2)}
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
