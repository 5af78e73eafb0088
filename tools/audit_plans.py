"""Physical-plan audit for the registry queries.

For every query: print the formatted plan and flag scale smells —
missing parquet filter pushdown, missing column pruning (ReadSchema too
wide), cartesian products that should be broadcast NL joins, sort-merge
joins where one side is dimension-sized, and row-at-a-time Python UDFs
(BatchEvalPython) in the hot path.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct (unpruned all-pairs shuffle join)")
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython (row-at-a-time Python UDF)")
    n_smj = plan.count("SortMergeJoin")
    if n_smj:
        flags.append(f"{n_smj} SortMergeJoin(s) — check whether a side is "
                     "broadcastable")
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in scans:
        cols = [c for c in s.split(",") if c]
        if len(cols) > 12:
            flags.append(f"wide scan ({len(cols)} cols) — pruning suspect")
    return flags


def main() -> None:
    from ydb_cdc_processor_spark.registry import QUERIES
    from ydb_cdc_processor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("audit-plans")
    spark.sparkContext.setLogLevel("ERROR")

    verbose = bool(only)
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            print(f"== {name}: PLAN FAILED {ex}")
            continue
        flags = audit(name, plan)
        wscg = plan.count("WholeStageCodegen")
        bhj = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoop")
        print(f"== {name}: wscg_spans={wscg} broadcast_joins={bhj} "
              + ("FLAGS: " + "; ".join(flags) if flags else "clean"))
        if verbose:
            print(plan)


if __name__ == "__main__":
    main()
