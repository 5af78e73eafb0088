"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir> <suffix> query [query ...]
e.g.:  python tools/dump_plans.py plans/r14 before q_pagerank q_join_view
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    from ydb_cdc_processor_spark.session import get_spark
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from ydb_cdc_processor_spark.registry import QUERIES
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
