"""Tiny catalog over the parquet testdata directories.

The reference resolves table/topic paths against the database root
(``expandPath``, YdbService.java:119-134) and fetches schemas with
``describeTable`` (YdbService.java:149-158).  Our analogue: parquet
directories under a root dir; schemas come from parquet footers (free);
primary keys are declared metadata (Spark has no native PK).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")

# Declared primary keys for the synthetic tables (FIXTURES.md §A).
PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def expand_path(root: str, name: str) -> str:
    """≙ YdbService.expandPath (YdbService.java:119-134): absolute paths
    pass through; relative names resolve under the root."""
    if os.path.isabs(name):
        return name
    return os.path.join(root, name if name.endswith(".parquet")
                        else f"{name}.parquet")


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (spark.sql.legacy.parquet.nanosAsLong); we restore TimestampType
    by truncating ns → µs, matching DuckDB's own ns→µs truncation so the
    oracle comparison sees identical values."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    if os.path.isdir(path):
        cands = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet")]
        if not cands:
            return []
        path = cands[0]
    schema = pq.read_schema(path)
    return [f.name for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = expand_path(sf_dir, name)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive (non-UTC-adjusted) parquet timestamps must surface as plain
    # TIMESTAMP, not TIMESTAMP_NTZ: the session zone is pinned to UTC so
    # values are identical, and it keeps one timestamp type across the
    # engine and the DuckDB oracle (which reads them as naive micros).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def describe_table(spark: SparkSession, sf_dir: str,
                   name: str) -> tuple[T.StructType, list[str]]:
    """≙ describeTable (YdbService.java:149-158): (schema, primary key)."""
    df = load_table(spark, sf_dir, name)
    return df.schema, PRIMARY_KEYS.get(name, [])


def register_views(spark: SparkSession, sf_dir: str,
                   tables=TPCH_TABLES) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
