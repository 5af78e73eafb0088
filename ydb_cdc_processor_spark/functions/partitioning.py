"""Partitioning helpers for CPU-bound operators.

Spark sizes scan partitions by bytes (``spark.sql.files.maxPartitionBytes``),
which is right for I/O-bound plans but starves CPU-bound expression work
(hashing, shingling, vector math) on small inputs: a 2 MB parquet file
becomes ONE task no matter how many cores exist.  At 100 TB the scan
already yields hundreds of thousands of partitions and these helpers are
no-ops; at test scale they unlock the full local parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None,
                          ) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the session's default parallelism (or ``min_partitions``).

    The repartition is a narrow extra shuffle of the raw input rows —
    worth it exactly when per-row compute dominates, which is the only
    place this helper is used.  Inputs that are already wide (the 100 TB
    case) pass through untouched, so no shuffle is added at scale.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
