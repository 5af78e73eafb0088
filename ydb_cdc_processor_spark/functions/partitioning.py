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
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(left: DataFrame, right: DataFrame, keys: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-tolerant equi-join: salt the (big, skewed) LEFT side into
    ``n_salts`` sub-keys and replicate the RIGHT side once per salt, so a
    hot key's rows spread over ``n_salts`` reducers instead of one.

    When to use — in this order of preference:

    1. ``F.broadcast(right)`` when the right side fits the broadcast
       threshold: no shuffle at all.
    2. AQE skew-join (on in session.py): splits oversized sort-merge
       partitions at runtime with no code.
    3. ``salted_join`` — when the right side is too big to broadcast AND
       the skew defeats AQE (e.g. a single key holding a double-digit
       percentage of the table: AQE can split the partition, but every
       split still re-reads the same right-side key group).

    Cost: the right side is shuffled ``n_salts``× (explode before the
    exchange).  Results are exactly the plain join's — each left row
    carries ONE salt and matches exactly the one replica with that salt.
    Supports the join types where left-row salting is sound
    (inner / left / left_semi / left_anti).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_l = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(n_salts)).cast("int"))
    salted_r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_l.join(salted_r, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)


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
