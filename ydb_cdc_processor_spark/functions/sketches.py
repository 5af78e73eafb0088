"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer at
scale, but its estimate depends on an engine-internal hash — it cannot
be replayed by another engine, so a correctness oracle can only check it
loosely.  The KMV (k-minimum-values) sketch here is built from ``md5``
fractions instead: every intermediate (the k minima, the k-th fraction,
the estimate) is a pure function of the input values, reproducible
bit-for-bit by any engine with md5 — the same construction as the
MinHash family in operators/dedup.py.

KMV (Bar-Yossef et al. 2002, the "distinct elements in a stream"
bottom-k estimator): hash every distinct value to a uniform [0,1)
fraction; if the k-th smallest fraction is f, the universe holds about
``(k-1)/f`` distinct values (k minima evenly spaced ≈ f/k apart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.sampling import hash_fraction


def kmv_distinct(values: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate of ``values[col]`` — one output row:
    ``(k INT, n_minima BIGINT, kth_frac DOUBLE, est_distinct DOUBLE)``.

    If fewer than ``k`` distinct fractions exist the exact count is
    returned as the estimate (the sketch degenerates to exact below k —
    standard KMV behavior).

    Plan shape (100 TB): map-side partial distinct collapses each
    partition to its local value set before the exchange, so the
    shuffle carries vocabulary-sized data, not corpus-sized; the
    ordered ``limit(k)`` lowers to TakeOrderedAndProject — per-partition
    bottom-k then a driver merge of (#partitions × k) fractions — never
    a global sort.  The estimate math runs on k rows.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    fracs = (values
             .select(hash_fraction(F.col(col)).alias("frac"))
             .distinct()
             .orderBy(F.col("frac").asc())
             .limit(k))
    return (fracs.agg(F.count(F.lit(1)).alias("n_minima"),
                      F.max("frac").alias("_kth"))
            .select(F.lit(k).alias("k"),
                    F.col("n_minima"),
                    F.round(F.col("_kth"), 6).alias("kth_frac"),
                    F.round(F.when(F.col("n_minima") < k, F.col("n_minima"))
                             .otherwise(F.lit(k - 1) / F.col("_kth")), 3)
                     .alias("est_distinct")))
