"""Order-independent floating-point aggregation helpers.

Summing doubles is not associative: a distributed sum's result depends on
partition boundaries, so a Spark sum and a single-threaded oracle sum of
the same column differ in the last ulps — enough to flip a rounded digit.
These helpers route the sum through DECIMAL(38,s), which IS exact and
order-independent, then cast back to double:

    double column → cast DECIMAL(38,s) (deterministic per-row rounding)
      → exact decimal SUM (any partitioning/order gives the same value)
      → cast DOUBLE (round-to-nearest, deterministic)

so engine and oracle agree bit-for-bit at ANY scale and parallelism.
The same pattern expressed in ANSI SQL is used on the DuckDB side —
see ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact, order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(38,{scale})"))
            .cast("double").alias(alias))


def dec_avg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum → double, divided by count.
    (decimal→double cast and the division are both IEEE-deterministic.)"""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
             / F.count(F.lit(1))).alias(alias))


def long_sum(col: Column | str, alias: str) -> Column:
    """Integer sum pinned to BIGINT (DuckDB widens integer sums to
    HUGEINT; both sides cast to BIGINT so schemas agree)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def exact_quantile(df, col: str, q: float = 0.5,
                   n_bins: int = 1024) -> "tuple[float, int]":
    """EXACT global quantile without a global sort — the two-pass
    bin-then-refine pattern: pass 1 histograms the column into
    ``n_bins`` equal-width bins (one map-side-combined hash agg; the
    driver receives ≤ n_bins rows — a bounded collect, not a data
    collect) and locates the bin containing the target rank; pass 2
    sorts ONLY that bin's rows (expected |data|/n_bins of them) to pick
    the exact element.

    Returns ``(value, n_rows)`` where value is the k-th smallest with
    ``k = floor(q·(n−1)) + 1`` (1-indexed; SQL ``LIMIT 1 OFFSET k−1``
    semantics, replayable by any engine).  NULLs are excluded.  A bin
    holding many duplicates degrades pass 2 toward a single-key sort of
    that bin — still bounded by the duplicate count, never |data|.
    """
    from pyspark.sql import functions as F
    base = df.select(F.col(col).alias("_v")).where(F.col("_v").isNotNull())
    stats = base.agg(F.min("_v").alias("lo"), F.max("_v").alias("hi"),
                     F.count(F.lit(1)).alias("n")).first()
    n = int(stats["n"])
    if n == 0:
        raise ValueError("exact_quantile over empty input")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    k = int(q * (n - 1)) + 1                      # 1-indexed target rank
    if lo == hi:
        return lo, n
    width = (hi - lo) / n_bins
    hist = (base.groupBy(
                F.least(F.floor((F.col("_v") - lo) / width),
                        F.lit(n_bins - 1)).alias("bin"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("bin").collect())             # ≤ n_bins rows
    cum = 0
    for row in hist:
        if cum + row["c"] >= k:
            target_bin, offset_in_bin = int(row["bin"]), k - cum
            break
        cum += row["c"]
    # pass-2 membership uses the IDENTICAL bin expression as the
    # histogram — a >=/< range re-derivation can disagree with
    # floor((v-lo)/width) by one ulp at bin edges and shift the rank
    in_bin = base.where(
        F.least(F.floor((F.col("_v") - lo) / width),
                F.lit(n_bins - 1)) == target_bin)
    val = (in_bin.orderBy("_v")
           .limit(offset_in_bin).orderBy(F.col("_v").desc()).limit(1)
           .first()["_v"])
    return float(val), n
