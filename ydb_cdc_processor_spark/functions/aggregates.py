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
