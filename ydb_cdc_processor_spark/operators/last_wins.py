"""Per-key ordering inside a micro-batch (operators B2/B4 of SURVEY.md §2).

The reference preserves per-key update/delete ordering mechanically: one
single-threaded writer per topic partition (``partitionId % threadsCount``,
YqlWriter.java:117-120) plus flush-on-kind-switch — a batch never mixes
updates and deletes, and is flushed whenever the next message needs the
other statement (YqlWriter.java:184-207).  The net EFFECT per key is
"the last change wins".

In Spark we reconstruct that effect declaratively: within a micro-batch,
collapse to the single most recent change per key with a ``row_number``
window over a monotonically increasing order column (source offset).  This
is one shuffle on the key columns — the SAME partitioning the downstream
merge join needs, so at scale the exchange is reused, not duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_last_wins(df: DataFrame,
                       keys: list[str],
                       order_col: str = "_offset") -> DataFrame:
    """Keep only the LAST change per key, by ``order_col`` descending.

    Equivalent final state to the reference's sequential per-key apply
    (property-tested in tests/test_last_wins.py against a sequential
    oracle).  Rows where any key column is NULL are kept as-is is not
    meaningful for CDC (keys are PK-derived, non-null by construction).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]) \
              .orderBy(F.col(order_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1)
              .drop("_rn"))


def split_upsert_delete(df: DataFrame,
                        op_col: str = "op") -> tuple[DataFrame, DataFrame]:
    """Split a last-wins-collapsed batch into (upserts, deletes).

    After :func:`collapse_last_wins` each key appears once, so applying
    deletes and upserts in either order reproduces the reference's
    kind-ordered flush semantics (B4)."""
    return (df.where(F.col(op_col) == "U").drop(op_col),
            df.where(F.col(op_col) == "D").drop(op_col))
