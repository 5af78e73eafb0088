"""Slowly-changing-dimension (SCD Type-2) history from a change stream.

The reference processor materializes only the LATEST row per key (the
last-wins merge pipeline, CdcMsgParser.java:96-120 feeding
YqlWriter.java:181-206).  A history sink — every value a key ever held,
with its validity interval — is the standard companion table in CDC
deployments (auditing, point-in-time joins, ML feature backfills), and
it lowers to pure window functions: no state store, no iteration.

Plan shape (100 TB audit): ONE hash exchange on the key, then two
Window operators over the SAME (partition, order) — Catalyst reuses the
exchange and the sort for the second window (Filter preserves both
distribution and ordering), so history construction costs exactly one
shuffle of the change stream regardless of history depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(changes: DataFrame, key_cols: list[str], ts_col: str,
                 attr_cols: list[str], tiebreak_col: str | None = None,
                 suppress_unchanged: bool = True) -> DataFrame:
    """Build a Type-2 history table from per-key change rows.

    ``changes``: one row per observed version (a CDC upsert stream after
    envelope decode).  Output: one row per DISTINCT consecutive value of
    ``attr_cols`` per key, with ``valid_from`` (the change's timestamp),
    ``valid_to`` (the NEXT change's timestamp, NULL while current) and
    ``is_current``.

    - ``suppress_unchanged``: drop no-op updates (same attrs re-sent —
      CDC streams are full of them) so intervals are maximal.  NULL-safe:
      an attr going NULL→NULL is "unchanged", NULL→x is a change.
    - ``tiebreak_col``: total order within equal timestamps (e.g. the
      source offset / event id).  Without it, equal-``ts`` versions
      order arbitrarily and the history is nondeterministic.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)

    out = changes
    if suppress_unchanged:
        # per-attr NULL-safe "differs from previous version" — OR'd, so a
        # row survives iff ANY tracked attribute changed (or it is the
        # key's first version: lag is NULL and eqNullSafe(NULL, x) is
        # false for non-null x, NULL→NULL handled by the lag marker).
        changed = F.lit(False)
        for a in attr_cols:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
        # first row per key always survives, even if all attrs are NULL
        first = F.lag(F.lit(1)).over(w).isNull()
        out = out.withColumn("_chg", changed | first) \
                 .where(F.col("_chg")).drop("_chg")

    out = (out.withColumn("valid_from", F.col(ts_col))
              .withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
              .withColumn("is_current", F.col("valid_to").isNull()))
    keep = list(key_cols) + list(attr_cols) + ["valid_from", "valid_to",
                                               "is_current"]
    return out.select(*keep)


def snapshot_at(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot from a Type-2 history: rows whose validity
    interval covers ``ts`` (``valid_from <= ts < valid_to``, open-ended
    for current rows).  A plain filter — partition-prunable when the
    history is stored partitioned by ``is_current`` or bucketed by key."""
    t = F.lit(ts).cast("timestamp")
    return history.where((F.col("valid_from") <= t)
                         & (F.col("valid_to").isNull()
                            | (F.col("valid_to") > t)))
