"""CDC-maintained SECONDARY INDEX — point lookups by a non-key column
without scanning the fact store.

The reference's target tables are served by YDB, whose server maintains
secondary indexes for them; this engine's parquet-backed views have no
server, so "find all orders of customer X" is a full scan unless the
engine maintains the index itself.  This class is that index: a
persistent mapping ``indexed column value → fact pk`` kept current from
the same pre-merge old-image feed that powers AggregateView /
ChecksumView / JoinView (``agg_views`` protocol), so one
:class:`~ydb_cdc_processor_spark.engine.CdcBatchEngine` drives the row
view and its indexes in lockstep.

Layout: a :class:`~ydb_cdc_processor_spark.operators.bucketed_view.
BucketedMaterializedView` keyed ``(_ixv, *pk)`` and CO-LOCATED on
``_ixv`` — the null-safe string image of the indexed value (SQL join
equality never matches NULL; the same ``\\x00`` sentinel trick
join_view.py uses for fks).  A lookup therefore reads ONLY the probed
values' buckets — O(touched), never O(|fact|) — and maintenance per
batch touches only the batch's old+new values' buckets.

Maintenance is delete-stale + upsert (idempotent keyed ops), so R1
retries and checkpoint replays converge without a token fence.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.bucketed_view import (
    BUCKET_COL, BucketedMaterializedView)

logger = logging.getLogger(__name__)

IXV = "_ixv"  # null-safe string image of the indexed value — merge key


class _Feed:
    """agg_views-protocol adapter (apply_delta(new, old, token))."""

    def __init__(self, fn):
        self._fn = fn

    def apply_delta(self, new_rows, old_rows, batch_token=None) -> None:
        self._fn(new_rows, old_rows, batch_token)


class SecondaryIndex:
    """Persistent value→pk index over one fact column.

    ``pk``: the fact table's primary-key columns.  ``col``: the indexed
    column.  The index stores ``(col, *pk)`` rows (the raw value kept as
    a data column for range/filter pushdown on reads)."""

    def __init__(self, spark: SparkSession, path: str,
                 pk: list[str], col: str, n_buckets: int = 16):
        if col in pk:
            raise ValueError("indexing a pk column is a no-op by design")
        self.spark = spark
        self.pk = list(pk)
        self.col = col
        self.view = BucketedMaterializedView(
            spark, path, keys=[IXV] + list(pk), bucket_keys=[IXV],
            n_buckets=n_buckets)

    def feed(self) -> _Feed:
        """Adapter for the fact engine's ``agg_views`` list."""
        return _Feed(self.apply_delta)

    def _ixv(self) -> F.Column:
        return F.coalesce(F.col(self.col).cast("string"),
                          F.lit("\x00null")).alias(IXV)

    # -- maintenance ---------------------------------------------------------

    def apply_delta(self, new_rows: DataFrame | None,
                    old_rows: DataFrame | None,
                    batch_token: str | None = None) -> None:
        """One micro-batch: ``new_rows`` = upserted fact rows (None for
        a delete-only batch), ``old_rows`` = pre-merge fact images of
        every touched key (None before the fact view exists).  Stale
        entries — deleted pks, or pks whose indexed value CHANGED — are
        deleted by their OLD value's key; current entries upsert.  Cost
        ∝ touched values' buckets."""
        if new_rows is None and old_rows is None:
            return
        if old_rows is not None:
            olds = old_rows.select(self._ixv(), *self.pk)
            if new_rows is not None:
                news = new_rows.select(
                    *[F.col(c).alias(f"_n_{c}") for c in self.pk],
                    self._ixv().alias("_n_ixv"))
                cond = [F.col(c) == F.col(f"_n_{c}") for c in self.pk]
                j = olds.join(F.broadcast(news), cond, "left")
                stale = (j.where(F.col(f"_n_{self.pk[0]}").isNull()
                                 | (F.col("_n_ixv") != F.col(IXV)))
                         .select(IXV, *self.pk))
            else:
                stale = olds
            # emptiness probe first — the steady-state batch (no value
            # changes, no deletes) must not pay a deleteFrom apply
            stale = stale.localCheckpoint(eager=True)
            if not stale.isEmpty():
                self.view.apply(stale, action="deleteFrom")
        if new_rows is not None:
            entries = new_rows.select(self._ixv(), self.col, *self.pk)
            self.view.apply(entries, action="upsertInto")

    # -- serving -------------------------------------------------------------

    def lookup(self, values: list) -> DataFrame:
        """All ``(col, *pk)`` entries for the probed values, reading
        ONLY their buckets (O(touched) directory listings).  ``values``
        is a bounded probe list (the point-lookup shape); use
        :meth:`read` for full scans/joins."""
        from pyspark.sql import types as T
        if not self.view.exists():
            # a never-built index has no layout to type pks from —
            # refuse rather than invent a wrong empty schema (the
            # vector index's empty-store lesson)
            raise FileNotFoundError(
                f"secondary index at {self.view.path} was never built")
        probe = self.spark.createDataFrame(
            [(("\x00null" if v is None else str(v)),) for v in values],
            T.StructType([T.StructField(IXV, T.StringType())]))
        buckets = sorted({r[0] for r in probe.select(
            self.view.bucket_expr().alias("_b")).distinct().collect()})
        rows = self.view.read_touched(buckets).drop(BUCKET_COL)
        return (rows.join(F.broadcast(probe), on=IXV, how="left_semi")
                .drop(IXV))

    def read(self) -> DataFrame:
        """The full index relation ``(col, *pk)``."""
        return self.view.read().drop(BUCKET_COL, IXV)
