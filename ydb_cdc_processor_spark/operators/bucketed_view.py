"""Hash-bucketed materialized view — the at-scale merge target.

:class:`~ydb_cdc_processor_spark.operators.merge.ParquetMaterializedView`
rewrites the whole directory per batch: O(|view|) work for a 1000-row
micro-batch (XmlConfig.java:18 default), which cannot survive a 100 TB
view.  This variant hash-partitions the view by PK into ``n_buckets``
directory partitions (``_bucket = pmod(xxhash64(pk...), n)``) so a batch:

1. computes the distinct buckets its keys touch — at most
   ``min(|delta|, n_buckets)``;
2. reads ONLY those partitions (Catalyst partition pruning on the
   ``_bucket IN (...)`` filter — verify with ``PartitionFilters`` in the
   scan node);
3. merges and rewrites ONLY those partitions (dynamic partition
   overwrite), deleting partitions the merge emptied.

Per-batch cost drops from O(|view|) to O(touched_buckets × bucket_size):
with the default 1000-row batch and 1024 buckets over a 100 TB view,
~1/1024th of the table is read and rewritten instead of all of it.  The
same layout co-locates future PK merges and joins (bucket ≙ a fixed hash
partitioning reused across batches).

Delivery semantics match the flat view: merges are idempotent per key, so
checkpoint replay after a mid-write crash converges (a torn dynamic
overwrite is repaired by the replay rewriting the same buckets).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.merge import (
    MERGE_FNS, merge_delete, merge_insert)

BUCKET_COL = "_bucket"


class BucketedMaterializedView:
    """Keyed materialized view partitioned by a PK hash bucket."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 schema=None, n_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.schema = schema
        self.n_buckets = n_buckets

    # -- bucketing -----------------------------------------------------------

    def bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]),
                      F.lit(self.n_buckets)).cast("int")

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COL, self.bucket_expr())

    # -- IO ------------------------------------------------------------------

    def exists(self) -> bool:
        # the dynamic-partition-overwrite committer does not emit _SUCCESS;
        # presence of any bucket partition directory is the marker
        if not os.path.isdir(self.path):
            return False
        if os.path.exists(os.path.join(self.path, "_SUCCESS")):
            return True
        return any(e.startswith(f"{BUCKET_COL}=")
                   for e in os.listdir(self.path))

    def read(self) -> DataFrame:
        """Public read — bucket column hidden."""
        return self._read_raw().drop(BUCKET_COL)

    def _read_raw(self) -> DataFrame:
        if not self.exists():
            if self.schema is None:
                raise FileNotFoundError(self.path)
            return self._with_bucket(
                self.spark.createDataFrame([], self.schema))
        return self.spark.read.parquet(self.path)

    def _write_full(self, df: DataFrame) -> None:
        (self._with_bucket(df)
         .repartition(BUCKET_COL)
         .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(self.path))

    # -- the incremental merge ------------------------------------------------

    def apply(self, delta: DataFrame, action: str = "upsertInto",
              order_col: str | None = None,
              small_delta: bool | None = None) -> None:
        existed = self.exists()
        if not existed and action == "deleteFrom":
            if self.schema is None:
                raise FileNotFoundError(self.path)
            # deleting from nothing → materialize the empty view
            self._write_full(self.spark.createDataFrame([], self.schema))
            return

        delta = self._with_bucket(delta).persist()
        try:
            touched = [r[0] for r in
                       delta.select(BUCKET_COL).distinct().collect()]
            if not touched:
                return
            if existed:
                # partition-pruned read: only the touched buckets
                target = self._read_raw().where(
                    F.col(BUCKET_COL).isin(touched))
            else:
                # first batch: merge against an empty target (keeps the
                # per-action dedup/collision semantics)
                base = (self.spark.createDataFrame([], self.schema)
                        if self.schema is not None
                        else delta.drop(BUCKET_COL).limit(0))
                target = self._with_bucket(base)

            keys_b = self.keys + [BUCKET_COL]
            if action == "deleteFrom":
                merged = merge_delete(target, delta, keys_b,
                                      small_delta=small_delta)
            elif action == "insertInto":
                merged = merge_insert(target, delta, keys_b, strict=True)
            else:
                merged = MERGE_FNS[action](target, delta, keys_b, order_col,
                                           small_delta)
            merged = merged.localCheckpoint(eager=True)

            # dynamic partition overwrite: only partitions present in
            # ``merged`` are replaced ...
            (merged.repartition(BUCKET_COL)
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy(BUCKET_COL).parquet(self.path))
            # ... so buckets the merge EMPTIED (all rows deleted) must be
            # dropped explicitly or stale files survive.  Only deleteFrom
            # can empty a bucket — upsert/update/insert keep ≥ the delta's
            # own rows in every touched bucket.
            if existed and action == "deleteFrom":
                remaining = {r[0] for r in
                             merged.select(BUCKET_COL).distinct().collect()}
                for b in set(touched) - remaining:
                    shutil.rmtree(
                        os.path.join(self.path, f"{BUCKET_COL}={b}"),
                        ignore_errors=True)
        finally:
            delta.unpersist()
