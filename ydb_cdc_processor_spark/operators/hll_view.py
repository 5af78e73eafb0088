"""Incrementally-maintained per-group HyperLogLog distinct-count view.

The IVM family's approximate member: ``distinct_view.DistinctCountView``
keeps COUNT(DISTINCT) EXACT and retractable by refcounting every live
value (state ∝ |distinct values|); this view keeps the HLL register
table instead — FIXED ``m = 2^p`` integers per group, independent of
cardinality — which is the only maintainable shape when the distinct
universe itself is too large to store ("distinct 5-grams per language
over 100 TB").  The trade is explicit: ~1.04/√m relative error and NO
retraction (a register max is monotone — deleting an upstream row
cannot lower it), so delete-bearing batches are REFUSED loudly rather
than silently served wrong; use the exact view when retraction matters.

Why no replay fence: the register merge ``M' = max(M, M_batch)`` is
idempotent and commutative (a bounded-join semilattice — the G-Counter
CRDT argument), so re-applying any batch, in any order, any number of
times converges to the same register table.  Checkpoint replays and R1
retries need no batch token — pinned by
test_hll_view_replay_and_any_batching.

Per-batch cost: one map-side-combined agg over the batch (exchange
carries ≤ |batch groups|·m register partials), then a merge touching
ONLY the batch groups' store buckets (the view is keyed ``(group, _j)``
and CO-LOCATED on group).  Serving (:meth:`read`) is the
``sketches.hll_estimate`` rollup over the register table — identical
output contract to the one-shot ``hll_grouped``, and after any
insert-only ingest history the state EQUALS the one-shot sketch of the
union (max-merge associativity), which is what the shared SQL oracle
replays.

Reference anchors: the maintained-store contract mirrors
``YqlWriter.java:118-147`` (per-batch idempotent merge into a keyed
target); the sketch math is Flajolet et al. 2007 via
functions/sketches.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ydb_cdc_processor_spark.functions.sketches import (
    hll_estimate, hll_registers)
from ydb_cdc_processor_spark.operators.bucketed_view import (
    BucketedMaterializedView)
from ydb_cdc_processor_spark.operators.ivm_feed import Feed


class HllView:
    """Persistent per-group HLL register table with incremental
    max-merge maintenance and one-shot-equal serving."""

    def __init__(self, spark: SparkSession, path: str,
                 group_cols: list[str], value_col: str,
                 p: int = 8, n_buckets: int = 8):
        if p % 4 != 0 or not 4 <= p <= 12:
            raise ValueError("p must be a multiple of 4 in [4, 12]")
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.p = p
        self.view = BucketedMaterializedView(
            spark, os.path.join(path, "regs"),
            keys=self.group_cols + ["_j"], bucket_keys=self.group_cols,
            n_buckets=n_buckets)
        # p is a LAYOUT property (register indices are p-dependent): a
        # store built at one p reopened with another must serve the
        # layout's p — the VectorIndex n_cells/seed rule.  The meta is
        # written HERE, before any data, so no crash window can leave a
        # populated store without its geometry (review finding), and it
        # lives OUTSIDE view.path — rebucket()'s whole-directory swap
        # would silently destroy a file stored inside the bucket dir
        # (review finding; CmsView's layout was already one level up).
        self.view.recover()
        stored = self._read_meta()
        if stored:
            self.p = int(stored["p"])
        else:
            self._write_meta()

    # -- layout metadata -------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.path, "_hll.json")

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def _write_meta(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"p": self.p}, fh)
        os.replace(tmp, self._meta_path())

    # -- maintenance -------------------------------------------------------------

    def apply_delta(self, new_rows: DataFrame | None,
                    old_rows: DataFrame | None = None,
                    batch_token: str | None = None) -> None:
        """Merge one micro-batch's registers into the store.

        ``old_rows`` must be None (or the engine's bootstrap feed on a
        store that doesn't exist yet): HLL registers cannot retract, so
        a delete/rewrite-bearing batch raises instead of serving
        silently-wrong counts.  ``batch_token`` is accepted for feed
        compatibility but unused — the max-merge is naturally
        idempotent (module docstring)."""
        if old_rows is not None and self.view.exists():
            raise ValueError(
                "HllView cannot retract (register max is monotone) — "
                "this batch carries old images; use "
                "DistinctCountView for exact retractable counts")
        if new_rows is None:
            return
        self._merge_registers(hll_registers(
            new_rows, self.group_cols, self.value_col, self.p))

    def _merge_registers(self, batch: DataFrame) -> None:
        """Max-merge a register table into the store — the semilattice
        join shared by row ingestion and store-to-store union."""
        if self.view.exists():
            # the register agg feeds the touched-bucket collect AND the
            # merge join — evaluate its plan once
            batch = batch.localCheckpoint(eager=True)
            # max-merge against ONLY the batch keys' current registers:
            # read the touched buckets, left-join the old M, keep the max
            touched = sorted({r[0] for r in batch.select(
                self.view.bucket_expr().alias("_b")).distinct().collect()})
            old = (self.view.read_touched(touched)
                   .select(*self.group_cols, "_j",
                           F.col("_M").alias("_M_old")))
            batch = (batch.join(old, on=self.group_cols + ["_j"],
                                how="left")
                     .select(*self.group_cols, "_j",
                             F.greatest(F.col("_M"),
                                        F.coalesce(F.col("_M_old"),
                                                   F.lit(0)))
                             .alias("_M")))
        self.view.apply(batch.select(*self.group_cols, "_j", "_M"),
                        action="upsertInto")

    def merge_from(self, other: "HllView") -> None:
        """UNION another HllView's registers into this one — federated
        sketching: per-shard / per-datacenter stores, each maintained
        locally over its own slice, combine by register max WITHOUT
        touching raw data (the merged state equals the one-shot sketch
        of the union — max-merge associativity, same argument as the
        replay contract; pinned by test_merge_from_shards).  Cost:
        O(|other's registers|) rows through one touched-bucket merge.
        Requires identical ``p`` — register indices are p-dependent."""
        if other.p != self.p:
            raise ValueError(
                f"cannot merge p={other.p} registers into a p={self.p} "
                "store — register indices are layout-dependent")
        if list(other.group_cols) != list(self.group_cols):
            raise ValueError("group_cols must match to merge")
        self._merge_registers(other.registers())

    def feed(self) -> Feed:
        """Adapter for a CDC engine's ``agg_views`` list (insert-only
        sources; a delete-bearing feed raises by contract)."""
        return Feed(self.apply_delta)

    def start_stream(self, rows_stream: DataFrame, checkpoint_dir: str,
                     available_now: bool = True):
        """Maintain the sketch from a STREAM (foreachBatch →
        :meth:`apply_delta`) — replay-safe without a fence because the
        register merge is idempotent.  Returns the StreamingQuery."""
        def _batch(df, batch_id: int) -> None:
            self.apply_delta(df, None)

        writer = (rows_stream.writeStream
                  .foreachBatch(_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- serving -----------------------------------------------------------------

    def registers(self) -> DataFrame:
        """The live register table (audit / recompute-check surface)."""
        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in self.group_cols]
            + [T.StructField("_j", T.IntegerType()),
               T.StructField("_M", T.IntegerType())])
        if not self.view.exists():
            return self.spark.createDataFrame([], schema)
        return self.view.read().select(*self.group_cols, "_j", "_M")

    def read(self) -> DataFrame:
        """Per-group estimates ``(*group_cols, m, v_zero, s_scaled,
        est_hll)`` — the ``hll_grouped`` output contract over the
        maintained state."""
        return hll_estimate(self.registers(), self.group_cols, self.p)

    def recompute_check(self, rows: DataFrame) -> bool:
        """True iff the maintained registers equal a from-scratch
        ``hll_registers`` of ``rows`` (the lifecycle tests' invariant)."""
        want = {tuple(r) for r in hll_registers(
            rows, self.group_cols, self.value_col, self.p).collect()}
        got = {tuple(r) for r in self.registers().collect()}
        return want == got

    def maintain(self) -> None:
        """Between-batch housekeeping: bucket-count sawtooth + small-file
        compaction (state is |groups|·m rows — compaction matters more
        than rebucketing here)."""
        self.view.maybe_rebucket()
        self.view.compact()
