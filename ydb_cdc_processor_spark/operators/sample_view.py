"""Incrementally-maintained per-group deterministic sample view.

A fixed-size uniform (or weighted) sample per group, maintained under
streaming ingest — the curation primitive that lets a 100 TB corpus be
eyeballed, spot-checked, or cheaply re-statted without scanning: the
state is ``n`` ROWS per group forever, independent of corpus size.

The maintained state is the hash-ranked reservoir of
``functions/sampling.py``: each row's priority is a pure function of
its id (``md5(id)``, ascending — uniform because the hash order is
independent of data order; with a ``weight_col``, the Efraimidis-
Spirakis key ``round(ln(u)/w, 9)`` descending, selection probability
∝ weight).  "Keep the best n per group by a deterministic priority" is
a bounded-join SEMILATTICE — idempotent, commutative, associative —
so, exactly like :class:`~ydb_cdc_processor_spark.operators.hll_view.
HllView`'s register max-merge:

* replaying any batch, any number of times, in any order converges to
  the same state (NO replay fence needed; checkpoint replays and R1
  retries are free);
* any batching of the same rows lands on the same sample, which EQUALS
  the one-shot ``sample_per_group`` / A-ES top-n of the union — the
  shared cross-engine oracle;
* two shard stores :meth:`merge_from` into a federated sample without
  touching raw data.

Retraction is refused on the same grounds as HLL: evicted candidates
are gone, so deleting a sampled row cannot be back-filled uniformly —
delete-bearing batches raise loudly (content-checked, not presence-
checked); re-sample from scratch when the corpus is rewritten.

Per-batch cost: prune the batch to its own per-group top-n FIRST
(a window over |batch| rows), then merge against ONLY the touched
groups' stored rows (the store is bucketed and CO-LOCATED on group) and
keep the combined top-n — O(touched_groups × n) rows read and written,
never O(|corpus|).

Reference anchors: maintained-store contract per YqlWriter.java:118-147
(idempotent keyed merge); sampling math per Efraimidis & Spirakis 2006
via functions/sampling.py.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.bucketed_view import (
    BucketedMaterializedView)
from ydb_cdc_processor_spark.operators.ivm_feed import Feed

logger = logging.getLogger(__name__)

#: hash-fraction resolution (functions/sampling.py contract)
_DENOM = float(1 << 32)


class SampleView:
    """Persistent per-group top-n-by-deterministic-priority sample with
    incremental semilattice maintenance and one-shot-equal serving."""

    def __init__(self, spark: SparkSession, path: str,
                 group_cols: list[str], id_col: str, n: int,
                 payload_cols: list[str] | None = None,
                 weight_col: str | None = None, n_buckets: int = 8):
        """``payload_cols``: non-key columns carried with each sampled
        row (the sample's point is the rows themselves).  ``weight_col``
        switches uniform → A-ES weighted sampling; the weight is part of
        the payload so the stored priority is self-contained."""
        if n < 1:
            raise ValueError("n must be >= 1")
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.id_col = id_col
        self.n = n
        self.payload_cols = list(payload_cols or [])
        self.weight_col = weight_col
        self.view = BucketedMaterializedView(
            spark, os.path.join(path, "rows"),
            keys=self.group_cols + [id_col], bucket_keys=self.group_cols,
            n_buckets=n_buckets)

    # -- the priority (pure function of the row; engine-replayable) -----------

    def _priority(self) -> F.Column:
        """The stored sampling priority — a pure function of the row.
        Uniform: ``md5(id)`` hex string, LOWEST-n win (uniform because
        the hash order is independent of data order).  Weighted: the
        rounded A-ES key ``round(ln(u)/w, 9)`` as a double, HIGHEST-n
        win (functions/sampling.py:weighted_sample's exact arithmetic,
        so the oracle replay is shared)."""
        idc = F.col(self.id_col).cast("string")
        if self.weight_col is None:
            return F.md5(idc)
        h = (F.conv(F.substring(F.md5(idc), 1, 8), 16, 10)
             .cast("long") + F.lit(1)) / F.lit(_DENOM)
        return F.round(F.log(h) / F.col(self.weight_col), 9)

    def _rank_cols(self):
        pri = (F.col("_pri").asc() if self.weight_col is None
               else F.col("_pri").desc())
        return [pri, F.col(self.id_col).asc()]

    def _payload_digest(self) -> F.Column:
        """Injective digest of the payload columns (JSON field names
        disambiguate nulls) — the deterministic tie-break when the same
        (group, id) is offered with different payloads."""
        if not self.payload_cols:
            return F.lit("")
        return F.md5(F.to_json(F.struct(
            *[F.col(c) for c in self.payload_cols])))

    def _dedup_keys(self, df: DataFrame) -> DataFrame:
        """One row per (group, id): keep the winning-priority offer,
        then the lowest payload digest — never an arbitrary
        dropDuplicates survivor (advisor finding: an arbitrary survivor
        made the stored payload — and, in weighted mode, the _pri
        ranking key, which depends on the weight — nondeterministic,
        silently breaking the maintained-equals-one-shot semilattice
        guarantee).  ``max by (priority, digest)`` is idempotent,
        commutative and associative, so every convergence argument in
        the module docstring survives re-offered ids unchanged."""
        w = Window.partitionBy(*self.group_cols, self.id_col).orderBy(
            self._rank_cols()[0], self._payload_digest().asc())
        return (df.withColumn("_dup", F.row_number().over(w))
                .where(F.col("_dup") == 1).drop("_dup"))

    def _candidates(self, rows: DataFrame) -> DataFrame:
        """Project + prune a batch to its own per-group top-n — the
        map-side collapse that bounds the merge input."""
        if self.weight_col is not None:
            rows = rows.where(F.col(self.weight_col) > 0)
        cand = rows.select(*self.group_cols, self.id_col,
                           *self.payload_cols,
                           self._priority().alias("_pri"))
        cand = self._dedup_keys(cand)   # intra-batch re-offers too
        w = Window.partitionBy(*self.group_cols).orderBy(*self._rank_cols())
        return (cand.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= self.n).drop("_rk"))

    # -- maintenance -----------------------------------------------------------

    def apply_delta(self, new_rows: DataFrame | None,
                    old_rows: DataFrame | None = None,
                    batch_token: str | None = None) -> None:
        """Merge one micro-batch into the reservoir.  ``old_rows`` must
        be None or EMPTY (content-checked): evicted candidates are gone,
        so the reservoir cannot retract — delete/rewrite-bearing batches
        raise; bootstrap old images on an absent store are tolerated
        with a warning (the HllView contract).  ``batch_token`` accepted
        for feed compatibility, unused — the top-n merge is idempotent.
        """
        if old_rows is not None and not old_rows.isEmpty():
            if self.view.exists():
                raise ValueError(
                    "SampleView cannot retract (evicted candidates are "
                    "discarded) — this batch carries old images; "
                    "rebuild the sample from a fresh scan instead")
            logger.warning(
                "SampleView %s: discarding old images on bootstrap "
                "(store absent) — a rewrite-bearing first batch can "
                "leave evicted-row artifacts; bootstrap from an "
                "insert-only scan", self.path)
        if new_rows is None:
            return
        self._merge_candidates(self._candidates(new_rows))

    def _merge_candidates(self, cand: DataFrame) -> None:
        """Semilattice join: combined per-group top-n of (stored ∪
        candidates), touching only the batch groups' buckets.  Evicted
        stored rows DELETE in the same fused apply_batch pass."""
        if not self.view.exists():
            self.view.apply(cand, action="upsertInto")
            return
        cand = cand.localCheckpoint(eager=True)  # feeds collect + merge
        touched = sorted({r[0] for r in cand.select(
            self.view.bucket_expr().alias("_b")).distinct().collect()})
        old = self.view.read_touched(touched).drop("_bucket")
        # candidate ids already stored must not double: replays re-offer
        # the same (group, id) — resolved DETERMINISTICALLY by
        # _dedup_keys, never positionally
        merged = self._dedup_keys(
            old.unionByName(cand, allowMissingColumns=True))
        w = Window.partitionBy(*self.group_cols).orderBy(*self._rank_cols())
        ranked = merged.withColumn("_rk", F.row_number().over(w)).persist()
        try:
            keep = ranked.where(F.col("_rk") <= self.n).drop("_rk")
            evict = (ranked.where(F.col("_rk") > self.n)
                     .select(*self.group_cols, self.id_col))
            self.view.apply_batch(keep, evict, action="upsertInto")
        finally:
            ranked.unpersist()

    def merge_from(self, other: "SampleView") -> None:
        """Federated union of shard samples — the merged state equals
        the one-shot sample of the union (semilattice associativity).
        Layout must match: same priority function and same n."""
        if (other.group_cols != self.group_cols
                or other.id_col != self.id_col
                or other.weight_col != self.weight_col):
            raise ValueError("sample layout (group_cols/id_col/"
                             "weight_col) must match to merge")
        if other.n < self.n:
            raise ValueError(
                f"cannot merge an n={other.n} shard into an n={self.n} "
                "store — the shard already evicted rows this store "
                "would keep")
        if not other.view.exists():
            return
        self._merge_candidates(
            other.view.read().select(*self.group_cols, self.id_col,
                                     *self.payload_cols, "_pri"))

    def feed(self) -> Feed:
        """Adapter for a CDC engine's ``agg_views`` list (insert-only
        sources; a delete-bearing feed raises by contract)."""
        return Feed(self.apply_delta)

    def start_stream(self, rows_stream: DataFrame, checkpoint_dir: str,
                     available_now: bool = True):
        """Maintain the sample from a STREAM (foreachBatch →
        :meth:`apply_delta`) — replay-safe without a fence because the
        top-n merge is idempotent.  Returns the StreamingQuery."""
        def _batch(df, batch_id: int) -> None:
            self.apply_delta(df, None)

        writer = (rows_stream.writeStream
                  .foreachBatch(_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- serving -----------------------------------------------------------------

    def read(self) -> DataFrame:
        """The live sample: ``(*group_cols, id_col, *payload_cols)`` —
        ≤ n rows per group."""
        if not self.view.exists():
            raise FileNotFoundError(self.path)
        return self.view.read().select(*self.group_cols, self.id_col,
                                       *self.payload_cols)

    def recompute_check(self, rows: DataFrame) -> bool:
        """True iff the maintained sample equals the one-shot per-group
        top-n of ``rows`` (the lifecycle tests' invariant)."""
        want = {tuple(r) for r in self._candidates(rows).collect()}
        got = {tuple(r) for r in self.view.read().select(
            *self.group_cols, self.id_col, *self.payload_cols,
            "_pri").collect()}
        return want == got

    def maintain(self) -> None:
        """Between-batch housekeeping (state is ≤ |groups|·n rows —
        compaction dominates)."""
        self.view.maintain()
