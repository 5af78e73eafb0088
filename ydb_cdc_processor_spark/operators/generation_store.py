"""Manifest-pointer commit — the object-store promotion protocol,
executed.

The bucketed stores promote batches by ATOMIC DIRECTORY RENAME, which
exists on POSIX and HDFS but not on object stores (S3/GCS rename is a
per-key copy+delete — a reader can observe a half-renamed bucket).
SCALING.md round-14 documents the required redesign; this class IS that
redesign, runnable today against
:class:`~ydb_cdc_processor_spark.storage.ObjectStoreSimStorage` (which
forbids directory rename outright):

- every batch writes its touched buckets under a GENERATION-unique
  prefix (``b=<n>/<gen>/part-*.parquet``) — invisible to readers, so
  the copy-in can be as non-atomic as an object store's multi-key
  upload actually is;
- ONE atomic manifest swap (``replace_text`` — a single-key PUT on a
  real object store) flips every touched bucket's current-generation
  pointer AND records the batch replay token in the same write.  The
  whole batch becomes visible atomically — strictly STRONGER than the
  bucketed store's per-bucket rename promotion, whose mid-batch crash
  exposes a mixed old/new state until the replay converges;
- superseded generation directories become unreachable the moment the
  manifest stops naming them; their deletion is pure GC
  (:meth:`vacuum`), exactly the correctness posture the storage-seam
  design note prescribes ("correctness must never depend on a delete
  landing").

Crash windows, by construction: before the manifest swap → stray
unreferenced generation dirs (GC'd by vacuum, invisible to readers);
after the swap → the batch is fully committed and its token recorded,
so the checkpoint replay short-circuits.  There is no torn-visibility
window at all.

Scale shape: identical to the bucketed view — per-batch cost is
O(touched buckets × bucket size), reads are direct generation-path
scans planned from ONE manifest read (no directory listing of the
bucket root at all, which on a real object store also dodges the
LIST-per-partition planning cost).  The reference's storage layer is
YDB's own server (YqlWriter.java writes rows, never files); this
class is the piece our file-native design needs that the reference
never had to build.
"""

from __future__ import annotations

import json
import logging
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_cdc_processor_spark import storage
from ydb_cdc_processor_spark.operators.bucketed_view import (
    TOKEN_HISTORY, rebalance_by_bucket)
from ydb_cdc_processor_spark.operators.merge import (
    MERGE_FNS, merge_delete, widen_to_union)

logger = logging.getLogger(__name__)

BUCKET_COL = "_bucket"
MANIFEST = "_manifest.json"


class GenerationStore:
    """Keyed materialized view whose ONLY commit primitive is an atomic
    single-file manifest swap — no directory rename anywhere on any
    path, so the full lifecycle runs on object-store semantics."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 schema=None, n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.schema = schema
        stored = self._manifest().get("n_buckets")
        if stored is not None and int(stored) != n_buckets:
            logger.info("generation store %s: manifest n_buckets=%s "
                        "overrides constructor %d", path, stored, n_buckets)
        self.n_buckets = int(stored) if stored is not None else n_buckets

    # -- manifest (the single source of visibility) ---------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST)

    def _manifest(self) -> dict:
        try:
            return json.loads(storage.read_text(self._manifest_path()))
        except (OSError, ValueError):
            return {}

    def _commit(self, mutate) -> None:
        """Read-modify-swap the manifest — the ONE commit point.  On a
        real object store this is a single-key PUT (atomic per key)."""
        storage.makedirs(self.path)
        doc = self._manifest()
        doc.setdefault("n_buckets", self.n_buckets)
        mutate(doc)
        storage.replace_text(self._manifest_path(), json.dumps(doc))

    def gens(self) -> dict[str, str]:
        """bucket-id (string) → current generation id."""
        return dict(self._manifest().get("gens") or {})

    def applied_tokens(self) -> list[str]:
        return list(self._manifest().get("applied_tokens") or [])

    # -- layout ----------------------------------------------------------------

    def bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]),
                      F.lit(self.n_buckets)).cast("int")

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COL, self.bucket_expr())

    def _gen_dir(self, b, gen: str) -> str:
        return os.path.join(self.path, f"b={b}", gen)

    # -- reads (planned from one manifest read, zero listings) ------------------

    def exists(self) -> bool:
        return bool(self._manifest().get("gens"))

    def read(self) -> DataFrame:
        gens = self.gens()
        if not gens:
            if self.schema is None:
                raise FileNotFoundError(self.path)
            return self.spark.createDataFrame([], self.schema)
        dirs = [self._gen_dir(b, g) for b, g in sorted(gens.items())]
        return self.spark.read.parquet(*dirs)

    def _read_touched(self, touched: list[int],
                      delta_schema) -> DataFrame:
        gens = self.gens()
        dirs = [self._gen_dir(b, gens[str(b)]) for b in touched
                if str(b) in gens]
        if not dirs:
            base = self.schema if self.schema is not None else delta_schema
            return self._with_bucket(self.spark.createDataFrame([], base))
        return self._with_bucket(self.spark.read.parquet(*dirs))

    # -- the incremental merge ---------------------------------------------------

    def apply(self, delta: DataFrame, action: str = "upsertInto",
              batch_token: str | None = None) -> None:
        """One keyed micro-batch, committed by ONE manifest swap.

        Replay contract: ``batch_token`` in the bounded applied history
        skips the whole batch (the token joins the history in the same
        swap that flips the generation pointers — token-recorded ⟺
        fully-visible, with no torn window to repair, which is why this
        store needs neither per-bucket fence files nor a recover())."""
        if (batch_token is not None
                and batch_token in self.applied_tokens()):
            logger.info("generation store %s: token %r already applied; "
                        "skipping replay", self.path, batch_token)
            return
        delta_b = self._with_bucket(delta).persist()
        try:
            touched = [r[0] for r in
                       delta_b.select(BUCKET_COL).distinct().collect()]
            if not touched:
                return
            target = self._read_touched(touched, delta.drop(BUCKET_COL)
                                        .schema if BUCKET_COL in
                                        delta.columns else delta.schema)
            keys_b = self.keys + [BUCKET_COL]
            if action == "deleteFrom":
                merged = merge_delete(target, delta_b, keys_b)
            else:
                target, delta_b2 = widen_to_union(target, delta_b)
                merged = MERGE_FNS[action](target, delta_b2, keys_b, None,
                                           None)
            gen = f"g-{uuid.uuid4().hex[:8]}"
            staging = os.path.join(self.path, "_staging", gen)
            (rebalance_by_bucket(merged)
             .write.mode("overwrite").partitionBy(BUCKET_COL)
             .parquet(staging))
            # non-atomic multi-key "upload" into the final generation
            # prefixes — harmless: nothing reads a generation the
            # manifest does not name yet
            emptied, placed = [], []
            for b in touched:
                src = os.path.join(staging, f"{BUCKET_COL}={b}")
                if not storage.is_dir(src):
                    emptied.append(b)       # merge emptied this bucket
                    continue
                dst = self._gen_dir(b, gen)
                storage.makedirs(dst)
                for name in storage.listdir(src):
                    if not name.startswith((".", "_")):
                        storage.copy_file(os.path.join(src, name),
                                          os.path.join(dst, name))
                placed.append(b)

            old = self.gens()

            def commit(doc):
                gens = dict(doc.get("gens") or {})
                for b in placed:
                    gens[str(b)] = gen
                for b in emptied:
                    gens.pop(str(b), None)
                doc["gens"] = gens
                if batch_token is not None:
                    hist = [t for t in (doc.get("applied_tokens") or [])
                            if t != batch_token]
                    doc["applied_tokens"] = \
                        (hist + [batch_token])[-TOKEN_HISTORY:]
            self._commit(commit)            # THE atomic visibility flip
            # everything below is GC — correctness already committed
            storage.remove_tree(os.path.join(self.path, "_staging", gen))
            for b in touched:
                g = old.get(str(b))
                if g is not None and g != gen:
                    storage.remove_tree(self._gen_dir(b, g))
        finally:
            delta_b.unpersist()

    # -- GC ------------------------------------------------------------------------

    def vacuum(self) -> int:
        """Remove every generation directory the manifest no longer
        names (crash leftovers: a batch that died before its commit, or
        an old generation whose post-commit delete failed).  Pure GC —
        readers can never reach these.  Returns directories removed."""
        gens = self.gens()
        removed = 0
        storage.remove_tree(os.path.join(self.path, "_staging"))
        if not storage.is_dir(self.path):
            return 0
        for e in storage.listdir(self.path):
            if not e.startswith("b="):
                continue
            b = e[2:]
            live = gens.get(b)
            bdir = os.path.join(self.path, e)
            for g in storage.listdir(bdir):
                if g != live:
                    storage.remove_tree(os.path.join(bdir, g))
                    removed += 1
        return removed
