"""Time-travel reads over a materialized view — per-batch snapshots at
zero data cost.

The reference's target is a mutable row table: once a batch lands, the
pre-batch state is gone (``YqlWriter.java:118-147`` upserts in place).
Warehouse users expect better — "what did the view hold before this
morning's backfill?" — and the flat view's immutable-parquet + atomic
swap design makes snapshots nearly free: every ``overwrite`` writes a
FRESH directory of files that are never mutated afterwards, so a
snapshot is one ``os.link`` per file (inode refs, no data copy), taken
atomically via the same temp+rename discipline as the swap itself.  A
later swap deletes the live directory's entries, but the snapshot's
hardlinks keep the inodes alive — a version reads identically forever,
or until retention prunes it.

Cost model at scale: O(#files) metadata ops per snapshot, zero bytes
copied (the 100 TB analogue is a manifest pointing at immutable
object-store keys — Delta/Iceberg's snapshot design; hardlinks are the
local-filesystem spelling of the same idea).  Disk retention: a flat
view rewrites every file per batch, so budget ``keep_last × |view|``
bytes — the feature fits compact serving views, not the fact store
(which is the bucketed view's territory; its touched-bucket rewrites
would share MOST files across versions, the natural extension).

Replay interaction: versions are stamped with the view's current meta
(including any batch token the owner wrote), so a checkpoint replay
that re-applies a batch and re-snapshots produces a DUPLICATE version
of identical content — harmless for reads, and ``snapshot(label=...)``
with a stable label collapses it (same label → same version slot).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from ydb_cdc_processor_spark import storage
from ydb_cdc_processor_spark.operators.merge import ParquetMaterializedView

_SNAP_META = "_snap.json"


class SnapshotView:
    """Hardlink-based version history for a :class:`ParquetMaterializedView`."""

    def __init__(self, view: ParquetMaterializedView, keep_last: int = 5):
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        self.view = view
        self.keep_last = keep_last
        parent = os.path.dirname(os.path.abspath(view.path)) or "."
        self.snap_dir = os.path.join(
            parent, f".{os.path.basename(view.path)}.snapshots")

    # -- write side ------------------------------------------------------------

    def snapshot(self, label: str | None = None) -> int:
        """Capture the CURRENT view state as the next version (or re-use
        the version already carrying ``label`` — the replay-collapse
        path).  Returns the version number.  Atomic AGAINST CRASHES:
        links build in a temp sibling and rename in; a crash
        mid-snapshot leaves only an ignorable temp directory.  NOT safe
        against a CONCURRENT writer: a swap racing the link walk could
        freeze a cross-bucket torn version (or ENOENT mid-link) — call
        snapshot() from the same maintenance loop that calls apply(),
        between batches, exactly like maintain(); the engines'
        driver-serialized batch loop satisfies this by construction.

        Label-collapse scope: a replay is only collapsible while its
        version is RETAINED — re-snapshotting a label that retention
        already pruned mints a new version of the CURRENT state.  Size
        ``keep_last`` above the checkpoint replay window (replays
        re-apply the last batch, never one ``keep_last`` generations
        back)."""
        if label is not None:
            for v in self.versions():
                if v.get("label") == label:
                    return v["version"]
        if hasattr(self.view, "recover"):
            # bucketed views: repair any crash-torn bucket BEFORE the
            # link walk — a snapshot of a displaced bucket would freeze
            # the torn state forever
            self.view.recover()
        if not self.view.exists():
            raise FileNotFoundError(
                f"view at {self.view.path} has no state to snapshot")
        storage.makedirs(self.snap_dir)
        version = 1 + max((v["version"] for v in self.versions()),
                          default=0)
        tmp = os.path.join(self.snap_dir,
                           f".v{version}.tmp-{uuid.uuid4().hex[:8]}")
        # recursive link walk: a BUCKETED view's _bucket=N subdirs come
        # along too, and buckets the next batches never touch keep
        # pointing at the SAME inodes across versions — snapshot storage
        # grows with churn, not with view size (the manifest-sharing
        # property Delta/Iceberg get from immutable object keys).
        # link_or_copy is the seam primitive: hardlink on POSIX, byte
        # copy on backends without links (HDFS/object stores — where
        # the manifest-pointer snapshot design replaces this wholesale)
        n_files = 0
        for root, _dirs, files in storage.walk(self.view.path):
            rel = os.path.relpath(root, self.view.path)
            dst = tmp if rel == "." else os.path.join(tmp, rel)
            storage.makedirs(dst)
            for name in files:
                storage.link_or_copy(os.path.join(root, name),
                                     os.path.join(dst, name))
                n_files += 1
        view_meta = (self.view.read_meta()
                     if hasattr(self.view, "read_meta") else {})
        storage.write_text(
            os.path.join(tmp, _SNAP_META),
            json.dumps({"version": version, "label": label,
                        "n_files": n_files, "view_meta": view_meta}))
        storage.rename(tmp, os.path.join(self.snap_dir, f"v{version}"))
        self._prune()
        return version

    def _prune(self) -> None:
        vs = sorted(self.versions(), key=lambda v: v["version"])
        for v in vs[:-self.keep_last]:
            storage.remove_tree(os.path.join(self.snap_dir,
                                             f"v{v['version']}"))

    # -- read side -------------------------------------------------------------

    def versions(self) -> list[dict]:
        """Metadata of every retained version, ascending — bounded
        (≤ keep_last rows), driver-side."""
        out = []
        if not storage.is_dir(self.snap_dir):
            return out
        for name in storage.listdir(self.snap_dir):
            meta = os.path.join(self.snap_dir, name, _SNAP_META)
            if name.startswith("v") and storage.is_file(meta):
                out.append(json.loads(storage.read_text(meta)))
        return sorted(out, key=lambda v: v["version"])

    def read_as_of(self, version: int) -> DataFrame:
        """The view exactly as it stood when ``version`` was taken.
        Bucketed snapshots read their ``_bucket=N`` layout with the
        snapshot root as basePath; the internal bucket column is
        dropped, matching the live view's public ``read()``."""
        path = os.path.join(self.snap_dir, f"v{version}")
        if not storage.is_dir(path):
            have = [v["version"] for v in self.versions()]
            raise FileNotFoundError(
                f"no snapshot v{version} at {self.snap_dir} "
                f"(retained: {have} — keep_last={self.keep_last})")
        df = (self.view.spark.read.option("basePath", path)
              .parquet(path))
        from ydb_cdc_processor_spark.operators.bucketed_view import (
            BUCKET_COL)
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df
