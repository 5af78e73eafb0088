"""Exhaustive tear-point sweep over the bucketed view's crash windows.

The bucketed view's durability story rests on three claims
(operators/bucketed_view.py):

1. ``apply``'s per-bucket promotion — a crash between ANY two renames
   leaves a mix of old/displaced/new buckets that ``_recover`` repairs,
   and an idempotent replay of the same batch converges to the clean
   result;
2. ``merge_touched``'s token fencing — the same sweep for a
   NON-idempotent (±delta) merge must be exactly-once: replayed deltas
   apply only to buckets not yet promoted under the batch token;
3. ``rebucket``'s swap — a crash between the two directory renames must
   never lose the view; recovery restores the complete old layout and a
   re-run completes the migration.

These tests kill the process surrogate (raise) at EVERY rename/replace
boundary in turn — the same treatment the merge path's property tests
apply to interleavings — instead of hand-picking one or two windows.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.bucketed_view import (
    BucketedMaterializedView)


class Killed(BaseException):
    """Raised by the instrumented rename to simulate a hard crash.
    BaseException so no library except-Exception handler swallows it."""


class _RenameKiller:
    """Counts os.rename/os.replace calls; raises on call #kill_at."""

    def __init__(self, kill_at: int | None):
        self.kill_at = kill_at
        self.calls = 0
        self._real_rename = os.rename
        self._real_replace = os.replace

    def _wrap(self, real):
        def inner(*a, **k):
            if self.kill_at is not None and self.calls == self.kill_at:
                raise Killed()
            self.calls += 1
            return real(*a, **k)
        return inner

    def __enter__(self):
        os.rename = self._wrap(self._real_rename)
        os.replace = self._wrap(self._real_replace)
        return self

    def __exit__(self, *exc):
        os.rename = self._real_rename
        os.replace = self._real_replace
        return False


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


BASE = [(i, f"v{i}") for i in range(24)]
DELTA = [(i, f"NEW{i}") for i in range(0, 24, 3)] + \
        [(100 + i, f"ins{i}") for i in range(4)]


def _build_base(spark, path):
    view = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
    view.apply(spark.createDataFrame(BASE, "id long, v string"))
    return view


def test_bucketed_crash_recovery_apply(spark, tmp_path):
    """Idempotent upsert: kill at every rename boundary, replay, expect
    the clean result every time."""
    pristine = str(tmp_path / "pristine")
    _build_base(spark, pristine)
    delta_df = spark.createDataFrame(DELTA, "id long, v string")

    # clean run on a copy → expected rows + the rename-call budget
    clean = str(tmp_path / "clean")
    shutil.copytree(pristine, clean)
    with _RenameKiller(None) as rk:
        v = BucketedMaterializedView(spark, clean, ["id"], n_buckets=4)
        v.apply(delta_df, action="upsertInto")
    n_renames = rk.calls
    expected = _rows(v.read())
    assert n_renames >= 2, "sweep needs at least one promotion boundary"

    for kill_at in range(n_renames):
        path = str(tmp_path / f"t{kill_at}")
        shutil.copytree(pristine, path)
        v = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
        with _RenameKiller(kill_at), pytest.raises(Killed):
            v.apply(delta_df, action="upsertInto")
        # fresh instance = restart; replay the same batch
        v2 = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
        v2.apply(delta_df, action="upsertInto")
        assert _rows(v2.read()) == expected, f"diverged at tear {kill_at}"


def test_bucketed_crash_recovery_merge_touched_exactly_once(spark, tmp_path):
    """NON-idempotent ±delta merge under a batch token: kill at every
    rename boundary, replay WITH the same token, expect each delta
    applied exactly once (never doubled, never lost)."""
    base = [(i, i * 10) for i in range(16)]
    delta = [(i, 1) for i in range(0, 16, 2)]

    def merge_fn(target, d):
        t = target.groupBy("id", "_bucket").agg(F.sum("n").alias("n"))
        dd = d.groupBy("id", "_bucket").agg(F.sum("n").alias("n"))
        return (t.unionByName(dd)
                .groupBy("id", "_bucket").agg(F.sum("n").alias("n")))

    def build(path):
        v = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
        v.apply(spark.createDataFrame(base, "id long, n long"))
        return v

    delta_df = spark.createDataFrame(delta, "id long, n long")
    clean = str(tmp_path / "clean")
    v = build(clean)
    with _RenameKiller(None) as rk:
        v.merge_touched(delta_df, merge_fn, batch_token="b1")
    n_renames = rk.calls
    expected = _rows(v.read())

    pristine = str(tmp_path / "pristine")
    build(pristine)
    for kill_at in range(n_renames):
        path = str(tmp_path / f"m{kill_at}")
        shutil.copytree(pristine, path)
        v = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
        with _RenameKiller(kill_at), pytest.raises(Killed):
            v.merge_touched(delta_df, merge_fn, batch_token="b1")
        v2 = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
        v2.merge_touched(delta_df, merge_fn, batch_token="b1")
        assert _rows(v2.read()) == expected, f"diverged at tear {kill_at}"
        # a SECOND replay of the fully-applied token must be a no-op
        assert v2.merge_touched(delta_df, merge_fn, batch_token="b1") is False
        assert _rows(v2.read()) == expected


def test_bucketed_crash_recovery_rebucket(spark, tmp_path):
    """Rebucket swap: kill at every rename boundary; the view must never
    lose rows, and re-running the rebucket completes the migration."""
    pristine = str(tmp_path / "pristine")
    v = _build_base(spark, pristine)
    expected = _rows(v.read())

    clean = str(tmp_path / "clean")
    shutil.copytree(pristine, clean)
    with _RenameKiller(None) as rk:
        BucketedMaterializedView(spark, clean, ["id"]).rebucket(8)
    n_renames = rk.calls

    for kill_at in range(n_renames):
        path = str(tmp_path / f"r{kill_at}")
        shutil.copytree(pristine, path)
        v = BucketedMaterializedView(spark, path, ["id"])
        with _RenameKiller(kill_at), pytest.raises(Killed):
            v.rebucket(8)
        # restart: content must be intact under whichever layout survived
        v2 = BucketedMaterializedView(spark, path, ["id"])
        assert _rows(v2.read()) == expected, f"lost rows at tear {kill_at}"
        v2.rebucket(8)
        v3 = BucketedMaterializedView(spark, path, ["id"])
        assert v3.n_buckets == 8
        assert _rows(v3.read()) == expected


def test_flat_view_crash_recovery_sweep(spark, tmp_path):
    """The same exhaustive tear sweep for the FLAT view's overwrite swap
    (merge.ParquetMaterializedView): kill at every rename boundary,
    replay the same batch, expect the clean result every time.  (The
    single-window test in test_merge.py hand-picks one boundary; this
    covers them all.)"""
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)

    base = [(i, f"v{i}") for i in range(20)]
    delta = [(i, f"NEW{i}") for i in range(0, 20, 4)] + [(100, "ins")]
    delta_df = spark.createDataFrame(delta, "id long, v string")

    pristine = str(tmp_path / "pristine")
    ParquetMaterializedView(spark, pristine, ["id"]).overwrite(
        spark.createDataFrame(base, "id long, v string"))

    clean = str(tmp_path / "clean")
    shutil.copytree(pristine, clean)
    with _RenameKiller(None) as rk:
        v = ParquetMaterializedView(spark, clean, ["id"])
        v.apply(delta_df)
    n_renames = rk.calls
    expected = _rows(v.read())
    assert n_renames >= 2

    for kill_at in range(n_renames):
        path = str(tmp_path / f"f{kill_at}")
        shutil.copytree(pristine, path)
        v = ParquetMaterializedView(spark, path, ["id"])
        with _RenameKiller(kill_at), pytest.raises(Killed):
            v.apply(delta_df)
        v2 = ParquetMaterializedView(spark, path, ["id"])
        v2.apply(delta_df)
        assert _rows(v2.read()) == expected, f"diverged at tear {kill_at}"
