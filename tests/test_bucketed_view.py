"""Bucketed materialized view: equivalence with the flat view across all
action modes, incremental multi-batch apply, emptied-bucket cleanup,
replay idempotence, and partition pruning of the touched-bucket read."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.bucketed_view import (
    BUCKET_COL, BucketedMaterializedView)
from ydb_cdc_processor_spark.operators.merge import (
    ParquetMaterializedView, StrictInsertError)
from ydb_cdc_processor_spark.sources.catalog import load_table

KEYS = ["o_orderkey"]


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").cache()


def _rows(df):
    return sorted(map(tuple, df.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority").collect()))


def _mk(spark, tmp_path, orders, n_buckets=8):
    flat = ParquetMaterializedView(spark, str(tmp_path / "flat"), KEYS,
                                   schema=orders.schema)
    buck = BucketedMaterializedView(spark, str(tmp_path / "buck"), KEYS,
                                    schema=orders.schema,
                                    n_buckets=n_buckets)
    flat.apply(orders, "upsertInto")
    buck.apply(orders, "upsertInto")
    return flat, buck


@pytest.mark.parametrize("action", ["upsertInto", "updateOn", "deleteFrom"])
def test_equivalent_to_flat_view(spark, tmp_path, orders, action):
    flat, buck = _mk(spark, tmp_path, orders)
    delta = (orders.where(F.col("o_orderkey") % 5 == 0)
             .withColumn("o_orderstatus", F.lit("Z")))
    if action == "deleteFrom":
        delta = delta.select(*KEYS)
    flat.apply(delta, action)
    buck.apply(delta, action)
    assert _rows(flat.read()) == _rows(buck.read())


def test_insert_collision_raises(spark, tmp_path, orders):
    _, buck = _mk(spark, tmp_path, orders)
    with pytest.raises(StrictInsertError):
        buck.apply(orders.limit(10), "insertInto")


def test_incremental_batches_match_flat(spark, tmp_path, orders):
    flat, buck = _mk(spark, tmp_path, orders)
    for i in range(3):
        delta = (orders.where(F.col("o_orderkey") % 7 == i)
                 .withColumn("o_totalprice", F.col("o_totalprice") + i))
        flat.apply(delta, "upsertInto")
        buck.apply(delta, "upsertInto")
        dels = orders.where(F.col("o_orderkey") % 11 == i).select(*KEYS)
        flat.apply(dels, "deleteFrom")
        buck.apply(dels, "deleteFrom")
    assert _rows(flat.read()) == _rows(buck.read())


def test_emptied_bucket_is_dropped(spark, tmp_path, orders):
    """Deleting EVERY key must empty the view even though dynamic
    partition overwrite writes no partitions for emptied buckets."""
    _, buck = _mk(spark, tmp_path, orders, n_buckets=4)
    buck.apply(orders.select(*KEYS), "deleteFrom")
    assert buck.read().count() == 0


def test_replay_idempotent(spark, tmp_path, orders):
    _, buck = _mk(spark, tmp_path, orders)
    delta = orders.where(F.col("o_orderkey") % 3 == 0) \
                  .withColumn("o_orderstatus", F.lit("R"))
    buck.apply(delta, "upsertInto")
    once = _rows(buck.read())
    buck.apply(delta, "upsertInto")   # checkpoint-replay simulation
    assert _rows(buck.read()) == once


def test_touched_bucket_read_is_partition_pruned(spark, tmp_path, orders):
    """The merge's target read must hit only the touched partitions —
    visible as a PartitionFilters entry with ``_bucket IN (...)``."""
    _, buck = _mk(spark, tmp_path, orders, n_buckets=8)
    pruned = buck._read_raw().where(F.col(BUCKET_COL).isin([1, 3]))
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    assert "_bucket IN (1,3)" in plan.replace(", ", ",") or \
           BUCKET_COL in plan.split("PartitionFilters", 1)[1].split("]")[0]
    # and the pruned read returns only those buckets' rows
    got = {r[0] for r in pruned.select(BUCKET_COL).distinct().collect()}
    assert got <= {1, 3}


def test_manifest_overrides_constructor(spark, tmp_path, orders):
    """Bucket count is a property of the on-disk LAYOUT: a fresh instance
    constructed with a different n_buckets adopts the manifest's count
    (a mismatched count would route keys to wrong buckets)."""
    _, buck = _mk(spark, tmp_path, orders, n_buckets=8)
    assert buck._read_manifest() == 8
    reopened = BucketedMaterializedView(
        spark, str(tmp_path / "buck"), KEYS, n_buckets=64)
    assert reopened.n_buckets == 8


def test_rebucket_preserves_contents(spark, tmp_path, orders):
    """rebucket(): one full rewrite to a new bucket count; contents
    identical, manifest updated, merges keep working at the new layout."""
    flat, buck = _mk(spark, tmp_path, orders, n_buckets=4)
    before = _rows(buck.read())
    buck.rebucket(16)
    assert buck.n_buckets == 16
    assert _rows(buck.read()) == before
    assert buck._read_manifest() == 16
    assert buck.n_nonempty_buckets() <= 16

    # a post-rebucket merge must agree with the flat view
    delta = orders.limit(50).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2)
    flat.apply(delta, "upsertInto")
    buck2 = BucketedMaterializedView(  # fresh instance: manifest-driven
        spark, str(tmp_path / "buck"), KEYS, n_buckets=4)
    assert buck2.n_buckets == 16
    buck2.apply(delta, "upsertInto")
    assert _rows(buck2.read()) == _rows(flat.read())


def test_maybe_rebucket_growth_trigger(spark, tmp_path, orders):
    """The documented growth rule (SCALING.md: n_buckets ∝ |view|): mean
    bucket size over target×4 → rebucket to ceil-pow2(total/target);
    under it → no-op.  Sizing comes from file metadata only."""
    _, buck = _mk(spark, tmp_path, orders, n_buckets=2)
    total = buck.total_bytes()
    assert total > 0
    # generous target: no rebucket
    assert buck.maybe_rebucket(target_bucket_bytes=total * 10) is False
    assert buck.n_buckets == 2
    # tiny target: must grow to a power of two > 2, contents preserved
    before = _rows(buck.read())
    assert buck.maybe_rebucket(target_bucket_bytes=max(total // 16, 1)) is True
    assert buck.n_buckets > 2 and buck.n_buckets & (buck.n_buckets - 1) == 0
    assert _rows(buck.read()) == before


def test_read_touched_probes_only_touched_dirs(spark, tmp_path, orders):
    """_read_touched: direct-path read of the touched buckets only — a
    bucket that does not exist on disk is simply absent (no error), and
    untouched buckets contribute no rows."""
    _, buck = _mk(spark, tmp_path, orders, n_buckets=8)
    got = buck._read_touched([1, 3, 999], orders.schema)
    assert {r[0] for r in got.select(BUCKET_COL).distinct().collect()} \
        <= {1, 3}
    # all-missing probe → empty frame with the right schema
    empty = buck._read_touched([999, 1000], orders.schema)
    assert empty.count() == 0
    assert BUCKET_COL in empty.columns


def test_rebucket_crash_between_renames_recovers(spark, tmp_path, orders):
    """A crash between rebucket()'s two renames leaves the view path
    missing and the complete old layout at the deterministic .old
    sibling; the next observation must restore it instead of treating
    the view as never-written (which would silently rebuild it from one
    delta)."""
    import os
    _, buck = _mk(spark, tmp_path, orders, n_buckets=4)
    before = _rows(buck.read())
    # simulate the torn swap: view renamed aside, new layout never landed
    os.rename(buck.path, buck._old_dir())
    reopened = BucketedMaterializedView(
        spark, str(tmp_path / "buck"), KEYS, n_buckets=4)
    assert reopened.exists() is True          # _recover restored it
    assert _rows(reopened.read()) == before
    assert reopened._read_manifest() == 4     # old layout, old count


def test_rebucket_failure_keeps_n_buckets_consistent(
        spark, tmp_path, orders, monkeypatch):
    """An exception during the swap must leave self.n_buckets agreeing
    with the on-disk layout (a premature mutation would mis-bucket every
    subsequent delta in-process)."""
    import os
    _, buck = _mk(spark, tmp_path, orders, n_buckets=4)
    real_rename = os.rename
    def boom(src, dst):
        raise OSError("simulated crash during swap")
    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError):
        buck.rebucket(16)
    monkeypatch.setattr(os, "rename", real_rename)
    assert buck.n_buckets == 4
    assert buck._read_manifest() == 4
    # and the view still merges correctly at the unchanged layout
    delta = orders.limit(20).withColumn("o_orderstatus", F.lit("X"))
    buck.apply(delta, "upsertInto")
    assert _rows(buck.read()) != []


def test_displaced_bucket_recovers(spark, tmp_path, orders):
    """_overwrite_touched's crash window: a live bucket renamed aside to
    .displaced-_bucket=N with no replacement promoted yet.  The next
    observation restores the displaced copy (pre-batch rows are NOT
    lost); a displaced leftover whose bucket was already promoted is
    dropped."""
    import os
    import shutil
    _, buck = _mk(spark, tmp_path, orders, n_buckets=4)
    before = _rows(buck.read())
    live = [e for e in os.listdir(buck.path)
            if e.startswith(f"{BUCKET_COL}=")]
    victim = os.path.join(buck.path, live[0])
    disp = os.path.join(buck.path, f".displaced-{live[0]}")
    # window (a): bucket renamed aside, replacement never landed
    os.rename(victim, disp)
    assert buck.exists() is True
    assert _rows(buck.read()) == before       # restored, nothing lost
    # window (b): crash after promotion — displaced leftover + live bucket
    shutil.copytree(victim, disp)
    assert buck.exists() is True
    assert not os.path.exists(disp)           # leftover dropped
    assert _rows(buck.read()) == before


def test_compact_fragmented_buckets(spark, tmp_path):
    """compact() must rewrite ONLY over-fragmented buckets down to one
    file each, preserve content and replay tokens exactly, and leave
    healthy buckets' files untouched."""
    import os

    from ydb_cdc_processor_spark.operators.bucketed_view import (
        BUCKET_COL, BucketedMaterializedView)

    path = str(tmp_path / "view")
    view = BucketedMaterializedView(spark, path, ["id"], n_buckets=4)
    view.apply(spark.createDataFrame([(i, f"v{i}") for i in range(64)],
                                     "id long, v string"))
    before = sorted(tuple(r) for r in view.read().collect())

    # fragment one bucket the way an external appender would: same rows,
    # many files
    def files_of(b):
        d = os.path.join(path, f"{BUCKET_COL}={b}")
        return [f for f in os.listdir(d) if not f.startswith((".", "_"))]

    frag = os.path.join(path, f"{BUCKET_COL}=0")
    rows0 = spark.read.option("basePath", path).parquet(frag) \
        .drop(BUCKET_COL).localCheckpoint(eager=True)
    rows0.repartition(8).write.mode("overwrite").parquet(frag)
    assert len(files_of(0)) > 4
    healthy_before = files_of(1)
    # seed a replay token on the fragmented bucket: compaction must carry it
    with open(os.path.join(frag, "_token"), "w") as fh:
        fh.write("tok-keep")

    n = view.compact(max_files_per_bucket=4)
    assert n == 1
    assert len(files_of(0)) == 1
    assert files_of(1) == healthy_before
    assert view.bucket_token(0) == "tok-keep"
    assert sorted(tuple(r) for r in view.read().collect()) == before
    # idempotent: nothing left to compact
    assert view.compact(max_files_per_bucket=4) == 0


def test_rebucket_preserves_bucket_keys_in_manifest(spark, tmp_path):
    """rebucket() must carry bucket_keys into the new manifest — a
    co-located store reopened without repeating bucket_keys= would
    otherwise hash probes over the full key set and read the wrong
    directories (found by review)."""
    from ydb_cdc_processor_spark.operators.bucketed_view import (
        BucketedMaterializedView)
    path = str(tmp_path / "colo")
    mv = BucketedMaterializedView(spark, path, keys=["g", "id"],
                                  bucket_keys=["g"], n_buckets=2)
    df = spark.createDataFrame([(i % 5, i, i) for i in range(100)],
                               "g long, id long, v long")
    mv.apply(df, action="upsertInto")
    mv.rebucket(8)
    reopened = BucketedMaterializedView(spark, path, keys=["g", "id"])
    assert reopened.bucket_keys == ["g"]
    assert reopened.n_buckets == 8
    # probes through the reopened handle still find their rows
    b = [r[0] for r in spark.createDataFrame([(3,)], "g long")
         .select(reopened.bucket_expr().alias("b")).collect()]
    rows = reopened.read_touched(b, df.schema)
    assert rows.where("g = 3").count() == 20


def test_rewrite_rows_preserves_tokens_and_fences_empty_buckets(
        spark, tmp_path):
    """rewrite_rows: in-place housekeeping rewrite — content transformed,
    per-bucket replay tokens preserved, and a bucket whose rows are ALL
    removed stays on disk as an empty token-bearing directory (dropping
    it would un-fence a replay of the last batch that touched it)."""
    import os

    from ydb_cdc_processor_spark.operators.bucketed_view import (
        BUCKET_COL, BucketedMaterializedView)
    path = str(tmp_path / "rw")
    mv = BucketedMaterializedView(spark, path, keys=["id"], n_buckets=4)
    df = spark.createDataFrame([(i, i % 10) for i in range(200)],
                               "id long, v long")
    mv.merge_touched(df, lambda target, d: d.unionByName(target),
                     batch_token="tok-a")
    toks_before = {b: mv.bucket_token(b) for b in range(4)}
    assert any(t == "tok-a" for t in toks_before.values())

    # drop most rows; one bucket loses EVERYTHING (v-filter chosen so
    # at least one bucket has no survivors is not guaranteed — force it
    # by filtering a whole bucket out explicitly)
    victim = 0
    n = mv.rewrite_rows(
        lambda rows: rows.where((rows["v"] < 2)
                                & (rows[BUCKET_COL] != victim)))
    assert n == 4
    got = mv.read()
    assert got.where("v >= 2").count() == 0
    assert got.count() == spark.createDataFrame(
        [(i, i % 10) for i in range(200)], "id long, v long") \
        .where("v < 2") \
        .withColumn("_b", mv.bucket_expr()).where(f"_b != {victim}").count()
    # tokens survived the rewrite — including the emptied bucket's
    for b in range(4):
        assert mv.bucket_token(b) == toks_before[b]
    assert os.path.isdir(os.path.join(path, f"{BUCKET_COL}={victim}"))
    # fence intact: replaying the original batch is still a no-op
    assert mv.merge_touched(df, lambda target, d: d.unionByName(target),
                            batch_token="tok-a") is False
    assert mv.read().where("v >= 2").count() == 0
