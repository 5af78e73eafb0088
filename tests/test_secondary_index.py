"""SecondaryIndex — CDC-maintained value→pk index; lookups read only the
probed values' buckets and maintenance converges to the fact state."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.secondary_index import SecondaryIndex


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "order_id long, status string, amount long")


def _ix(spark, tmp_path, n_buckets=4):
    return SecondaryIndex(spark, str(tmp_path / "ix"), pk=["order_id"],
                          col="status", n_buckets=n_buckets)


def _entries(ix):
    return sorted((r.status, r.order_id) for r in ix.read().collect())


def test_maintenance_tracks_fact_state(spark, tmp_path):
    ix = _ix(spark, tmp_path)
    f1 = _fact(spark, [(1, "open", 10), (2, "open", 20), (3, "paid", 30)])
    ix.apply_delta(f1, None)
    assert _entries(ix) == [("open", 1), ("open", 2), ("paid", 3)]

    # value change: order 1 open→paid; old image routes the stale delete
    f2 = _fact(spark, [(1, "paid", 10)])
    ix.apply_delta(f2, f1.where("order_id = 1").localCheckpoint(True))
    assert _entries(ix) == [("open", 2), ("paid", 1), ("paid", 3)]

    # delete-only batch
    ix.apply_delta(None, _fact(spark, [(3, "paid", 30)])
                   .localCheckpoint(True))
    assert _entries(ix) == [("open", 2), ("paid", 1)]

    # replay of the value-change batch: unchanged (old image now absent
    # post-merge, so the feed would hand the CURRENT image — idempotent)
    ix.apply_delta(f2, _fact(spark, [(1, "paid", 10)])
                   .localCheckpoint(True))
    assert _entries(ix) == [("open", 2), ("paid", 1)]


def test_null_values_indexable(spark, tmp_path):
    ix = _ix(spark, tmp_path)
    f1 = _fact(spark, [(1, None, 10), (2, "open", 20)])
    ix.apply_delta(f1, None)
    got = ix.lookup([None]).collect()
    assert [(r.status, r.order_id) for r in got] == [(None, 1)]
    # replace the null-valued row — must not duplicate
    ix.apply_delta(_fact(spark, [(1, None, 11)]),
                   f1.where("order_id = 1").localCheckpoint(True))
    assert ix.read().count() == 2


def test_lookup_reads_only_probed_buckets(spark, tmp_path):
    ix = _ix(spark, tmp_path, n_buckets=8)
    rows = [(i, f"s{i % 40}", i) for i in range(400)]
    ix.apply_delta(_fact(spark, rows), None)

    asked = []
    orig = ix.view.read_touched

    def spy(buckets, *a, **kw):
        asked.append(sorted(buckets))
        return orig(buckets, *a, **kw)

    ix.view.read_touched = spy
    got = ix.lookup(["s7"]).collect()
    assert len(asked) == 1 and len(asked[0]) == 1
    assert sorted(r.order_id for r in got) == list(range(7, 400, 40))


def test_lookup_before_build_refuses(spark, tmp_path):
    ix = _ix(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        ix.lookup(["x"])


def test_engine_drives_index(spark, sf_dir, tmp_path):
    """CdcBatchEngine(agg_views=[ix.feed()]): the index tracks the row
    view through the full fixture batch (upserts + deletes), ending
    consistent with the view."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), pk=["event_id"],
                        col="event_type", n_buckets=4)
    p = CdcPipeline(
        name="ix_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[ix.feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    view = eng.read_view()
    assert ix.read().count() == view.count()
    # a point lookup agrees with the scan
    some_type = view.select("event_type").first()[0]
    got = sorted(r.order_id if hasattr(r, "order_id") else r.event_id
                 for r in ix.lookup([some_type]).collect())
    exp = sorted(r.event_id for r in
                 view.where(F.col("event_type") == some_type).collect())
    assert got == exp


def test_stream_maintains_index_across_restart(spark, sf_dir, tmp_path):
    """The index rides the STREAM engine's agg_views feed: maintained
    across >=3 micro-batches, survives kill/restart (fresh objects, same
    checkpoint), and after post-restart updates+deletes lands consistent
    with the row view."""
    import json as _json
    import os

    from ydb_cdc_processor_spark import CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table
    from ydb_cdc_processor_spark.streaming.engine import CdcStreamEngine

    schema, pk = describe_table(spark, sf_dir, "events")
    src = str(tmp_path / "cdc_src")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, src,
                                      n_partitions=3, limit=600)
    p = CdcPipeline(
        name="ix_stream", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    view, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")

    def engine():
        ix = SecondaryIndex(spark, str(tmp_path / "ix"),
                            pk=["event_id"], col="event_type",
                            n_buckets=4)
        return CdcStreamEngine(spark, p, view, ckpt, max_retries=2,
                               agg_views=[ix.feed()]), ix

    def check(se, ix):
        got = sorted((r.event_type, r.event_id)
                     for r in ix.read().collect())
        exp = sorted((r.event_type, r.event_id)
                     for r in se.batch_engine.read_view()
                     .select("event_type", "event_id").collect())
        assert got == exp

    se1, ix1 = engine()
    q = se1.start(src, available_now=True, max_files_per_trigger=1)
    q.awaitTermination()
    assert se1.status().batches >= 3
    check(se1, ix1)
    se1.stop()

    ids = [r.event_id for r in
           se1.batch_engine.read_view().orderBy("event_id")
           .limit(20).collect()]
    lines = [cdc_json.envelope([i], erase=True) for i in ids[:10]]
    lines += [cdc_json.envelope(
        [i], {"ts": "2024-06-01T00:00:00Z", "user_id": 1,
              "event_type": "reindexed", "value": 1.0, "props": None})
        for i in ids[10:20]]
    with open(os.path.join(src, "part-late.json"), "w") as f:
        for off, line in enumerate(lines):
            f.write(_json.dumps({"value": line, "_partition": 0,
                                 "_offset": 10_000 + off}) + "\n")

    se2, ix2 = engine()
    status = se2.run_available(src)
    assert status.ok and status.totals.deleted > 0
    check(se2, ix2)
    assert ix2.lookup(["reindexed"]).count() == 10


def test_lookup_miss_on_absent_bucket_returns_empty(spark, tmp_path):
    """A probed value whose bucket directory was never written must
    return an EMPTY typed frame, not crash on schema inference (found
    by review: read_touched on a schema-less store with zero present
    dirs raised ValueError)."""
    ix = _ix(spark, tmp_path, n_buckets=64)  # sparse: most dirs absent
    ix.apply_delta(_fact(spark, [(1, "only", 10)]), None)
    for probe in ["missing-a", "missing-b", "missing-c"]:
        got = ix.lookup([probe])
        assert got.count() == 0
        assert set(got.columns) == {"status", "order_id"}


def test_lookup_probe_rendering_matches_spark_cast(spark, tmp_path):
    """Probes must render via Spark's cast, not Python str(): booleans
    ('true' vs 'True') and large doubles ('1.0E20' vs '1e+20') would
    otherwise silently miss stored rows (found by review)."""
    from ydb_cdc_processor_spark.operators.secondary_index import (
        SecondaryIndex)
    rows = spark.createDataFrame(
        [(1, True, 1.0e20), (2, False, 0.0001), (3, True, 5.0)],
        "id long, flag boolean, score double")
    fx = SecondaryIndex(spark, str(tmp_path / "fx"), pk=["id"],
                        col="flag", n_buckets=4)
    fx.apply_delta(rows.select("id", "flag"), None)
    assert sorted(r.id for r in fx.lookup([True]).collect()) == [1, 3]
    dx = SecondaryIndex(spark, str(tmp_path / "dx"), pk=["id"],
                        col="score", n_buckets=4)
    dx.apply_delta(rows.select("id", "score"), None)
    assert [r.id for r in dx.lookup([1.0e20]).collect()] == [1]
    assert [r.id for r in dx.lookup([0.0001]).collect()] == [2]


def test_first_batch_with_stale_old_images_bootstraps(spark, tmp_path):
    """The engine's old-image feed can carry images on the index's very
    FIRST batch (fact view predates the index).  A delete in that batch
    must not crash on the absent store (found by review:
    FileNotFoundError from deleteFrom-before-existence)."""
    ix = _ix(spark, tmp_path)
    f_old = _fact(spark, [(1, "open", 10), (2, "open", 20)])
    # delete-only first batch: new=None, old images present
    ix.apply_delta(None, f_old.localCheckpoint(True))
    # upsert+delete first batch on a second fresh index
    ix2 = SecondaryIndex(spark, str(tmp_path / "ix2"), pk=["order_id"],
                         col="status", n_buckets=4)
    ix2.apply_delta(_fact(spark, [(1, "paid", 11)]),
                    f_old.localCheckpoint(True))
    assert _entries(ix2) == [("paid", 1)]
