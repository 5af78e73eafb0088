"""TopKView — exact retractable per-group top-k over a maintained
count rollup (operators/topk_view.py)."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.topk_view import TopKView


def _rows(spark, lo, hi, shift=0):
    # value universe per group is small → real count collisions + ties
    return spark.createDataFrame(
        [(f"g{i % 2}", f"t{(i + shift) % 7}") for i in range(lo, hi)],
        "grp string, term string")


def _res(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_recompute(spark, tmp_path):
    tv = TopKView(spark, str(tmp_path / "t"), ["grp"], "term", k=3)
    full = _rows(spark, 0, 300)
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        tv.apply_delta(_rows(spark, lo, hi), None, batch_token=f"b{lo}")
    assert tv.recompute_check(full)
    got = tv.read()
    assert got.where(F.col("rk") > 3).count() == 0
    assert got.groupBy("grp").count().where("count != 3").count() == 0


def test_retraction_is_exact(spark, tmp_path):
    """Deleting and rewriting rows retracts counts exactly: after a
    modify-then-restore cycle the top-k equals the original."""
    tv = TopKView(spark, str(tmp_path / "r"), ["grp"], "term", k=4)
    base = _rows(spark, 0, 200)
    tv.apply_delta(base, None, batch_token="b0")
    before = _res(tv.read())
    # rewrite rows 0..50 to different terms (old images retract)
    old = _rows(spark, 0, 50)
    new = _rows(spark, 0, 50, shift=3)
    tv.apply_delta(new, old, batch_token="b1")
    assert tv.recompute_check(
        _rows(spark, 0, 50, shift=3).unionByName(_rows(spark, 50, 200)))
    # restore: retract the rewrite, re-apply the originals
    tv.apply_delta(old, new, batch_token="b2")
    assert _res(tv.read()) == before
    # delete everything in g1 → the group vanishes from the rollup
    g1 = base.where(F.col("grp") == "g1")
    tv.apply_delta(None, g1, batch_token="b3")
    assert tv.read().where(F.col("grp") == "g1").count() == 0


def test_replay_fence(spark, tmp_path):
    """±counts are NOT idempotent — the per-bucket token fence makes a
    replayed batch a no-op."""
    tv = TopKView(spark, str(tmp_path / "f"), ["grp"], "term", k=3)
    b = _rows(spark, 0, 100)
    tv.apply_delta(b, None, batch_token="tok")
    state = _res(tv.counts())
    tv.apply_delta(b, None, batch_token="tok")   # replay: fenced out
    assert _res(tv.counts()) == state
    tv.apply_delta(b, None, batch_token="tok2")  # genuinely new batch
    assert _res(tv.counts()) != state


def test_lookup_reads_one_bucket(spark, tmp_path):
    tv = TopKView(spark, str(tmp_path / "l"), ["grp"], "term", k=3,
                  n_buckets=8)
    full = _rows(spark, 0, 300)
    tv.apply_delta(full, None, batch_token="b0")
    store = tv.agg.store()
    seen = {}
    orig = store.read_touched

    def spy(touched, delta_schema=None):
        seen["touched"] = list(touched)
        return orig(touched, delta_schema)

    store.read_touched = spy
    got = tv.lookup(["g1"])
    exp = tv.read().where(F.col("grp") == "g1") \
        .select("grp", "term", "n", "rk")
    assert _res(got) == _res(exp) and got.count() == 3
    assert len(seen["touched"]) == 1


def test_engine_feed_updates_and_deletes(spark, sf_dir, tmp_path):
    """TopKView rides the engine's agg_views feed through a full
    update+delete fixture batch and equals the view recompute."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table
    from ydb_cdc_processor_spark.operators.ivm_feed import Feed

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    tv = TopKView(spark, str(tmp_path / "topk"), ["grp"], "term", k=3)

    def shaped(new_rows, old_rows, batch_token=None):
        sel = lambda df: (None if df is None else df.select(
            F.col("event_type").alias("grp"),
            (F.col("user_id") % 10).cast("string").alias("term")))
        tv.apply_delta(sel(new_rows), sel(old_rows), batch_token)

    p = CdcPipeline(
        name="topk_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[Feed(shaped)])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture),
                        batch_token="t0")
    final = eng.read_view().select(
        F.col("event_type").alias("grp"),
        (F.col("user_id") % 10).cast("string").alias("term"))
    assert tv.recompute_check(final)


def test_stream_restart_converges(spark, tmp_path):
    full = _rows(spark, 0, 300).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    full.repartition(3).write.parquet(src)
    tv = TopKView(spark, str(tmp_path / "st"), ["grp"], "term", k=3)
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = tv.start_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    q2 = tv.start_stream(
        (spark.readStream.schema(full.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)),
        str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert tv.recompute_check(full)


def test_k_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        TopKView(spark, str(tmp_path / "bad"), ["grp"], "term", k=0)
