"""CmsView — incrementally-maintained count-min sketch: the counter
table tracks the live corpus exactly (linear sketch) under inserts,
rewrites (old-image retraction), deletes, and replays; point estimates
never undercount live values."""

import pytest
from pyspark.sql import Row, functions as F

from ydb_cdc_processor_spark.functions.sketches import cms_top_terms
from ydb_cdc_processor_spark.operators.cms_view import CmsView


def _vals(spark, spec):
    """spec: {value: multiplicity}"""
    rows = [Row(v=val) for val, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "v string")


def test_lifecycle_tracks_live_corpus(spark, tmp_path):
    cv = CmsView(spark, str(tmp_path / "c"), "v", depth=4, width_hex=2)
    b1 = _vals(spark, {"hot": 50, "warm": 10, "x": 1})
    b2 = _vals(spark, {"hot": 30, "y": 2})
    cv.apply_delta(b1, batch_token="b1")
    cv.apply_delta(b2, batch_token="b2")
    assert cv.recompute_check(_vals(spark, {"hot": 80, "warm": 10,
                                            "x": 1, "y": 2}))

    # retraction: delete all 'warm' and one 'hot' (delete-only batch)
    cv.apply_delta(None, _vals(spark, {"warm": 10, "hot": 1}),
                   batch_token="b3")
    live = {"hot": 79, "x": 1, "y": 2}
    assert cv.recompute_check(_vals(spark, live))

    # estimates: >= true for every live value, 0 for a never-seen term
    # in untouched cells (4-deep collision on 256 buckets ~ never here)
    est = {r.term: r.est_count for r in cv.estimate(
        spark.createDataFrame([("hot",), ("x",), ("gone",)],
                              "term string")).collect()}
    assert est["hot"] >= 79 and est["x"] >= 1
    assert est["gone"] == 0

    # top_terms == the one-shot sketch of the live corpus
    vocab = spark.createDataFrame([(t,) for t in live], "term string")
    got = sorted(tuple(r) for r in cv.top_terms(vocab, k=3).collect())
    exp = sorted(tuple(r) for r in
                 cms_top_terms(_vals(spark, live), "v", k=3).collect())
    assert got == exp


def test_replay_fence_and_rewrite(spark, tmp_path):
    """A replayed token is a no-op (AggregateView's per-bucket fence);
    a rewrite batch (new + old images) lands the net delta once."""
    cv = CmsView(spark, str(tmp_path / "r"), "v")
    cv.apply_delta(_vals(spark, {"a": 5, "b": 3}), batch_token="t1")
    # rewrite: 'b' becomes 'c' (old image retracts b, new adds c)
    cv.apply_delta(_vals(spark, {"c": 3}), _vals(spark, {"b": 3}),
                   batch_token="t2")
    cv.apply_delta(_vals(spark, {"c": 3}), _vals(spark, {"b": 3}),
                   batch_token="t2")   # replay
    assert cv.recompute_check(_vals(spark, {"a": 5, "c": 3}))


def test_geometry_is_layout_metadata(spark, tmp_path):
    cv = CmsView(spark, str(tmp_path / "g"), "v", depth=2, width_hex=1)
    cv.apply_delta(_vals(spark, {"a": 4}))
    reopened = CmsView(spark, str(tmp_path / "g"), "v",
                       depth=8, width_hex=3)
    assert (reopened.depth, reopened.width_hex) == (2, 1)
    assert reopened.recompute_check(_vals(spark, {"a": 4}))
    with pytest.raises(ValueError, match="depth"):
        CmsView(spark, str(tmp_path / "bad"), "v", depth=0)


def test_rank_sketch_maintained_via_cms_view(spark, tmp_path):
    """The dyadic rank sketch composes with CmsView: maintain the node
    stream under inserts + a delete, and per-node point estimates sum
    to rank estimates that track the LIVE corpus (>= true, exact here
    absent collisions) — the retractable maintained form of
    q_rank_sketch."""
    from pyspark.sql import functions as F
    from ydb_cdc_processor_spark.functions.sketches import (
        dyadic_node_stream, dyadic_probe_nodes)

    cv = CmsView(spark, str(tmp_path / "rk"), "node",
                 depth=4, width_hex=2)
    b1 = spark.createDataFrame([(v,) for v in (1, 5, 5, 12, 40)],
                               "v long")
    b2 = spark.createDataFrame([(v,) for v in (3, 12, 60)], "v long")
    cv.apply_delta(dyadic_node_stream(b1, "v", levels=8),
                   batch_token="r1")
    cv.apply_delta(dyadic_node_stream(b2, "v", levels=8),
                   batch_token="r2")
    # delete the two 12s (old images retract their nodes)
    gone = spark.createDataFrame([(12,), (12,)], "v long")
    cv.apply_delta(None, dyadic_node_stream(gone, "v", levels=8),
                   batch_token="r3")

    live = [1, 5, 5, 40, 3, 60]
    probes = spark.createDataFrame([(x,) for x in (2, 6, 41, 256)],
                                   "x long")
    pn = dyadic_probe_nodes(probes, "x", levels=8)
    est = (pn.join(cv.estimate(pn.select("node"), "node"),
                   pn.node == F.col("term"))
           .groupBy("x").agg(F.sum("est_count").alias("est_rank")))
    got = {r.x: r.est_rank for r in est.collect()}
    true = {x: sum(1 for v in live if v < x) for x in (2, 6, 41, 256)}
    assert got == true


def test_engine_drives_cms_view(spark, sf_dir, tmp_path):
    """CdcBatchEngine(agg_views=[cv.feed()]): event_type frequency
    counters over the events changefeed equal a from-scratch sketch of
    the LIVE row view (upserts net out via old images, deletes
    retract), and an engine-level replay under the same token is a
    no-op."""
    from pyspark.sql import functions as F
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    cv = CmsView(spark, str(tmp_path / "cms"), "event_type")
    p = CdcPipeline(
        name="cms_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[cv.feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture),
                        batch_token="c0")
    assert cv.recompute_check(eng.read_view())
    state = sorted(tuple(r) for r in cv.counts.read().collect())
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture),
                        batch_token="c0")   # replay
    assert sorted(tuple(r) for r in cv.counts.read().collect()) == state


def test_cms_stream_restart_converges(spark, tmp_path):
    full = _vals(spark, {"a": 30, "b": 12, "c": 5}) \
        .localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    full.repartition(3).write.parquet(src)
    cv = CmsView(spark, str(tmp_path / "s"), "v")
    for _ in range(2):   # second start: checkpoint replays nothing
        q = cv.start_stream(
            (spark.readStream.schema(full.schema)
             .option("maxFilesPerTrigger", 1).parquet(src)),
            str(tmp_path / "ckpt"))
        q.awaitTermination()
    assert cv.recompute_check(full)


def test_merge_from_shards(spark, tmp_path):
    """Federated union: shard count-min sketches SUM cell-wise into the
    one-shot sketch of the union (same geometry required); the merge is
    token-fenced."""
    import pytest

    from ydb_cdc_processor_spark.operators.cms_view import CmsView

    ids = spark.createDataFrame(
        [(i, f"t{i % 11}") for i in range(400)], "id long, term string")
    rows = ids.select("term")
    a = CmsView(spark, str(tmp_path / "a"), "term")
    b = CmsView(spark, str(tmp_path / "b"), "term")
    a.apply_delta(ids.where("id % 2 = 0").select("term"), None,
                  batch_token="a0")
    b.apply_delta(ids.where("id % 2 = 1").select("term"), None,
                  batch_token="b0")
    a.merge_from(b, batch_token="fed")
    assert a.recompute_check(rows)
    cells = sorted(tuple(r) for r in a.counts.store().read().collect())
    a.merge_from(b, batch_token="fed")   # replay: fenced out
    assert sorted(tuple(r)
                  for r in a.counts.store().read().collect()) == cells
    with pytest.raises(ValueError, match="geometry"):
        a.merge_from(CmsView(spark, str(tmp_path / "c"), "term", depth=2))
    # never-written shard: no-op
    a.merge_from(CmsView(spark, str(tmp_path / "d"), "term"),
                 batch_token="fed2")
    assert sorted(tuple(r)
                  for r in a.counts.store().read().collect()) == cells


def test_merge_from_value_col_mismatch_refused(spark, tmp_path):
    """Sketches counting different columns must refuse to merge —
    summing unrelated hash domains silently over-counts (review
    finding)."""
    import pytest

    from ydb_cdc_processor_spark.operators.cms_view import CmsView
    a = CmsView(spark, str(tmp_path / "a"), "url")
    b = CmsView(spark, str(tmp_path / "b"), "user_id")
    with pytest.raises(ValueError, match="value_col must match"):
        a.merge_from(b)
