"""DistinctCountView — incrementally-maintained COUNT(DISTINCT): the
refcount store tracks the fact state exactly under upserts, value
changes, deletes, and replays."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.distinct_view import (
    DistinctCountView)


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "order_id long, region string, status string")


def _dv(spark, tmp_path, n_buckets=4):
    return DistinctCountView(spark, str(tmp_path / "dv"), ["region"],
                             "status", n_buckets=n_buckets)


def _counts(dv):
    return sorted((r.region, r.n_distinct) for r in dv.read().collect())


def test_maintenance_tracks_distinct_counts(spark, tmp_path):
    dv = _dv(spark, tmp_path)
    f1 = _fact(spark, [(1, "eu", "open"), (2, "eu", "open"),
                       (3, "eu", "paid"), (4, "us", "open")])
    dv.apply_delta(f1, None)
    assert _counts(dv) == [("eu", 2), ("us", 1)]

    # value change: order 2 open→paid.  eu still holds BOTH values
    # (order 1 supplies open) — the case a scalar delta cannot decide
    f2 = _fact(spark, [(2, "eu", "paid")])
    dv.apply_delta(f2, f1.where("order_id = 2").localCheckpoint(True))
    assert _counts(dv) == [("eu", 2), ("us", 1)]

    # order 1 also open→paid: NOW eu's 'open' refcount hits 0
    f3 = _fact(spark, [(1, "eu", "paid")])
    dv.apply_delta(f3, f1.where("order_id = 1").localCheckpoint(True))
    assert _counts(dv) == [("eu", 1), ("us", 1)]

    # delete-only batch removes us entirely (group disappears)
    dv.apply_delta(None, _fact(spark, [(4, "us", "open")])
                   .localCheckpoint(True))
    assert _counts(dv) == [("eu", 1)]
    assert dv.recompute_check(_fact(spark, [(1, "eu", "paid"),
                                            (2, "eu", "paid"),
                                            (3, "eu", "paid")]))


def test_null_values_ignored(spark, tmp_path):
    """COUNT(DISTINCT x) ignores NULLs — NULL-valued rows contribute
    nothing, and a group whose rows are all NULL-valued has no row."""
    dv = _dv(spark, tmp_path)
    f1 = _fact(spark, [(1, "eu", None), (2, "eu", "open"),
                       (3, "us", None)])
    dv.apply_delta(f1, None)
    assert _counts(dv) == [("eu", 1)]
    # NULL→value and value→NULL transitions
    dv.apply_delta(_fact(spark, [(1, "eu", "paid"), (2, "eu", None)]),
                   f1.where("order_id in (1, 2)").localCheckpoint(True))
    assert _counts(dv) == [("eu", 1)]


def test_replay_fence_blocks_double_decrement(spark, tmp_path):
    """Re-applying a DELETE batch under the same token must not
    double-decrement (the non-idempotent case the per-bucket fence
    exists for)."""
    dv = _dv(spark, tmp_path)
    f1 = _fact(spark, [(1, "eu", "open"), (2, "eu", "paid")])
    dv.apply_delta(f1, None, batch_token="b0")
    dels = f1.where("order_id = 2").localCheckpoint(True)
    dv.apply_delta(None, dels, batch_token="b1")
    assert _counts(dv) == [("eu", 1)]
    dv.apply_delta(None, dels, batch_token="b1")   # replay
    assert _counts(dv) == [("eu", 1)]


def test_group_key_with_nulls(spark, tmp_path):
    """NULL group keys are ordinary groups (GROUP BY semantics)."""
    dv = _dv(spark, tmp_path)
    dv.apply_delta(_fact(spark, [(1, None, "open"), (2, None, "paid"),
                                 (3, "eu", "open")]), None)
    got = {(r.region, r.n_distinct) for r in dv.read().collect()}
    assert got == {(None, 2), ("eu", 1)}


def test_engine_drives_distinct_view(spark, sf_dir, tmp_path):
    """CdcBatchEngine(agg_views=[dv.feed()]): maintained counts equal a
    recompute over the row view after the full fixture batch."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    dv = DistinctCountView(spark, str(tmp_path / "dv"), ["user_id"],
                           "event_type", n_buckets=4)
    p = CdcPipeline(
        name="dv_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[dv.feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    view = eng.read_view()
    got = sorted((r.user_id, r.n_distinct) for r in dv.read().collect())
    exp = sorted((r.user_id, r.n_distinct) for r in
                 view.groupBy("user_id")
                 .agg(F.countDistinct("event_type").alias("n_distinct"))
                 .collect())
    assert got == exp


def test_stream_maintains_distinct_view_across_restart(spark, sf_dir,
                                                       tmp_path):
    """Kill/restart with fresh objects on the same checkpoint, then
    post-restart deletes + updates: the maintained counts stay equal to
    a recompute over the row view."""
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
        name="dv_stream", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    view, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")

    def engine():
        dv = DistinctCountView(spark, str(tmp_path / "dv"),
                               ["user_id"], "event_type", n_buckets=4)
        return CdcStreamEngine(spark, p, view, ckpt, max_retries=2,
                               agg_views=[dv.feed()]), dv

    def check(se, dv):
        got = sorted((r.user_id, r.n_distinct)
                     for r in dv.read().collect())
        exp = sorted((r.user_id, r.n_distinct)
                     for r in se.batch_engine.read_view()
                     .groupBy("user_id")
                     .agg(F.countDistinct("event_type")
                          .alias("n_distinct")).collect())
        assert got == exp

    se1, dv1 = engine()
    q = se1.start(src, available_now=True, max_files_per_trigger=1)
    q.awaitTermination()
    assert se1.status().batches >= 3
    check(se1, dv1)
    se1.stop()

    ids = [r.event_id for r in
           se1.batch_engine.read_view().orderBy("event_id")
           .limit(20).collect()]
    lines = [cdc_json.envelope([i], erase=True) for i in ids[:10]]
    lines += [cdc_json.envelope(
        [i], {"ts": "2024-06-01T00:00:00Z", "user_id": 1,
              "event_type": "rebucketed", "value": 1.0, "props": None})
        for i in ids[10:20]]
    with open(os.path.join(src, "part-late.json"), "w") as f:
        for off, line in enumerate(lines):
            f.write(_json.dumps({"value": line, "_partition": 0,
                                 "_offset": 10_000 + off}) + "\n")

    se2, dv2 = engine()
    status = se2.run_available(src)
    assert status.ok and status.totals.deleted > 0
    check(se2, dv2)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# a step is (op, pk, value-index): upsert assigns (group g0/g1 by pk
# parity, value v0..v2 or NULL), delete removes the pk if present
_dstep = st.one_of(
    st.tuples(st.just("up"), st.integers(0, 5), st.integers(0, 3)),
    st.tuples(st.just("del"), st.integers(0, 5), st.just(0)),
)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(steps=st.lists(_dstep, min_size=2, max_size=8))
def test_property_any_interleaving_matches_recompute(spark,
                                                     tmp_path_factory,
                                                     steps):
    """ANY interleaving of keyed upserts (incl. value changes, NULLs)
    and deletes leaves the maintained counts equal to COUNT(DISTINCT)
    over the resulting table state."""
    tmp_path = tmp_path_factory.mktemp("dv_prop")
    dv = DistinctCountView(spark, str(tmp_path / "dv"), ["region"],
                           "status", n_buckets=2)
    state: dict[int, tuple] = {}
    for i, (op, pk, vi) in enumerate(steps):
        old_rows = ([state[pk]] if pk in state else [])
        old = (_fact(spark, old_rows).localCheckpoint(True)
               if old_rows else None)
        if op == "up":
            row = (pk, f"g{pk % 2}", None if vi == 3 else f"v{vi}")
            dv.apply_delta(_fact(spark, [row]), old,
                           batch_token=f"s{i}")
            state[pk] = row
        else:
            if not old_rows:
                continue
            dv.apply_delta(None, old, batch_token=f"s{i}")
            state.pop(pk, None)
    exp = {}
    for pk, (_, g, v) in state.items():
        if v is not None:
            exp.setdefault(g, set()).add(v)
    # a run whose every step was a no-op (deletes of absent keys) never
    # creates the store — fresh-store reads raise by convention
    got = _counts(dv) if dv.view.exists() else []
    assert got == sorted((g, len(vs)) for g, vs in exp.items())


def test_merge_from_shards(spark, tmp_path):
    """Federated union: shard refcount stores SUM into the one-shot
    refcounts of the union; the merge is token-fenced."""
    from ydb_cdc_processor_spark.operators.distinct_view import (
        DistinctCountView)

    rows = spark.createDataFrame(
        [(i, f"u{i % 7}", f"t{i % 5}") for i in range(200)],
        "event_id long, user_id string, event_type string")
    mk = lambda p: DistinctCountView(  # noqa: E731
        spark, str(tmp_path / p), ["user_id"], "event_type")
    a, b = mk("a"), mk("b")
    a.apply_delta(rows.where("event_id % 2 = 0"), None, batch_token="a0")
    b.apply_delta(rows.where("event_id % 2 = 1"), None, batch_token="b0")
    a.merge_from(b, batch_token="fed")
    assert a.recompute_check(rows)
    state = sorted(tuple(r) for r in a.read_values().collect())
    a.merge_from(b, batch_token="fed")   # replay: fenced out
    assert sorted(tuple(r) for r in a.read_values().collect()) == state
    with pytest.raises(ValueError, match="must match"):
        a.merge_from(DistinctCountView(spark, str(tmp_path / "c"),
                                       ["user_id"], "other"))
    # never-written shard: no-op
    a.merge_from(mk("d"), batch_token="fed2")
    assert sorted(tuple(r) for r in a.read_values().collect()) == state
