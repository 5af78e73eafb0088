"""Concurrent derived-view maintenance (engine.CdcBatchEngine._fan_out_views):
attached views maintain in up-to-``max_parallel_views`` driver threads.
Pinned here: (1) the parallel result is indistinguishable from the serial
loop, (2) a failing view re-raises but the OTHER views' work survives and
a token-fenced replay converges, (3) the R5 timeout's cancelJobGroup
reaches jobs submitted from worker threads (job-group re-pinning —
Spark job-group properties are thread-local)."""

import time

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.engine import BatchTimeoutError, CdcBatchEngine
from ydb_cdc_processor_spark.operators.agg_view import AggregateView
from ydb_cdc_processor_spark.plans.pipeline import CdcPipeline
from ydb_cdc_processor_spark.sources import cdc_json
from ydb_cdc_processor_spark.sources.catalog import describe_table


def _events_pipeline(spark, sf_dir, tmp_path, **kw):
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="par_views", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value"
                   " FROM rows",
        delete_sql="SELECT event_id FROM rows", **kw).validate(spark)
    return p, fixture


def _mk_views(spark, base):
    return [
        AggregateView(spark, str(base / "by_type"), ["event_type"],
                      {"sum_value": "value"}, count_col="n"),
        AggregateView(spark, str(base / "by_user"), ["user_id"],
                      {"sum_value": "value"}, count_col="n"),
        AggregateView(spark, str(base / "by_both"),
                      ["event_type", "user_id"],
                      {"sum_value": "value"}, count_col="n"),
    ]


def _snap(av):
    return {tuple(r) for r in av.read().collect()}


def test_parallel_views_match_serial(spark, sf_dir, tmp_path):
    """Three independent rollups maintained with max_parallel_views=4
    end up byte-identical to the serial loop (max_parallel_views=1),
    including across an idempotent token-fenced replay."""
    p, fixture = _events_pipeline(spark, sf_dir, tmp_path)
    raw = cdc_json.read_cdc_batch(spark, fixture)

    ser_views = _mk_views(spark, tmp_path / "ser")
    par_views = _mk_views(spark, tmp_path / "par")
    ser = CdcBatchEngine(spark, p, str(tmp_path / "view_s"),
                         agg_views=ser_views, max_parallel_views=1)
    par = CdcBatchEngine(spark, p, str(tmp_path / "view_p"),
                         agg_views=par_views, max_parallel_views=4)

    ser.apply_raw_batch(raw, batch_token="b0")
    par.apply_raw_batch(raw, batch_token="b0")
    for sv, pv in zip(ser_views, par_views):
        assert _snap(sv) == _snap(pv)
        assert sv.recompute_check(ser.read_view())

    # replay: the per-view fences are independent; parallel replay must
    # be a no-op exactly like the serial one
    before = [_snap(v) for v in par_views]
    par.apply_raw_batch(raw, batch_token="b0")
    assert [_snap(v) for v in par_views] == before


def test_parallel_view_failure_replay_converges(spark, sf_dir, tmp_path):
    """One view failing mid-fan-out re-raises (R1 sees the batch fail),
    but sibling views' completed work stands; a replay under the SAME
    token re-applies only the failed view (the siblings fence it out)
    and everything converges to the serial answer."""
    p, fixture = _events_pipeline(spark, sf_dir, tmp_path)
    raw = cdc_json.read_cdc_batch(spark, fixture)

    views = _mk_views(spark, tmp_path / "v")
    flaky = views[1]
    real_apply = flaky.apply_delta
    calls = {"n": 0}

    def flaky_apply(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected view failure")
        return real_apply(*a, **kw)

    flaky.apply_delta = flaky_apply
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=views, max_parallel_views=4)
    with pytest.raises(RuntimeError, match="injected view failure"):
        eng.apply_raw_batch(raw, batch_token="b0")

    # R1 replay of the same batch: converged, no double counting anywhere
    eng.apply_raw_batch(raw, batch_token="b0")
    for v in views:
        assert v.recompute_check(eng.read_view())


def test_multiple_view_failures_all_surface(spark, sf_dir, tmp_path,
                                            caplog):
    """When SEVERAL views fail in one fan-out, the first error drives
    the R1 retry and the others are logged — never silently dropped."""
    import logging

    class Boom:
        def __init__(self, msg):
            self.msg = msg

        def apply_delta(self, new_rows=None, old_rows=None,
                        batch_token=None):
            raise RuntimeError(self.msg)

    p, fixture = _events_pipeline(spark, sf_dir, tmp_path)
    raw = cdc_json.read_cdc_batch(spark, fixture)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[Boom("boom-a"), Boom("boom-b")],
                         max_parallel_views=4)
    with caplog.at_level(logging.ERROR,
                         logger="ydb_cdc_processor_spark.engine"):
        with pytest.raises(RuntimeError, match="boom-"):
            eng.apply_raw_batch(raw, batch_token="b0")
    assert any("boom-" in r.message for r in caplog.records)


def test_timeout_cancels_parallel_view_jobs(spark, sf_dir, tmp_path):
    """R5 through the fan-out: jobs submitted from view-maintenance
    worker threads must carry the batch's job group, or the timeout's
    cancelJobGroup misses them and the batch overruns its budget.  Two
    slow views (30 s each, uncancelled) under timeoutSeconds=2 must
    surface BatchTimeoutError well before either could finish."""

    class SlowView:
        def __init__(self, s):
            self.spark = s

        def apply_delta(self, new_rows=None, old_rows=None,
                        batch_token=None):
            slow = F.udf(lambda x: (time.sleep(30), x)[1], "long")
            (self.spark.range(4, numPartitions=4)
             .select(slow("id").alias("v")).agg(F.sum("v")).collect())

    p, fixture = _events_pipeline(spark, sf_dir, tmp_path,
                                  timeout_seconds=2)
    raw = cdc_json.read_cdc_batch(spark, fixture)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[SlowView(spark), SlowView(spark)],
                         max_parallel_views=4)
    t0 = time.perf_counter()
    with pytest.raises(BatchTimeoutError):
        eng.apply_raw_batch(raw, batch_token="b0")
    assert time.perf_counter() - t0 < 25  # cancelled, not slept out
    assert spark.range(3).count() == 3  # session healthy after cancel
