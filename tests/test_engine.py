"""End-to-end: CDC fixture → decode → SQL transform → materialized view.

Mirrors the reference README walkthrough (README.md:20-117): the events
table plays the source, ``events_view1`` is the retyping projection view
(≙ mat_view1) and ``events_view2`` the passthrough with a different PK
(≙ mat_view2).  The final view contents are compared against a sequential
per-key apply oracle computed from the raw envelopes.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.engine import CdcBatchEngine
from ydb_cdc_processor_spark.plans.pipeline import ActionMode, CdcPipeline
from ydb_cdc_processor_spark.sources import cdc_json
from ydb_cdc_processor_spark.sources.catalog import describe_table


@pytest.fixture(scope="module")
def fixture_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cdc") / "events_cdc")
    n = cdc_json.write_events_cdc_fixture(spark, sf_dir, out, n_partitions=4)
    assert n > 0
    return out


def _sequential_oracle(fixture_dir):
    """Replay envelopes per partition in offset order (the reference's
    single-threaded per-partition writer, YqlWriter.java:117-120) and
    return the surviving key set."""
    state = {}
    for fn in sorted(os.listdir(fixture_dir)):
        with open(os.path.join(fixture_dir, fn)) as f:
            for line in f:
                rec = json.loads(line)
                try:
                    env = json.loads(rec["value"])
                except json.JSONDecodeError:
                    continue
                key = env.get("key")
                if not isinstance(key, list):
                    continue
                k = key[0]
                if "erase" in env:
                    state.pop(k, None)
                elif "update" in env or "newImage" in env:
                    payload = env.get("update") or env.get("newImage") or {}
                    state[k] = payload
                # else: malformed, skipped
    return state


def test_events_view1_end_to_end(spark, sf_dir, fixture_dir, tmp_path):
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="events_view1",
        source_schema=schema,
        pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        # ≙ the README v1 transform (README.md:93-100): projection + retype
        update_sql="""
            SELECT event_id, ts, user_id, event_type, value
            FROM rows
        """,
        delete_sql="SELECT event_id FROM rows",
        action_mode=ActionMode.DIRECT,
    )
    # events.ts is timestamp in the source but TEXT on the CDC wire; the
    # declared member retypes it — validation must compare against source.
    eng = CdcBatchEngine(spark, p, str(tmp_path / "events_view1"))
    raw = cdc_json.read_cdc_batch(spark, fixture_dir)
    stats = eng.apply_raw_batch(raw)
    assert stats.malformed == 3

    view = eng.read_view()
    oracle = _sequential_oracle(fixture_dir)
    assert view.count() == len(oracle)
    # spot-check values incl. the null-optionals edge rows
    got = {r.event_id: r for r in view.collect()}
    assert set(got) == {int(k) for k in oracle}
    for k, payload in list(oracle.items())[:50]:
        r = got[int(k)]
        assert r.user_id == payload["user_id"]
        assert (r.value is None) == (payload.get("value") is None)

    # replay the same batch: idempotence (at-least-once ⇒ same final state)
    eng.apply_raw_batch(raw)
    assert eng.read_view().count() == len(oracle)


def test_events_view2_different_pk(spark, sf_dir, fixture_dir, tmp_path):
    # ≙ mat_view2 (README.md:47-56,114): SELECT * with PK (user_id, event_id)
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="events_view2", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT * FROM rows",
        delete_sql="SELECT event_id FROM rows",
        target_keys=["event_id"],
        action_mode=ActionMode.DIRECT,
    )
    eng = CdcBatchEngine(spark, p, str(tmp_path / "events_view2"))
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture_dir))
    view = eng.read_view()
    oracle = _sequential_oracle(fixture_dir)
    assert view.count() == len(oracle)
    assert set(view.columns) == set(cdc_json.EVENTS_MEMBERS)


def test_validation_rejects_bad_pipelines(spark, sf_dir):
    from ydb_cdc_processor_spark.plans.pipeline import PipelineValidationError
    schema, pk = describe_table(spark, sf_dir, "events")
    # unknown column (≙ CdcMsgParser.java:200-207)
    with pytest.raises(PipelineValidationError, match="unknown column"):
        CdcPipeline(name="x", source_schema=schema, pk=pk,
                    members={"event_id": "Int64", "nope": "Text"},
                    update_sql="SELECT * FROM rows").validate(spark)
    # wrong type (≙ CdcMsgParser.java:208-214)
    with pytest.raises(PipelineValidationError, match="wrong type"):
        CdcPipeline(name="x", source_schema=schema, pk=pk,
                    members={"event_id": "Int32"},
                    update_sql="SELECT * FROM rows").validate(spark)
    # delete query touching non-PK columns (≙ CdcMsgParser.java:216-221)
    with pytest.raises(PipelineValidationError, match="non-primary-key"):
        CdcPipeline(name="x", source_schema=schema, pk=pk,
                    members={"event_id": "Int64", "user_id": "Int64"},
                    delete_sql="SELECT event_id, user_id FROM rows",
                    delete_members={"event_id": "Int64", "user_id": "Int64"},
                    ).validate(spark)
    # SQL analysis error (≙ prepareDataQuery failure, YdbService.java:137-146)
    with pytest.raises(PipelineValidationError, match="Can't parse query"):
        CdcPipeline(name="x", source_schema=schema, pk=pk,
                    members={"event_id": "Int64"},
                    update_sql="SELECT no_such_col FROM rows").validate(spark)
    # soft mode collects warnings instead (Application.java:95-97)
    p = CdcPipeline(name="x", source_schema=schema, pk=pk,
                    members={"event_id": "Int32"},
                    update_sql="SELECT * FROM rows").validate_warn(spark)
    assert p.warnings


# -- R5: per-query timeout enforcement (YdbService.java:160-175) -------------

def test_query_timeout_cancels_slow_job(spark):
    """A job that outlives timeoutSeconds is cancelled and surfaces as
    BatchTimeoutError; the session stays usable afterwards."""
    import time as _time
    from ydb_cdc_processor_spark.engine import BatchTimeoutError, query_timeout

    slow = F.udf(lambda x: (_time.sleep(30), x)[1], "long")
    # aggregate the UDF column so Catalyst cannot prune the slow projection
    df = spark.range(4, numPartitions=4).select(slow("id").alias("v"))
    t0 = _time.perf_counter()
    with pytest.raises(BatchTimeoutError, match="timeoutSeconds=1"):
        with query_timeout(spark, 1, "slow-test"):
            df.agg(F.sum("v")).collect()
    assert _time.perf_counter() - t0 < 25  # cancelled, not slept out
    assert spark.range(3).count() == 3  # session healthy after cancel


def test_query_timeout_zero_is_no_limit(spark):
    """timeoutSeconds <= 0 means no limit (XmlConfig.java:139-144 default)."""
    from ydb_cdc_processor_spark.engine import query_timeout
    with query_timeout(spark, 0, "unlimited"):
        assert spark.range(5).count() == 5


def test_timeout_enforced_in_batch_apply(spark, sf_dir, fixture_dir, tmp_path):
    """End-to-end R5: a pipeline whose transform stalls past
    timeout_seconds raises BatchTimeoutError from apply_raw_batch, and the
    R1 retry path sees it as a retryable failure."""
    import time as _time
    from ydb_cdc_processor_spark.engine import BatchTimeoutError
    from ydb_cdc_processor_spark.streaming.engine import retry_forever

    spark.udf.register("slow_ident_r5",
                       lambda x: (_time.sleep(30), x)[1], "long")
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="r5_timeout", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value,"
                   " slow_ident_r5(event_id) AS slow FROM rows",
        timeout_seconds=2)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"))
    raw = cdc_json.read_cdc_batch(spark, fixture_dir)
    with pytest.raises(BatchTimeoutError):
        eng.apply_raw_batch(raw)
    # R1 escalation: the timeout is an ordinary retryable failure
    attempts = []
    with pytest.raises(BatchTimeoutError):
        retry_forever(lambda: attempts.append(1) or eng.apply_raw_batch(raw),
                      max_retries=1, sleep=lambda s: None)
    assert len(attempts) == 2  # original + one retry


def test_timeout_enforced_in_two_phase(spark, tmp_path):
    """R5 over the standalone T2 path: two_phase(timeout_seconds=N) bounds
    the select + merge, not just apply_raw_batch (YdbService.java:160-175
    runs both phases under one request timeout)."""
    import time as _time
    from ydb_cdc_processor_spark.engine import (
        BatchTimeoutError, two_phase)

    slow = F.udf(lambda x: (_time.sleep(30), x)[1], "long")
    batch = spark.range(4, numPartitions=4).select(
        F.col("id").alias("k"), slow("id").alias("v"))
    t0 = _time.perf_counter()
    with pytest.raises(BatchTimeoutError):
        two_phase(spark, batch, "SELECT k, SUM(v) AS sv FROM rows GROUP BY k",
                  target_path=str(tmp_path / "t2"), keys=["k"],
                  timeout_seconds=1)
    assert _time.perf_counter() - t0 < 25
    # untimed call still works, session healthy
    fast = spark.range(3).select(F.col("id").alias("k"),
                                 F.col("id").alias("v"))
    out = two_phase(spark, fast, "SELECT k, v FROM rows",
                    target_path=str(tmp_path / "t2b"), keys=["k"])
    assert out.count() == 3


def test_dlq_collects_malformed_envelopes(spark, sf_dir, fixture_dir,
                                          tmp_path):
    """dlq_path: malformed envelopes land queryably in the dead-letter
    parquet with the original raw line, a diagnostic reason, and the
    batch token; the raw log is at-least-once (replays re-append) but
    read_dlq() collapses replays to exact counts."""
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="dlq_view", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows",
        action_mode=ActionMode.DIRECT).validate(spark)
    dlq = str(tmp_path / "dlq")
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"), dlq_path=dlq)
    raw = cdc_json.read_cdc_batch(spark, fixture_dir)
    stats = eng.apply_raw_batch(raw, batch_token="dlq_view:0")
    assert stats.malformed > 0

    got = spark.read.parquet(dlq)
    assert got.count() == stats.malformed
    rows = got.collect()
    assert all(r.reason for r in rows) and all(r.raw for r in rows)
    assert all(r._batch_token == "dlq_view:0" for r in rows)
    assert {"_offset", "raw", "reason", "_ingested_at",
            "_batch_token"} <= set(got.columns)
    # the view itself must be unaffected by DLQ capture
    n_view = eng.read_view().count()

    # replay under the SAME token: raw log is at-least-once, but the
    # collapsed reader stays exact; view unchanged
    eng.apply_raw_batch(raw, batch_token="dlq_view:0")
    assert spark.read.parquet(dlq).count() == 2 * stats.malformed
    assert eng.read_dlq().count() == stats.malformed
    assert eng.read_view().count() == n_view

    # a DIFFERENT batch that happens to carry identical malformed lines
    # is a distinct occurrence — the collapsed reader keeps both
    eng.apply_raw_batch(raw, batch_token="dlq_view:1")
    assert eng.read_dlq().count() == 2 * stats.malformed

    # token-less ad-hoc appends collapse with each other only
    eng.apply_raw_batch(raw)
    eng.apply_raw_batch(raw)
    assert eng.read_dlq().count() == 3 * stats.malformed


def test_read_dlq_empty_when_never_written(spark, sf_dir, tmp_path):
    """A healthy pipeline never creates the DLQ directory — read_dlq()
    must answer 0, not crash (found by review)."""
    schema, pk = describe_table(spark, sf_dir, "events")
    p = CdcPipeline(
        name="dlq_empty", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        action_mode=ActionMode.DIRECT).validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         dlq_path=str(tmp_path / "dlq"))
    assert eng.read_dlq().count() == 0
    assert {"raw", "reason", "_batch_token"} <= set(eng.read_dlq().columns)
