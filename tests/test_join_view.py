"""JoinView — incrementally-maintained fact LEFT JOIN dim under CDC on
both sides.  Every test verifies against a from-scratch recompute of the
join over the CURRENT table states (recompute_check), the IVM ground
truth."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ydb_cdc_processor_spark.operators.join_view import JoinView

DIM_SCHEMA = T.StructType([
    T.StructField("cust_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("tier", T.StringType())])


def _jv(spark, tmp_path, n_buckets=4):
    return JoinView(spark, str(tmp_path / "jv"), fact_pk=["order_id"],
                    fk_col="o_cust", dim_pk="cust_id",
                    dim_schema=DIM_SCHEMA, n_buckets=n_buckets)


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "order_id long, o_cust long, amount long")


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def test_fact_then_dim_then_updates_match_recompute(spark, tmp_path):
    jv = _jv(spark, tmp_path)
    dim1 = _dim(spark, [(1, "alice", "gold"), (2, "bob", "silver")])
    jv.apply_dim_delta(dim1, None)
    fact1 = _fact(spark, [(10, 1, 100), (11, 2, 200), (12, 3, 300)])
    jv.apply_fact_delta(fact1, None)
    # order 12 references cust 3 (absent) → left-join null enrichment
    got = {r.order_id: (r.name, r.tier) for r in jv.read().collect()}
    assert got[10] == ("alice", "gold")
    assert got[12] == (None, None)
    assert jv.recompute_check(fact1, dim1)

    # late-arriving dim row fills the nulls IN PLACE
    dim2_new = _dim(spark, [(3, "carol", "bronze")])
    jv.apply_dim_delta(dim2_new, None)
    assert jv.read().where("order_id = 12").collect()[0].name == "carol"
    assert jv.recompute_check(
        fact1, dim1.unionByName(dim2_new))

    # dim UPDATE refreshes every fact row under that key
    old = dim1.where("cust_id = 1").localCheckpoint(eager=True)
    upd = _dim(spark, [(1, "alice", "platinum")])
    jv.apply_dim_delta(upd, old)
    assert jv.read().where("order_id = 10").collect()[0].tier == "platinum"


def test_fact_updates_moves_and_deletes(spark, tmp_path):
    jv = _jv(spark, tmp_path)
    jv.apply_dim_delta(
        _dim(spark, [(1, "alice", "gold"), (2, "bob", "silver")]), None)
    f1 = _fact(spark, [(10, 1, 100), (11, 1, 150), (12, 2, 200)])
    jv.apply_fact_delta(f1, None)

    # order 11 MOVES from cust 1 to cust 2; order 12 amount update
    f2 = _fact(spark, [(11, 2, 155), (12, 2, 205)])
    old = (jv.read().select("order_id", "o_cust", "amount")
           .join(f2.select("order_id"), on="order_id", how="left_semi")
           .localCheckpoint(eager=True))
    jv.apply_fact_delta(f2, old)
    rows = {r.order_id: r for r in jv.read().collect()}
    assert len(rows) == 3
    assert rows[11].o_cust == 2 and rows[11].name == "bob"
    assert rows[12].amount == 205
    cur_fact = _fact(spark, [(10, 1, 100), (11, 2, 155), (12, 2, 205)])
    assert jv.recompute_check(
        cur_fact, _dim(spark, [(1, "alice", "gold"), (2, "bob", "silver")]))

    # delete-only batch: old images route the (fk, pk) removals
    dead = (jv.read().select("order_id", "o_cust", "amount")
            .where(F.col("order_id") == 10).localCheckpoint(eager=True))
    jv.apply_fact_delta(None, dead)
    assert {r.order_id for r in jv.read().collect()} == {11, 12}


def test_null_fk_rows_merge_not_duplicate(spark, tmp_path):
    """NULL fks must behave as ordinary keys in the store (the null-safe
    _fkb merge key): re-upserting a null-fk row REPLACES it, moving a
    row to/from NULL displaces the old image."""
    jv = _jv(spark, tmp_path)
    jv.apply_dim_delta(_dim(spark, [(1, "alice", "gold")]), None)
    f1 = _fact(spark, [(10, None, 100), (11, 1, 200)])
    jv.apply_fact_delta(f1, None)
    # replace the null-fk row (same pk, still null fk)
    f2 = _fact(spark, [(10, None, 101)])
    old = (jv.read().select("order_id", "o_cust", "amount")
           .where("order_id = 10").localCheckpoint(eager=True))
    jv.apply_fact_delta(f2, old)
    rows = {r.order_id: r for r in jv.read().collect()}
    assert len(rows) == 2 and rows[10].amount == 101
    # move 10 from NULL to cust 1 — the old null-keyed row must go
    f3 = _fact(spark, [(10, 1, 102)])
    old = (jv.read().select("order_id", "o_cust", "amount")
           .where("order_id = 10").localCheckpoint(eager=True))
    jv.apply_fact_delta(f3, old)
    rows = [r for r in jv.read().where("order_id = 10").collect()]
    assert len(rows) == 1 and rows[0].name == "alice"


def test_replay_converges(spark, tmp_path):
    """Re-applying the SAME deltas (R1 retry / checkpoint replay) leaves
    the view unchanged — convergence by keyed idempotence."""
    jv = _jv(spark, tmp_path)
    dim = _dim(spark, [(1, "alice", "gold")])
    fact = _fact(spark, [(10, 1, 100), (11, 2, 200)])
    jv.apply_dim_delta(dim, None)
    jv.apply_fact_delta(fact, None)
    before = sorted(map(tuple, jv.read().collect()))
    jv.apply_dim_delta(dim, None)
    jv.apply_fact_delta(fact, None)
    assert sorted(map(tuple, jv.read().collect())) == before


def test_dim_delete_nulls_enrichment(spark, tmp_path):
    jv = _jv(spark, tmp_path)
    dim = _dim(spark, [(1, "alice", "gold"), (2, "bob", "silver")])
    jv.apply_dim_delta(dim, None)
    jv.apply_fact_delta(_fact(spark, [(10, 1, 100), (11, 2, 200)]), None)
    old = dim.where("cust_id = 2").localCheckpoint(eager=True)
    jv.apply_dim_delta(None, old)  # delete bob
    rows = {r.order_id: r for r in jv.read().collect()}
    assert rows[11].name is None and rows[11].tier is None
    assert rows[10].name == "alice"
    assert jv.recompute_check(
        _fact(spark, [(10, 1, 100), (11, 2, 200)]),
        dim.where("cust_id = 1"))


def test_dim_refresh_reads_only_touched_buckets(spark, tmp_path):
    """The dim-side refresh must scale with the CHANGED keys, not the
    fact table: pin that it asks the store for exactly the changed
    keys' buckets."""
    jv = _jv(spark, tmp_path, n_buckets=8)
    dim = _dim(spark, [(i, f"c{i}", "t") for i in range(20)])
    jv.apply_dim_delta(dim, None)
    jv.apply_fact_delta(
        _fact(spark, [(i, i % 20, i) for i in range(200)]), None)

    asked = []
    # the fused refresh reads its pending buckets through the store's
    # merge_touched pass (_read_touched) — spy there, the touched-set
    # contract is what this test pins, not the entry point
    orig = jv.view._read_touched

    def spy(buckets, *a, **kw):
        asked.append(sorted(buckets))
        return orig(buckets, *a, **kw)

    jv.view._read_touched = spy
    old = dim.where("cust_id = 7").localCheckpoint(eager=True)
    jv.apply_dim_delta(_dim(spark, [(7, "seven", "gold")]), old)
    assert len(asked) == 1 and len(asked[0]) == 1  # one key → one bucket
    refreshed = jv.read().where("o_cust = 7").collect()
    assert refreshed and all(r.name == "seven" for r in refreshed)


def test_engine_drives_fact_side(spark, sf_dir, tmp_path):
    """CdcBatchEngine(agg_views=[jv.fact_feed()]): the engine's
    pre-merge old-image feed maintains the join view inline with the
    row view — the end state matches a from-scratch join of the row
    view against the dim mirror."""
    from ydb_cdc_processor_spark import (
        ActionMode, CdcBatchEngine, CdcPipeline)
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import (
        describe_table, load_table)

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    dim_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("segment", T.StringType())])
    jv = JoinView(spark, str(tmp_path / "jv"), fact_pk=["event_id"],
                  fk_col="user_id", dim_pk="user_id",
                  dim_schema=dim_schema, n_buckets=4)
    users = (load_table(spark, sf_dir, "events")
             .select("user_id").distinct()
             .withColumn("segment",
                         F.concat(F.lit("seg"), F.col("user_id") % 3)))
    jv.apply_dim_delta(spark.createDataFrame(
        users.collect(), dim_schema), None)

    p = CdcPipeline(
        name="jv_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[jv.fact_feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    assert jv.read().count() == eng.read_view().count()
    assert jv.recompute_check(eng.read_view(), jv.dim_mirror.read())


def test_join_view_streams_restart_converge(spark, tmp_path):
    """Both sides stream in as files (one per trigger); the queries are
    killed and restarted with the same checkpoints while LATE data lands
    on both sides — the final view must equal the from-scratch join of
    everything that arrived (fact rows that beat their dim row get
    their nulls filled by the late dim batch's touched-bucket
    refresh)."""
    fact_all = _fact(spark, [(i, i % 10, i * 10) for i in range(120)])
    dim_all = _dim(spark, [(i, f"c{i}", f"t{i % 3}") for i in range(10)])
    fsrc, dsrc = str(tmp_path / "fsrc"), str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "ckpt")
    fact_all.where("order_id % 3 != 2").repartition(2).write.parquet(fsrc)
    dim_all.where("cust_id % 2 = 0").coalesce(1).write.parquet(dsrc)

    jv = _jv(spark, tmp_path)
    for q in jv.start_streams(
            spark.readStream.schema(fact_all.schema)
            .option("maxFilesPerTrigger", 1).parquet(fsrc),
            spark.readStream.schema(dim_all.schema)
            .option("maxFilesPerTrigger", 1).parquet(dsrc), ckpt):
        q.awaitTermination()
    # facts referencing odd cust ids are enriched with nulls so far
    assert jv.read().where("o_cust = 1 AND name IS NULL").count() > 0

    # kill; late arrivals on BOTH sides; fresh object, same checkpoints
    fact_all.where("order_id % 3 = 2").coalesce(1) \
        .write.mode("append").parquet(fsrc)
    dim_all.where("cust_id % 2 = 1").coalesce(1) \
        .write.mode("append").parquet(dsrc)
    jv2 = _jv(spark, tmp_path)
    for q in jv2.start_streams(
            spark.readStream.schema(fact_all.schema)
            .option("maxFilesPerTrigger", 1).parquet(fsrc),
            spark.readStream.schema(dim_all.schema)
            .option("maxFilesPerTrigger", 1).parquet(dsrc), ckpt):
        q.awaitTermination()
    assert jv2.read().count() == 120
    assert jv2.read().where("name IS NULL").count() == 0
    assert jv2.recompute_check(fact_all, dim_all)


def test_maintain_rebuckets_growing_store(spark, tmp_path):
    """As the FACT side grows, maintain() grows the bucket count (the
    same amortized policy the CDC view uses) and the dim-refresh path
    keeps serving correct results against the new layout."""
    jv = _jv(spark, tmp_path, n_buckets=2)
    dim = _dim(spark, [(i, f"c{i}", "t") for i in range(50)])
    jv.apply_dim_delta(dim, None)
    jv.apply_fact_delta(
        _fact(spark, [(i, i % 50, i) for i in range(5000)]), None)
    out = jv.maintain(target_bucket_bytes=4 << 10)  # tiny target → grow
    assert out["rebucketed"] and jv.view.n_buckets > 2
    # dim refresh against the NEW layout still lands on the right rows
    old = dim.where("cust_id = 13").localCheckpoint(eager=True)
    jv.apply_dim_delta(_dim(spark, [(13, "x13", "vip")]), old)
    hit = jv.read().where("o_cust = 13").collect()
    assert hit and all(r.name == "x13" for r in hit)
    assert jv.read().count() == 5000


def test_two_cdc_engines_maintain_one_join_view(spark, sf_dir, tmp_path):
    """The full reference shape, joined: TWO changefeeds (events fact +
    users dim), one CDC stream engine per pipeline (CdcReader.java runs
    one consumer per view), both feeding ONE JoinView through their
    agg_views old-image protocol.  After both drains the join equals a
    from-scratch join of the two row views; a later dim-update batch
    fans out to the enriched rows."""
    import json as _json
    import os

    from ydb_cdc_processor_spark import CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table
    from ydb_cdc_processor_spark.streaming.engine import CdcStreamEngine

    # -- dim side: synthetic users changefeed --------------------------------
    dim_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("segment", T.StringType())])
    dim_src = str(tmp_path / "dim_src")
    os.makedirs(dim_src)
    with open(os.path.join(dim_src, "part-0.json"), "w") as f:
        for i in range(200):
            env = cdc_json.envelope([i], {"segment": f"seg{i % 5}"})
            f.write(_json.dumps({"value": env, "_partition": 0,
                                 "_offset": i}) + "\n")
    dim_pipe = CdcPipeline(
        name="users_dim", source_schema=dim_schema, pk=["user_id"],
        members={"user_id": "Int64", "segment": "Text"},
        update_sql="SELECT user_id, segment FROM rows",
        delete_sql="SELECT user_id FROM rows").validate(spark)

    # -- fact side: the standard events fixture ------------------------------
    fact_schema, fact_pk = describe_table(spark, sf_dir, "events")
    fact_src = str(tmp_path / "fact_src")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fact_src, limit=400)
    fact_pipe = CdcPipeline(
        name="events_fact", source_schema=fact_schema, pk=fact_pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)

    jv = JoinView(spark, str(tmp_path / "jv"), fact_pk=["event_id"],
                  fk_col="user_id", dim_pk="user_id",
                  dim_schema=dim_schema, n_buckets=4)
    dim_eng = CdcStreamEngine(
        spark, dim_pipe, str(tmp_path / "dim_view"),
        str(tmp_path / "dim_ckpt"), agg_views=[jv.dim_feed()])
    fact_eng = CdcStreamEngine(
        spark, fact_pipe, str(tmp_path / "fact_view"),
        str(tmp_path / "fact_ckpt"), agg_views=[jv.fact_feed()])

    assert dim_eng.run_available(dim_src).ok
    assert fact_eng.run_available(fact_src).ok
    fact_rows = fact_eng.batch_engine.read_view()
    assert jv.read().count() == fact_rows.count()
    assert jv.recompute_check(fact_rows,
                              dim_eng.batch_engine.read_view())

    # -- dim update lands later: segment change fans out ---------------------
    with open(os.path.join(dim_src, "part-upd.json"), "w") as f:
        for off, i in enumerate(range(0, 200, 5)):
            env = cdc_json.envelope([i], {"segment": "upgraded"})
            f.write(_json.dumps({"value": env, "_partition": 0,
                                 "_offset": 1000 + off}) + "\n")
    assert dim_eng.run_available(dim_src).ok
    assert jv.recompute_check(fact_rows,
                              dim_eng.batch_engine.read_view())
    upgraded = jv.read().where("user_id % 5 = 0 AND user_id < 200")
    assert upgraded.count() > 0
    assert upgraded.where("segment != 'upgraded'").count() == 0


def test_full_ivm_stack_one_engine(spark, sf_dir, tmp_path):
    """THE integration showcase: one CdcBatchEngine maintains the row
    view plus FOUR derived views from the same old-image feed — rollup,
    checksum, secondary index, join view — and each converges to its
    from-scratch recompute after a batch containing upserts AND
    deletes."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.functions.checksum import ChecksumView
    from ydb_cdc_processor_spark.operators.agg_view import AggregateView
    from ydb_cdc_processor_spark.operators.secondary_index import (
        SecondaryIndex)
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    dim_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("segment", T.StringType())])
    av = AggregateView(spark, str(tmp_path / "agg"), ["event_type"],
                       {"sum_value": "value"}, count_col="n")
    cv = ChecksumView(spark, str(tmp_path / "ck"), cols)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), pk=["event_id"],
                        col="event_type", n_buckets=4)
    jv = JoinView(spark, str(tmp_path / "jv"), fact_pk=["event_id"],
                  fk_col="user_id", dim_pk="user_id",
                  dim_schema=dim_schema, n_buckets=4)
    jv.apply_dim_delta(spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(2000)], dim_schema), None)

    p = CdcPipeline(
        name="stack", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(
        spark, p, str(tmp_path / "view"),
        agg_views=[av, cv, ix.feed(), jv.fact_feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))

    view = eng.read_view()
    # rollup == recompute
    got = {r.event_type: (r.n, None if r.sum_value is None
                          else round(r.sum_value, 4))
           for r in av.read().collect()}
    exp = {r.event_type: (r.n, None if r.s is None else round(r.s, 4))
           for r in view.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                 .cast("double").alias("s")).collect()}
    assert got == exp
    # checksum == recompute
    assert cv.matches(view)
    # index == projection
    assert sorted((r.event_type, r.event_id) for r in ix.read().collect()) \
        == sorted((r.event_type, r.event_id)
                  for r in view.select("event_type", "event_id").collect())
    # join view == recompute
    assert jv.recompute_check(view, jv.dim_mirror.read())


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# a step is (side, op, key): fact upsert/delete over pks 0-5 with fk
# drawn from 0-3, dim upsert/delete over pks 0-3
_step = st.one_of(
    st.tuples(st.just("fact_up"), st.integers(0, 5), st.integers(0, 3)),
    st.tuples(st.just("fact_del"), st.integers(0, 5), st.just(0)),
    st.tuples(st.just("dim_up"), st.integers(0, 3), st.integers(0, 9)),
    st.tuples(st.just("dim_del"), st.integers(0, 3), st.just(0)),
)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(steps=st.lists(_step, min_size=2, max_size=8))
def test_property_any_interleaving_matches_recompute(spark,
                                                     tmp_path_factory,
                                                     steps):
    """ANY interleaving of fact/dim upserts and deletes (including fk
    moves and re-deletes of absent keys) leaves the view equal to the
    from-scratch join of the resulting table states."""
    tmp_path = tmp_path_factory.mktemp("jv_prop")
    jv = _jv(spark, tmp_path, n_buckets=2)
    fact_state: dict[int, tuple] = {}
    dim_state: dict[int, tuple] = {}
    for side, k, v in steps:
        if side == "fact_up":
            row = (k, v, 100 + k)
            old = None
            if jv.view.exists():
                old = (jv.read().select("order_id", "o_cust", "amount")
                       .where(F.col("order_id") == k)
                       .localCheckpoint(eager=True))
            jv.apply_fact_delta(_fact(spark, [row]), old)
            fact_state[k] = row
        elif side == "fact_del":
            if not jv.view.exists():
                continue
            old = (jv.read().select("order_id", "o_cust", "amount")
                   .where(F.col("order_id") == k)
                   .localCheckpoint(eager=True))
            jv.apply_fact_delta(None, old)
            fact_state.pop(k, None)
        elif side == "dim_up":
            row = (k, f"n{v}", f"t{v % 2}")
            old = (jv.dim_mirror.read().where(F.col("cust_id") == k)
                   .localCheckpoint(eager=True))
            jv.apply_dim_delta(_dim(spark, [row]), old)
            dim_state[k] = row
        else:  # dim_del
            old = (jv.dim_mirror.read().where(F.col("cust_id") == k)
                   .localCheckpoint(eager=True))
            jv.apply_dim_delta(None, old)
            dim_state.pop(k, None)
    if not jv.view.exists():
        assert not fact_state
        return
    fact_df = (_fact(spark, list(fact_state.values()))
               if fact_state else _fact(spark, []).limit(0))
    dim_df = (_dim(spark, list(dim_state.values()))
              if dim_state else _dim(spark, []).limit(0))
    assert jv.recompute_check(fact_df, dim_df)


def test_dim_update_for_unreferenced_key_in_absent_bucket(spark, tmp_path):
    """A dim change whose key no stored fact row references — and whose
    bucket directory was never written — must be a no-op refresh, not a
    schema-inference crash (found by review)."""
    jv = _jv(spark, tmp_path, n_buckets=64)  # sparse store
    jv.apply_dim_delta(_dim(spark, [(1, "alice", "gold")]), None)
    jv.apply_fact_delta(_fact(spark, [(10, 1, 100)]), None)
    for k in range(2, 30):  # unreferenced keys across many buckets
        jv.apply_dim_delta(_dim(spark, [(k, f"c{k}", "t")]), None)
    assert jv.read().count() == 1
    assert jv.read().collect()[0].name == "alice"


def test_fk_dim_pk_type_mismatch_refused(spark, tmp_path):
    """A double fk against a bigint dim pk would stringify differently
    ('7.0' vs '7') and silently break dim refreshes — the first fact
    batch must refuse instead (found by review)."""
    jv = _jv(spark, tmp_path)
    bad = spark.createDataFrame(
        [(10, 1.0, 100)], "order_id long, o_cust double, amount long")
    with pytest.raises(ValueError, match="must have ONE type"):
        jv.apply_fact_delta(bad, None)


def test_fact_bootstrap_with_old_images(spark, tmp_path):
    """Old images on the join view's FIRST fact batch (row view predates
    the join view) must not crash the absent store (found by review)."""
    jv = _jv(spark, tmp_path)
    jv.apply_dim_delta(_dim(spark, [(1, "alice", "gold")]), None)
    olds = _fact(spark, [(10, 1, 99), (11, 1, 98)])
    jv.apply_fact_delta(_fact(spark, [(10, 1, 100)]),
                        olds.localCheckpoint(True))
    rows = {r.order_id for r in jv.read().collect()}
    assert rows == {10}


def test_large_dim_falls_back_to_shuffle_join(spark, tmp_path):
    """A dim mirror past dim_broadcast_max_bytes must NOT be force-
    broadcast into the enrichment join (a 10-100 GB dimension would OOM
    executors); the plan drops the hint and maintenance results are
    unchanged.  Threshold forced to 1 byte so the small test dim crosses
    it — the oracle (recompute_check) stays identical either way."""
    jv = JoinView(spark, str(tmp_path / "jvL"), fact_pk=["order_id"],
                  fk_col="o_cust", dim_pk="cust_id",
                  dim_schema=DIM_SCHEMA, n_buckets=4,
                  dim_broadcast_max_bytes=1)
    dim = _dim(spark, [(i, f"c{i}", "t") for i in range(1, 40)])
    jv.apply_dim_delta(dim, None)
    assert jv._dim_disk_bytes() > 1

    # the enrichment plan must carry NO broadcast hint on the dim side
    plan = jv._enrich(_fact(spark, [(10, 1, 100)]))._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan and "BROADCAST" not in plan

    fact = _fact(spark, [(10, 1, 100), (11, 2, 200), (12, 99, 300)])
    jv.apply_fact_delta(fact, None)
    got = {r.order_id: r.name for r in jv.read().collect()}
    assert got == {10: "c1", 11: "c2", 12: None}
    assert jv.recompute_check(fact, dim)

    # an update batch (old images, moves) exercises the same path
    f2 = _fact(spark, [(11, 3, 205)])
    old = (jv.read().select("order_id", "o_cust", "amount")
           .join(f2.select("order_id"), on="order_id", how="left_semi")
           .localCheckpoint(eager=True))
    jv.apply_fact_delta(f2, old)
    cur = _fact(spark, [(10, 1, 100), (11, 3, 205), (12, 99, 300)])
    assert jv.recompute_check(cur, dim)

    # below the cap (default ctor) the hint IS applied
    jv2 = JoinView(spark, str(tmp_path / "jvS"), fact_pk=["order_id"],
                   fk_col="o_cust", dim_pk="cust_id",
                   dim_schema=DIM_SCHEMA, n_buckets=4)
    jv2.apply_dim_delta(dim, None)
    plan2 = jv2._enrich(_fact(spark, [(10, 1, 100)]))._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" in plan2 or "broadcast" in plan2.lower()
