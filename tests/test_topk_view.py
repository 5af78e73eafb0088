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


def _zipf(spark, n_heads=5, head_n=50, n_tail=2000):
    """Adversarial zipfian domain: a few heavy head terms plus a long
    count-1 tail of unique values per group."""
    head = [(f"g{i % 2}", f"head{i % n_heads}")
            for i in range(n_heads * head_n)]
    tail = [(f"g{i % 2}", f"tail{i}") for i in range(n_tail)]
    return spark.createDataFrame(head + tail, "grp string, term string")


def test_prune_bounds_state_on_zipfian_domain(spark, tmp_path):
    """Bounded mode: the lossy sweep collapses the count-1 tail —
    rollup state lands near |heads| + k·|groups|, NOT |distinct pairs|
    — while the served top-k stays exactly the heavy hitters."""
    tv = TopKView(spark, str(tmp_path / "z"), ["grp"], "term", k=3,
                  prune_floor=2)
    rows = _zipf(spark)
    tv.apply_delta(rows, None, batch_token="b0")
    before = tv.counts().count()
    assert before > 2000                       # tail resident pre-sweep
    pruned = tv.prune()
    after = tv.counts().count()
    assert pruned == before - after
    assert after <= 5 * 2 + 3 * 2              # heads + top-k slack
    # top-k unchanged by the sweep: heads dominate the tail
    want = {("g0",) + (f"head{i}",) for i in range(3)} | \
           {("g1",) + (f"head{i}",) for i in range(3)}
    got = {(r["grp"], r["term"]) for r in tv.read().collect()}
    assert got == want


def test_prune_preserves_replay_fence(spark, tmp_path):
    """A replay of the last batch stays fenced out AFTER a prune sweep
    (rewrite_rows keeps per-bucket tokens, even for emptied buckets)."""
    tv = TopKView(spark, str(tmp_path / "pf"), ["grp"], "term", k=2,
                  prune_floor=3)
    b = _zipf(spark, n_heads=2, head_n=10, n_tail=500)
    tv.apply_delta(b, None, batch_token="tok")
    tv.prune()
    state = _res(tv.counts())
    tv.apply_delta(b, None, batch_token="tok")   # replay: still fenced
    assert _res(tv.counts()) == state


def test_prune_undercount_bound_and_forfeit(spark, tmp_path):
    """A pruned value restarting from zero under-counts by at most
    prune_floor−1 per sweep that dropped it; a late delete for a
    pruned pair forfeits (never resurrects or goes negative)."""
    tv = TopKView(spark, str(tmp_path / "ub"), ["grp"], "term", k=1,
                  prune_floor=4)
    mk = lambda pairs: spark.createDataFrame(  # noqa: E731
        pairs, "grp string, term string")
    # heavy term keeps k=1 occupied; 'v' accumulates 3 (< floor)
    tv.apply_delta(mk([("g", "hot")] * 10 + [("g", "v")] * 3),
                   None, batch_token="b0")
    assert tv.prune() == 1                      # 'v' dropped (3 < 4)
    # 'v' re-offered 5 times → resident count 5, true count 8:
    # deficit 3 == prune_floor − 1, within the documented bound
    tv.apply_delta(mk([("g", "v")] * 5), None, batch_token="b1")
    n = {r["term"]: r["n"] for r in tv.counts().collect()}
    assert n["v"] == 5
    # a delete for a long-gone pair forfeits: no resurrection, no
    # negative count
    tv.apply_delta(None, mk([("g", "w")]), batch_token="b2")
    assert "w" not in {r["term"] for r in tv.counts().collect()}


def test_maintain_runs_prune_in_bounded_mode(spark, tmp_path):
    tv = TopKView(spark, str(tmp_path / "m"), ["grp"], "term", k=2,
                  prune_floor=2)
    tv.apply_delta(_zipf(spark, n_tail=800), None, batch_token="b0")
    assert tv.counts().count() > 800
    tv.maintain()
    assert tv.counts().count() <= 5 * 2 + 2 * 2
    # exact mode: maintain never prunes
    ex = TopKView(spark, str(tmp_path / "ex"), ["grp"], "term", k=2)
    ex.apply_delta(_zipf(spark, n_tail=300), None, batch_token="b0")
    n0 = ex.counts().count()
    ex.maintain()
    assert ex.counts().count() == n0 and ex.prune() == 0


def test_prune_floor_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        TopKView(spark, str(tmp_path / "v"), ["grp"], "term", k=2,
                 prune_floor=1)


def test_merge_from_shards(spark, tmp_path):
    """Federated union: two shard stores maintained over disjoint
    slices merge by count SUM into the one-shot rollup of the union;
    the merge is token-fenced (a replay is a no-op)."""
    full = _rows(spark, 0, 300)
    a = TopKView(spark, str(tmp_path / "a"), ["grp"], "term", k=3)
    b = TopKView(spark, str(tmp_path / "b"), ["grp"], "term", k=3)
    a.apply_delta(_rows(spark, 0, 150), None, batch_token="a0")
    b.apply_delta(_rows(spark, 150, 300), None, batch_token="b0")
    a.merge_from(b, batch_token="fed:b")
    assert a.recompute_check(full)
    state = _res(a.counts())
    a.merge_from(b, batch_token="fed:b")    # replay: fenced out
    assert _res(a.counts()) == state
    # mismatched layouts refuse
    c = TopKView(spark, str(tmp_path / "c"), ["grp"], "other", k=3)
    with pytest.raises(ValueError, match="must match"):
        a.merge_from(c)
    # merging a never-written shard is a no-op
    d = TopKView(spark, str(tmp_path / "d"), ["grp"], "term", k=3)
    a.merge_from(d, batch_token="fed:d")
    assert _res(a.counts()) == state


def test_agg_view_merge_rollup_sums(spark, tmp_path):
    """AggregateView.merge_rollup: shard rollups with SUM columns merge
    linearly (counts, sums, and null-contribution counters all add);
    a frame missing the raw state columns (e.g. a public read()) is
    refused with a pointer at store().read()."""
    from ydb_cdc_processor_spark.operators.agg_view import AggregateView

    rows = spark.createDataFrame(
        [(f"g{i % 3}", float(i) if i % 5 else None) for i in range(100)],
        "grp string, v double")
    mk = lambda p: AggregateView(  # noqa: E731
        spark, str(tmp_path / p), ["grp"], {"sum_v": "v"},
        count_col="n", backend="bucketed", n_buckets=4)
    a, b = mk("a"), mk("b")
    a.apply_delta(rows.where("v IS NULL OR v < 50"), None, batch_token="a0")
    b.apply_delta(rows.where("v >= 50"), None, batch_token="b0")
    a.merge_rollup(b.store().read(), batch_token="fed")
    assert a.recompute_check(rows)
    with pytest.raises(ValueError, match="store\\(\\).read\\(\\)"):
        a.merge_rollup(b.read())
