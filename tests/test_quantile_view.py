"""QuantileView — incrementally-maintained exact discrete percentiles:
the weight store tracks the fact state exactly under upserts, value
changes, deletes, and replays; reads are integer-rational exact."""

from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.quantile_view import QuantileView


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "order_id long, region string, amount long")


def _qv(spark, tmp_path, n_buckets=4):
    return QuantileView(spark, str(tmp_path / "qv"), ["region"],
                        "amount", n_buckets=n_buckets)


def _read(qv, **kw):
    return sorted((r.region, r.n_rows, r.p25, r.p50, r.p75)
                  for r in qv.read(**kw).collect())


def test_maintenance_tracks_quantiles(spark, tmp_path):
    qv = _qv(spark, tmp_path)
    f1 = _fact(spark, [(1, "eu", 10), (2, "eu", 20), (3, "eu", 30),
                       (4, "eu", 40), (5, "us", 7)])
    qv.apply_delta(f1, None)
    # eu n=4: p25 → cum·4 ≥ 4 → 1st value; p50 → 2nd; p75 → 3rd
    assert _read(qv) == [("eu", 4, 10, 20, 30), ("us", 1, 7, 7, 7)]

    # value change: order 4's 40 → 5 shifts every eu quantile down
    f2 = _fact(spark, [(4, "eu", 5)])
    qv.apply_delta(f2, f1.where("order_id = 4").localCheckpoint(True))
    assert _read(qv) == [("eu", 4, 5, 10, 20), ("us", 1, 7, 7, 7)]

    # delete-only batch: median of {5, 10, 30} is 10
    qv.apply_delta(None, _fact(spark, [(2, "eu", 20)])
                   .localCheckpoint(True))
    assert _read(qv) == [("eu", 3, 5, 10, 30), ("us", 1, 7, 7, 7)]
    assert qv.recompute_check(_fact(spark, [(1, "eu", 10), (3, "eu", 30),
                                            (4, "eu", 5), (5, "us", 7)]))


def test_duplicate_values_weighted(spark, tmp_path):
    """Equal values collapse to one store row whose weight still pulls
    the quantile like the individual rows would."""
    qv = _qv(spark, tmp_path)
    qv.apply_delta(_fact(spark, [(i, "eu", 1) for i in range(9)]
                         + [(9, "eu", 100)]), None)
    # n=10: p75 needs cum·4 ≥ 30 → cum ≥ 7.5 → the 1s (cum 9) supply it
    assert _read(qv) == [("eu", 10, 1, 1, 1)]
    # delete six 1s: {1,1,1,100} — p75 → 3rd value = 1, p90 → 100
    qv.apply_delta(None, _fact(spark, [(i, "eu", 1) for i in range(6)])
                   .localCheckpoint(True))
    got = qv.read({"p75": (3, 4), "p90": (9, 10)}).collect()[0]
    assert (got.region, got.n_rows, got.p75, got.p90) == ("eu", 4, 1, 100)


def test_null_values_ignored(spark, tmp_path):
    qv = _qv(spark, tmp_path)
    f1 = spark.createDataFrame(
        [(1, "eu", None), (2, "eu", 10), (3, "us", None)],
        "order_id long, region string, amount long")
    qv.apply_delta(f1, None)
    assert _read(qv) == [("eu", 1, 10, 10, 10)]
    # NULL→value and value→NULL transitions
    qv.apply_delta(
        spark.createDataFrame([(1, "eu", 30), (2, "eu", None)],
                              "order_id long, region string, amount long"),
        f1.where("order_id in (1, 2)").localCheckpoint(True))
    assert _read(qv) == [("eu", 1, 30, 30, 30)]


def test_replay_fence_blocks_double_decrement(spark, tmp_path):
    qv = _qv(spark, tmp_path)
    f1 = _fact(spark, [(1, "eu", 10), (2, "eu", 20)])
    qv.apply_delta(f1, None, batch_token="b0")
    dels = f1.where("order_id = 2").localCheckpoint(True)
    qv.apply_delta(None, dels, batch_token="b1")
    assert _read(qv) == [("eu", 1, 10, 10, 10)]
    qv.apply_delta(None, dels, batch_token="b1")   # replay
    assert _read(qv) == [("eu", 1, 10, 10, 10)]


def test_rational_read_matches_sql_percentile_disc(spark, tmp_path):
    """The rational inequality equals SQL percentile_disc for ps that
    are and are not exact multiples of 1/n (the float-rounding trap the
    integer formulation exists for)."""
    import random
    rng = random.Random(7)
    rows = [(i, "g", rng.randrange(1000)) for i in range(100)]
    qv = _qv(spark, tmp_path)
    qv.apply_delta(_fact(spark, rows), None)
    got = qv.read({"p10": (1, 10), "p50": (1, 2),
                   "p99": (99, 100)}).collect()[0]
    df = _fact(spark, rows)
    exp = df.selectExpr(
        "percentile_disc(0.10) WITHIN GROUP (ORDER BY amount) AS p10",
        "percentile_disc(0.50) WITHIN GROUP (ORDER BY amount) AS p50",
        "percentile_disc(0.99) WITHIN GROUP (ORDER BY amount) AS p99"
    ).collect()[0]
    assert (got.p10, got.p50, got.p99) == (exp.p10, exp.p50, exp.p99)


def test_engine_drives_quantile_view(spark, sf_dir, tmp_path):
    """CdcBatchEngine(agg_views=[qv.feed()]): maintained quantiles equal
    a percentile_disc recompute over the row view."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    qv = QuantileView(spark, str(tmp_path / "qv"), ["event_type"],
                      "value", n_buckets=4)
    p = CdcPipeline(
        name="qv_fact", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"),
                         agg_views=[qv.feed()])
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    view = eng.read_view()
    got = sorted((r.event_type, r.n_rows, r.p25, r.p50, r.p75)
                 for r in qv.read().collect())
    exp = sorted(
        (r.event_type, r.n_rows, r.p25, r.p50, r.p75)
        for r in view.where("value IS NOT NULL").groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.expr("percentile_disc(0.25) WITHIN GROUP "
                    "(ORDER BY value)").alias("p25"),
             F.expr("percentile_disc(0.50) WITHIN GROUP "
                    "(ORDER BY value)").alias("p50"),
             F.expr("percentile_disc(0.75) WITHIN GROUP "
                    "(ORDER BY value)").alias("p75")).collect())
    assert got == exp


def test_merge_from_shards(spark, tmp_path):
    """Federated union: shard (group, value, weight) stores SUM into
    the one-shot weights of the union — exact quantiles preserved; the
    merge is token-fenced."""
    import pytest

    rows = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i % 20)) for i in range(180)],
        "id long, grp string, v double")
    a = QuantileView(spark, str(tmp_path / "a"), ["grp"], "v")
    b = QuantileView(spark, str(tmp_path / "b"), ["grp"], "v")
    a.apply_delta(rows.where("id % 2 = 0"), None, batch_token="a0")
    b.apply_delta(rows.where("id % 2 = 1"), None, batch_token="b0")
    a.merge_from(b, batch_token="fed")
    assert a.recompute_check(rows)
    state = sorted(tuple(r) for r in a.read_weights().collect())
    a.merge_from(b, batch_token="fed")   # replay: fenced out
    assert sorted(tuple(r) for r in a.read_weights().collect()) == state
    with pytest.raises(ValueError, match="must match"):
        a.merge_from(QuantileView(spark, str(tmp_path / "c"),
                                  ["grp"], "other"))
    a.merge_from(QuantileView(spark, str(tmp_path / "d"), ["grp"], "v"),
                 batch_token="fed2")    # never-written shard: no-op
    assert sorted(tuple(r) for r in a.read_weights().collect()) == state
