"""SampleView — incrementally-maintained per-group deterministic
reservoir (operators/sample_view.py): any insert-only ingest history
equals the one-shot sample; replays converge without a fence; deletes
are refused on content; shards merge federatively."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.sampling import (
    sample_per_group, weighted_sample)
from ydb_cdc_processor_spark.operators.sample_view import SampleView


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(f"g{i % 3}", i, f"payload{i}", float(1 + i % 7))
         for i in range(lo, hi)],
        "grp string, id long, txt string, w double")


def _res(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_oneshot(spark, tmp_path):
    sv = SampleView(spark, str(tmp_path / "s"), ["grp"], "id", n=10,
                    payload_cols=["txt"])
    full = _rows(spark, 0, 900)
    for lo, hi in ((0, 300), (300, 600), (600, 900)):
        sv.apply_delta(_rows(spark, lo, hi))
    assert sv.recompute_check(full)
    # per-group size is exactly n, and the members equal the one-shot
    # hash-ranked sample of the union
    sizes = {r["grp"]: r["n"] for r in
             sv.read().groupBy("grp").agg(F.count("*").alias("n"))
             .collect()}
    assert sizes == {"g0": 10, "g1": 10, "g2": 10}
    exp = sample_per_group(full.select("grp", "id", "txt"),
                           "id", "grp", 10)
    assert _res(sv.read()) == _res(exp)


def test_replay_and_any_batching_converge(spark, tmp_path):
    a = SampleView(spark, str(tmp_path / "a"), ["grp"], "id", n=7)
    b1, b2 = _rows(spark, 0, 500), _rows(spark, 400, 900)  # overlap
    a.apply_delta(b1)
    a.apply_delta(b2)
    a.apply_delta(b2)   # replay
    a.apply_delta(b1)   # out-of-order replay
    b = SampleView(spark, str(tmp_path / "b"), ["grp"], "id", n=7)
    b.apply_delta(_rows(spark, 0, 900))
    assert _res(a.read()) == _res(b.read())


def test_weighted_sample_view(spark, tmp_path):
    """weight_col switches to the A-ES key; the maintained top-n per
    group equals the one-shot weighted_sample restricted per group."""
    sv = SampleView(spark, str(tmp_path / "w"), ["grp"], "id", n=5,
                    payload_cols=["w"], weight_col="w")
    full = _rows(spark, 0, 600)
    for lo, hi in ((0, 200), (200, 400), (400, 600)):
        sv.apply_delta(_rows(spark, lo, hi))
    assert sv.recompute_check(full)
    # cross-check one group against functions.sampling.weighted_sample
    g0 = full.where(F.col("grp") == "g0").select("grp", "id", "w")
    exp = weighted_sample(g0, "id", "w", k=5)
    got = sv.read().where(F.col("grp") == "g0").select("grp", "id", "w")
    assert _res(got) == _res(exp)


def test_delete_refused_on_content(spark, tmp_path, caplog):
    sv = SampleView(spark, str(tmp_path / "d"), ["grp"], "id", n=5)
    sv.apply_delta(_rows(spark, 0, 100))
    with pytest.raises(ValueError, match="cannot retract"):
        sv.apply_delta(_rows(spark, 0, 10), _rows(spark, 0, 10))
    # empty old-image frame (engine insert-only feed) passes through
    sv.apply_delta(_rows(spark, 100, 150), _rows(spark, 0, 0))
    assert sv.recompute_check(_rows(spark, 0, 150))
    # bootstrap tolerance logs a warning
    sv2 = SampleView(spark, str(tmp_path / "d2"), ["grp"], "id", n=5)
    with caplog.at_level(
            "WARNING",
            logger="ydb_cdc_processor_spark.operators.sample_view"):
        sv2.apply_delta(_rows(spark, 0, 50), _rows(spark, 0, 5))
    assert any("discarding old images" in r.message for r in caplog.records)


def test_merge_from_shards(spark, tmp_path):
    a = SampleView(spark, str(tmp_path / "sa"), ["grp"], "id", n=8)
    b = SampleView(spark, str(tmp_path / "sb"), ["grp"], "id", n=8)
    a.apply_delta(_rows(spark, 0, 500))
    b.apply_delta(_rows(spark, 400, 900))
    merged = SampleView(spark, str(tmp_path / "m"), ["grp"], "id", n=8)
    merged.merge_from(a)
    merged.merge_from(b)
    merged.merge_from(b)   # idempotent
    assert merged.recompute_check(_rows(spark, 0, 900))
    with pytest.raises(ValueError, match="evicted rows"):
        small = SampleView(spark, str(tmp_path / "small"), ["grp"], "id",
                           n=3)
        small.apply_delta(_rows(spark, 0, 50))
        merged.merge_from(small)
    with pytest.raises(ValueError, match="layout"):
        merged.merge_from(SampleView(spark, str(tmp_path / "wl"),
                                     ["grp"], "id", n=8, weight_col="w"))


def test_stream_restart_converges(spark, tmp_path):
    full = _rows(spark, 0, 600).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    full.repartition(3).write.parquet(src)
    sv = SampleView(spark, str(tmp_path / "st"), ["grp"], "id", n=6,
                    payload_cols=["txt"])
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = sv.start_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    q2 = sv.start_stream(
        (spark.readStream.schema(full.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)),
        str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert sv.recompute_check(full)


def test_reoffered_id_resolves_deterministically(spark, tmp_path):
    """Re-offering a (group, id) with a CHANGED payload (and, weighted,
    a changed weight → changed _pri) must converge to one deterministic
    survivor in every offer order — max by (priority, payload digest),
    never an arbitrary dropDuplicates pick (advisor finding)."""
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "grp string, id long, txt string, w double")
    a = mk([("g", i, f"old{i}", 1.0) for i in range(6)])
    b = mk([("g", i, f"new{i}", 5.0) for i in range(6)])   # same ids

    def run(path, order, weighted):
        sv = SampleView(spark, path, ["grp"], "id", n=4,
                        payload_cols=["txt", "w"],
                        weight_col="w" if weighted else None)
        for batch in order:
            sv.apply_delta(batch)
        return sorted(tuple(r) for r in sv.view.read()
                      .select("grp", "id", "txt", "w", "_pri").collect())

    for weighted in (False, True):
        ab = run(str(tmp_path / f"ab{weighted}"), (a, b), weighted)
        ba = run(str(tmp_path / f"ba{weighted}"), (b, a), weighted)
        both = run(str(tmp_path / f"u{weighted}"),
                   (a.unionByName(b),), weighted)   # intra-batch dup
        assert ab == ba == both
    # weighted: the HIGHER-priority offer (w=5) must be the survivor
    assert all(t[3] == 5.0 for t in ab)


def test_uniform_payload_tiebreak_is_digest_ordered(spark, tmp_path):
    """Uniform mode: _pri is a pure function of the id, so two offers of
    one id tie on priority — the lowest payload digest wins, on every
    path (bootstrap batch, later merge, merge_from)."""
    from pyspark.sql import Row
    import hashlib
    import json
    sv = SampleView(spark, str(tmp_path / "t"), ["grp"], "id", n=3,
                    payload_cols=["txt"])
    sv.apply_delta(spark.createDataFrame(
        [("g", 1, "aaa"), ("g", 1, "bbb")], "grp string, id long, txt string"))
    sv.apply_delta(spark.createDataFrame(
        [("g", 1, "ccc")], "grp string, id long, txt string"))
    got = sv.read().collect()
    assert len(got) == 1
    digest = lambda s: hashlib.md5(  # noqa: E731
        json.dumps({"txt": s}, separators=(",", ":")).encode()).hexdigest()
    want = min(("aaa", "bbb", "ccc"), key=digest)
    assert got[0]["txt"] == want
