"""K1-K4 merge semantics + the parquet materialized view writer."""

import pytest
from pyspark.sql import Row

from ydb_cdc_processor_spark.operators import merge


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")])


def _as_dict(df):
    return {r.k: r.v for r in df.collect()}


def test_upsert(spark, base):
    delta = spark.createDataFrame([Row(k=2, v="B"), Row(k=4, v="d")])
    out = _as_dict(merge.merge_upsert(base, delta, ["k"]))
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_last_wins_in_delta(spark, base):
    delta = spark.createDataFrame(
        [Row(k=2, v="old", _offset=1), Row(k=2, v="new", _offset=2)])
    out = _as_dict(merge.merge_upsert(base, delta, ["k"], order_col="_offset"))
    assert out[2] == "new"


def test_delete(spark, base):
    keys = spark.createDataFrame([Row(k=1), Row(k=99)])
    out = _as_dict(merge.merge_delete(base, keys, ["k"]))
    assert out == {2: "b", 3: "c"}


def test_update_on_ignores_unmatched(spark, base):
    # K3: updateOn touches EXISTING keys only (CdcMsgParser.java:236-239)
    delta = spark.createDataFrame([Row(k=3, v="C"), Row(k=4, v="d")])
    out = _as_dict(merge.merge_update(base, delta, ["k"]))
    assert out == {1: "a", 2: "b", 3: "C"}


def test_insert_strict_collision(spark, base):
    delta = spark.createDataFrame([Row(k=3, v="X")])
    with pytest.raises(merge.StrictInsertError):
        merge.merge_insert(base, delta, ["k"], strict=True)
    out = _as_dict(merge.merge_insert(base, delta, ["k"], strict=False))
    assert out == {1: "a", 2: "b", 3: "c"}  # collision dropped


def test_parquet_view_apply_idempotent(spark, base, tmp_path):
    mv = merge.ParquetMaterializedView(
        spark, str(tmp_path / "mv"), ["k"], schema=base.schema)
    delta = spark.createDataFrame([Row(k=2, v="B"), Row(k=4, v="d")])
    mv.apply(base, "upsertInto")
    mv.apply(delta, "upsertInto")
    mv.apply(delta, "upsertInto")  # replay: at-least-once must be safe (R2)
    assert _as_dict(mv.read()) == {1: "a", 2: "B", 3: "c", 4: "d"}
    dels = spark.createDataFrame([Row(k=1)])
    mv.apply(dels, "deleteFrom")
    mv.apply(dels, "deleteFrom")
    assert _as_dict(mv.read()) == {2: "B", 3: "c", 4: "d"}
