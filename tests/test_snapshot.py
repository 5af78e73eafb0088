"""SnapshotView — hardlink time travel over a flat materialized view:
every retained version reads exactly as the view stood, across later
swaps, deletes, retention pruning, and replay re-snapshots."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.merge import ParquetMaterializedView
from ydb_cdc_processor_spark.operators.snapshot import SnapshotView


from pyspark.sql import types as T

_SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("v", T.StringType())])


def _mv(spark, tmp_path, name="mv"):
    return ParquetMaterializedView(spark, str(tmp_path / name), ["k"],
                                   schema=_SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_versions_survive_later_swaps(spark, tmp_path):
    mv = _mv(spark, tmp_path)
    snap = SnapshotView(mv, keep_last=5)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    mv.apply(b1)
    v1 = snap.snapshot()
    mv.apply(spark.createDataFrame([(2, "B"), (3, "c")],
                                   "k long, v string"))
    v2 = snap.snapshot()
    mv.apply(spark.createDataFrame([(1,)], "k long"), action="deleteFrom")

    # live state moved on; both versions read as they stood
    assert _rows(snap.read_as_of(v1)) == [(1, "a"), (2, "b")]
    assert _rows(snap.read_as_of(v2)) == [(1, "a"), (2, "B"), (3, "c")]
    assert _rows(mv.read()) == [(2, "B"), (3, "c")]
    assert [v["version"] for v in snap.versions()] == [v1, v2]


def test_retention_prunes_oldest(spark, tmp_path):
    mv = _mv(spark, tmp_path)
    snap = SnapshotView(mv, keep_last=2)
    for i in range(4):
        mv.apply(spark.createDataFrame([(i, f"v{i}")], "k long, v string"))
        snap.snapshot()
    kept = [v["version"] for v in snap.versions()]
    assert kept == [3, 4]
    with pytest.raises(FileNotFoundError, match="retained"):
        snap.read_as_of(1)
    assert _rows(snap.read_as_of(3)) == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_labeled_snapshot_collapses_replay(spark, tmp_path):
    """A replayed batch that re-snapshots under the same label re-uses
    the existing version instead of minting a duplicate."""
    mv = _mv(spark, tmp_path)
    snap = SnapshotView(mv, keep_last=5)
    mv.apply(spark.createDataFrame([(1, "a")], "k long, v string"))
    v = snap.snapshot(label="batch:7")
    again = snap.snapshot(label="batch:7")   # replay
    assert v == again and len(snap.versions()) == 1

    with pytest.raises(ValueError, match="keep_last"):
        SnapshotView(mv, keep_last=0)
    empty = _mv(spark, tmp_path, "nv")
    with pytest.raises(FileNotFoundError, match="no state"):
        SnapshotView(empty).snapshot()
