"""Range-clustered file layout (functions/layout.py): files must own
narrow, mostly-disjoint key ranges so parquet min/max stats prune range
scans."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.layout import (
    cluster_write, file_ranges)
from ydb_cdc_processor_spark.sources.catalog import load_table


def test_cluster_write_files_own_disjoint_ranges(spark, sf_dir, tmp_path):
    """After cluster_write on l_shipdate: every file's [min,max] span is
    a small slice of the table's range, and a one-month predicate
    intersects only a few of the files — the structural property
    min/max file skipping needs (a random layout has every file
    spanning the whole range and prunes nothing)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice")
    path = str(tmp_path / "clustered")
    cluster_write(li, path, ["l_shipdate"], n_files=8)

    ranges = file_ranges(path, "l_shipdate")
    assert len(ranges) >= 4
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    span = (hi - lo).total_seconds()
    # each file covers a narrow slice, not the whole range
    widths = [(b - a).total_seconds() / span for a, b in ranges]
    assert max(widths) < 0.5
    assert sum(widths) / len(widths) < 0.35

    # a one-month slice intersects only a few files
    import datetime as dt
    tz = ranges[0][0].tzinfo  # stats are tz-aware (UTC session)
    q_lo = dt.datetime(1997, 3, 1, tzinfo=tz)
    q_hi = dt.datetime(1997, 4, 1, tzinfo=tz)
    touched = [1 for a, b in ranges if a < q_hi and b >= q_lo]
    assert sum(touched) <= max(2, len(ranges) // 3)

    # content is layout-invariant
    got = spark.read.parquet(path).count()
    assert got == li.count()


def test_cluster_write_validates_cols(spark):
    with pytest.raises(ValueError):
        cluster_write(spark.range(5), "/tmp/x", [])


def test_unclustered_baseline_spans_everything(spark, sf_dir, tmp_path):
    """Sanity for the disjointness assertion above: writing WITHOUT
    clustering leaves (nearly) every file spanning (nearly) the whole
    range — the layout, not parquet, is what makes pruning possible."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice")
    path = str(tmp_path / "random")
    li.repartition(8).write.mode("overwrite").parquet(path)
    ranges = file_ranges(path, "l_shipdate")
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    span = (hi - lo).total_seconds()
    widths = [(b - a).total_seconds() / span for a, b in ranges]
    assert min(widths) > 0.8  # every file spans ~the whole range


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Two decorrelated uniform columns: the single-key range layout
    prunes files only on its leading column (the other spans every
    file); the Z-order layout gives SUBSTANTIAL footer-stat pruning on
    BOTH — each file owns a compact Morton tile of the (x, y) space."""
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.functions.layout import zorder_write

    df = spark.range(200_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("x"),
        ((F.col("id") * 40_503 + 17) % 100_000).alias("y"),
        F.col("id").alias("payload"))
    zp, rp = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_write(df, zp, ["x", "y"], n_files=64, bits=8)
    cluster_write(df, rp, ["x"], n_files=64)

    def skippable(path, col, lo, hi):
        rng = file_ranges(path, col)
        assert rng
        return sum(1 for a, b in rng if b < lo or a > hi) / len(rng)

    lo, hi = 45_000, 55_000   # a 10% slice on either dimension
    assert skippable(rp, "x", lo, hi) > 0.8   # range layout: leading col
    assert skippable(rp, "y", lo, hi) == 0.0  # ...and NOTHING on y
    assert skippable(zp, "x", lo, hi) > 0.5   # z-order: both dimensions
    assert skippable(zp, "y", lo, hi) > 0.5

    # the rewrite is a layout change only — content preserved
    assert spark.read.parquet(zp).count() == 200_000
    got = spark.read.parquet(zp).agg(F.sum("payload")).collect()[0][0]
    assert got == sum(range(200_000))
