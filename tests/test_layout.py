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


def test_shard_assignment_reproducible_permutation(spark):
    """(shard, seq) is a pure function of (seed, id): recomputing under
    a different partitioning is bit-identical, seqs are dense 1..n per
    shard, shards are near-uniform, and a new seed is a genuinely
    different permutation."""
    from ydb_cdc_processor_spark.functions.layout import shard_assignment

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.shard, r.seq) for r in
         shard_assignment(df, "doc_id", 16, seed=7).collect()}
    b = {r.doc_id: (r.shard, r.seq) for r in
         shard_assignment(df.repartition(5), "doc_id", 16, seed=7)
         .collect()}
    assert a == b and len(a) == 4000
    sizes: dict[int, list[int]] = {}
    for shard, seq in a.values():
        sizes.setdefault(shard, []).append(seq)
    assert len(sizes) == 16
    for seqs in sizes.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))  # dense rank
        assert abs(len(seqs) - 250) < 100                     # ~uniform
    c = {r.doc_id: (r.shard, r.seq) for r in
         shard_assignment(df, "doc_id", 16, seed=8).collect()}
    assert c != a  # a fresh epoch permutation


def test_shuffle_write_layout_matches_assignment(spark, tmp_path):
    """The materialized shard=k/ layout delivers shard_assignment's
    order: file row order within each shard directory equals the seq
    order, the union of shards is the input, and a rewrite is
    byte-deterministic at the row-sequence level."""
    import os

    import pyarrow.parquet as pq

    from ydb_cdc_processor_spark.functions.layout import (
        shard_assignment, shuffle_write)

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("payload"))
    path = str(tmp_path / "shards")
    shuffle_write(df, path, "doc_id", 8, seed=3)

    def read_order(base):
        out = {}
        for d in sorted(os.listdir(base)):
            if not d.startswith("shard="):
                continue
            shard = int(d.split("=", 1)[1])
            ids = []
            for f in sorted(os.listdir(os.path.join(base, d))):
                if f.endswith(".parquet"):
                    ids.extend(pq.read_table(os.path.join(base, d, f),
                                             columns=["doc_id"])
                               .column("doc_id").to_pylist())
            out[shard] = ids
        return out

    got = read_order(path)
    want: dict[int, list[int]] = {}
    for r in shard_assignment(df, "doc_id", 8, seed=3) \
            .orderBy("shard", "seq").collect():
        want.setdefault(r.shard, []).append(r.doc_id)
    assert got == want
    assert sorted(x for ids in got.values() for x in ids) == \
           list(range(2000))

    # deterministic rewrite: same (input, seed) → same sequences
    path2 = str(tmp_path / "shards2")
    shuffle_write(df.repartition(7), path2, "doc_id", 8, seed=3)
    assert read_order(path2) == got
