"""Schema evolution at the merge boundary (merge.widen_to_union +
the bucketed manifest's authoritative schema): an upstream
ALTER TABLE ADD COLUMN — or a user editing the transform SQL to emit a
new column — must WIDEN the materialized view (NULL on pre-evolution
rows), never silently drop the column or crash the merge; and a
bucketed store whose buckets were written under different schema
generations must still surface the union on every read path."""

from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.bucketed_view import (
    BucketedMaterializedView)
from ydb_cdc_processor_spark.operators.merge import ParquetMaterializedView


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_flat_view_widens_on_new_column(spark, tmp_path):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    mv = ParquetMaterializedView(spark, str(tmp_path / "mv"), ["k"],
                                 schema=base.schema)
    mv.apply(base, action="upsertInto")

    wide = spark.createDataFrame([(2, "b2", 9.5), (3, "c", 1.5)],
                                 "k long, v string, extra double")
    mv.apply(wide, action="upsertInto")
    assert _rows(mv.read().select("k", "v", "extra")) == [
        (1, "a", None), (2, "b2", 9.5), (3, "c", 1.5)]

    # narrower delta: replaced row's missing column goes NULL (K1
    # replaces the WHOLE row); untouched rows keep their values
    narrow = spark.createDataFrame([(3, "c3")], "k long, v string")
    mv.apply(narrow, action="upsertInto")
    assert _rows(mv.read().select("k", "v", "extra")) == [
        (1, "a", None), (2, "b2", 9.5), (3, "c3", None)]


def test_flat_view_widens_in_fused_batch(spark, tmp_path):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "k long, v string")
    mv = ParquetMaterializedView(spark, str(tmp_path / "mv"), ["k"],
                                 schema=base.schema)
    mv.apply(base, action="upsertInto")
    ups = spark.createDataFrame([(1, "a1", 7)], "k long, v string, n int")
    dels = spark.createDataFrame([(3,)], "k long")
    mv.apply_batch(ups, dels)
    assert _rows(mv.read().select("k", "v", "n")) == [
        (1, "a1", 7), (2, "b", None)]


def test_bucketed_view_widens_and_reads_mixed_buckets(spark, tmp_path):
    """The widening batch touches ONE bucket; the others keep their
    pre-evolution files.  Every read path — full read(), and a
    read_touched() pinned to an UNTOUCHED bucket — must surface the
    evolved column (NULL where no file carries it): the manifest's
    stored schema, not per-file inference, is authoritative."""
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    bv = BucketedMaterializedView(spark, str(tmp_path / "bv"), ["k"],
                                  n_buckets=8)
    bv.apply(base, action="upsertInto")

    wide = spark.createDataFrame([(0, 99, "tagged")],
                                 "k long, v long, tag string")
    bv.apply(wide, action="upsertInto")

    got = {r.k: (r.v, r.tag) for r in bv.read().collect()}
    assert got[0] == (99, "tagged")
    assert len(got) == 40 and got[1] == (1, None)

    # an untouched bucket read by direct path still shows the column
    probe = spark.createDataFrame([(1,)], "k long")
    b1 = [r[0] for r in probe.select(bv.bucket_expr().alias("b")).collect()]
    touched = bv.read_touched(b1)
    assert "tag" in touched.columns
    assert touched.where(F.col("k") == 1).select("tag").collect()[0][0] \
        is None

    # restart: a fresh handle serves the stored (evolved) schema
    bv2 = BucketedMaterializedView(spark, str(tmp_path / "bv"), ["k"],
                                   n_buckets=8)
    assert "tag" in bv2.read().columns
    assert {r.k: r.tag for r in bv2.read().collect()}[0] == "tagged"


def test_bucketed_schema_survives_rebucket(spark, tmp_path):
    base = spark.range(0, 30).select(F.col("id").alias("k"),
                                     F.lit("x").alias("v"))
    bv = BucketedMaterializedView(spark, str(tmp_path / "bv"), ["k"],
                                  n_buckets=4)
    bv.apply(base, action="upsertInto")
    bv.apply(spark.createDataFrame([(5, "y", 1.25)],
                                   "k long, v string, w double"),
             action="upsertInto")
    bv.rebucket(16)
    got = {r.k: (r.v, r.w) for r in bv.read().collect()}
    assert got[5] == ("y", 1.25) and got[6] == ("x", None)


def test_engine_view_widens_when_transform_gains_column(spark, sf_dir,
                                                        tmp_path):
    """End-to-end: the same target view, first maintained by a pipeline
    whose SQL emits 5 columns, then by an UPDATED pipeline emitting a
    6th (the operational 'edit the transform, restart the engine'
    path).  Pre-evolution rows read NULL in the new column; replayed
    rows carry it."""
    from ydb_cdc_processor_spark import CdcBatchEngine, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    schema, pk = describe_table(spark, sf_dir, "events")
    fixture = str(tmp_path / "cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)
    raw = cdc_json.read_cdc_batch(spark, fixture)
    view = str(tmp_path / "view")

    p1 = CdcPipeline(
        name="evo_v1", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value "
                   "FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    CdcBatchEngine(spark, p1, view).apply_raw_batch(
        raw.where("_offset % 2 = 0"))

    p2 = CdcPipeline(
        name="evo_v2", source_schema=schema, pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="SELECT event_id, ts, user_id, event_type, value, "
                   "upper(event_type) AS etype_uc FROM rows",
        delete_sql="SELECT event_id FROM rows").validate(spark)
    eng2 = CdcBatchEngine(spark, p2, view)
    eng2.apply_raw_batch(raw.where("_offset % 2 = 1"))

    out = eng2.read_view()
    assert "etype_uc" in out.columns
    n_null = out.where(F.col("etype_uc").isNull()).count()
    n_set = out.where(F.col("etype_uc") == F.upper("event_type")).count()
    assert n_null > 0 and n_set > 0 and n_null + n_set == out.count()
