"""Round-10 additions: theta-sketch set operations
(functions/sketches.kmv_set_ops)."""

from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.sketches import kmv_set_ops


def _sets(spark, a_ids, b_ids):
    a = spark.createDataFrame([(f"v{i}",) for i in a_ids], "v string")
    b = spark.createDataFrame([(f"v{i}",) for i in b_ids], "v string")
    return a, b


def test_exact_below_k(spark):
    """Both sides under k distinct → theta = 1.0 and the estimates are
    EXACT set-operation counts."""
    a, b = _sets(spark, range(0, 60), range(40, 100))
    row = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert row["theta"] == 1.0
    assert row["est_union"] == 100.0
    assert row["est_intersection"] == 20.0
    assert row["est_only_a"] == 40.0
    assert row["est_only_b"] == 40.0
    assert row["jaccard"] == 0.2


def test_estimates_within_sketch_error(spark):
    """Above k the estimates land within ~4/sqrt(k) of truth (KMV
    relative error ≈ 1/sqrt(k-2); 4σ at k=256 is ±25%) — a loose but
    meaningful bound for the deterministic md5 stream."""
    a, b = _sets(spark, range(0, 4000), range(2000, 6000))
    row = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert row["theta"] < 1.0
    for est, truth in ((row["est_union"], 6000),
                       (row["est_intersection"], 2000),
                       (row["est_only_a"], 2000),
                       (row["est_only_b"], 2000)):
        assert abs(est - truth) / truth < 0.25, (est, truth)


def test_duplicates_and_order_invariant(spark):
    """The sketch sees distinct VALUES: duplicating rows or reordering
    inputs cannot change any output."""
    a, b = _sets(spark, range(0, 500), range(300, 800))
    base = kmv_set_ops(a, b, "v", k=128).collect()[0]
    dup = kmv_set_ops(a.unionAll(a).orderBy(F.rand(7)), b, "v",
                      k=128).collect()[0]
    assert tuple(base) == tuple(dup)


def test_disjoint_sides(spark):
    a, b = _sets(spark, range(0, 50), range(100, 150))
    row = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert row["est_intersection"] == 0.0 and row["jaccard"] == 0.0
    assert row["est_union"] == 100.0
