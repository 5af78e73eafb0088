"""Embedding similarity search (SURVEY.md §7 M4 — beyond-reference scope).

Brute-force cosine top-k as the correctness baseline, plus an LSH-bucketed
variant as the scale path.

Scale design (100 TB of embeddings):

- **Brute force** is probe-count × corpus — fine when probes are few and
  broadcastable: the corpus is scanned ONCE (no shuffle), each partition
  emits only its local top-k per probe via the row_number window, and only
  k·|probes| rows cross the wire.  The cross join is a
  BroadcastNestedLoopJoin with the probes (small side) broadcast.
- **LSH (random hyperplane / SRP)** buckets vectors by sign-bit sketch;
  candidates are only same-bucket pairs → the cross join becomes an
  equi-join on bucket id, which Spark shuffles hash-partitioned (or
  broadcasts the probe buckets).  Recall is tunable with (n_planes,
  n_tables).  Deterministic planes (seeded) keep results reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.vector import as_double_array, cosine


def cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                probe_id_col: str = "probe_id",
                round_digits: int | None = 6) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    Returns (probe_id, vec_id, cos_sim, rnk), rnk 1..k, ties broken by
    vec_id ascending for full determinism.  ``round_digits`` rounds the
    similarity BEFORE ranking so results are reproducible across engines
    and partitionings (float summation order).
    """
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      as_double_array(vec_col).alias("_v"))
    p = probes.select(F.col(probe_id_col).alias("probe_id"),
                      as_double_array(vec_col).alias("_p"))
    pairs = c.crossJoin(F.broadcast(p)).where(F.col("vec_id") != F.col("probe_id"))
    sim = cosine(F.col("_v"), F.col("_p"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = pairs.select("probe_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k))


def srp_buckets(df: DataFrame, n_planes: int = 16, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Signed-random-projection bucket id per vector (deterministic).

    Planes are generated from a seeded xorshift-free hash: plane p,
    component i weight = hash-derived pseudo-random in [-1,1).  All
    arithmetic is Catalyst expressions — no Python per row.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    v = as_double_array(vec_col)
    # weight(p,i) derived from a deterministic integer hash → [-1, 1)
    def w(p: int, i: int) -> F.Column:
        h = F.hash(F.lit(seed), F.lit(p), F.lit(i)).cast("double")
        return h / F.lit(2147483648.0)
    bits = []
    for p in range(n_planes):
        dotp = None
        for i in range(dim):
            term = F.element_at(v, i + 1) * w(p, i)
            dotp = term if dotp is None else dotp + term
        bits.append(F.when(dotp >= 0, F.lit(1)).otherwise(F.lit(0)) *
                    F.lit(2 ** p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(F.col(id_col), F.col(vec_col),
                     bucket.cast("long").alias("bucket"))


def cosine_topk_lsh(corpus: DataFrame, probes: DataFrame, k: int = 5,
                    n_planes: int = 12, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    probe_id_col: str = "probe_id") -> DataFrame:
    """Approximate top-k: candidates limited to probe's SRP bucket.

    At 100 TB the equi-join on ``bucket`` replaces the cross join; recall
    trades off with n_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = srp_buckets(corpus, n_planes, seed, id_col, vec_col, dim)
    pb = srp_buckets(probes.withColumnRenamed(probe_id_col, "vec_id"),
                     n_planes, seed, "vec_id", vec_col, dim) \
        .withColumnRenamed("vec_id", "probe_id") \
        .withColumnRenamed(vec_col, "_pvec")
    cand = cb.join(F.broadcast(pb), on="bucket") \
             .where(F.col("vec_id") != F.col("probe_id"))
    sim = F.round(cosine(as_double_array(vec_col), as_double_array("_pvec")), 6)
    scored = cand.select("probe_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k))
