"""Deterministic sampling for training-data curation.

``df.sample()`` is seed-dependent per partitioning — re-running a
pipeline after a repartition draws a DIFFERENT sample, which poisons
incremental/reproducible curation.  These samplers hash a stable row id
instead: a row's keep/drop decision is a pure function of (id, rate),
so the sample is stable across runs, partitionings, engines — and
exactly replayable by any engine with ``md5()`` (the cross-engine
oracle path, same construction as the MinHash family).

Scale shape: pure codegen projections + filter — no shuffle, no RNG
state, trivially pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-fraction resolution: the first 8 md5 hex chars → [0, 2^32)
_DENOM = float(1 << 32)


def hash_fraction(id_col: Column) -> Column:
    """Uniform-[0,1) fraction from the row id: first 8 hex chars of
    ``md5(id)`` as an integer / 2^32.  ``conv`` is exact here (2^32 ≪
    2^63)."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
            .cast("long") / F.lit(_DENOM))


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, decided by id hash (stable, rerunnable)."""
    return df.where(hash_fraction(F.col(id_col)) < F.lit(float(rate)))


def sample_per_group(df: DataFrame, id_col: str, group_col: str,
                     k: int) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group ("take 1000 docs per
    language"), chosen deterministically: rows rank by md5(id) within
    their group, lowest k win.  A hash-ranked reservoir — stable across
    runs/partitionings/engines, and uniform because the hash order is
    independent of any data order.

    One shuffle (window partition by group); at 100 TB prefer this over
    ``RDD.takeSample``-style reservoirs — it is a plain window top-k that
    AQE/codegen handle, with no driver-side state."""
    from pyspark.sql import Window
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k).drop("_rk"))


def stratified_sample(df: DataFrame, id_col: str, group_col: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Per-group sampling rates (e.g. downweight boilerplate languages,
    keep all rare ones): ``rates`` maps group value → keep rate; groups
    not listed use ``default_rate``.

    The rate lookup is a literal CASE chain (broadcast-free: rates are
    config, not data).  Decision = id-hash fraction < group rate."""
    expr = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        expr = F.when(F.col(group_col) == F.lit(k),
                      F.lit(float(v))).otherwise(expr)
    return df.where(hash_fraction(F.col(id_col)) < expr)


def dataset_split(df: DataFrame, id_col: str,
                  fractions: dict[str, float]) -> DataFrame:
    """Deterministic train/val/test assignment: the id-hash fraction
    falls into cumulative ``fractions`` intervals (insertion order), so
    the split is a pure function of the id — stable across runs,
    partitionings, engines and INCREMENTAL ingestion (a new document
    lands in its split without reshuffling old ones, which a
    randomSplit cannot guarantee).  Fractions must sum to ~1.

    Adds a ``split`` column; zero shuffles — the assignment is a scan
    expression, and a filter on ``split`` prunes at the scan.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    frac = hash_fraction(F.col(id_col))
    expr = F.lit(None).cast("string")
    cum = 0.0
    # build the CASE from the LAST interval backward so the first
    # interval ends up outermost
    bounds = []
    for name, f in fractions.items():
        cum += f
        bounds.append((name, cum))
    for name, hi in reversed(bounds):
        expr = F.when(frac < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, keep_key: bool = False) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows, deterministic:
    Efraimidis–Spirakis A-ES — each row draws a uniform ``u`` from its
    id hash and ranks by ``u^(1/w)``; the top-k by that key are a true
    weighted sample (selection probability ∝ weight, no replacement).

    Implemented on the monotone-equivalent key ``ln(u)/w`` (avoids the
    pow underflow for large weights), with ``u = (h+1)/2^32 ∈ (0,1]`` so
    ln never sees 0.  The key is ROUNDED to 9 decimals before ranking
    with an id tiebreak: IEEE division/ln agree across engines to ~1
    ulp, so the rounded key + tiebreak makes the selected set
    engine-replayable (same contract as the round-6 cosine ranking).
    Rows with non-positive weight never qualify.

    Scale shape: a codegen projection + ONE global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort, no
    shuffle of non-winners).  Stable across runs, partitionings, and
    engines — ``df.sample`` is none of those.

    Output: the selected rows with ``df``'s schema unchanged;
    ``keep_key=True`` additionally keeps the ``_aes_key`` ranking
    column (for audits/oracles that replay the selection).
    """
    h = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("long") + F.lit(1)) / F.lit(_DENOM)
    key = F.round(F.log(h) / F.col(weight_col), 9)
    out = (df.where(F.col(weight_col) > 0)
           .withColumn("_aes_key", key)
           .orderBy(F.col("_aes_key").desc(), F.col(id_col).asc())
           .limit(k))
    return out if keep_key else out.drop("_aes_key")
