"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are classic "custom operator" cases (the reference engine family's
servers ship them natively; Spark does not) — implemented here as
compositions of existing DataFrame ops, never per-row Python:

- **as-of join**: for each probe row, the most recent build row with
  ``build.ts <= probe.ts`` per key.  The naive formulation is a range
  join + per-key argmax (quadratic per key); the scalable one is the
  UNION-SORT trick: tag both inputs, union, ONE shuffle on the key, one
  per-key sort by (ts, tag), and a running ``last(value, ignorenulls)``
  window — O(n log n) per key, no range join at all.  This is the
  standard distributed as-of (the same shape kdb/Flink temporal joins
  lower to).

- **range join**: probe value ∈ [lo, hi) against an interval table.  A
  plain theta-join is a cross product; the scalable form BINS both
  sides: probe rows get ``bin = floor(v / w)``, interval rows replicate
  to every bin they overlap (``sequence(floor(lo/w), floor(hi/w))`` →
  explode), then an EQUI-join on bin + exact predicate refine.  Shuffle
  carries |probe| + Σ interval-spans/w rows — linear for bounded-width
  intervals, and Catalyst runs the refine inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(probe: DataFrame, build: DataFrame, keys: list[str],
               probe_ts: str = "ts", build_ts: str = "ts",
               payload: list[str] | None = None,
               suffix: str = "_asof") -> DataFrame:
    """Enrich each ``probe`` row with the latest ``build`` row at or
    before its timestamp, per key (backward as-of; ties — equal
    timestamps — match, like DuckDB/kdb ``ASOF JOIN ... >=``).

    Probe rows with no prior build row keep NULL payload.  Returns all
    probe columns + ``<payload><suffix>`` columns.
    """
    if payload is None:
        payload = [c for c in build.columns
                   if c not in keys and c != build_ts]
    out_payload = [f"{c}{suffix}" for c in payload]

    b = build.select(
        *keys,
        F.col(build_ts).alias("_t"),
        F.lit(1).alias("_is_build"),
        *[F.col(c).alias(o) for c, o in zip(payload, out_payload)])
    p = probe.select(
        "*",
        F.col(probe_ts).alias("_t"),
        F.lit(0).alias("_is_build"),
        *[F.lit(None).cast(b.schema[o].dataType).alias(o)
          for o in out_payload])
    # align schemas: build rows carry NULL for the probe-only columns
    probe_only = [c for c in p.columns if c not in b.columns]
    b = b.select(
        *[F.lit(None).cast(p.schema[c].dataType).alias(c)
          if c in probe_only else F.col(c) for c in p.columns])

    u = p.unionByName(b)
    # ONE shuffle (partitionBy keys) + per-key sort; at equal _t the
    # build row sorts FIRST (desc _is_build) so ts == build ts matches
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_t").asc(), F.col("_is_build").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *[c for c in u.columns if c not in out_payload],
        *[F.last(o, ignorenulls=True).over(w).alias(o)
          for o in out_payload])
    return (filled.where(F.col("_is_build") == 0)
            .drop("_t", "_is_build"))


def range_join_binned(probe: DataFrame, intervals: DataFrame,
                      value_col: str, lo_col: str, hi_col: str,
                      bin_width: float) -> DataFrame:
    """Join each probe row to every interval with ``lo <= value < hi``
    via bin-replication + equi-join (the scalable range-join lowering).

    ``bin_width`` should be on the order of the TYPICAL interval width:
    too small multiplies interval replication, too large weakens the
    pre-filter.  Returns probe columns + interval columns.
    """
    pb = probe.withColumn(
        "_bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
            F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"))))
    joined = pb.join(iv, on="_bin").where(
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)))
    return joined.drop("_bin")
