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

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

#: warn when some interval would replicate into more bins than this —
#: the caller's (or auto-derived) bin width is far below the widest
#: interval and the explode is amplifying the shuffle
MAX_REPLICATION_WARN = 1000


def as_of_join(probe: DataFrame, build: DataFrame, keys: list[str],
               probe_ts: str = "ts", build_ts: str = "ts",
               payload: list[str] | None = None,
               suffix: str = "_asof") -> DataFrame:
    """Enrich each ``probe`` row with the latest ``build`` row at or
    before its timestamp, per key (backward as-of; ties — equal
    timestamps — match, like DuckDB/kdb ``ASOF JOIN ... >=``).

    Probe rows with no prior build row keep NULL payload.  Returns all
    probe columns + ``<payload><suffix>`` columns.

    The fill carries the matched build row as ONE struct (non-NULL even
    when its fields are NULL), so ``last(..., ignorenulls)`` skips only
    probe rows — a matched build row whose payload VALUE is NULL yields
    NULL, exactly as DuckDB's native ASOF does, instead of falling
    through to an older build row's value.
    """
    if payload is None:
        payload = [c for c in build.columns
                   if c not in keys and c != build_ts]
    if not payload:
        return probe
    out_payload = [f"{c}{suffix}" for c in payload]

    b = build.select(
        *keys,
        F.col(build_ts).alias("_t"),
        F.lit(1).alias("_is_build"),
        F.struct(*[F.col(c).alias(o)
                   for c, o in zip(payload, out_payload)]).alias("_asof_row"))
    p = probe.select(
        "*",
        F.col(probe_ts).alias("_t"),
        F.lit(0).alias("_is_build"),
        F.lit(None).cast(b.schema["_asof_row"].dataType).alias("_asof_row"))
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
        *[c for c in u.columns if c != "_asof_row"],
        F.last("_asof_row", ignorenulls=True).over(w).alias("_asof_row"))
    return (filled.where(F.col("_is_build") == 0)
            .select(*[c for c in filled.columns
                      if c not in ("_t", "_is_build", "_asof_row")],
                    *[F.col("_asof_row").getField(o).alias(o)
                      for o in out_payload]))


def range_join_binned(probe: DataFrame, intervals: DataFrame,
                      value_col: str, lo_col: str, hi_col: str,
                      bin_width: float | None = None) -> DataFrame:
    """Join each probe row to every interval with ``lo <= value < hi``
    via bin-replication + equi-join (the scalable range-join lowering).

    ``bin_width`` should be on the order of the TYPICAL interval width:
    too small multiplies interval replication, too large weakens the
    pre-filter.  When ``None`` it is derived as the MEDIAN interval
    width (``percentile_approx(hi - lo, 0.5)``) — one tiny aggregate
    over the (small) interval side; the median bounds the typical
    interval's replication to ~2 bins.  Either way a warning fires when
    the WIDEST interval would replicate into more than
    ``MAX_REPLICATION_WARN`` bins (explode amplification).  Returns
    probe columns + interval columns.
    """
    if bin_width is None:
        width = F.col(hi_col).cast("double") - F.col(lo_col).cast("double")
        st = intervals.select(
            F.percentile_approx(width, F.lit(0.5)).alias("p50"),
            F.max(width).alias("mx")).first()
        p50 = float(st["p50"] or 0.0)
        mx = float(st["mx"] or 0.0)
        # degenerate medians (point intervals) fall back to the widest
        # interval, then to 1.0 for an empty/all-point interval table
        bin_width = p50 if p50 > 0 else (mx if mx > 0 else 1.0)
        logger.info("range_join_binned: auto bin_width=%s "
                    "(median interval width; max width %s)", bin_width, mx)
        if mx / bin_width + 1 > MAX_REPLICATION_WARN:
            logger.warning(
                "range_join_binned: widest interval (%s) replicates into "
                "~%d bins at bin_width=%s — heavily skewed interval "
                "widths; consider splitting outlier intervals or passing "
                "an explicit bin_width", mx, int(mx / bin_width) + 1,
                bin_width)
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


def rolling_anomalies(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      tiebreak_col: str = "event_id",
                      window_rows: int = 20, min_points: int = 10,
                      z_threshold: float = 2.0) -> DataFrame:
    """Streaming-shaped anomaly detection: flag events whose value is a
    ``z_threshold``-sigma outlier against that key's TRAILING window of
    the previous ``window_rows`` events (the current row is excluded —
    an outlier must not dilute its own baseline).

    One window pass over a single hash partitioning by key: the frame
    aggregates (count, Σv, Σv²) all share the same sort, so Spark
    computes them in one physical Window operator — no self-join, no
    second shuffle.  Sums are routed through DECIMAL (exact, order-
    independent — see functions/aggregates.py) and the mean/variance
    arithmetic is plain IEEE on those exact sums, so any SQL engine
    evaluating the same expressions agrees bit-for-bit and the oracle
    can hash-match the z-scores.

    Variance uses the E[v²]−E[v]² form on exact sums (no cancellation
    hazard beyond float, guarded with greatest(·,0)); windows with
    fewer than ``min_points`` prior events or zero variance emit
    nothing.

    mean/z are emitted UNROUNDED: because every input double is
    bit-identical cross-engine (exact decimal sums), the IEEE
    expression graph reproduces the same doubles everywhere — whereas
    a final ``round(x, 4)`` DIVERGES when x sits on a half boundary
    (Java rounds the shortest decimal repr half-up, C libraries round
    the binary value), which a measured sf0.01 run actually hit.

    Output: ``(key, tiebreak, ts, value, baseline_n BIGINT,
    baseline_mean, zscore)``.
    """
    v = F.col(val_col)
    vdec = v.cast("decimal(18,6)")
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
         .rowsBetween(-window_rows, -1))
    c = F.count(v).over(w)
    s = F.sum(v.cast("decimal(38,6)")).over(w).cast("double")
    s2 = F.sum(vdec * vdec).over(w).cast("double")
    mean = s / c
    var = F.greatest((s2 - s * s / c) / (c - 1), F.lit(0.0))
    z = (v - mean) / F.sqrt(var)
    out = (events
           .select(F.col(key_col), F.col(tiebreak_col), F.col(ts_col), v,
                   c.alias("_c"), mean.alias("_mean"), var.alias("_var"),
                   z.alias("_z")))
    return (out
            .where((F.col("_c") >= min_points) & (F.col("_var") > 0)
                   & (F.abs(F.col("_z")) >= z_threshold))
            .select(key_col, tiebreak_col, ts_col, val_col,
                    F.col("_c").cast("long").alias("baseline_n"),
                    F.col("_mean").alias("baseline_mean"),
                    F.col("_z").alias("zscore")))


def resample_ffill(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", val_col: str = "value",
                   step: str = "1 hour",
                   tiebreak_col: str | None = None) -> DataFrame:
    """Resample an irregular per-key time series onto a regular grid
    with forward fill — the standard regularization step before
    windowed feature extraction or model training on event streams.

    Grid: per key, every ``step`` from the key's first observation
    (truncated to the step unit) through its last.  Each grid point
    carries the value of the latest observation at or before it
    (as-of backward semantics — the union-sort-window as-of join, ONE
    key shuffle, no range join).  Duplicate-timestamp observations are
    collapsed first (largest ``tiebreak_col`` wins, or largest value if
    no tiebreak given) so the fill is deterministic.

    The grid explode is per-key-span/step rows — linear in observed
    time span, never a cross join against a global calendar.

    Output: ``(key_col, grid_ts, value)``; leading grid points before
    the first observation cannot exist by construction (the grid starts
    AT the first observation's truncated step).
    """
    unit = step.split()[-1].rstrip("s")
    tb = tiebreak_col or val_col
    build = (events
             .groupBy(key_col, ts_col)
             .agg(F.max_by(F.col(val_col), F.col(tb)).alias(val_col)))
    spans = events.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_mn"),
        F.max(ts_col).alias("_mx"))
    grid = (spans
            .select(F.col(key_col),
                    F.explode_outer(F.expr(
                        f"sequence(_mn, _mx, interval {step})"))
                     .alias("grid_ts"))
            .where(F.col("grid_ts").isNotNull()))
    out = as_of_join(grid, build, keys=[key_col],
                     probe_ts="grid_ts", build_ts=ts_col,
                     payload=[val_col], suffix="")
    return out.select(key_col, "grid_ts", F.col(val_col).alias("value"))
