"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer at
scale, but its estimate depends on an engine-internal hash — it cannot
be replayed by another engine, so a correctness oracle can only check it
loosely.  The KMV (k-minimum-values) sketch here is built from ``md5``
fractions instead: every intermediate (the k minima, the k-th fraction,
the estimate) is a pure function of the input values, reproducible
bit-for-bit by any engine with md5 — the same construction as the
MinHash family in operators/dedup.py.

KMV (Bar-Yossef et al. 2002, the "distinct elements in a stream"
bottom-k estimator): hash every distinct value to a uniform [0,1)
fraction; if the k-th smallest fraction is f, the universe holds about
``(k-1)/f`` distinct values (k minima evenly spaced ≈ f/k apart).

HLL (Flajolet et al. 2007): hash each value, route it to one of
``m = 2^p`` registers by its first ``p`` bits, and keep per register the
maximum "position of the first 1-bit" (rho) seen in the remaining bits;
the harmonic mean of ``2^-M_j`` estimates the cardinality.  Unlike KMV
(one global bottom-k), the register table is a FIXED-SIZE, max-mergeable
state per GROUP — the per-group distinct-count shape ("distinct n-grams
per language over 100 TB") where a bottom-k per group would shuffle
vocabulary-sized data.  It is insert-only (max() cannot retract); the
exact, retractable counterpart is operators/distinct_view.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.sampling import hash_fraction

#: scaled 2^-rho terms: rho ∈ [1,49] → integer 2^(49-rho); exact in
#: BIGINT for p ≤ 12 (absent registers contribute _RHO_SCALE = 2^49
#: each, so the worst case is m·2^49 = 2^61 < 2^63).
_RHO_SCALE_POW = 49
_RHO_SCALE = 1 << _RHO_SCALE_POW


def hll_alpha_num(p: int) -> float:
    """The HLL estimator's constant numerator ``alpha_m · m² · 2^49``,
    as ONE Python float so both engines of a correctness harness can
    divide the identical double by the identical exact-integer register
    sum (one correctly-rounded IEEE division each — bit-reproducible,
    unlike re-deriving alpha through ``ln``/``pow`` in each engine)."""
    m = 1 << p
    if p >= 7:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif p == 6:
        alpha = 0.709
    elif p == 5:
        alpha = 0.697
    else:
        alpha = 0.673
    return alpha * m * m * float(_RHO_SCALE)


def hll_grouped(df: DataFrame, group_cols: list[str], col: str,
                p: int = 8) -> DataFrame:
    """Per-group HLL distinct-count estimate — one row per group:
    ``(*group_cols, m INT, v_zero INT, s_scaled BIGINT, est_hll DOUBLE)``.

    ``s_scaled = Σ_j 2^(49 - M_j)`` over all m registers (absent
    registers contribute ``2^49``) is the sketch's EXACT-integer digest:
    two engines replaying the same md5 math land on the same BIGINT, and
    ``est_hll`` is one rounded division of :func:`hll_alpha_num` by it.
    ``v_zero`` (registers never hit) is emitted so consumers can apply
    the standard linear-counting small-range correction
    ``m·ln(m/v_zero)`` themselves — it is NOT folded into ``est_hll``
    because ``ln`` is not correctly-rounded across libms and would break
    bit-replayability.

    Plan shape (100 TB): two map-side-combined hash aggregations — the
    first exchange carries at most ``|groups|·m`` register rows
    (duplicates of a (group, register, rho) collapse in the partial
    max), the second ``|groups|`` rows.  No sort, no window, no Python.

    ``p`` must be a multiple of 4 in [4, 12] (register index = first
    p/4 hex chars of md5; rho from the next 48 bits).
    """
    regs = hll_registers(df, group_cols, col, p)
    return hll_estimate(regs, group_cols, p)


def hll_registers(df: DataFrame, group_cols: list[str], col: str,
                  p: int = 8) -> DataFrame:
    """The max-rolled register table ``(*group_cols, _j INT, _M INT)``
    for one input — the MERGEABLE half of :func:`hll_grouped` (register
    max is associative/commutative/idempotent, so tables from any
    partition of the input combine by ``max(_M)`` per ``(group, _j)``
    — the property operators/hll_view.py maintains incrementally)."""
    if p % 4 != 0 or not 4 <= p <= 12:
        raise ValueError("p must be a multiple of 4 in [4, 12]")
    hex_j = p // 4
    h = F.md5(F.col(col).cast("string"))
    j = F.conv(F.substring(h, 1, hex_j), 16, 10).cast("int")
    w = F.conv(F.substring(h, hex_j + 1, 12), 16, 10).cast("long")
    # rho = leading zeros of the 48-bit suffix + 1; w = 0 → all 48 zero
    rho = (F.when(w == F.lit(0), F.lit(_RHO_SCALE_POW))
           .otherwise(F.lit(_RHO_SCALE_POW) - F.length(F.bin(w))))
    return (df.select(*group_cols, j.alias("_j"), rho.alias("_rho"))
            .groupBy(*group_cols, "_j")
            .agg(F.max("_rho").alias("_M")))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """The estimate rollup over a register table — the serving half of
    :func:`hll_grouped` (one row per group, same output contract)."""
    m = 1 << p
    num = F.lit(hll_alpha_num(p))
    return (regs.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("_n_regs"),
                 # shiftleft with a COLUMN shift count: the python
                 # wrapper only takes a literal numBits, the SQL
                 # function takes both
                 F.sum(F.expr(
                     f"shiftleft(cast(1 as bigint), {_RHO_SCALE_POW} - _M)"))
                  .alias("_s_present"))
            .select(*group_cols, F.lit(m).alias("m"),
                    (F.lit(m) - F.col("_n_regs")).cast("int")
                    .alias("v_zero"),
                    (F.col("_s_present")
                     + (F.lit(m) - F.col("_n_regs")).cast("long")
                     * F.lit(_RHO_SCALE)).alias("s_scaled"))
            .withColumn("est_hll",
                        F.round(num / F.col("s_scaled").cast("double"), 3)))


def kmv_distinct(values: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate of ``values[col]`` — one output row:
    ``(k INT, n_minima BIGINT, kth_frac DOUBLE, est_distinct DOUBLE)``.

    If fewer than ``k`` distinct fractions exist the exact count is
    returned as the estimate (the sketch degenerates to exact below k —
    standard KMV behavior).

    Plan shape (100 TB): map-side partial distinct collapses each
    partition to its local value set before the exchange, so the
    shuffle carries vocabulary-sized data, not corpus-sized; the
    ordered ``limit(k)`` lowers to TakeOrderedAndProject — per-partition
    bottom-k then a driver merge of (#partitions × k) fractions — never
    a global sort.  The estimate math runs on k rows.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    fracs = (values
             .select(hash_fraction(F.col(col)).alias("frac"))
             .distinct()
             .orderBy(F.col("frac").asc())
             .limit(k))
    return (fracs.agg(F.count(F.lit(1)).alias("n_minima"),
                      F.max("frac").alias("_kth"))
            .select(F.lit(k).alias("k"),
                    F.col("n_minima"),
                    F.round(F.col("_kth"), 6).alias("kth_frac"),
                    F.round(F.when(F.col("n_minima") < k, F.col("n_minima"))
                             .otherwise(F.lit(k - 1) / F.col("_kth")), 3)
                     .alias("est_distinct")))


def kmv_set_ops(a: DataFrame, b: DataFrame, col: str,
                k: int = 256) -> DataFrame:
    """Theta-sketch set operations over two KMV sketches — distinct
    union / intersection / difference ESTIMATES from two bottom-k
    samples, never a scan of either full set.  One output row:
    ``(k INT, theta DOUBLE, est_union, est_intersection, est_only_a,
    est_only_b DOUBLE, jaccard DOUBLE)``.

    The 100 TB use case is cross-corpus overlap accounting: "how many
    distinct 8-grams / user ids / URLs do these two crawls share?" —
    e.g. a train/benchmark contamination ESTIMATE before paying for the
    exact decontamination join.  Each side collapses to ≤ k hash
    fractions (the same map-side-combined distinct + bottom-k plan as
    :func:`kmv_distinct`), so sketching cost is two scans and the set
    algebra runs on ≤ 2k rows.

    Math (Dasgupta et al., the theta-sketch framework): with
    ``theta = min`` over sides of (1.0 when the side is exact — fewer
    than k distinct — else its k-th smallest fraction), every side's
    retained fractions ``< theta`` are a uniform theta-sample of that
    side, so ``|retained| / theta`` estimates any composed set's
    cardinality: union = retained(a) ∪ retained(b), intersection =
    both-sided, differences = single-sided.  ``jaccard`` is the
    retained-set ratio (the estimate thetas cancel).  When BOTH sides
    are exact the estimates are exact counts.  All intermediates are
    md5-deterministic → bit-replayable by the SQL oracle.

    Plan note: the retained-set combine is a FULL OUTER join of the two
    ≤ k-row sketches — Spark has no broadcast strategy for keyed full
    outer, so the audit shows one SortMergeJoin over ≤ 2k rows by
    design (sketch-sized, not data-sized).
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    def sketch(side: DataFrame):
        return (side.select(hash_fraction(F.col(col)).alias("frac"))
                .distinct().orderBy(F.col("frac").asc()).limit(k))

    fa, fb = sketch(a), sketch(b)
    theta_of = lambda f: f.agg(  # noqa: E731
        F.when(F.count(F.lit(1)) < k, F.lit(1.0))
         .otherwise(F.max("frac")).alias("theta"))
    theta = (theta_of(fa).crossJoin(theta_of(fb).select(
                 F.col("theta").alias("_tb")))
             .select(F.least("theta", "_tb").alias("theta")))
    # retained = fractions strictly below the combined theta, flagged by
    # side; the crossJoin broadcasts ONE row against ≤ 2k rows
    flagged = (fa.select("frac", F.lit(1).alias("_a"))
               .join(fb.select("frac", F.lit(1).alias("_b")),
                     on="frac", how="full_outer")
               .crossJoin(F.broadcast(theta))
               .where(F.col("frac") < F.col("theta")))
    agg = flagged.groupBy("theta").agg(
        F.count(F.lit(1)).alias("_n_union"),
        F.sum(F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(),
                     1).otherwise(0)).alias("_n_both"),
        F.sum(F.when(F.col("_a").isNotNull() & F.col("_b").isNull(),
                     1).otherwise(0)).alias("_n_only_a"),
        F.sum(F.when(F.col("_a").isNull() & F.col("_b").isNotNull(),
                     1).otherwise(0)).alias("_n_only_b"))
    return agg.select(
        F.lit(k).alias("k"),
        F.round("theta", 6).alias("theta"),
        F.round(F.col("_n_union") / F.col("theta"), 3).alias("est_union"),
        F.round(F.col("_n_both") / F.col("theta"), 3)
         .alias("est_intersection"),
        F.round(F.col("_n_only_a") / F.col("theta"), 3).alias("est_only_a"),
        F.round(F.col("_n_only_b") / F.col("theta"), 3).alias("est_only_b"),
        F.round(F.col("_n_both") / F.col("_n_union"), 6).alias("jaccard"))


def cms_top_terms(values: DataFrame, col: str, depth: int = 4,
                  width_hex: int = 2, k: int = 20) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    top-``k`` values of ``values[col]`` by their CMS frequency
    ESTIMATE — ``(term, est_count BIGINT, rnk INT)``.

    The sketch is ``depth`` counter rows of ``width = 16^width_hex``
    buckets; row ``d`` buckets a value by the first ``width_hex`` hex
    chars of ``md5(d || ':' || value)`` (the bucket stays a hex STRING
    — no integer conversion, so any md5-capable engine replays it),
    and a value's estimate is the MIN of its ``depth`` counters.
    CMS guarantees est ≥ true count (collisions only ADD), with
    overshoot ≤ ε·N at probability 1-δ for width = e/ε, depth = ln(1/δ)
    — so the top-k BY ESTIMATE is a superset-biased view of the true
    heavy hitters, the standard trade.

    Plan shape (100 TB): the corpus touches ONE aggregation —
    corpus×depth rows collapse map-side to ≤ depth·width partials per
    partition, so the exchange carries ~|partitions|·depth·width rows,
    never data.  Estimates touch only the DISTINCT value set
    (vocabulary-sized) joined against the broadcast depth·width counter
    table; the final top-k is one rank window over vocabulary rows.
    The counter table is MERGEABLE state (cell-wise sum), the property
    that lets sketches of shards/days combine without re-scanning.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if not 1 <= width_hex <= 8:
        raise ValueError("width_hex must be in [1, 8]")
    from pyspark.sql import Window

    ds = F.array([F.lit(i) for i in range(depth)])
    vals = values.select(F.col(col).cast("string").alias("term"))
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("_d").cast("string"),
                          F.col("term"))), 1, width_hex)
    counters = (vals
                .select("term", F.explode(ds).alias("_d"))
                .groupBy("_d", bucket.alias("_b"))
                .agg(F.count(F.lit(1)).alias("_c")))
    vocab = vals.distinct()
    est = (vocab
           .select("term", F.explode(ds).alias("_d"))
           .withColumn("_b", bucket)
           .join(F.broadcast(counters), on=["_d", "_b"])
           .groupBy("term")
           .agg(F.min("_c").alias("est_count")))
    w = Window.orderBy(F.col("est_count").desc(), F.col("term").asc())
    return (est.withColumn("rnk", F.row_number().over(w).cast("int"))
            .where(F.col("rnk") <= k))


def dyadic_node_stream(rows: DataFrame, col: str,
                       levels: int = 16) -> DataFrame:
    """One ``node`` string ``"l:(v >> l)"`` per row per level — the
    dyadic decomposition UPDATE stream (Cormode & Muthukrishnan 2005
    §4.2: a count-min over these nodes answers range/rank queries).
    Values clip to ``[0, 2^levels)`` (the top node absorbs the tail —
    ranks above the clip merge, documented).  Levels run 0..``levels``
    INCLUSIVE: the root node ``"levels:0"`` counts every row, so a
    probe at/past the top (x ≥ 2^levels, which decomposes to the root
    alone) estimates N.  Feed this through :func:`cms_top_terms`'s
    counter build or an ``operators/cms_view.CmsView``
    (value_col="node") and rank queries become ≤ ``levels+1`` point
    estimates."""
    if not 1 <= levels <= 32:
        raise ValueError("levels must be in [1, 32]")
    v = F.least(F.greatest(F.col(col).cast("long"), F.lit(0)),
                F.lit((1 << levels) - 1))
    ls = F.array([F.lit(i) for i in range(levels + 1)])
    return (rows.select(v.alias("_v"), F.explode(ls).alias("_l"))
            .select(F.concat_ws(
                ":", F.col("_l").cast("string"),
                F.floor(F.col("_v") / F.pow(F.lit(2.0), F.col("_l")))
                 .cast("long").cast("string")).alias("node")))


def dyadic_probe_nodes(probes: DataFrame, col: str,
                       levels: int = 16) -> DataFrame:
    """The ≤ ``levels`` node strings whose counter sum estimates
    ``rank(x) = |{v : v < x}|`` — one ``(x, node)`` row per SET bit of
    ``x``: bit ``l`` contributes the level-``l`` node
    ``(x >> (l+1)) << 1`` (the canonical dyadic cover of ``[0, x)``).
    Pure integer arithmetic, identical in any SQL engine.  Output rows
    carry the CALLER's ``x``; the decomposition itself runs on ``x``
    clipped to ``[0, 2^levels]`` (a probe at or past the top estimates
    rank-below-everything, i.e. N — x = 2^levels decomposes to the
    single root node)."""
    if not 1 <= levels <= 32:
        raise ValueError("levels must be in [1, 32]")
    xc = F.least(F.greatest(F.col(col).cast("long"), F.lit(0)),
                 F.lit(1 << levels))
    ls = F.array([F.lit(i) for i in range(levels + 1)])
    base = (probes.select(F.col(col).cast("long").alias("x"),
                          xc.alias("_xc"), F.explode(ls).alias("_l"))
            .withColumn("_hi", F.floor(
                F.col("_xc") / F.pow(F.lit(2.0), F.col("_l") + 1))
                .cast("long")))
    bit = (F.floor(F.col("_xc") / F.pow(F.lit(2.0), F.col("_l")))
           .cast("long") % 2)
    return (base.where(bit == 1)
            .select("x",
                    F.concat_ws(":", F.col("_l").cast("string"),
                                (F.col("_hi") * 2).cast("string"))
                    .alias("node")))


def dyadic_rank_estimates(values: DataFrame, col: str,
                          probes: DataFrame, probe_col: str,
                          levels: int = 16, depth: int = 4,
                          width_hex: int = 2) -> DataFrame:
    """One-shot rank/quantile sketch: ``(x, est_rank BIGINT)`` per
    probe value — ``est_rank ≥ true rank`` (CMS overestimates; each
    rank is ≤ ``levels`` point estimates, so overshoot ≤
    levels·ε·N·levels in the classic bound).  The UPDATE side is one
    map-side-combined pass over values×levels; the counter table
    (depth·width cells) broadcasts; probes decompose to ≤ levels nodes
    each.  State is FIXED-size and mergeable (cell-wise sum) —
    retractable too when maintained via CmsView (linear counters),
    which is the same construction with old-image −1s."""
    nodes = dyadic_node_stream(values, col, levels)
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("_d").cast("string"),
                          F.col("node"))), 1, width_hex)
    ds = F.array([F.lit(i) for i in range(depth)])
    counters = (nodes.select("node", F.explode(ds).alias("_d"))
                .groupBy("_d", bucket.alias("_b"))
                .agg(F.count(F.lit(1)).alias("_c")))
    pn = (dyadic_probe_nodes(probes, probe_col, levels)
          .select("x", "node", F.explode(ds).alias("_d"))
          .withColumn("_b", bucket))
    per_node = (pn.join(F.broadcast(counters), on=["_d", "_b"],
                        how="left")
                .groupBy("x", "node")
                .agg(F.min(F.coalesce(F.col("_c"), F.lit(0)))
                     .alias("_est")))
    probe_xs = probes.select(
        F.col(probe_col).cast("long").alias("x")).distinct()
    return (probe_xs.join(per_node, on="x", how="left")
            .groupBy("x")
            .agg(F.coalesce(F.sum("_est"), F.lit(0)).cast("long")
                 .alias("est_rank")))


def dyadic_quantiles(values: DataFrame, col: str,
                     qs: list[float], levels: int = 16,
                     depth: int = 4,
                     width_hex: int = 2) -> list[tuple[float, int]]:
    """Quantile extraction from the dyadic-CM sketch: the smallest ``x``
    with ``est_rank(x) ≥ q·N`` per requested ``q`` — ``[(q, x), ...]``.

    ONE bounded collect (the ``depth·16^width_hex`` counter table —
    sketch state, never data; the same driver-metadata contract as the
    PQ codebook), then pure-Python binary searches: each probe costs
    ≤ ``levels+1`` dict lookups, so the whole extraction is O(|qs| ·
    levels²) driver arithmetic.  Because est_rank ≥ true rank and is
    monotone in x, the returned x is ≤ the true q-quantile's position
    — a one-sided estimate, like every CMS answer.  N is read from the
    root node's estimate (exact when the root cells are collision-free,
    which depth rows make near-certain)."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    nodes = dyadic_node_stream(values, col, levels)
    ds = F.array([F.lit(i) for i in range(depth)])
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("_d").cast("string"),
                          F.col("node"))), 1, width_hex)
    counters = {(r["_d"], r["_b"]): r["_c"] for r in
                (nodes.select("node", F.explode(ds).alias("_d"))
                 .groupBy("_d", bucket.alias("_b"))
                 .agg(F.count(F.lit(1)).alias("_c")).collect())}

    import hashlib

    def est_node(node: str) -> int:
        return min(counters.get(
            (d, hashlib.md5(f"{d}:{node}".encode()).hexdigest()
             [:width_hex]), 0) for d in range(depth))

    def est_rank(x: int) -> int:
        x = min(max(x, 0), 1 << levels)
        total, l = 0, 0
        while x:
            if x & 1:
                total += est_node(f"{l}:{(x >> 1) << 1}")
            x >>= 1
            l += 1
        return total

    n = est_node(f"{levels}:0")
    out = []
    for q in qs:
        target = q * n
        lo, hi = 0, 1 << levels     # smallest x with est_rank(x) >= target
        while lo < hi:
            mid = (lo + hi) // 2
            if est_rank(mid) >= target:
                hi = mid
            else:
                lo = mid + 1
        # rank counts values STRICTLY below x, so the q-quantile VALUE
        # is x-1 (the largest value still inside the first ceil(q·N))
        out.append((q, max(lo - 1, 0)))
    return out
