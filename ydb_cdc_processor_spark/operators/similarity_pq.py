"""Product-quantized ANN — Arrow-vectorized encode, Catalyst ADC.

Split out of similarity.py because this operator deliberately crosses
into Pandas-UDF territory: PQ encoding evaluates |corpus| · m_sub ·
n_codes tiny (dim/m_sub-wide) dot products, a shape Catalyst
expressions price badly in BOTH directions — zip_with/aggregate folds
are CodegenFallback (interpreted per row: 56 s at sf0.1 for m=16,
K=64), and unrolling the dots into explicit component arithmetic
produces a ~12k-node expression tree whose py4j CONSTRUCTION alone
costs ~60 s before a single row moves (measured; plus ~15 s of codegen
compile per run).  One numpy matmul per Arrow batch per subspace does
the identical math in milliseconds — exactly the "drop to Pandas UDFs
when the built-ins genuinely can't express it" case the build brief
carves out.  Candidate scoring, ranking, broadcasts, and the IVF cell
pruning of the composed variant stay pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.partitioning import ensure_min_partitions
from ydb_cdc_processor_spark.functions.vector import as_double_array, dot, norm


def _round6_half_away(x):
    """round(x, 6) with HALF-AWAY-FROM-ZERO ties on the BINARY value —
    bit-identical to DuckDB's ``round()`` (``std::round(x*1e6)/1e6``),
    which is the equivalence the PQ oracles rely on.  numpy's own
    ``np.round`` is banker's (half-even) and would diverge on exact
    .5e-6 boundaries.  Spark's ``F.round`` (BigDecimal HALF_UP on the
    shortest DECIMAL representation) agrees except on adversarial
    edges where the binary product x*1e6 is an exact .5 tie while the
    decimal repr is not (e.g. 0.6152704999999999 → binary 615270.5
    rounds up here and in DuckDB, down in Spark) — pinned by
    test_round6_half_away_matches_duckdb_round; inner products of
    md5-derived doubles never land there in practice, which is why the
    F.round calls elsewhere in this module also hash-match."""
    import numpy as np

    return np.where(x >= 0,
                    np.floor(x * 1e6 + 0.5),
                    np.ceil(x * 1e6 - 0.5)) / 1e6


def _unit(df: DataFrame, src_id: str, out_id: str, vec_col: str,
          keep: list[str] | None = None) -> DataFrame:
    """(out_id, [keep...], _u) with ``_u`` the L2-normalized vector —
    cosine over ``_u`` is a plain inner product."""
    return (df.select(F.col(src_id).alias(out_id), *(keep or []),
                      as_double_array(vec_col).alias("_v"))
            .withColumn("_n", norm(F.col("_v")))
            .select(out_id, *(keep or []),
                    F.transform(F.col("_v"),
                                lambda x: x / F.col("_n")).alias("_u")))


def _train_codebook(corpus_unit: DataFrame, id_out: str, n_codes: int,
                    seed: int, m_sub: int, dsub: int):
    """Subspace codeword matrices from the md5-seeded sample pick
    (code j = 0-based rank in hash order — the IVF centroid rule);
    ``n_codes`` rows to the driver: bounded metadata, never data."""
    import numpy as np

    sample = (ensure_min_partitions(corpus_unit)
              .withColumn("_h", F.md5(F.concat_ws(
                  ":", F.col(id_out).cast("string"), F.lit(str(seed)))))
              .orderBy("_h").limit(n_codes)
              .select("_u").collect())
    cw = np.array([list(r["_u"]) for r in sample], dtype=np.float64)
    return [cw[:, m * dsub:(m + 1) * dsub] for m in range(m_sub)]


def _pq_encode(df_unit: DataFrame, C, id_out: str, id_type: str,
               m_sub: int, dsub: int,
               keep: list[tuple[str, str]] = ()) -> DataFrame:
    """``(id, [keep...], _q0.._q{m-1})`` codes — argmax of the rounded
    subspace inner product, np.argmax's first-maximum = the smallest-
    code tie-break the oracle's (s DESC, j ASC) rank uses.  One numpy
    matmul per subspace per Arrow batch (module docstring)."""
    def it(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            import numpy as np
            u = np.array(pdf["_u"].tolist(), dtype=np.float64)
            out = {id_out: pdf[id_out]}
            for name, _ in keep:
                out[name] = pdf[name]
            for m in range(m_sub):
                s = _round6_half_away(u[:, m * dsub:(m + 1) * dsub]
                                      @ C[m].T)
                out[f"_q{m}"] = np.argmax(s, axis=1).astype("int32")
            yield pd.DataFrame(out)

    keep_fields = "".join(f", {n} {t}" for n, t in keep)
    q_fields = ", ".join(f"_q{m} int" for m in range(m_sub))
    return df_unit.mapInPandas(
        it, schema=f"{id_out} {id_type}{keep_fields}, {q_fields}")


def _pq_tables(df_unit: DataFrame, C, id_out: str, id_type: str,
               m_sub: int, dsub: int) -> DataFrame:
    """``(id, _t0.._t{m-1})`` per-subspace ADC lookup arrays (rounded
    inner products against every codeword)."""
    def it(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            import numpy as np
            u = np.array(pdf["_u"].tolist(), dtype=np.float64)
            out = {id_out: pdf[id_out]}
            for m in range(m_sub):
                t = _round6_half_away(u[:, m * dsub:(m + 1) * dsub]
                                      @ C[m].T)
                out[f"_t{m}"] = list(t)
            yield pd.DataFrame(out)

    t_fields = ", ".join(f"_t{m} array<double>" for m in range(m_sub))
    return df_unit.mapInPandas(it, schema=f"{id_out} {id_type}, {t_fields}")


def _adc_topk(cand: DataFrame, m_sub: int, k: int) -> DataFrame:
    """Score candidates by the m-ordered sum of table lookups, round,
    rank per probe — pure Catalyst (element_at is codegen'd)."""
    ip = F.element_at(F.col("_t0"), F.col("_q0") + 1)
    for m in range(1, m_sub):
        ip = ip + F.element_at(F.col(f"_t{m}"), F.col(f"_q{m}") + 1)
    scored = cand.select("probe_id", "vec_id",
                         F.round(ip, 6).alias("pq_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("pq_sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k))


def _check_params(dim, m_sub, n_codes):
    if dim is None:
        raise ValueError("dim is required")
    if dim % m_sub != 0:
        raise ValueError("dim must be divisible by m_sub")
    if n_codes < 1:
        raise ValueError("n_codes must be >= 1")


def cosine_topk_pq(corpus: DataFrame, probes: DataFrame, k: int = 5,
                   m_sub: int = 4, n_codes: int = 8, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   probe_id_col: str = "probe_id",
                   dim: int | None = None) -> DataFrame:
    """Product-quantized (PQ) approximate top-k — the MEMORY-compressed
    ANN path: each L2-normalized vector is stored as ``m_sub`` small
    codes instead of ``dim`` floats, and a query scores a candidate
    with ``m_sub`` table lookups + adds instead of a ``dim``-wide dot
    product (Jégou et al. 2011, asymmetric distance computation).  At
    100 TB of embeddings this is the difference between the index
    fitting in cluster memory or not (m=16 6-bit codes = 96 bits vs 64
    doubles ≈ 42×); :func:`cosine_topk_ivf_pq` composes it with IVF
    cell pruning.

    Engine-replayable, same discipline as the IVF/LSH family: vectors
    are L2-normalized so cosine = plain inner product; the codebook is
    the md5-seeded sample pick; assignment maximizes the ROUNDED (6dp,
    half-away ties) subspace inner product with ties to the smallest
    code (a MIPS-flavored quantizer — only dot products anywhere); the
    ADC score is the m-ordered sum of per-subspace rounded lookup-table
    entries, rounded again before ranking.

    Plan shape: codebook = driver-side constant; encode = ONE corpus
    scan through Arrow-batched ``mapInPandas``; probes carry their
    lookup tables the same way and broadcast; candidate scoring is a
    BroadcastNestedLoopJoin of ``m_sub`` ``element_at`` lookups per
    pair, only k·|probes| rows surviving the per-probe rank window.

    Output: ``(probe_id, vec_id, pq_sim, rnk)`` — recall vs
    `cosine_topk` pinned by test_pq_recall_and_validation."""
    _check_params(dim, m_sub, n_codes)
    dsub = dim // m_sub
    cu = _unit(corpus, id_col, "vec_id", vec_col)
    C = _train_codebook(cu, "vec_id", n_codes, seed, m_sub, dsub)
    id_type = dict(corpus.dtypes)[id_col]
    probe_id_type = dict(probes.dtypes)[probe_id_col]
    enc = _pq_encode(ensure_min_partitions(cu), C, "vec_id", id_type,
                     m_sub, dsub)
    p = _pq_tables(_unit(probes, probe_id_col, "probe_id", vec_col),
                   C, "probe_id", probe_id_type, m_sub, dsub)
    cand = enc.crossJoin(F.broadcast(p)) \
              .where(F.col("vec_id") != F.col("probe_id"))
    return _adc_topk(cand, m_sub, k)


def cosine_topk_ivf_pq(corpus: DataFrame, probes: DataFrame, k: int = 5,
                       n_cells: int = 16, n_probe: int = 4,
                       m_sub: int = 16, n_codes: int = 64,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       probe_id_col: str = "probe_id",
                       dim: int | None = None) -> DataFrame:
    """IVF × PQ — the full memory-AND-compute-pruned ANN serving shape
    at 100 TB: the IVF coarse quantizer (the `cosine_topk_ivf` sampled-
    centroid pick, unchanged) restricts each probe's candidates to its
    ``n_probe`` nearest cells, and within those cells candidates are
    scored from their PQ codes by ADC table lookups instead of full
    dot products.  Candidate volume ∝ n_probe/n_cells of the corpus;
    candidate payload ∝ m_sub codes, not dim floats — together the
    classic IVFADC layout of the FAISS lineage, here as one
    declarative plan: broadcast centroids → cell argmax window →
    Arrow-batched encode (cell rides through the UDF) → cell equi-join
    against the broadcast probed cells → codegen'd lookups → per-probe
    rank.

    Determinism matches both parents exactly: cell assignment is the
    rounded RAW-vector cosine with cell-asc ties (bit-for-bit
    `cosine_topk_ivf`), codes/tables are the rounded normalized
    subspace inner products (bit-for-bit `cosine_topk_pq`), so the
    oracle is the two parents' CTEs joined on cell.

    Output: ``(probe_id, vec_id, pq_sim, rnk)``."""
    _check_params(dim, m_sub, n_codes)
    if n_cells < 1 or n_probe < 1:
        raise ValueError("n_cells and n_probe must be >= 1")
    dsub = dim // m_sub

    # coarse quantizer — identical pick + assignment to cosine_topk_ivf
    cent = (ensure_min_partitions(corpus)
            .withColumn("_h", F.md5(F.concat_ws(
                ":", F.col(id_col).cast("string"), F.lit(str(seed)))))
            .orderBy("_h").limit(n_cells)
            .select(F.col(id_col).alias("cell"),
                    as_double_array(vec_col).alias("_c"))
            .withColumn("_nc", norm(F.col("_c"))))

    def assign(df, out_id, rank_limit):
        base = (df.select(F.col(out_id).alias(out_id),
                          as_double_array(vec_col).alias("_av"))
                .withColumn("_an", norm(F.col("_av")))
                .crossJoin(F.broadcast(cent)))
        sim = dot(F.col("_av"), F.col("_c")) / (F.col("_an") * F.col("_nc"))
        w = Window.partitionBy(out_id).orderBy(
            F.round(sim, 6).desc(), F.col("cell").asc())
        return (base.withColumn("_cr", F.row_number().over(w))
                .where(F.col("_cr") <= rank_limit)
                .select(out_id, "cell"))

    cu = _unit(corpus, id_col, "vec_id", vec_col)
    C = _train_codebook(cu, "vec_id", n_codes, seed, m_sub, dsub)
    id_type = dict(corpus.dtypes)[id_col]
    probe_id_type = dict(probes.dtypes)[probe_id_col]

    c_cells = assign(corpus.select(F.col(id_col).alias("vec_id"),
                                   vec_col), "vec_id", 1)
    cu_cells = ensure_min_partitions(
        cu.join(c_cells, on="vec_id"))
    enc = _pq_encode(cu_cells, C, "vec_id", id_type, m_sub, dsub,
                     keep=[("cell", id_type)])

    p_cells = assign(probes.select(F.col(probe_id_col).alias("probe_id"),
                                   vec_col), "probe_id", n_probe)
    p_tabs = _pq_tables(_unit(probes, probe_id_col, "probe_id", vec_col),
                        C, "probe_id", probe_id_type, m_sub, dsub)
    p = p_cells.join(p_tabs, on="probe_id")

    cand = enc.join(F.broadcast(p), on="cell") \
              .where(F.col("vec_id") != F.col("probe_id"))
    return _adc_topk(cand, m_sub, k)
