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
carves out.  Candidate scoring, ranking, and the broadcast stay pure
Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.partitioning import ensure_min_partitions
from ydb_cdc_processor_spark.functions.vector import as_double_array, norm


def _round6_half_away(x):
    """round(x, 6) with HALF-AWAY-FROM-ZERO ties — what Spark's
    ``F.round`` (BigDecimal HALF_UP) and DuckDB's ``round()`` both do;
    numpy's own ``np.round`` is banker's (half-even) and would diverge
    on exact .5e-6 boundaries."""
    import numpy as np

    return np.where(x >= 0,
                    np.floor(x * 1e6 + 0.5),
                    np.ceil(x * 1e6 - 0.5)) / 1e6


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
    doubles ≈ 42×), and it COMPOSES with IVF (`cosine_topk_ivf` prunes
    candidates to probed cells; PQ shrinks what each cell stores —
    this function demonstrates the ADC scoring half on the full
    corpus).

    Engine-replayable, same discipline as the IVF/LSH family: vectors
    are L2-normalized so cosine = plain inner product; the codebook is
    the md5-seeded sample pick (code j = 0-based rank in hash order,
    subspace m's codeword = the sample's m-th slice); assignment
    maximizes the ROUNDED (6dp, half-away ties) subspace inner product
    with ties to the smallest code (a MIPS-flavored quantizer — only
    dot products anywhere); the ADC score is the m-ordered sum of
    per-subspace rounded lookup-table entries, rounded again before
    ranking.

    Plan shape: codebook = driver-side constant (``n_codes`` rows,
    bounded metadata collect); encode = ONE corpus scan through an
    Arrow-batched ``mapInPandas`` (one numpy matmul per subspace per
    batch — see module docstring for why not Catalyst expressions);
    probes carry their lookup tables the same way and broadcast;
    candidate scoring is a BroadcastNestedLoopJoin evaluating
    ``m_sub`` ``element_at`` lookups per pair, only k·|probes| rows
    surviving the per-probe rank window.

    Output: ``(probe_id, vec_id, pq_sim, rnk)`` — ``pq_sim`` is the
    quantized cosine (approximation error ∝ subspace quantization
    error; recall vs `cosine_topk` pinned by
    test_pq_recall_and_validation)."""
    import numpy as np

    if dim is None:
        raise ValueError("dim is required")
    if dim % m_sub != 0:
        raise ValueError("dim must be divisible by m_sub")
    if n_codes < 1:
        raise ValueError("n_codes must be >= 1")
    dsub = dim // m_sub

    def unit(df, src_id, out_id):
        return (df.select(F.col(src_id).alias(out_id),
                          as_double_array(vec_col).alias("_v"))
                .withColumn("_n", norm(F.col("_v")))
                .select(out_id,
                        F.transform(F.col("_v"),
                                    lambda x: x / F.col("_n")).alias("_u")))

    # codebook: md5-seeded sample of NORMALIZED corpus vectors, code j =
    # 0-based rank in hash order (the IVF centroid pick rule); n_codes
    # rows to the driver — bounded metadata, never data rows
    sample = (ensure_min_partitions(unit(corpus, id_col, "vec_id"))
              .withColumn("_h", F.md5(F.concat_ws(
                  ":", F.col("vec_id").cast("string"), F.lit(str(seed)))))
              .orderBy("_h").limit(n_codes)
              .select("_u").collect())
    # C[m]: (n_codes × dsub) codeword matrix for subspace m
    cw = np.array([list(r["_u"]) for r in sample], dtype=np.float64)
    n_cb = cw.shape[0]
    C = [cw[:, m * dsub:(m + 1) * dsub] for m in range(m_sub)]

    id_type = dict(corpus.dtypes)[id_col]
    probe_id_type = dict(probes.dtypes)[probe_id_col]

    def encode_iter(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            u = np.array(pdf["_u"].tolist(), dtype=np.float64)
            out = {"vec_id": pdf["vec_id"]}
            for m in range(m_sub):
                s = _round6_half_away(u[:, m * dsub:(m + 1) * dsub]
                                      @ C[m].T)
                # np.argmax returns the FIRST maximum — the smallest-
                # code tie-break the oracle's (s DESC, j ASC) rank uses
                out[f"_q{m}"] = np.argmax(s, axis=1).astype("int32")
            yield pd.DataFrame(out)

    q_fields = ", ".join(f"_q{m} int" for m in range(m_sub))
    enc = (ensure_min_partitions(unit(corpus, id_col, "vec_id"))
           .mapInPandas(encode_iter, schema=f"vec_id {id_type}, {q_fields}"))

    def table_iter(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            u = np.array(pdf["_u"].tolist(), dtype=np.float64)
            out = {"probe_id": pdf["probe_id"]}
            for m in range(m_sub):
                t = _round6_half_away(u[:, m * dsub:(m + 1) * dsub]
                                      @ C[m].T)
                out[f"_t{m}"] = list(t)
            yield pd.DataFrame(out)

    t_fields = ", ".join(f"_t{m} array<double>" for m in range(m_sub))
    p = (unit(probes, probe_id_col, "probe_id")
         .mapInPandas(table_iter,
                      schema=f"probe_id {probe_id_type}, {t_fields}"))

    cand = enc.crossJoin(F.broadcast(p)) \
              .where(F.col("vec_id") != F.col("probe_id"))
    ip = F.element_at(F.col("_t0"), F.col("_q0") + 1)
    for m in range(1, m_sub):
        ip = ip + F.element_at(F.col(f"_t{m}"), F.col(f"_q{m}") + 1)
    scored = cand.select("probe_id", "vec_id",
                         F.round(ip, 6).alias("pq_sim"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("pq_sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k))
