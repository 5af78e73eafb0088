"""Measure the text index's ranked-query cost as the corpus grows 10×.

The claim text_index.py makes: a BM25 top-k reads only the probed
terms' buckets — O(touched buckets, held constant by the
n_buckets ∝ |postings| sizing rule) — while the alternative the index
exists to avoid (``text.bm25_topk``, which re-tokenizes and re-scores
the whole corpus per query) grows linearly with it.  At 100 TB a
ranked query that re-reads the corpus is a non-starter.

Builds synthetic corpora at two sizes (deterministic 16-word docs over
a 10k-word vocabulary) with CONSTANT bucket size, ingests each into a
TextIndex once, then times ONE 3-term top-5 query through both paths:

- ``index``: TextIndex.topk (bucket-pruned postings + 1-row stats)
- ``batch``: text.bm25_topk over the raw documents (full re-scan)

Both paths must return IDENTICAL rows (same arithmetic) — asserted.
Writes tools/text_index_growth_results.json and prints a table.  Run
SOLO (any concurrent Spark skews timings 3-10×).  The metric that
transfers to a real cluster is rows touched, not seconds — local
page-cached scans hide the IO difference that dominates at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [300_000, 3_000_000]
BUCKET_ROWS = 100_000
VOCAB = 10_000
DOC_WORDS = 16


def _median3(fn) -> float:
    import statistics
    fn()  # warm (JIT, page cache, codegen) — not counted
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators import text
    from ydb_cdc_processor_spark.operators.text_index import TextIndex
    from ydb_cdc_processor_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    spark = get_spark("text-index-growth")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"tig_{n}_")
        try:
            n_buckets = 1
            while n_buckets < n * DOC_WORDS // BUCKET_ROWS:
                n_buckets *= 2
            docs = spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *[
                    F.concat(F.lit("w"),
                             ((F.col("id") * 7 + j * 131) % VOCAB)
                             .cast("string"))
                    for j in range(DOC_WORDS)]).alias("text"))
            flat = base + "/docs"
            docs.write.parquet(flat)
            raw = spark.read.parquet(flat)

            ix = TextIndex(spark, base + "/tix", n_buckets=n_buckets)
            t0 = time.perf_counter()
            ix.apply_delta(raw, None, batch_token="g0")
            t_build = time.perf_counter() - t0

            q = spark.createDataFrame(
                [("q", "w7"), ("q", "w421"), ("q", "w888")],
                "qid string, term string")
            got_ix = sorted(tuple(r) for r in ix.topk(q, k=5).collect())
            got_batch = sorted(tuple(r) for r in
                               text.bm25_topk(raw, q, k=5).collect())
            assert got_ix == got_batch, (got_ix, got_batch)

            t_ix = _median3(lambda: ix.topk(q, k=5).count())
            t_batch = _median3(lambda: text.bm25_topk(raw, q, k=5).count())

            probe = spark.createDataFrame(
                [("w7",), ("w421",), ("w888",)], "term string")
            touched = sorted({r[0] for r in probe.select(
                ix.view.bucket_expr().alias("_b")).distinct().collect()})
            rows_read = ix.view.read_touched(touched).count()
            total_terms = n * DOC_WORDS
            results[str(n)] = {"n_buckets": n_buckets,
                               "build_s": round(t_build, 2),
                               "topk_s": t_ix,
                               "batch_s": t_batch,
                               "topk_rows_read": rows_read,
                               "batch_rows_read": total_terms}
            print(f"{n:>12,} docs  buckets={n_buckets:>5}  "
                  f"build={t_build:6.1f}s  topk={t_ix:6.2f}s "
                  f"({rows_read:,} rows read)  batch={t_batch:6.2f}s "
                  f"({total_terms:,} rows read)")
        finally:
            shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "text_index_growth_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
