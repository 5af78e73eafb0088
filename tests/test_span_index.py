"""SpanDupIndex — incremental span-duplication detection: counts
converge for any batching, flags are as-of-ingest, replays are fenced,
streaming restarts converge."""

import pytest
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators import dedup
from ydb_cdc_processor_spark.operators.span_index import SpanDupIndex

HEADER = "this standard license header repeats in many documents"  # 8 toks
DOCS = [
    (1, HEADER + " alpha beta gamma delta"),
    (2, HEADER + " epsilon zeta"),
    (3, "unique content one with no repeats whatsoever at all"),
    (4, HEADER + " eta theta iota"),
    (5, "shared tail passage closes this file " + "omega psi chi phi"),
    (6, "also a " + "shared tail passage closes this file"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _spans(df):
    return sorted((r.doc_id, r.span_start, r.span_end)
                  for r in df.collect())


def test_last_batch_flags_equal_one_shot(spark, tmp_path):
    """Any batching: the LAST batch is judged against the full corpus,
    so its flags must equal the one-shot duplicate_spans restricted to
    its docs — for several batch orders."""
    docs = _docs(spark)
    oneshot = dedup.duplicate_spans(docs, k=5, min_docs=2)
    for split, order in [(2, [0, 1]), (3, [2, 0, 1]), (3, [1, 2, 0])]:
        idx = SpanDupIndex(spark,
                           str(tmp_path / f"idx_{split}_{order[0]}"), k=5)
        out = None
        for part in order:
            out = idx.apply_batch(
                docs.where(F.col("doc_id") % split == part),
                batch_token=f"b{part}")
        last_ids = [r.doc_id for r in
                    docs.where(F.col("doc_id") % split == order[-1])
                    .collect()]
        exp = oneshot.where(F.col("doc_id").isin(last_ids))
        assert _spans(out) == _spans(exp), (split, order)


def test_store_counts_converge_any_batching(spark, tmp_path):
    docs = _docs(spark)
    ref = SpanDupIndex(spark, str(tmp_path / "ref"), k=5)
    ref.apply_batch(docs, batch_token="all")
    exp = sorted(map(tuple, ref.gram_counts().collect()))
    inc = SpanDupIndex(spark, str(tmp_path / "inc"), k=5)
    for part in (1, 0):
        inc.apply_batch(docs.where(F.col("doc_id") % 2 == part),
                        batch_token=f"b{part}")
    assert sorted(map(tuple, inc.gram_counts().collect())) == exp


def test_as_of_ingest_no_retro_flags(spark, tmp_path):
    """Doc 1 ingested alone is clean; doc 2 arriving with the same
    header is flagged — doc 1 is NOT retro-flagged (documented)."""
    idx = SpanDupIndex(spark, str(tmp_path / "idx"), k=5)
    s1 = idx.apply_batch(_docs(spark, [(1, HEADER + " alpha")]),
                         batch_token="b0")
    assert s1.count() == 0
    s2 = idx.apply_batch(_docs(spark, [(2, HEADER + " beta")]),
                         batch_token="b1")
    assert _spans(s2) == [(2, 0, 7)]
    # flag_docs is the retro query: doc 1 NOW reads as duplicated
    assert _spans(idx.flag_docs(_docs(spark, [(1, HEADER + " alpha")]))) \
        == [(1, 0, 7)]


def test_old_image_retraction(spark, tmp_path):
    """Rewriting a doc retracts its old grams: after doc 2's text moves
    away from the header, a fresh doc no longer collides with it."""
    idx = SpanDupIndex(spark, str(tmp_path / "idx"), k=5)
    d1 = _docs(spark, [(1, HEADER + " solo")])
    idx.apply_batch(d1, batch_token="b0")
    # rewrite doc 1 to unrelated text, old image supplied
    idx.apply_batch(_docs(spark, [(1, "completely different content "
                                      "now here today")]),
                    old_docs=d1, batch_token="b1")
    # the header grams' counts dropped back to 0 -> a new doc is clean
    s = idx.apply_batch(_docs(spark, [(7, HEADER + " fresh")]),
                        batch_token="b2")
    assert s.count() == 0


def test_replay_fence_blocks_double_count(spark, tmp_path):
    """Replaying a batch under the same token must not double-count a
    doc (min_docs=2 would then flag a solo doc)."""
    idx = SpanDupIndex(spark, str(tmp_path / "idx"), k=5)
    d = _docs(spark, [(1, HEADER + " once")])
    idx.apply_batch(d, batch_token="b0")
    s = idx.apply_batch(d, batch_token="b0")   # replay
    # the flag pass still sees n_docs == 1 for every gram
    assert s.count() == 0
    assert idx.gram_counts().agg(F.max("n_docs")).collect()[0][0] == 1


def test_engine_feed_maintains_counts(spark, sf_dir, tmp_path):
    """The feed() adapter rides CdcBatchEngine(agg_views=[...]) over the
    documents-like events fixture is not textual — drive it directly
    with a keyed doc view instead: counts equal a one-shot recompute
    after upsert + rewrite batches."""
    idx = SpanDupIndex(spark, str(tmp_path / "idx"), k=5)
    f = idx.feed()
    d0 = _docs(spark)
    f.apply_delta(d0, None, "t0")
    rewrite = _docs(spark, [(2, "rewritten away from the header text")])
    f.apply_delta(rewrite, d0.where("doc_id = 2"), "t1")
    final = d0.where("doc_id <> 2").unionByName(rewrite)
    ref = SpanDupIndex(spark, str(tmp_path / "ref"), k=5)
    ref.apply_batch(final, batch_token="all")
    assert sorted(map(tuple, idx.gram_counts().collect())) == \
        sorted(map(tuple, ref.gram_counts().collect()))


def test_stream_restart_converges(spark, tmp_path):
    """Kill/restart on the same checkpoint: the replayed micro-batch is
    fenced out of the counts and read_spans collapses the re-appended
    spans — final state equals an uninterrupted run."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = _docs(spark)
    # three single-file micro-batches
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1) \
            .write.mode("overwrite").json(os.path.join(src, f"p{part}"))

    spans_path = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")

    def build():
        return SpanDupIndex(spark, str(tmp_path / "idx"), k=5)

    idx1 = build()
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .json(src + "/p*"))
    q = idx1.start_stream(stream, ckpt, spans_path)
    # let at least one batch commit, then kill mid-flight
    while q.lastProgress is None:
        q.awaitTermination(0.2)
    q.stop()
    q.awaitTermination()

    idx2 = build()
    stream2 = (spark.readStream.schema("doc_id long, text string")
               .option("maxFilesPerTrigger", 1)
               .json(src + "/p*"))
    q2 = idx2.start_stream(stream2, ckpt, spans_path)
    q2.awaitTermination()

    ref = SpanDupIndex(spark, str(tmp_path / "ref"), k=5)
    ref.apply_batch(docs, batch_token="all")
    assert sorted(map(tuple, idx2.gram_counts().collect())) == \
        sorted(map(tuple, ref.gram_counts().collect()))
    # collapsed streamed spans: unique, and every as-of-ingest span is
    # contained in a one-shot span of the same doc (as-of flags only
    # ever see a subset of the final duplications)
    got = _spans(idx2.read_spans(spans_path)
                 .select("doc_id", "span_start", "span_end"))
    assert len(got) == len(set(got))
    oneshot = {}
    for r in dedup.duplicate_spans(docs, k=5, min_docs=2).collect():
        oneshot.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end))
    for d, s, e in got:
        assert any(a <= s and e <= b for a, b in oneshot.get(d, [])), \
            (d, s, e, oneshot.get(d))
