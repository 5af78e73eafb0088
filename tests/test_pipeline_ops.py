"""Round-5 pipeline operators: as-of join, binned range join,
deterministic sampling, tf-idf, document chunking."""

import pytest
from pyspark.sql import functions as F


def test_as_of_join_semantics(spark):
    """Backward as-of: latest build at-or-before the probe ts per key;
    equal timestamps match; no prior build → NULL payload."""
    from ydb_cdc_processor_spark.operators.temporal import as_of_join

    probe = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "v", 50)],
        "id long, k string, ts long")
    build = spark.createDataFrame(
        [("u", 10, "a"), ("u", 15, "b"), ("w", 1, "z")],
        "k string, ts long, val string")
    got = {r.id: r.val_asof
           for r in as_of_join(probe, build, keys=["k"]).collect()}
    # id=1: ts=10 matches the equal-ts build row 'a'; id=2: latest <=20
    # is 'b'; id=3: nothing at-or-before 5; id=4: key has no build rows
    assert got == {1: "a", 2: "b", 3: None, 4: None}


def test_curation_pipeline_no_rejoin(spark, sf_dir):
    """carry_cols rides `lang` through the chunk explode — the pipeline
    plan must contain exactly ONE join (the dedup semi-join, broadcast)
    and NO doc_id hash-shuffle: the old formulation re-joined chunks to
    recover lang, shuffling the (larger) chunk set a third time."""
    from ydb_cdc_processor_spark.registry import QUERIES

    import re

    df = QUERIES["q_curation_pipeline"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # the formatted plan names each node in the tree AND the details
    # section — count node headers, not substrings
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "hashpartitioning(doc_id" not in plan
    assert "lang" in df.columns


def test_chunk_documents_carry_cols(spark):
    """carry_cols values are replicated onto every chunk of their doc."""
    from ydb_cdc_processor_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "en", " ".join(f"w{i}" for i in range(100))),
         (2, "de", "kurz")],
        "doc_id long, lang string, text string")
    out = chunk_documents(docs, chunk_words=64, stride=48,
                          carry_cols=["lang"]).collect()
    langs = {(r.doc_id, r.lang) for r in out}
    assert langs == {(1, "en"), (2, "de")}
    assert sum(1 for r in out if r.doc_id == 1) == 3  # starts 0,48,96


def test_as_of_join_null_payload_from_matched_row(spark):
    """A matched build row whose payload value is NULL must yield NULL —
    not fall through to an OLDER build row's value (true as-of / DuckDB
    ASOF semantics; the struct-fill regression test)."""
    from ydb_cdc_processor_spark.operators.temporal import as_of_join

    probe = spark.createDataFrame([(1, "u", 20)], "id long, k string, ts long")
    build = spark.createDataFrame(
        [("u", 10, "older"), ("u", 15, None)], "k string, ts long, val string")
    [r] = as_of_join(probe, build, keys=["k"]).collect()
    assert r.val_asof is None  # matched row (ts=15) carries NULL


def test_range_join_auto_bin_width(spark, caplog):
    """bin_width=None derives the median interval width and returns the
    exact theta-join result; a pathologically wide interval triggers the
    replication warning."""
    import logging

    from ydb_cdc_processor_spark.operators import temporal
    from ydb_cdc_processor_spark.operators.temporal import range_join_binned

    probe = spark.range(0, 100).select(
        F.col("id").alias("pid"), (F.col("id") * 1.3).alias("v"))
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 6.0), (2, 9.9, 40.0), (3, 90.0, 95.0)],
        "iv_id long, lo double, hi double")
    got = sorted((r.pid, r.iv_id) for r in range_join_binned(
        probe, iv, "v", "lo", "hi").collect())
    exp = sorted((r.pid, r.iv_id) for r in probe.join(
        iv, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect())
    assert got == exp and len(got) > 0

    wide = spark.createDataFrame(
        [(0, 0.0, 0.001), (1, 0.0, 0.001), (2, 0.0, 0.001),
         (3, 0.0, 50.0)],  # 50 / 0.001 ≫ MAX_REPLICATION_WARN bins
        "iv_id long, lo double, hi double")
    with caplog.at_level(logging.WARNING, logger=temporal.__name__):
        range_join_binned(probe.limit(1), wide, "v", "lo", "hi").collect()
    assert any("replicates into" in m for m in caplog.messages)


def test_range_join_binned_matches_plain_join(spark):
    """The bin-replication lowering returns exactly the plain theta-join
    result, including intervals spanning many bins and probe values on
    bin boundaries."""
    from ydb_cdc_processor_spark.operators.temporal import range_join_binned

    probe = spark.range(0, 200).select(
        F.col("id").alias("pid"), (F.col("id") * 0.7).alias("v"))
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 6.0), (2, 9.9, 140.0), (3, 200.0, 300.0)],
        "iv_id long, lo double, hi double")
    got = sorted((r.pid, r.iv_id) for r in range_join_binned(
        probe, iv, "v", "lo", "hi", bin_width=8.0).collect())
    exp = sorted((r.pid, r.iv_id) for r in probe.join(
        iv, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect())
    assert got == exp and len(got) > 0


def test_deterministic_sample_stable_across_partitioning(spark):
    """The kept id-set is a pure function of (id, rate): immune to
    repartitioning and re-execution (df.sample is neither)."""
    from ydb_cdc_processor_spark.functions.sampling import (
        deterministic_sample)

    df = spark.range(0, 2000).select(F.col("id"))
    a = {r.id for r in deterministic_sample(df, "id", 0.25).collect()}
    b = {r.id for r in deterministic_sample(
        df.repartition(17), "id", 0.25).collect()}
    assert a == b
    assert 0.15 < len(a) / 2000 < 0.35  # ~rate, hash-uniform
    # monotone in rate: smaller sample nests inside the larger
    c = {r.id for r in deterministic_sample(df, "id", 0.10).collect()}
    assert c <= a


def test_stratified_sample_rates(spark):
    """Per-group rates honored: rate-1.0 groups keep everything,
    rate-0.0 (default) groups drop everything."""
    from ydb_cdc_processor_spark.functions.sampling import stratified_sample

    df = spark.range(0, 300).select(
        "id", F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                           (F.col("id") % 3 + 1).cast("int")).alias("g"))
    out = stratified_sample(df, "id", "g", {"a": 1.0, "b": 0.5},
                            default_rate=0.0)
    per = {r.g: r.n for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per.get("a") == 100          # rate 1.0: all 100 'a' rows
    assert "c" not in per               # default 0.0: none
    assert 20 < per.get("b", 0) < 80    # ~half


def test_chunk_documents_overlap(spark):
    """64/48 word windows: starts at 0,48,96,...; last chunk short;
    overlap region repeats the previous chunk's tail."""
    from ydb_cdc_processor_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame([(1, " ".join(words)), (2, ""),
                                  (3, "one two")],
                                 "doc_id long, text string")
    rows = sorted(chunk_documents(docs, chunk_words=64, stride=48)
                  .collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.chunk_start for r in by_doc[1]] == [0, 48, 96]
    assert [r.n_words for r in by_doc[1]] == [64, 52, 4]
    assert by_doc[1][0].chunk_text.split(" ")[:2] == ["w0", "w1"]
    # overlap: chunk 1 starts at w48, inside chunk 0's [0, 64) window
    assert by_doc[1][1].chunk_text.split(" ")[0] == "w48"
    assert 2 not in by_doc                      # empty doc → no chunks
    assert [r.n_words for r in by_doc[3]] == [2]  # short doc → one chunk


def test_tfidf_top_terms(spark):
    """Rational tf-idf: corpus-wide terms score low, doc-unique terms
    rank first; ties break on term text."""
    from ydb_cdc_processor_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "common apple apple"), (2, "common banana"),
         (3, "common cherry cherry cherry")],
        "doc_id long, text string")
    top1 = {r.doc_id: r.term for r in
            tfidf_top_terms(docs, k=1).collect()}
    assert top1 == {1: "apple", 2: "banana", 3: "cherry"}
    # score check for doc 1 'apple': tf=2, N=3, df=1 → 6.0
    all_rows = {(r.doc_id, r.term): r.score
                for r in tfidf_top_terms(docs, k=3).collect()}
    assert all_rows[(1, "apple")] == 6.0
    assert all_rows[(1, "common")] == 1.0  # tf=1 × 3/3


def test_sample_per_group_exact_k(spark):
    """Exactly min(k, |group|) rows per group, identical across
    partitionings."""
    from ydb_cdc_processor_spark.functions.sampling import sample_per_group

    df = spark.range(0, 500).select(
        "id", (F.col("id") % 3).cast("string").alias("g"))
    small = spark.createDataFrame([(1000, "tiny"), (1001, "tiny")],
                                  "id long, g string")
    df = df.unionByName(small)
    out = sample_per_group(df, "id", "g", k=25)
    per = {r.g: r.n for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 25, "1": 25, "2": 25, "tiny": 2}
    again = {tuple(r) for r in sample_per_group(
        df.repartition(13), "id", "g", k=25).collect()}
    assert again == {tuple(r) for r in out.collect()}


def test_quantized_cosine_recall(spark, sf_dir):
    """Int8-quantized top-5 stays close to exact top-5 (unit-norm
    embeddings; quantization error ~1/127 per component): mean overlap
    >= 0.7, and quantized similarities within 0.05 of exact for shared
    pairs."""
    from ydb_cdc_processor_spark.operators import similarity
    from ydb_cdc_processor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 50 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    exact = similarity.cosine_topk(emb, probes, k=5).collect()
    quant = similarity.cosine_topk_quantized(emb, probes, k=5).collect()
    ex, qu, qsim, esim = {}, {}, {}, {}
    for r in exact:
        ex.setdefault(r.probe_id, set()).add(r.vec_id)
        esim[(r.probe_id, r.vec_id)] = r.cos_sim
    for r in quant:
        qu.setdefault(r.probe_id, set()).add(r.vec_id)
        qsim[(r.probe_id, r.vec_id)] = r.cos_sim
    overlaps = [len(ex[p] & qu[p]) / 5 for p in ex]
    assert sum(overlaps) / len(overlaps) >= 0.7
    shared = set(qsim) & set(esim)
    assert shared and all(abs(qsim[k] - esim[k]) < 0.05 for k in shared)


def test_jaccard_similarity_join_exact_vs_bruteforce(spark):
    """Prefix filtering must be LOSSLESS: compare against the all-pairs
    answer on a corpus dense enough to stress prefix-boundary math."""
    import itertools
    import random

    from ydb_cdc_processor_spark.operators.dedup import (
        jaccard_similarity_join)

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = [(i, " ".join(rng.sample(vocab, rng.randint(15, 28))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.6, 0.75, 0.9):
        got = {(r.doc_a, r.doc_b): r
               for r in jaccard_similarity_join(
                   docs, threshold=t).collect()}
        sets = {i: set(s.split()) for i, s in rows}
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            j = inter / len(sets[a] | sets[b])
            if j >= t:
                want[(a, b)] = (inter, j)
        assert set(got) == set(want), f"threshold {t}"
        for k, (inter, j) in want.items():
            assert got[k].n_inter == inter
            assert abs(got[k].jaccard - j) < 1e-6


def test_jaccard_similarity_join_validates_threshold(spark):
    import pytest as _pytest

    from ydb_cdc_processor_spark.operators.dedup import (
        jaccard_similarity_join)
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        jaccard_similarity_join(docs, threshold=0.0)


def test_rolling_anomalies_flags_known_outlier(spark):
    from ydb_cdc_processor_spark.operators.temporal import rolling_anomalies

    # user 1: 30 calm points then a spike; user 2: too few points
    rows = ([(1, i, f"2024-01-01 00:{i:02d}:00", 10.0 + (i % 3))
             for i in range(30)]
            + [(1, 30, "2024-01-01 00:30:30", 500.0)]
            + [(2, 100 + i, f"2024-01-01 01:{i:02d}:00", float(i * 100))
               for i in range(5)])
    ev = (spark.createDataFrame(
              rows, "user_id long, event_id long, ts string, value double")
          .select("user_id", "event_id",
                  F.col("ts").cast("timestamp").alias("ts"), "value"))
    out = rolling_anomalies(ev, window_rows=20, min_points=10,
                            z_threshold=3.0).collect()
    assert [(r.user_id, r.event_id) for r in out] == [(1, 30)]
    r = out[0]
    assert r.baseline_n == 20 and abs(r.baseline_mean - 11.0) < 0.5
    assert r.zscore > 3.0


def test_rolling_anomalies_excludes_current_row(spark):
    """The spike must not dilute its own baseline: two consecutive
    spikes should BOTH flag (the second's window holds only one spike,
    which shifts the mean but the trailing frame excludes itself)."""
    from ydb_cdc_processor_spark.operators.temporal import rolling_anomalies

    rows = ([(1, i, f"2024-01-01 00:{i:02d}:00", 10.0 + 0.5 * (i % 5))
             for i in range(25)]
            + [(1, 25, "2024-01-01 00:25:30", 400.0)])
    ev = (spark.createDataFrame(
              rows, "user_id long, event_id long, ts string, value double")
          .select("user_id", "event_id",
                  F.col("ts").cast("timestamp").alias("ts"), "value"))
    out = rolling_anomalies(ev, window_rows=20, min_points=10,
                            z_threshold=3.0).collect()
    # with the current row excluded the spike's z is huge; if it were
    # included, its own value would inflate mean AND std and shrink z
    assert [(r.user_id, r.event_id) for r in out] == [(1, 25)]
    assert out[0].zscore > 10


def test_bpe_merge_counts_weighted_by_word_freq(spark):
    from ydb_cdc_processor_spark.operators.text import bpe_merge_counts

    # "ab" appears in 'abc' (3 docs) and 'ab' (1 doc) → 4; single-char
    # words contribute nothing
    docs = spark.createDataFrame(
        [(1, "abc x"), (2, "abc y"), (3, "abc ab z"), (4, "q")],
        "doc_id long, text string")
    got = {r.pair: r.n for r in bpe_merge_counts(docs, k=10).collect()}
    assert got["ab"] == 4 and got["bc"] == 3
    assert all(len(p) == 2 for p in got)


def test_bigram_familiarity_scores_repetition_high(spark):
    from ydb_cdc_processor_spark.operators.text import bigram_familiarity

    # familiarity discriminates when the corpus makes a word's USUAL
    # continuation clear: after 'the', 'cat' follows 10/11 times — a
    # doc pairing 'the' with an unseen continuation scores low
    docs = spark.createDataFrame(
        [(i, "the cat sat") for i in range(10)]
        + [(100, "the zzz"), (200, "the")],     # <2 words → no row
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_familiarity(docs).collect()}
    # doc 0: mean(C(the cat)/C(the)=10/12, C(cat sat)/C(cat)=10/10)
    assert out[0].n_bigrams == 2
    assert abs(out[0].familiarity - (10 / 12 + 1.0) / 2) < 1e-8
    # doc 100: its only bigram 'the zzz' is 1 of 12 'the' continuations
    assert abs(out[100].familiarity - 1 / 12) < 1e-8
    assert out[100].familiarity < out[0].familiarity
    assert 200 not in out


def test_inverted_index_caps_postings(spark):
    from ydb_cdc_processor_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(i, "common term" + (" rare" if i == 7 else ""))
         for i in range(30)],
        "doc_id long, text string")
    got = {r.term: r for r in
           inverted_index(docs, max_postings=5).collect()}
    assert got["common"].df == 30
    assert got["common"].postings == [0, 1, 2, 3, 4]   # capped + sorted
    assert got["rare"].df == 1 and got["rare"].postings == [7]


def test_resample_ffill_semantics(spark):
    from ydb_cdc_processor_spark.operators.temporal import resample_ffill

    rows = [
        (1, 10, "2024-01-01 00:30:00", 1.0),    # first obs → grid 00:00
        (1, 11, "2024-01-01 00:30:00", 2.0),    # dup ts → event_id 11 wins
        (1, 12, "2024-01-01 03:15:00", 9.0),    # 3h gap → ffill covers it
        (2, 20, "2024-01-01 05:00:00", 5.0),
    ]
    ev = (spark.createDataFrame(
              rows, "user_id long, event_id long, ts string, value double")
          .select("user_id", "event_id",
                  F.col("ts").cast("timestamp").alias("ts"), "value"))
    got = {(r.user_id, str(r.grid_ts)): r.value
           for r in resample_ffill(ev, step="1 hour",
                                   tiebreak_col="event_id").collect()}
    assert got == {
        (1, "2024-01-01 00:00:00"): None,       # grid starts at trunc(min)
        (1, "2024-01-01 01:00:00"): 2.0,        # dup collapsed: id 11 won
        (1, "2024-01-01 02:00:00"): 2.0,
        (1, "2024-01-01 03:00:00"): 2.0,        # 03:15 obs not yet visible
        (2, "2024-01-01 05:00:00"): 5.0,
    }


def test_pagerank_known_graph(spark):
    """3-node directed cycle → uniform ranks; star graph → hub gets the
    mass; ranks always sum to ~1 (teleport conservation on graphs with
    no dangling nodes)."""
    from ydb_cdc_processor_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(cycle, n_iter=5).collect()}
    assert all(abs(v - 1 / 3) < 1e-12 for v in got.values())

    # undirected star: spokes point at hub and back
    star = spark.createDataFrame(
        [("hub", s) for s in "xyz"] + [(s, "hub") for s in "xyz"],
        "src string, dst string")
    got = {r.node: r.rank for r in pagerank(star, n_iter=10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["hub"] > 2.0 * got["x"]
    assert abs(got["x"] - got["y"]) < 1e-12

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pagerank(cycle, n_iter=-1)


def test_pagerank_fast_close_to_exact(spark):
    """exact=False (plain double sums) must agree with the decimal-exact
    mode to within float-summation noise on a non-trivial graph."""
    import random

    from ydb_cdc_processor_spark.operators.graph import pagerank

    rng = random.Random(7)
    edges_data = list({(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
                       for _ in range(400)})
    edges = spark.createDataFrame(edges_data, "src string, dst string")
    exact = {r.node: r.rank
             for r in pagerank(edges, n_iter=4, exact=True).collect()}
    fast = {r.node: r.rank
            for r in pagerank(edges, n_iter=4, exact=False).collect()}
    assert set(exact) == set(fast)
    for node, v in exact.items():
        assert abs(fast[node] - v) <= 1e-9 * max(abs(v), 1e-30)


def test_dataset_split_stable_and_partitions(spark):
    from ydb_cdc_processor_spark.functions.sampling import dataset_split

    df = spark.range(0, 3000).select(F.col("id"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.id: r.split for r in dataset_split(df, "id", fr).collect()}
    b = {r.id: r.split for r in
         dataset_split(df.repartition(13), "id", fr).collect()}
    assert a == b                                   # partition-invariant
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    assert 0.75 < sum(v == "train" for v in a.values()) / n < 0.85
    # incremental: a grown dataset never reassigns existing ids
    c = {r.id: r.split for r in
         dataset_split(spark.range(0, 5000), "id", fr).collect()}
    assert all(c[i] == s for i, s in a.items())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dataset_split(df, "id", {"train": 0.5, "val": 0.1})


def test_exact_quantile_matches_sorted_definition(spark):
    import random

    from ydb_cdc_processor_spark.functions.aggregates import exact_quantile

    rng = random.Random(3)
    vals = [rng.uniform(-100, 100) for _ in range(5001)]
    # duplicates + a constant run to stress bin-edge and dup handling
    vals += [42.0] * 500
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        val, n = exact_quantile(df, "x", q=q, n_bins=64)
        k = int(q * (n - 1))
        assert n == len(vals)
        assert val == s[k], f"q={q}"
    # constant column fast path and empty-input error
    const = spark.createDataFrame([(7.0,)] * 10, "x double")
    assert exact_quantile(const, "x") == (7.0, 10)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        exact_quantile(spark.createDataFrame([], "x double"), "x")


def test_weighted_sample_deterministic_and_weighted(spark):
    """A-ES weighted sampling: stable across partitionings, exactly k
    rows, and heavily-weighted rows dominate selection."""
    from ydb_cdc_processor_spark.functions.sampling import weighted_sample

    rows = [(i, 1000 if i < 20 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    a = weighted_sample(df, "id", "w", 30).select("id").collect()
    b = weighted_sample(df.repartition(17), "id", "w", 30) \
        .select("id").collect()
    assert sorted(r.id for r in a) == sorted(r.id for r in b)
    assert len(a) == 30
    picked = {r.id for r in a}
    # the 20 rows with 1000x weight should essentially all be selected
    assert len(picked & set(range(20))) >= 18
    # zero/negative weights never qualify
    z = spark.createDataFrame([(1, 0), (2, -5), (3, 7)], "id long, w long")
    assert [r.id for r in weighted_sample(z, "id", "w", 10)
            .select("id").collect()] == [3]


def test_q6_filters_push_into_scan(spark, sf_dir):
    """The Q6 shape exists to prove pushdown: all three conjuncts must
    reach the parquet reader as PushedFilters, and the scan must prune
    to the four referenced columns."""
    from ydb_cdc_processor_spark.registry import QUERIES

    df = QUERIES["q_forecast_revenue"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters line in the scan node"
    line = pushed[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, f"{col} filter not pushed: {line}"
    sch = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" in sch
    assert "l_orderkey" not in sch  # column pruning held


def test_adapted_tpch_shapes_plan_hygiene(spark, sf_dir):
    """The adapted Q2/Q9/Q11/Q16/Q20/Q21 shapes (no partsupp in this
    corpus — lineitem is the part↔supplier bridge) must keep the plans
    that survive 100×: no CartesianProduct, no Python in the hot path,
    and the dimension-bounded sides (dominant-supplier set, excluded-
    supplier set) joined as broadcasts, never shuffled."""
    from ydb_cdc_processor_spark.registry import QUERIES

    for name in ("q_waiting_suppliers", "q_min_cost_supplier",
                 "q_product_profit", "q_important_parts",
                 "q_dominant_supplier", "q_supplier_part_counts"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    semi = QUERIES["q_dominant_supplier"](spark, sf_dir)
    plan = semi._sc._jvm.PythonSQLUtils.explainString(
        semi._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin LeftSemi" in plan
    anti = QUERIES["q_supplier_part_counts"](spark, sf_dir)
    plan = anti._sc._jvm.PythonSQLUtils.explainString(
        anti._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin LeftAnti" in plan


def test_round6_half_away_matches_duckdb_round(spark):
    """_round6_half_away == DuckDB round() bit-for-bit on adversarial
    .5e-6 boundary values — THE equivalence the PQ oracles rely on
    (the Spark side of those queries rounds via this numpy helper; the
    oracle side rounds via DuckDB).  Spark's own F.round (BigDecimal
    HALF_UP on the decimal repr) is checked too: it is KNOWN to diverge
    from both exactly on binary-tie/decimal-non-tie edges (e.g.
    0.6152704999999999), so the test pins (a) DuckDB equivalence
    everywhere, (b) F.round equivalence away from that documented edge
    set — a numpy/Spark/DuckDB upgrade that moves any of the three
    fails here instead of silently un-hash-matching oracles."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F
    from ydb_cdc_processor_spark.operators.similarity_pq import (
        _round6_half_away)

    # half-boundary .5e-6 ties (exact and off-by-one-ulp), sign
    # symmetry, and a dense random sweep near boundaries
    edges = []
    for mant in (0, 1, 3, 7, 1234567, 999999):
        base = mant / 1e6 + 0.5e-6
        edges += [base, -base, np.nextafter(base, 0),
                  np.nextafter(base, 1), -np.nextafter(base, 0)]
    rng = np.random.RandomState(42)
    near = (rng.randint(0, 2_000_000, 500) / 1e6
            + (rng.randint(-2, 3, 500)) * 1e-7 + 0.5e-6)
    vals = np.array(edges + list(near) + list(-near), dtype=np.float64)

    got = _round6_half_away(vals)

    con = duckdb.connect()
    duck = np.array([con.execute(
        "select round(?::DOUBLE, 6)", [float(v)]).fetchone()[0]
        for v in vals])
    bad = np.nonzero(got != duck)[0]
    assert bad.size == 0, ("DuckDB divergence at "
                           f"{[(vals[i], got[i], duck[i]) for i in bad[:5]]}")

    sp_rows = (spark.createDataFrame(
        [(float(v),) for v in vals], "x double")
        .select(F.round(F.col("x"), 6).alias("r")).collect())
    sp = np.array([r["r"] for r in sp_rows])
    # the documented edge set: binary product x*1e6 is an EXACT .5 tie
    # (numpy/DuckDB round away) while the shortest decimal repr of x is
    # not a tie (Spark rounds by the repr) — divergence is expected
    # exactly there and nowhere else
    prod = np.abs(vals) * 1e6
    binary_tie = (prod - np.floor(prod)) == 0.5
    diverged = got != sp
    assert not np.any(diverged & ~binary_tie), (
        "F.round diverged OFF the documented binary-tie edge set at "
        f"{[(vals[i], got[i], sp[i]) for i in np.nonzero(diverged & ~binary_tie)[0][:5]]}")


def test_pq_recall_and_validation(spark, sf_dir):
    """Product quantization at m=16/K=64 reaches IVF-level recall on
    this weakly-structured corpus (exact top-1 cosine ~0.4), the
    quantized sim stays a valid cosine, output is exactly k per probe
    and partitioning-independent, and bad parameters raise."""
    import pytest as _pytest

    from ydb_cdc_processor_spark.operators import similarity
    from ydb_cdc_processor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 50 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    exact = similarity.cosine_topk(emb, probes, k=5).collect()
    pq = similarity.cosine_topk_pq(emb, probes, k=5, m_sub=16,
                                   n_codes=64, dim=64).collect()
    ex, qu = {}, {}
    for r in exact:
        ex.setdefault(r.probe_id, set()).add(r.vec_id)
    for r in pq:
        qu.setdefault(r.probe_id, set()).add(r.vec_id)
        assert -1.001 <= r.pq_sim <= 1.001
    assert set(ex) == set(qu)
    assert all(len(s) == 5 for s in qu.values())
    overlaps = [len(ex[p] & qu[p]) / 5 for p in ex]
    assert sum(overlaps) / len(overlaps) >= 0.2   # measured 0.38 sf0.01
    # deterministic under any partitioning
    again = similarity.cosine_topk_pq(emb.repartition(7), probes, k=5,
                                      m_sub=16, n_codes=64,
                                      dim=64).collect()
    assert {(r.probe_id, r.vec_id, r.pq_sim, r.rnk) for r in again} == \
           {(r.probe_id, r.vec_id, r.pq_sim, r.rnk) for r in pq}
    with _pytest.raises(ValueError):
        similarity.cosine_topk_pq(emb, probes, dim=None)
    with _pytest.raises(ValueError):
        similarity.cosine_topk_pq(emb, probes, m_sub=5, dim=64)
    with _pytest.raises(ValueError):
        similarity.cosine_topk_pq(emb, probes, m_sub=4, n_codes=0, dim=64)


def test_ivf_pq_composes_parents(spark, sf_dir):
    """IVF×PQ = PQ scoring restricted to IVF's candidate set: every
    result pair must carry the same pq_sim the standalone PQ assigns,
    and every (probe, candidate) pair must lie in one of the probe's
    IVF cells (prune-only composition — no new arithmetic)."""
    from ydb_cdc_processor_spark.operators import similarity
    from ydb_cdc_processor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    comp = similarity.cosine_topk_ivf_pq(emb, probes, k=5, n_cells=16,
                                         n_probe=4, m_sub=16,
                                         n_codes=64, dim=64).collect()
    full = similarity.cosine_topk_pq(emb, probes, k=10 ** 9, m_sub=16,
                                     n_codes=64, dim=64).collect()
    full_sim = {(r.probe_id, r.vec_id): r.pq_sim for r in full}
    ivf = similarity.cosine_topk_ivf(emb, probes, k=10 ** 9, n_cells=16,
                                     n_probe=4).collect()
    allowed = {(r.probe_id, r.vec_id) for r in ivf}
    assert comp and all(len({r.vec_id for r in comp
                             if r.probe_id == p}) == 5
                        for p in {r.probe_id for r in comp})
    for r in comp:
        assert (r.probe_id, r.vec_id) in allowed          # IVF prune
        assert full_sim[(r.probe_id, r.vec_id)] == r.pq_sim  # PQ score
