"""Round-6 curation operators: decontamination, repetition signals,
PII redaction, sequence packing, temperature resampling, keep-best."""

import hashlib

import pytest
from pyspark.sql import functions as F


def test_contamination_flags_overlap(spark):
    from ydb_cdc_processor_spark.operators.curation import contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "x y alpha beta gamma z"),     # shares 'alpha beta gamma'
         (2, "beta gamma delta q r"),       # shares 'beta gamma delta'
         (3, "totally different words here"),
         (4, "alpha beta gamma delta")],    # shares both grams
        "doc_id long, text string")
    out = {r.doc_id: (r.n_hits, r.first_hit)
           for r in contamination(docs, bench, n=3).collect()}
    assert out == {1: (1, "alpha beta gamma"),
                   2: (1, "beta gamma delta"),
                   4: (2, "alpha beta gamma")}


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """Scale shape: the benchmark gram set must broadcast — the corpus
    side is never shuffled for the probe join."""
    from ydb_cdc_processor_spark.registry import QUERIES

    df = QUERIES["q_decontaminate"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_stats(spark):
    from ydb_cdc_processor_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),     # words {a,b}: dup 4/6; top bigram 'a b'×3 of 5
         (2, "q w e r t y"),     # all distinct: dup 0; every bigram once
         (3, "solo")],           # single word: no real bigram, 1-word gram
        "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert r1.n_words == 6
    assert r1.dup_word_frac == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r1.top_bigram == "a b" and r1.top_bigram_frac == pytest.approx(3 / 5)
    r2 = rows[2]
    assert r2.dup_word_frac == 0.0
    # ties on count=1 break to the lexicographically smallest bigram
    assert r2.top_bigram == "e r"
    assert rows[3].n_words == 1


def test_pii_redact_and_counts(spark):
    from ydb_cdc_processor_spark.operators.curation import (
        pii_counts, redact_pii)

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 555-123-4567 "
             "from 192.168.0.12 thanks"),
         (2, "no pii at all")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in df.select(
        "doc_id", *pii_counts(F.col("text")),
        redact_pii(F.col("text")).alias("red")).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 1)
    assert out[1].red == ("mail <EMAIL> or <PHONE> from <IP> thanks")
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 0)
    assert out[2].red == "no pii at all"


def _expected_packing(rows, budget):
    """Single-threaded reference: global (md5(id), id) order prefix sum."""
    ordered = sorted(rows, key=lambda r: (
        hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    out, cum = {}, 0
    for doc_id, n_tokens in ordered:
        out[doc_id] = (n_tokens, cum // budget, cum % budget)
        cum += n_tokens
    return out


def test_pack_sequences_matches_global_prefix_sum(spark):
    """The 256-shard distributed prefix sum must equal the flat global
    cumsum — and be invariant to input partitioning."""
    from ydb_cdc_processor_spark.operators.curation import pack_sequences

    data = [(i, "w " * (3 + i % 7) + "end") for i in range(200)]
    expected = _expected_packing(
        [(i, 4 + i % 7) for i in range(200)], budget=16)
    for n_parts in (1, 7):
        docs = spark.createDataFrame(
            data, "doc_id long, text string").repartition(n_parts)
        got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_pos)
               for r in pack_sequences(docs, budget=16).collect()}
        assert got == expected


def test_pack_sequences_rejects_bad_budget(spark):
    from ydb_cdc_processor_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_temperature_sample_rates_and_determinism(spark):
    from ydb_cdc_processor_spark.operators.curation import temperature_sample

    rows = ([(i, "big") for i in range(400)]
            + [(1000 + i, "rare") for i in range(4)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(docs, group_col="lang", alpha=0.5)
    got = out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("keep_rate").alias("rate")).collect()
    by_lang = {r.lang: r for r in got}
    # the rarest group keeps rate 1.0 → all rows survive
    assert by_lang["rare"].n == 4 and by_lang["rare"].rate == 1.0
    # the big group keeps ~sqrt(4/400) = 10%
    assert by_lang["big"].rate == pytest.approx((4 / 400) ** 0.5, abs=1e-6)
    assert 20 <= by_lang["big"].n <= 60
    # decisions are id-hash functions → rerun on a different
    # partitioning keeps the identical doc set
    ids_a = {r.doc_id for r in out.collect()}
    ids_b = {r.doc_id for r in temperature_sample(
        docs.repartition(13), group_col="lang", alpha=0.5).collect()}
    assert ids_a == ids_b


def test_keep_best_in_clusters(spark):
    from ydb_cdc_processor_spark.operators.curation import (
        keep_best_in_clusters)

    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.5)],
        "doc_id long, q_score double")
    out = {r.cluster_id: r for r in
           keep_best_in_clusters(members, scores).collect()}
    # cluster 1: 2 and 3 tie at 0.9 → smaller id wins
    assert out[1].keep == 2 and out[1].n_members == 3
    assert out[1].best_score == pytest.approx(0.9)
    # cluster 7: tie at 0.5 → keep 7
    assert out[7].keep == 7 and out[7].n_members == 2


def test_bucketed_join_no_exchange(spark, sf_dir):
    """The whole point of the bucketed layout: join + same-key agg with
    ZERO Exchange in the final plan (scan partitioning satisfies both)."""
    from ydb_cdc_processor_spark.registry import QUERIES

    df = QUERIES["q_bucketed_join"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # sortBy made the buckets pre-sorted: no per-task Sort before the join
    assert df.count() > 0


def test_kmv_distinct_accuracy_and_degeneracy(spark):
    from ydb_cdc_processor_spark.functions.sketches import kmv_distinct

    import pytest as _pytest

    # universe >> k: estimate within ~3 std errors (se ≈ 1/sqrt(k-2))
    big = spark.range(20000).select(
        (F.col("id") % 5000).cast("string").alias("v"))
    row = kmv_distinct(big, "v", k=256).collect()[0]
    assert row.n_minima == 256
    assert abs(row.est_distinct - 5000) / 5000 < 3 / (254 ** 0.5)
    # universe < k: degenerates to the exact count
    small = spark.range(50).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(small, "v", k=256).collect()[0]
    assert row.n_minima == 50 and row.est_distinct == 50.0
    with _pytest.raises(ValueError):
        kmv_distinct(small, "v", k=1)


def test_hll_grouped_accuracy_per_group(spark):
    """Per-group estimates within ~3 std errors (se ≈ 1.04/sqrt(m)),
    duplicates change nothing (max-merge), and the emitted invariants
    hold: s_scaled accounts for all m registers, v_zero registers never
    hit."""
    from ydb_cdc_processor_spark.functions.sketches import hll_grouped

    df = spark.range(30000).select(
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
        # group a: 10000 distinct, group b: 2000 distinct (with dups)
        F.when(F.col("id") % 3 == 0, F.col("id"))
         .otherwise(F.col("id") % 2000).cast("string").alias("v"))
    rows = {r.g: r for r in hll_grouped(df, ["g"], "v", p=8).collect()}
    se = 3 * 1.04 / (256 ** 0.5)
    for g, exact in (("a", 10000), ("b", 2000)):
        r = rows[g]
        assert r.m == 256 and 0 <= r.v_zero < 256
        assert abs(r.est_hll - exact) / exact < se
    # duplicate-insensitive: the sketch of df ∪ df is identical
    again = {r.g: r for r in
             hll_grouped(df.union(df), ["g"], "v", p=8).collect()}
    assert {g: (r.s_scaled, r.est_hll) for g, r in rows.items()} == \
           {g: (r.s_scaled, r.est_hll) for g, r in again.items()}


def test_hll_grouped_merge_and_validation(spark):
    """Sharding the input and max-merging register sums equals the
    one-shot sketch (the property that makes the state mergeable across
    100 TB partials), and p outside [4,12]/non-multiple-of-4 raises."""
    import pytest as _pytest

    from ydb_cdc_processor_spark.functions.sketches import hll_grouped

    df = spark.range(8000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    whole = hll_grouped(df, ["g"], "v", p=8).collect()[0]
    # shard by id parity, sketch each shard with a shared group key:
    # grouping the UNION of the shards is exactly the register max-merge
    shards = df.where(F.col("v").cast("long") % 2 == 0).union(
        df.where(F.col("v").cast("long") % 2 == 1))
    merged = hll_grouped(shards, ["g"], "v", p=8).collect()[0]
    assert (whole.s_scaled, whole.est_hll) == \
           (merged.s_scaled, merged.est_hll)
    for bad in (3, 6, 16, 0):
        with _pytest.raises(ValueError):
            hll_grouped(df, ["g"], "v", p=bad)


def test_dedup_paragraphs_removes_shared_units(spark):
    from ydb_cdc_processor_spark.operators.curation import dedup_paragraphs

    boiler = "all rights reserved by the original author"   # 7 words + pad
    docs = spark.createDataFrame(
        [(1, f"{boiler} x unique one content here aa bb cc"),
         (2, f"{boiler} x other words entirely different dd ee ff"),
         (3, "standalone text with no shared units at all"),
         (4, f"{boiler} x"),          # only the shared unit → emptied
         (5, "")],                    # empty doc → no units row at all
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup_paragraphs(docs, unit_words=8, max_docs=1).collect()}
    # the 8-word boilerplate unit appears in docs 1, 2, 4 → removed
    assert out[1].text_dedup == "unique one content here aa bb cc"
    assert out[1].n_units == 2 and out[1].n_kept == 1
    assert out[2].text_dedup == "other words entirely different dd ee ff"
    assert out[3].text_dedup == "standalone text with no shared units at all"
    assert out[3].n_kept == 1
    assert out[4].n_kept == 0 and out[4].text_dedup == ""
    assert 5 not in out                # empty docs yield no units
    # order preservation across >2 units
    long = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string")
    r = dedup_paragraphs(long, unit_words=8).collect()[0]
    assert r.text_dedup == " ".join(f"w{i}" for i in range(20))
    assert r.n_units == 3 and r.n_kept == 3


def test_cms_top_terms_overestimates_and_finds_heavy_hitters(spark):
    """CMS semantics: est >= true for EVERY value (collisions only add);
    on a skewed corpus the true heavy hitters lead the estimate ranking;
    a universe far below the sketch width is counted exactly; bad
    params raise."""
    import pytest as _pytest
    from pyspark.sql import Row, functions as F
    from ydb_cdc_processor_spark.functions.sketches import cms_top_terms

    # skewed: value 'hot' 500x, 'warm' 100x, 60 singletons
    rows = [Row(v="hot")] * 500 + [Row(v="warm")] * 100 + \
        [Row(v=f"cold{i}") for i in range(60)]
    df = spark.createDataFrame(rows)
    got = {r.term: (r.est_count, r.rnk)
           for r in cms_top_terms(df, "v", depth=4, width_hex=2,
                                  k=1000).collect()}
    true = {r.v: r.c for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    for term, cnt in true.items():
        assert got[term][0] >= cnt, (term, got[term], cnt)
    assert got["hot"][1] == 1 and got["warm"][1] == 2

    # tiny universe, wide sketch: depth-4 collision in 256 buckets is
    # vanishingly unlikely for 3 values — counts exact
    small = spark.createDataFrame(
        [Row(v="a")] * 7 + [Row(v="b")] * 3 + [Row(v="c")])
    ex = {r.term: r.est_count
          for r in cms_top_terms(small, "v", k=10).collect()}
    assert ex == {"a": 7, "b": 3, "c": 1}

    with _pytest.raises(ValueError, match="depth"):
        cms_top_terms(small, "v", depth=0)
    with _pytest.raises(ValueError, match="width_hex"):
        cms_top_terms(small, "v", width_hex=0)


def test_dyadic_rank_sketch_bounds_and_decomposition(spark):
    """Dyadic-CM rank sketch: est_rank >= true rank for every probe
    (CMS only overestimates), exact on a tiny collision-free universe,
    monotone in x, and the probe decomposition covers [0, x) exactly
    (pinned by the exactness case)."""
    import pytest as _pytest
    from pyspark.sql import Row, functions as F
    from ydb_cdc_processor_spark.functions.sketches import (
        dyadic_node_stream, dyadic_probe_nodes, dyadic_rank_estimates)

    # small universe: 10 distinct values with known multiplicities
    spec = {0: 3, 1: 2, 5: 4, 7: 1, 12: 5, 33: 2, 64: 1, 100: 3,
            200: 2, 255: 1}
    rows = [Row(v=val) for val, n in spec.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "v long")
    probes = spark.createDataFrame(
        [(x,) for x in (0, 1, 2, 6, 13, 64, 101, 256)], "x long")
    got = {r.x: r.est_rank for r in dyadic_rank_estimates(
        df, "v", probes, "x", levels=8, depth=4).collect()}
    true = {x: sum(n for val, n in spec.items() if val < x)
            for x in (0, 1, 2, 6, 13, 64, 101, 256)}
    assert all(got[x] >= true[x] for x in true)
    # collision-free at this size: exact
    assert got == true
    # monotone
    xs = sorted(got)
    assert all(got[a] <= got[b] for a, b in zip(xs, xs[1:]))

    # skewed bigger universe: bound still holds
    big = spark.range(0, 3000).select(
        (F.col("id") % 700).alias("v"))
    p2 = spark.createDataFrame([(100,), (350,), (700,)], "x long")
    est = {r.x: r.est_rank for r in dyadic_rank_estimates(
        big, "v", p2, "x", levels=10, depth=4).collect()}
    tr = {100: 100 * 5, 350: 350 * 5, 700: 3000}
    # v in [0,700): ids 0..2999 → values hit ~4.29x each... compute truly
    tr = {x: sum(1 for i in range(3000) if (i % 700) < x)
          for x in (100, 350, 700)}
    assert all(est[x] >= tr[x] for x in tr)

    # decomposition unit check: nodes of [0, 13) at 4 levels
    pn = {(r.x, r.node) for r in dyadic_probe_nodes(
        spark.createDataFrame([(13,)], "x long"), "x", levels=4).collect()}
    # 13 = 0b1101 → bits 0,2,3 → nodes 0:(12), 2:(2), 3:(0)
    assert pn == {(13, "0:12"), (13, "2:2"), (13, "3:0")}

    # update stream: one node per level per row, root level included
    ns = dyadic_node_stream(spark.createDataFrame([(5,)], "v long"),
                            "v", levels=4)
    assert sorted(r.node for r in ns.collect()) == \
        ["0:5", "1:2", "2:1", "3:0", "4:0"]

    with _pytest.raises(ValueError, match="levels"):
        dyadic_node_stream(df, "v", levels=0)


def test_bpe_apply_semantics(spark):
    """BPE application: known merge outcomes, greedy-leftmost pairing on
    repeats, no cross-boundary merges (delimiter is outside the
    alphabet), empty docs yield 0 tokens / NULL compression."""
    from pyspark.sql import functions as F
    from ydb_cdc_processor_spark.operators.text import bpe_apply

    docs = spark.createDataFrame(
        [(1, "the then"), (2, "lll"), (3, ""), (4, "xy"),
         (5, "to ton")],
        "doc_id long, text string")
    merges = [("t", "h"), ("th", "e"), ("l", "l"), ("t", "o")]
    got = {r.doc_id: (r.n_chars, r.n_bpe_tokens)
           for r in bpe_apply(docs, merges).collect()}
    # "the then" → marked "the_then" (8 chars); merges: t h→th,
    # th e→the, t o: tokens [the][_][the][n] = 4
    assert got[1] == (8, 4)
    # "lll": l l merges leftmost pair only → [ll][l] = 2 tokens
    assert got[2] == (3, 2)
    assert got[3] == (0, 0)
    # no applicable merges: 2 chars → 2 tokens
    assert got[4] == (2, 2)
    # "to ton" → "to_ton": [to][_][to][n] = 4 — the 'to' inside 'ton'
    # merges because BPE is position-blind, but '_t' never merges with
    # a preceding token (boundary safety)
    assert got[5] == (6, 4)

    # compression is chars/token rounded 6, NULL on empty
    rows = {r.doc_id: r.compression for r in bpe_apply(docs, merges).collect()}
    assert rows[1] == 2.0 and rows[3] is None


def test_dyadic_quantiles_extraction(spark):
    """Driver-side quantile extraction from the dyadic-CM counters:
    exact on a collision-free universe (the returned x is the smallest
    value whose strict rank reaches q*N), one-sided (<= true position)
    in general, and bad q raises."""
    import pytest as _pytest
    from pyspark.sql import Row
    from ydb_cdc_processor_spark.functions.sketches import dyadic_quantiles

    # 100 values 0..99, uniform
    df = spark.createDataFrame([Row(v=i) for i in range(100)], "v long")
    got = dict(dyadic_quantiles(df, "v", [0.25, 0.5, 0.9, 1.0],
                                levels=8, depth=4))
    # smallest x with |{v < x}| >= q*100, minus 1 → the value at the
    # q-th position: q=0.5 → x=50 has rank 50 → value 49
    assert got == {0.25: 24, 0.5: 49, 0.9: 89, 1.0: 99}

    # skewed: 90 zeros + 10 nines
    sk = spark.createDataFrame(
        [Row(v=0)] * 90 + [Row(v=9)] * 10, "v long")
    g2 = dict(dyadic_quantiles(sk, "v", [0.5, 0.95], levels=4, depth=4))
    assert g2[0.5] == 0 and g2[0.95] == 9

    with _pytest.raises(ValueError, match="q must be"):
        dyadic_quantiles(df, "v", [0.0])
