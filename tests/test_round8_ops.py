"""Round-8 operator unit tests: span-level dedup, triangle counting,
hierarchy pointer-doubling, mixture weights."""

from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators import curation, dedup
from ydb_cdc_processor_spark.operators.graph import (
    tree_paths, triangle_count)


# -- duplicate_spans / strip_spans ------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_finds_shared_boilerplate(spark):
    header = "all rights reserved by the example corporation"  # 7 tokens
    docs = _docs(spark, [
        (1, header + " alpha beta gamma"),
        (2, header + " delta epsilon"),
        (3, "entirely unrelated content with no repeats at all"),
    ])
    spans = dedup.duplicate_spans(docs, k=5, min_docs=2).collect()
    by_doc = {r.doc_id: (r.span_start, r.span_end, r.n_tokens)
              for r in spans}
    # the 7-token header = three overlapping 5-gram hits merging into
    # one span covering tokens 0..6 in both docs
    assert by_doc[1] == (0, 6, 7)
    assert by_doc[2] == (0, 6, 7)
    assert 3 not in by_doc


def test_duplicate_spans_merges_adjacent_and_splits_gaps(spark):
    a = "one two three four five"           # span A (5 tokens)
    b = "six seven eight nine ten"          # span B (5 tokens)
    docs = _docs(spark, [
        (1, a + " " + b),                    # contiguous: A B
        (2, a + " filler words here apart distinctly " + b),  # gapped
        (3, a + " x " + b + " y"),           # A and B both shared
    ])
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in dedup.duplicate_spans(docs, k=5, min_docs=2)
             .collect()}
    # doc 1: A=[0,4] and B=[5,9] are adjacent -> one merged span [0,9]
    assert (1, 0, 9) in spans
    # doc 2: gap > k between the two hits -> two separate spans
    assert (2, 0, 4) in spans and (2, 10, 14) in spans
    # doc 3: one-token gap still separates (positions 0..4 and 6..10,
    # 6-0 > ... wait: 6-0=6 > 5 -> separate spans)
    assert (3, 0, 4) in spans and (3, 6, 10) in spans


def test_duplicate_spans_short_docs_excluded(spark):
    docs = _docs(spark, [(1, "too few words"), (2, "too few words")])
    assert dedup.duplicate_spans(docs, k=5, min_docs=2).count() == 0


def test_strip_spans_removes_flagged_tokens(spark):
    header = "shared header line for removal here"  # 6 tokens
    docs = _docs(spark, [
        (1, header + " unique tail one"),
        (2, header + " another unique tail"),
        (3, "no duplicate content in this document at all"),
    ])
    spans = dedup.duplicate_spans(docs, k=5, min_docs=2)
    out = {r.doc_id: r.text
           for r in dedup.strip_spans(docs, spans).collect()}
    assert out[1] == "unique tail one"
    assert out[2] == "another unique tail"
    assert out[3] == "no duplicate content in this document at all"


# -- triangle_count ----------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_basic(spark):
    # triangle 1-2-3 plus a pendant 3-4
    got = dict(triangle_count(_edges(spark, [
        (1, 2), (2, 3), (1, 3), (3, 4)])).collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_triangle_count_direction_and_dup_insensitive(spark):
    # same triangle given with reversed/duplicate edges + self-loop
    got = dict(triangle_count(_edges(spark, [
        (2, 1), (1, 2), (3, 2), (1, 3), (3, 1), (2, 2)])).collect())
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = dict(triangle_count(_edges(spark, k4)).collect())
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


# -- tree_paths --------------------------------------------------------------

def test_tree_paths_forest(spark):
    # two trees: 1<-2<-3<-4 (chain) and 10<-11, plus root-only parents
    parents = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (11, 10)],
        "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_paths(parents, max_depth=8).collect()}
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3),
                   10: (10, 0), 11: (10, 1)}


def test_tree_paths_deep_chain_needs_doubling(spark):
    # depth 33 > 2^5: max_depth=64 -> 6 doubling rounds must suffice
    parents = spark.createDataFrame(
        [(i + 1, i) for i in range(33)], "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_paths(parents, max_depth=64).collect()}
    assert got[33] == (0, 33) and got[0] == (0, 0)


def test_tree_paths_null_parents_are_roots(spark):
    parents = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1)], "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_paths(parents, max_depth=4).collect()}
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 1)}


# -- mixture_weights ---------------------------------------------------------

def test_mixture_weights_uniform_target(spark):
    docs = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(90 + i, "small")
                                           for i in range(10)],
        "doc_id long, source string")
    got = {r.source: r for r in
           curation.mixture_weights(docs, group_col="source",
                                    max_repeat=4.0).collect()}
    assert got["big"].n_docs == 90 and got["small"].n_docs == 10
    # uniform target = 0.5 each; weights = 0.5/0.9 and 0.5/0.1
    assert abs(got["big"].weight - 0.555556) < 1e-6
    assert abs(got["small"].weight - 5.0) < 1e-9
    # the small source's 5x repeat is capped at 4 epochs
    assert abs(got["small"].capped_weight - 4.0) < 1e-9
    assert abs(got["big"].capped_weight - got["big"].weight) < 1e-9


def test_mixture_weights_weighted_target(spark):
    docs = spark.createDataFrame(
        [(1, "a", 3.0), (2, "a", 3.0), (3, "b", 2.0)],
        "doc_id long, source string, pref double")
    got = {r.source: r for r in
           curation.mixture_weights(docs, group_col="source",
                                    weight_col="pref",
                                    max_repeat=10.0).collect()}
    # target masses: a=6/8, b=2/8; actual shares: a=2/3, b=1/3
    assert abs(got["a"].weight - (6 / 8) / (2 / 3)) < 1e-9
    assert abs(got["b"].weight - (2 / 8) / (1 / 3)) < 1e-9


def test_rrf_fuse_semantics(spark):
    """RRF: docs in both lists outrank same-rank single-list docs; a
    doc missing from a list contributes nothing for it; ties break on
    doc id; n_lists reports coverage."""
    from ydb_cdc_processor_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "qid string, doc_id long, rank long")
    vec = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "qid string, doc_id long, rank long")
    got = {r.doc_id: r for r in rrf_fuse([lex, vec], k=60).collect()}
    # doc 2: 1/62 + 1/61 beats doc 1's 1/61 alone
    assert got[2].rank == 1 and got[2].n_lists == 2
    assert got[1].rank == 2 and got[1].n_lists == 1
    assert abs(got[2].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(got[4].rrf_score - round(1 / 62, 6)) < 1e-9
    # doc 3 (1/63) vs doc 4 (1/62): 4 outranks 3
    assert got[4].rank == 3 and got[3].rank == 4
