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


def _lpa_reference(pairs, n_iter):
    """Plain-Python synchronous LPA with the (most-frequent, smallest)
    tie-break — the reference model label_propagation must match."""
    from collections import Counter, defaultdict
    inn = defaultdict(list)
    nodes = set()
    for s, d in pairs:
        inn[d].append(s)
        nodes.update((s, d))
    lab = {v: v for v in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in nodes:
            if not inn[v]:
                nxt[v] = lab[v]
                continue
            cnt = Counter(lab[u] for u in inn[v])
            top = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == top)
        lab = nxt
    return lab


def test_label_propagation_matches_reference_model(spark):
    from ydb_cdc_processor_spark.operators.graph import label_propagation

    # two triangles bridged by one edge, both directions (undirected)
    und = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    pairs = und + [(b, a) for a, b in und]
    for it in (1, 2, 3):
        got = dict(label_propagation(_edges(spark, pairs), n_iter=it)
                   .collect())
        assert got == _lpa_reference(pairs, it), f"n_iter={it}"
    # the first triangle converges to its min label; the bridge lets
    # label 3 leak into the second triangle (the reference model says
    # exactly where)
    final = dict(label_propagation(_edges(spark, pairs), n_iter=3)
                 .collect())
    assert final == _lpa_reference(pairs, 3)
    assert {final[1], final[2], final[3]} == {1}


def test_label_propagation_determinism_and_edges(spark):
    import pytest as _pytest

    from ydb_cdc_processor_spark.operators.graph import label_propagation

    # a node with no in-edges keeps its own label; ties break to the
    # smallest label (node 4 hears {1, 2} once each -> 1)
    pairs = [(1, 4), (2, 4), (1, 2)]
    got = dict(label_propagation(_edges(spark, pairs), n_iter=1)
               .collect())
    assert got == _lpa_reference(pairs, 1)
    assert got[1] == 1 and got[4] == 1
    # partitioning-independent
    df = _edges(spark, pairs).repartition(7)
    assert dict(label_propagation(df, n_iter=1).collect()) == got
    # n_iter=0 is the identity labeling
    got0 = dict(label_propagation(_edges(spark, pairs), n_iter=0)
                .collect())
    assert got0 == {1: 1, 2: 2, 4: 4}
    with _pytest.raises(ValueError):
        label_propagation(_edges(spark, pairs), n_iter=-1)
