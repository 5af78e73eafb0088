"""Iterative graph algorithms as deterministic DataFrame loops.

Connected components live in operators/dedup.py (min-label and
large-star/small-star, both oracle-gated).  This module adds PageRank —
the canonical fixed-point iteration — in an ENGINE-REPLAYABLE form: a
fixed iteration count unrolls to a chain of join+aggregate rounds whose
per-edge contributions round to DECIMAL before summing, so the
distributed sum is exact/order-independent and a sequential SQL engine
replays the identical ranks bit-for-bit (the same determinism contract
as functions/aggregates.py).

Scale shape per iteration: one equi-join of the rank vector against the
edge list (both hash-partitioned on the node) + one map-side-combined
aggregate on the destination — the standard Pregel lowering.  No driver
loop state besides the unrolled plan; ``localCheckpoint`` cuts lineage
every few rounds so plans stay bounded for large ``n_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 3, damping: float = 0.85,
             checkpoint_every: int = 8, exact: bool = True) -> DataFrame:
    """PageRank over an edge list (directed; pass both directions for an
    undirected walk), ``n_iter`` synchronous power-iteration rounds from
    a uniform start.

    Every node that appears as a source contributes rank/out-degree to
    its destinations; ``r' = (1-d)/N + d·Σ contributions``.  Nodes with
    no in-edges keep the teleport term.

    ``exact=True`` (default): contributions are rounded to
    DECIMAL(38,18) per row before the exact decimal sum — deterministic
    at any parallelism and replayable by any SQL engine (the oracle
    contract).  ``exact=False``: plain double sums — the per-edge
    decimal round-trip disappears from every iteration (~1.1-1.6×
    faster at sf0.1 depending on box load — the decimal cast is NOT
    the dominant cost, the edge derivation was; see below) and the
    better sf-scaling curve; ranks then differ from the exact mode only
    by float-summation order (≤ ~1e-12 relative for graphs this shape —
    pinned by test_pagerank_fast_close_to_exact), so use it whenever
    bit-replay across engines is not required.

    The edge list is eagerly ``localCheckpoint``-ed before iterating:
    the unrolled n_iter-round plan references the edge subtree (often an
    expensive join+distinct derivation at the caller) once per
    iteration per branch, and exchange reuse does not always collapse
    the re-executions — materializing |E| rows once cuts the whole
    subtree out of every iteration (measured 10.3 s → ~6 s exact at
    sf0.1).  Linear storage, the standard Pregel-edges-are-static call.

    Output: ``(node, rank DOUBLE)`` for every node incident to an edge.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")) \
        .localCheckpoint(eager=True)
    nodes = (e.select(F.col("_s").alias("node"))
             .unionByName(e.select(F.col("_d").alias("node")))
             .distinct())
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    n = nodes.agg(F.count(F.lit(1)).alias("_n"))
    ranks = (nodes.crossJoin(F.broadcast(n))
             .select("node", "_n",
                     (F.lit(1.0) / F.col("_n")).alias("rank")))
    for i in range(n_iter):
        c = F.col("rank") / F.col("_deg")
        if exact:
            c = c.cast("decimal(38,18)")
        contrib = (ranks
                   .join(e, ranks.node == e._s)
                   .join(deg, on="_s")
                   .select(F.col("_d").alias("node"), c.alias("_c")))
        summed = contrib.groupBy("node").agg(
            F.sum("_c").cast("double").alias("_in"))
        ranks = (ranks.select("node", "_n")
                 .join(summed, on="node", how="left")
                 .select("node", "_n",
                         (F.lit(1.0 - damping) / F.col("_n")
                          + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
                          ).alias("rank")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph (edges
    in either/both directions; self-loops dropped).

    Canonical low→high orientation first, then the standard two-path +
    closing-edge plan: ``e(a,b) ⋈ e(b,c) ⋈ e(a,c)`` with ``a<b<c``
    enumerates each triangle exactly once.  Orienting by id bounds the
    join fan-out by each node's LOW-neighbor degree (the classic
    degree-ordering trick — a hub's triangles are charged to its smaller
    endpoints, so no single task owns a hub's full neighborhood²); both
    joins are hash equi-joins on a node key, AQE splits residual skew.

    Output: ``(node, n_triangles)`` for every node of the graph (zero
    rows included — isolated-from-triangles nodes still report)."""
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    # wedges a<b<c closed by edge (a,c)
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = (e.join(e2, on="b")
           .join(e.select(F.col("a"), F.col("b").alias("c")),
                 on=["a", "c"], how="left_semi")
           .select("a", "b", "c"))
    per_node = (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("n_triangles")))
    return (nodes.join(per_node, on="node", how="left")
            .select("node", F.coalesce("n_triangles", F.lit(0))
                    .cast("long").alias("n_triangles")))


def tree_paths(parents: DataFrame, node: str = "node",
               parent: str = "parent", max_depth: int = 64) -> DataFrame:
    """Root + depth for every node of a forest given ``(node, parent)``
    edges (roots appear with NULL parent, or simply never as a child).

    Pointer doubling, not per-level iteration: each round joins the
    current ancestor pointers with themselves, squaring the jump length
    — ``(node → anc, d)`` ⋈ ``(anc → anc', d')`` ⇒ ``(node → anc',
    d+d')`` — so a depth-D forest resolves in ⌈log₂ D⌉ rounds of
    hash equi-joins instead of D chained joins (the difference between
    6 and 64 shuffles on a deep hierarchy).  Each round's pointer table
    is localCheckpoint-ed: the next round references it twice (both
    sides of the self-join) and lineage would otherwise double per
    round.

    Output: ``(node, root, depth)`` — depth 0 for roots."""
    p = (parents.select(F.col(node).alias("n"), F.col(parent).alias("p"))
         .where(F.col(parent).isNotNull())
         .localCheckpoint(eager=True))
    all_nodes = (p.select("n")
                 .unionByName(p.select(F.col("p").alias("n")))
                 .distinct())
    # ptr: node -> highest known ancestor, with hop count
    ptr = (all_nodes.join(p, on="n", how="left")
           .select("n", F.coalesce("p", F.col("n")).alias("anc"),
                   F.col("p").isNotNull().cast("long").alias("d"))
           .localCheckpoint(eager=True))
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        up = ptr.select(F.col("n").alias("anc"),
                        F.col("anc").alias("anc2"),
                        F.col("d").alias("d2"))
        ptr = (ptr.join(up, on="anc")
               .select("n", F.col("anc2").alias("anc"),
                       (F.col("d") + F.col("d2")).alias("d"))
               .localCheckpoint(eager=True))
    return ptr.select(F.col("n").alias(node), F.col("anc").alias("root"),
                      F.col("d").cast("long").alias("depth"))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", n_iter: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection by neighbor-majority vote: every node starts labeled with
    itself; each round, a node adopts the label MOST FREQUENT among its
    in-neighbors (pass both edge directions for the undirected
    algorithm), ties broken by the smallest label, nodes with no
    in-edges keeping their label.  The synchronous update + the
    deterministic tie-break make the run exactly replayable by any SQL
    engine (every intermediate is an integer count or a string compare
    — no floats anywhere), unlike the classic randomized-order variant.

    This is the COMMUNITY operator in the graph family: connected
    components (dedup.duplicate_clusters) answer reachability, PageRank
    ranks, LPA groups densely-linked neighborhoods — the distinct use
    is clustering a near-dup or interaction graph into topical blocks.

    Per round: one labels⋈edges equi-join + one map-side-combined
    (node, label) count + one per-node arg-min aggregate (min over the
    (-count, label) struct — a hash agg, NOT a window sort).  Labels
    are localCheckpoint-ed per round (|V| rows) so the unrolled plan
    never re-executes prior rounds — the same Pregel-state pattern as
    :func:`pagerank`/:func:`tree_paths`.

    Output: ``(node, community)`` for every node incident to an edge.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")) \
        .localCheckpoint(eager=True)
    labels = (e.select(F.col("_s").alias("node"))
              .unionByName(e.select(F.col("_d").alias("node")))
              .distinct()
              .select("node", F.col("node").alias("label")))
    for _ in range(n_iter):
        votes = (labels.join(e, labels.node == e._s)
                 .groupBy(F.col("_d").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("_cnt")))
        best = (votes.groupBy("node")
                .agg(F.min(F.struct((-F.col("_cnt")).alias("nc"),
                                    F.col("label").alias("lb")))
                     .alias("_b"))
                .select("node", F.col("_b.lb").alias("_new")))
        labels = (labels.select("node", "label")
                  .join(best, on="node", how="left")
                  .select("node",
                          F.coalesce("_new", "label").alias("label"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("label").alias("community"))
