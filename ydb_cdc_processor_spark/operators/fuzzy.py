"""Fuzzy string matching via deletion-neighborhood blocking (SymSpell).

Entity resolution / typo normalization needs "all pairs within edit
distance t" — at corpus scale the naive all-pairs comparison is
quadratic and dead on arrival.  For t=1 the SymSpell observation (Wolf
Garbe's symmetric-delete algorithm, public domain) gives a LOSSLESS
equi-join reduction: if lev(a, b) <= 1 then a and b share at least one
string in their {self} ∪ {single-char deletions} neighborhoods —
  substitution at i: deleting position i from both yields the same
  string; insertion/deletion: the shorter string IS a deletion variant
  of the longer (or itself).
So: explode each term to |term|+1 variants, equi-join on the variant,
verify the survivors with the exact Levenshtein (built-in, codegen'd).
False positives exist (two different deletions colliding — "ab"/"ba"
share variant "a" at distance 2); the verify removes them.  False
negatives do not — the brute-force oracle pins that losslessness.

Scale shape: candidate generation is a per-row array expression (no
shuffle), the join is a plain hash equi-join on the variant string —
O(n·len) exploded rows total, never O(n²).  A variant bucket of length
L is producible by at most ~|Σ|·(L+1) + 1 strings (itself plus every
single-character insertion) — a bound independent of corpus size, which
is the property that matters: buckets cannot grow with n, so no skew
salting is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: str) -> str:
    """SQL expr: the term plus every single-character deletion of it,
    deduplicated (deleting any of a run of equal chars collides)."""
    return (f"array_distinct(concat(array({col}), "
            f"transform(sequence(1, length({col})), "
            f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1)))))")


def fuzzy_pairs_edit1(vocab: DataFrame, term_col: str = "term") -> DataFrame:
    """All unordered pairs of DISTINCT ``vocab[term_col]`` values within
    Levenshtein distance 1.  Output: ``(term_a, term_b, dist)`` with
    ``term_a < term_b``.

    Input should be the distinct vocabulary (call ``.distinct()``
    upstream if unsure) — the blocking key is the term itself, so
    duplicate terms only waste work, never change the result.
    """
    v = vocab.select(F.col(term_col).alias("t")).where(
        F.col("t").isNotNull()).distinct()
    exploded = v.select(
        "t", F.explode(F.expr(_deletion_variants("t"))).alias("vrt"))
    a = exploded.select(F.col("t").alias("term_a"), "vrt")
    b = exploded.select(F.col("t").alias("term_b"), "vrt")
    cand = (a.join(b, on="vrt")
             .where(F.col("term_a") < F.col("term_b"))
             .select("term_a", "term_b")
             .distinct())
    return (cand
            .withColumn("dist",
                        F.levenshtein("term_a", "term_b").cast("long"))
            .where(F.col("dist") <= 1))
