"""Vector column expressions — cosine similarity over array<float|double>.

Pure Catalyst expressions (``zip_with`` + ``aggregate``) so the math runs
JVM-side inside codegen — no Python per row.  Floats are widened to double
first (exact), keeping ulp-level error ~1e-15; callers that need
engine-vs-oracle equality round to 6 decimals (see SURVEY.md §6 rationale
in functions/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a single fold — one pass, no intermediate array alloc
    beyond zip_with's projection."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Pre-normalize embeddings once so repeated similarity queries reduce
    to plain dot products — the 100 TB-friendly formulation (normalize at
    ingest, store, then every search is dot-only)."""
    n = norm(a)
    return F.transform(a, lambda x: x / n)
