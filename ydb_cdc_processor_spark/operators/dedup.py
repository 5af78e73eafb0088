"""Deduplication operators (SURVEY.md §7 M4 — beyond-reference scope).

Exact and near-duplicate detection over a document corpus, all engineered
for 100 TB:

- **Exact**: hash-groupBy on a normalized-content digest — one shuffle on
  the digest, partial aggregation map-side.  (The CDC engine's PK dedup is
  the keyed variant of the same plan — operators/last_wins.py.)
- **MinHash + LSH**: shingle → k minhashes → band buckets → bucket
  equi-join.  Only same-band-bucket pairs are compared, so the candidate
  set is linear-ish in corpus size instead of quadratic.  Hashes are
  xxhash64 with seeded salts — deterministic, no Python.
- **SimHash**: 64-bit sign-aggregated token hash; near-dups differ in few
  bits.  Bucketed by the top bits for candidate generation.
- **N-gram Jaccard**: exact verification on candidate pairs (the
  re-rank step after LSH).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(norm_hash, keep_doc_id, dup_count): one row per distinct content,
    keeping the smallest id — a pure hash aggregate (map-side partials,
    single shuffle on the digest)."""
    return (docs
            .select(F.md5(normalize_text(F.col(text_col))).alias("norm_hash"),
                    F.col(id_col))
            .groupBy("norm_hash")
            .agg(F.min(id_col).cast("long").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array of the normalized text."""
    words = F.split(normalize_text(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))


def minhash_signature(sh: Column, k: int = 16) -> Column:
    """k-permutation MinHash via k salted xxhash64 passes — an array<long>
    signature.  All JVM-side."""
    return F.array(*[
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(k)
    ])


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_shingle: int = 3,
                      k: int = 16, bands: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    signature (k minhashes) → ``bands`` bands of k/bands rows → a doc
    lands in one bucket per band → pairs sharing any bucket are candidates.
    Self-join is on (band, bucket_hash): an equi-join, shuffle-partitioned
    by bucket — the scalable formulation (never all-pairs).
    Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    """
    rows_per_band = k // bands
    sig = docs.select(
        F.col(id_col).alias("doc"),
        minhash_signature(shingles(F.col(text_col), n_shingle), k).alias("sig"))
    band_rows = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)])).alias("bucket"))
            for b in range(bands)])).alias("bb")) \
        .select("doc", "bb.band", "bb.bucket")
    left = band_rows.withColumnRenamed("doc", "doc_a")
    right = band_rows.withColumnRenamed("doc", "doc_b")
    return (left.join(right, on=["band", "bucket"])
                .where(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b").distinct())


def ngram_jaccard(docs: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (the verify
    step after LSH).  Joins are by doc id — broadcastable when the
    candidate set is small (it is, post-LSH)."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.array_distinct(shingles(F.col(text_col), n)).alias("_sh"))
    j = (pairs
         .join(sh.withColumnRenamed("_id", "doc_a")
                 .withColumnRenamed("_sh", "sh_a"), on="doc_a")
         .join(sh.withColumnRenamed("_id", "doc_b")
                 .withColumnRenamed("_sh", "sh_b"), on="doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "doc_a", "doc_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"))


def simhash64(text: Column, n_shingle: int = 2) -> Column:
    """64-bit SimHash over word shingles: per-bit majority vote of shingle
    hashes, expressed as 64 aggregate-free bit sums via transform+filter.

    Near-duplicate documents have small Hamming distance between
    signatures."""
    sh = shingles(text, n_shingle)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bit_cols = []
    for b in range(64):
        ones = F.size(F.filter(
            hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1))
        bit = F.when(ones * 2 >= F.size(hashes), F.lit(1)).otherwise(F.lit(0))
        bit_cols.append(bit.cast("long") * F.lit(2 ** b if b < 63 else -(2 ** 63)))
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return total


def simhash_candidates(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       prefix_bits: int = 16) -> DataFrame:
    """Bucket docs by the top ``prefix_bits`` of their SimHash — candidate
    near-dup groups come from shared buckets (multi-probe/rotation tables
    extend recall; one table here)."""
    sig = docs.select(F.col(id_col).alias("doc"),
                      simhash64(F.col(text_col)).alias("simhash"))
    return sig.withColumn(
        "bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits))
