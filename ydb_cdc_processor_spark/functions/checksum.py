"""Order-independent table checksums for CDC sink verification.

A CDC pipeline's operational question is "does the sink now equal the
source?" — the reference answers it only indirectly (row counts on the
status page, WebController.java:25-84).  A content checksum answers it
directly: hash every row to an integer, SUM the integers.  Addition is
commutative, so the digest is independent of row order, partitioning,
and engine — two tables are (overwhelmingly likely) equal iff their
(row_count, digest) pairs match, and the digest of a UNION of disjoint
shards is the sum of shard digests, so incremental maintenance is one
add per micro-batch.

Injectivity: each field is hashed SEPARATELY to a fixed-width 32-char
md5 hex block (NULL → a 32-char marker outside md5's [0-9a-f] output
alphabet), and the row digest hashes the concatenation of those blocks.
Because every block has the same width and the NULL marker cannot be
produced by md5, distinct rows map to distinct pre-images — the only
possible collisions are md5 collisions themselves.  (A naive
separator-join serialization is NOT injective: a field value containing
the separator character forges field boundaries before hashing.)

Scale shape: a codegen'd projection + a single global SUM — map-side
partial aggregation collapses each task to one 128-bit partial, the
exchange carries #partitions rows.  No sort, no collect of data rows.

Cross-engine exactness: the per-row integer is the first 15 hex chars
of md5 (60 bits, exact in BIGINT); the sum is DECIMAL(38,0), rendered
as a canonical STRING in the output — DuckDB's BIGINT sum widens to
HUGEINT whose pandas conversion goes through float64 and silently
loses precision above 2^53, so the comparable form is the decimal
string, never a native numeric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 32-char NULL block — 'N' is outside md5's hex output alphabet, so no
#: field digest can ever equal it.  Must match the oracle's repeat('N',32).
NULL_BLOCK = "N" * 32

#: Digest FORMAT VERSION, emitted with every checksum so persisted
#: baselines fail LOUDLY on format changes instead of comparing unequal.
#: History — compare digests only within the same tag:
#:   (untagged)   round-6: separator-join serialization, DECIMAL digest.
#:                NOT injective and numerically incomparable cross-engine;
#:                any stored digest from then is incompatible with later
#:                formats (equal tables WILL read as a mismatch).
#:   "cksum-v2"   round-7+: per-field md5 blocks (injective), digest
#:                rendered as a canonical decimal STRING.
DIGEST_FORMAT = "cksum-v2"


def row_digest(cols: list[Column]) -> Column:
    """60-bit integer hash of the injective row serialization:
    ``md5(md5(c1) || md5(c2) || ...)`` with each NULL field encoded as
    the fixed-width ``NULL_BLOCK``.  Callers must cast non-string
    columns to a canonical string form themselves (casts differ per
    type; digest equality requires the caller to pick ONE canonical
    rendering)."""
    blocks = [F.coalesce(F.md5(c.cast("string").cast("binary")),
                         F.lit(NULL_BLOCK)) for c in cols]
    joined = F.concat(*blocks) if len(blocks) > 1 else blocks[0]
    return F.conv(F.substring(F.md5(joined.cast("binary")), 1, 15),
                  16, 10).cast("long")


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row digest of ``df[cols]``: ``(n_rows BIGINT, digest STRING,
    fmt STRING)`` — the digest is DECIMAL(38,0) rendered canonically as
    a string so it compares exactly across engines (see module
    docstring).  Equal digests + equal counts ⇒ equal multisets of rows
    (up to md5 collisions).  Compare source vs sink, or yesterday vs
    today, with two cheap scans and an equality check.

    ``fmt`` carries :data:`DIGEST_FORMAT` so a digest persisted as a
    baseline is self-describing: comparing rows with different ``fmt``
    tags is a format break, not a data mismatch — check it FIRST (the
    round-6 → round-7 serialization change made all older stored
    digests silently incomparable; the tag turns that failure mode into
    an explicit signal)."""
    d = row_digest([F.col(c) for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(d.cast("decimal(38,0)")).cast("string").alias("digest"),
        F.lit(DIGEST_FORMAT).alias("fmt"))
