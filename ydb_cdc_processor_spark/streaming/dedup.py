"""Streaming dedup operators — bounded-state exactly-once hardening.

Two layers, both with watermark-bounded state (an unbounded
``dropDuplicates`` grows state forever and OOMs a long-running stream —
the 100 TB disqualifier):

- :func:`dedup_redelivered` — SOURCE-level: drop re-delivered topic
  records by (partition, offset).  The reference gets at-least-once from
  deferred commits (YqlWriter.java:181-206) and relies on idempotent
  UPSERTs to absorb replays; the keyed-merge sink here is idempotent the
  same way, so this operator only removes the *wasted reprocessing* of a
  redelivered batch, not a correctness gap.
- :func:`dedup_documents_stream` — CONTENT-level: first-seen-wins on a
  document fingerprint, the streaming twin of
  ``operators/dedup.exact_dedup_groups`` for ingest pipelines that must
  not admit a near-real-time duplicate document twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.text import fingerprint


def dedup_redelivered(raw: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Drop duplicate (``_partition``, ``_offset``) records within the
    watermark window.

    Event time is ingest time (``current_timestamp``): redelivery windows
    are a property of the transport, not the data, and an ingest-time
    watermark is what bounds the dedup state for an always-on stream.
    Records redelivered LATER than ``delay`` pass through — and are then
    absorbed by the idempotent keyed merge, exactly like the reference's
    replayed UPSERTs."""
    return (raw.withColumn("_ingest_ts", F.current_timestamp())
               .withWatermark("_ingest_ts", delay)
               .dropDuplicatesWithinWatermark(["_partition", "_offset"])
               .drop("_ingest_ts"))


def dedup_documents_stream(docs: DataFrame, text_col: str = "text",
                           delay: str = "1 hour") -> DataFrame:
    """First-seen-wins streaming dedup on the normalized content
    fingerprint (md5 — same digest as the batch ``exact_dedup_groups``
    oracle).  State: one fingerprint per distinct document within the
    watermark, dropped on expiry."""
    return (docs.withColumn("_fp", fingerprint(F.col(text_col)))
                .withColumn("_ingest_ts", F.current_timestamp())
                .withWatermark("_ingest_ts", delay)
                .dropDuplicatesWithinWatermark(["_fp"])
                .drop("_ingest_ts"))
