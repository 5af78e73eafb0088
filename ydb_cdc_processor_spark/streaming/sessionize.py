"""Stateful streaming sessionization — session windows over a CDC stream.

The reference keeps no stream state (SURVEY.md §7: all statefulness lives
in the target table + checkpoint), but a training-data pipeline wants
activity sessions.  Spark-first shape: the built-in ``session_window``
gap-merge aggregation under an event-time watermark — state store,
late-data handling, and recovery come from Structured Streaming, no
custom operator code.  (The batch-mode equivalent, oracle-checked against
DuckDB, is registry ``q_sessionize`` — lag → flag → running sum.)

At scale: state is hash-partitioned by (user, session window); the
watermark bounds state size by evicting sessions older than the allowed
lateness — without it, state grows without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.operators.decode import decode_cdc
from ydb_cdc_processor_spark.sources import cdc_json


def sessionize(events: DataFrame, *, gap: str = "30 minutes",
               watermark: str | None = "2 hours",
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """(user_id, sess_start, sess_end, n_events) via gap-merge session
    windows.  Works on both batch and streaming DataFrames; streaming
    requires the watermark (state eviction)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                       F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(user_col,
                    F.col("sw.start").alias("sess_start"),
                    F.col("sw.end").alias("sess_end"),
                    "n_events"))


def sessionize_cdc_stream(spark: SparkSession, source_path: str,
                          members: dict[str, str], pk: list[str], *,
                          gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """CDC JSON stream → typed decode → session windows.  Returns a
    streaming DataFrame; attach a writeStream sink + checkpoint to run."""
    raw = cdc_json.read_cdc_stream(spark, source_path)
    typed = decode_cdc(raw, members, pk)
    return sessionize(typed, gap=gap, watermark=watermark)
