"""CDC JSON source (operators S1-S4, SURVEY.md §2) + deterministic fixture
generator (FIXTURES.md §B).

The reference subscribes an SDK ``AsyncReader`` to a YDB topic
(CdcReader.java:34-53).  The Spark-native source is Structured Streaming
over JSON line files (or Kafka with the same value format — same decode
path).  Rate/buffer limits map to ``maxFilesPerTrigger`` /
``maxBytesPerTrigger`` (reference's 200 MB buffer, CdcReader.java:43).

Each line is a YDB changefeed envelope (README.md:62-72):

    {"key":[...], "update":{...}}      upsert (payload, or newImage when {})
    {"key":[...], "erase":{}}          delete

The generator adds ``_offset`` (per-partition monotonically increasing) and
``_partition`` fields, standing in for topic (partition, offset) — used for
per-key ordering (B2/B4) and deferred-commit tests (R2).
"""

from __future__ import annotations

import json
import math
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_SCHEMA = T.StructType([
    T.StructField("value", T.StringType(), False),
    T.StructField("_partition", T.IntegerType(), False),
    T.StructField("_offset", T.LongType(), False),
])


def read_cdc_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of CDC JSON-lines part files (raw, undecoded)."""
    return spark.read.schema(RAW_SCHEMA).json(path)


def read_cdc_stream(spark: SparkSession, path: str,
                    max_files_per_trigger: int | None = None,
                    max_bytes_per_trigger: str | int | None = None
                    ) -> DataFrame:
    """S1 — streaming read.  ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
    are the backpressure knobs (≙ the reference's 200 MB reader buffer +
    bounded queue, CdcReader.java:43 / YqlWriter.java:130; pass
    ``max_bytes_per_trigger="200m"`` for exact buffer parity)."""
    reader = spark.readStream.schema(RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.json(path)


def kafka_records_to_raw(kafka_df: DataFrame) -> DataFrame:
    """Map a Kafka-source DataFrame (``key/value binary, partition int,
    offset long, …``) to the engine's RAW_SCHEMA shape.

    The reference consumes the same envelopes from a YDB topic
    (CdcReader.java:104-108 receives (partition, offset, payload));
    with Kafka the message value IS the JSON envelope and the topic
    coordinates become ``(_partition, _offset)`` — so the entire decode /
    ordering / merge path downstream is identical to the file source.
    Pure projection: usable on both batch and streaming Kafka reads."""
    return kafka_df.select(
        F.col("value").cast("string").alias("value"),
        F.col("partition").cast("int").alias("_partition"),
        F.col("offset").cast("long").alias("_offset"))


def read_cdc_stream_kafka(spark: SparkSession, bootstrap_servers: str,
                          topic: str, *, starting_offsets: str = "earliest",
                          max_offsets_per_trigger: int | None = None
                          ) -> DataFrame:
    """S1 (Kafka variant) — subscribe to a topic of CDC JSON envelopes.

    ``maxOffsetsPerTrigger`` is the backpressure knob (≙ the reference's
    200 MB reader buffer, CdcReader.java:43).  Requires the
    spark-sql-kafka package on the classpath; this container ships none,
    so the function is exercised in tests only through
    :func:`kafka_records_to_raw` on Kafka-shaped DataFrames."""
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger",
                               max_offsets_per_trigger)
    return kafka_records_to_raw(reader.load())


# ---------------------------------------------------------------------------
# Fixture generation (FIXTURES.md §B) — engine-side, deterministic.
# ---------------------------------------------------------------------------

def _json_value(v):
    if v is None:
        return None
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return v.isoformat().replace("+00:00", "Z")
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    return v


def envelope(key: list, update: dict | None = None, *,
             new_image: dict | None = None, erase: bool = False) -> str:
    env: dict = {"key": [_json_value(k) for k in key]}
    if erase:
        env["erase"] = {}
    else:
        if update is not None:
            env["update"] = {k: _json_value(v) for k, v in update.items()}
        if new_image is not None:
            env["newImage"] = {k: _json_value(v) for k, v in new_image.items()}
    return json.dumps(env, separators=(",", ":"))


def write_events_cdc_fixture(spark: SparkSession, sf_dir: str, out_dir: str,
                             n_partitions: int = 4,
                             limit: int | None = None) -> int:
    """Generate the ``events_cdc`` fixture (FIXTURES.md §B.1) from the
    driver's ``events`` table: one upsert envelope per row, partitioned by
    ``event_id % n_partitions`` (≙ topic partitions), offsets dense per
    partition, plus the edge-case rows FIXTURES.md requires:

    1. ``update:{}`` + ``newImage`` fallback  (CdcMsgParser.java:62-69)
    2. null optional columns                  (YqlQuery.java:90-97)
    3. same-key U→U→D and D→U interleavings   (YqlWriter.java:184-207)
    4. malformed envelopes                    (CdcMsgParser.java:47-57)

    Returns the number of WELL-FORMED envelopes written.
    """
    from ydb_cdc_processor_spark.sources.catalog import load_table
    rows = load_table(spark, sf_dir, "events").orderBy("event_id").collect()
    if limit:
        rows = rows[:limit]
    parts: list[list[str]] = [[] for _ in range(n_partitions)]

    def emit(pid: int, line: str):
        parts[pid % n_partitions].append(line)

    def payload(r, **over):
        d = {"ts": r.ts, "user_id": r.user_id, "event_type": r.event_type,
             "value": r.value, "props": r.props}
        d.update(over)
        return d

    for i, r in enumerate(rows):
        pid = r.event_id % n_partitions
        if i % 97 == 3:  # edge 1: empty update, payload in newImage
            emit(pid, envelope([r.event_id], update={}, new_image=payload(r)))
        elif i % 97 == 5:  # edge 2: null optionals
            emit(pid, envelope([r.event_id], payload(r, value=None, props=None)))
        else:
            emit(pid, envelope([r.event_id], payload(r)))
        if i % 211 == 7:  # edge 3a: U→U→D — final state: deleted
            emit(pid, envelope([r.event_id], payload(r, value=-1.0)))
            emit(pid, envelope([r.event_id], erase=True))
        if i % 211 == 11:  # edge 3b: D→U — final state: re-upserted
            emit(pid, envelope([r.event_id], erase=True))
            emit(pid, envelope([r.event_id], payload(r)))
    well_formed = sum(len(p) for p in parts)
    # edge 4: malformed envelopes — logged-and-skipped by the decoder
    emit(0, '{"no_key": true}')
    emit(1, '{"key": 42, "update": {}}')
    emit(2, '{"key": [1]}')

    os.makedirs(out_dir, exist_ok=True)
    # Kafka-like wrapping: the envelope is the message ``value``;
    # ``(_partition, _offset)`` are the source coordinates (metadata the
    # reference gets from the topic SDK, CdcReader.java:104-108).
    for pid, lines in enumerate(parts):
        with open(os.path.join(out_dir, f"part-{pid:04d}.json"), "w") as f:
            for off, line in enumerate(lines):
                rec = {"value": line, "_partition": pid, "_offset": off}
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
    return well_formed


def write_events_cdc_fixture_distributed(spark: SparkSession, sf_dir: str,
                                         out_dir: str,
                                         n_partitions: int = 32) -> None:
    """Scale-path fixture writer: builds envelopes WITH SPARK (``to_json``
    projection, no driver loop) — this is how a real deployment would
    replay a table into a changefeed at 100 TB.  No edge-case rows; use
    :func:`write_events_cdc_fixture` for those."""
    from pyspark.sql import Window
    from ydb_cdc_processor_spark.sources.catalog import load_table
    ev = load_table(spark, sf_dir, "events")
    part = (F.col("event_id") % n_partitions).cast("int")
    w = Window.partitionBy("_partition").orderBy("event_id")
    (ev.select(
        F.col("event_id"),
        F.to_json(F.struct(
            F.array(F.col("event_id").cast("string")).alias("key"),
            F.struct(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("ts"),
                F.col("user_id"), F.col("event_type"), F.col("value"),
                F.col("props")).alias("update"),
        )).alias("value"),
        part.alias("_partition"))
     .withColumn("_offset", F.row_number().over(w).cast("long"))
     .drop("event_id")
     .repartition(n_partitions, "_partition")
     .write.mode("overwrite").json(out_dir))


EVENTS_MEMBERS: dict[str, str] = {
    # Declared batch struct for events_cdc (FIXTURES.md §B.1) — the analogue
    # of DECLARE $rows (README.md:81-89).  ts arrives as ISO text.
    "event_id": "Int64",
    "ts": "Timestamp",
    "user_id": "Int64",
    "event_type": "Text",
    "value": "Optional<Double>",
    "props": "Optional<Json>",
}
