"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC pipeline end-to-end (fixture → decode →
SQL transform → keyed merge view) at sf0.001; ``queries``/``oracle_sql``
expose the full operator registry (one entry per SURVEY.md §2 operator,
mapping in FIXTURES.md §C, plus the M4 LLM-pipeline operators) for the
DuckDB correctness harness.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: maintain the README-v1 materialized view from a CDC
    changefeed of the ``events`` table (SURVEY.md §0's full data path) and
    return the resulting view."""
    from ydb_cdc_processor_spark.engine import CdcBatchEngine
    from ydb_cdc_processor_spark.plans.pipeline import ActionMode, CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.catalog import describe_table

    sf_dir = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="cdc_entry_")
    fixture = os.path.join(work, "events_cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture)

    schema, pk = describe_table(spark, sf_dir, "events")
    pipeline = CdcPipeline(
        name="events_view1",
        source_schema=schema,
        pk=pk,
        members=cdc_json.EVENTS_MEMBERS,
        update_sql="""
            SELECT event_id, ts, user_id, event_type, value
            FROM rows
        """,
        delete_sql="SELECT event_id FROM rows",
        action_mode=ActionMode.DIRECT,
    ).validate(spark)

    eng = CdcBatchEngine(spark, pipeline, os.path.join(work, "events_view1"))
    eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    return eng.read_view()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registry queries, ordered by ``driver_window_priority()``:
    never-driver-stamped entries first, then stalest stamps — so the
    external harness's first-N correctness window always spends its
    budget on the least-verified queries.  The ordering lives HERE (the
    one consumer that wants it), not in the registry, whose iteration
    order stays registration order for bench/tests/tools."""
    from ydb_cdc_processor_spark.registry import (
        QUERIES, driver_window_priority)
    return {n: QUERIES[n] for n in driver_window_priority()}


def oracle_sql() -> dict[str, str]:
    from ydb_cdc_processor_spark.registry import (
        ORACLES, driver_window_priority)
    return {n: ORACLES[n] for n in driver_window_priority() if n in ORACLES}
