"""ydb_cdc_processor_spark — a PySpark-native CDC materialized-view engine.

A from-scratch, Spark-first re-expression of the capabilities of
ydb-platform/ydb-cdc-processor (reference at /root/reference, a Java/Spring
service that feeds YDB JSON changefeeds through user YQL into materialized
views).  Architecture (see SURVEY.md):

- CDC JSON envelopes ``{key:[...], update:{...}|newImage:{...}|erase:{}}``
  are decoded with a single ``from_json`` projection (reference:
  CdcMsgParser.java:45-83 + YqlQuery.java:55-166, a hand-written row loop).
- The user transformation is plain Spark SQL over a per-micro-batch temp
  view named ``rows`` — the analogue of YQL ``AS_TABLE($rows)``
  (reference: YqlQuery.java:185-196).
- Materialized views are maintained by a keyed MERGE writer with four
  action modes (UPSERT/DELETE/UPDATE/INSERT — reference:
  CdcMsgParser.java:225-249).
- Streaming uses Structured Streaming ``foreachBatch`` + checkpoints for
  the reference's at-least-once + idempotent-upsert delivery
  (YqlWriter.java:181-266).

Catalyst supplies every relational optimization the reference delegates to
the YDB server; no custom rules are needed (SURVEY.md §4).
"""

from ydb_cdc_processor_spark.session import get_spark
from ydb_cdc_processor_spark.plans.pipeline import (
    ActionMode, CdcPipeline, PipelineValidationError)
from ydb_cdc_processor_spark.plans.config import load_config_xml
from ydb_cdc_processor_spark.plans.yql_compat import translate_yql
from ydb_cdc_processor_spark.engine import CdcBatchEngine, run_transform
from ydb_cdc_processor_spark.operators.merge import ParquetMaterializedView
from ydb_cdc_processor_spark.operators.bucketed_view import (
    BucketedMaterializedView, MaintenanceFenceError)
from ydb_cdc_processor_spark.streaming import CdcStreamEngine
from ydb_cdc_processor_spark.app import CdcApp

__all__ = [
    "get_spark", "ActionMode", "CdcPipeline", "PipelineValidationError",
    "load_config_xml", "translate_yql", "CdcBatchEngine", "run_transform",
    "ParquetMaterializedView", "BucketedMaterializedView",
    "MaintenanceFenceError", "CdcStreamEngine", "CdcApp",
]
__version__ = "0.1.0"
