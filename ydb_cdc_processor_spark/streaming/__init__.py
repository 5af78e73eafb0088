from ydb_cdc_processor_spark.streaming.anomaly import streaming_anomalies
from ydb_cdc_processor_spark.streaming.dedup import (
    dedup_documents_stream, dedup_redelivered)
from ydb_cdc_processor_spark.streaming.engine import (
    CdcStreamEngine, StreamStatus, ThroughputListener, retry_forever)
from ydb_cdc_processor_spark.streaming.sessionize import (
    sessionize, sessionize_cdc_stream)
from ydb_cdc_processor_spark.streaming.stateful import user_activity_profile
from ydb_cdc_processor_spark.streaming.web import StatusServer

__all__ = ["CdcStreamEngine", "StatusServer", "StreamStatus",
           "ThroughputListener", "dedup_documents_stream",
           "dedup_redelivered", "retry_forever", "sessionize",
           "sessionize_cdc_stream", "streaming_anomalies",
           "user_activity_profile"]
