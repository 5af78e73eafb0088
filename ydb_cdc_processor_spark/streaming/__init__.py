from ydb_cdc_processor_spark.streaming.engine import (
    CdcStreamEngine, StreamStatus, retry_forever)

__all__ = ["CdcStreamEngine", "StreamStatus", "retry_forever"]
