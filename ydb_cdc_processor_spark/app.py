"""L1/L2 — app bootstrap: many pipelines, one process.

The reference's ``Application`` (Application.java:60-115) loads the XML
config, turns every ``<cdc>`` element into a reader+writer pair
(collecting per-pipeline failures as WARNINGS, not crashes), sizes the
shared session pool from the writers' thread counts, starts everything,
and on shutdown closes every reader.  :class:`CdcApp` is that lifecycle
over :class:`~ydb_cdc_processor_spark.streaming.engine.CdcStreamEngine`
instances sharing one SparkSession (the session pool analogue — executor
slots are shared by construction), with the O3 HTTP surface served over
ALL pipelines, exactly like the reference's single web controller.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ydb_cdc_processor_spark.plans.config import load_config_xml
from ydb_cdc_processor_spark.plans.pipeline import CdcPipeline
from ydb_cdc_processor_spark.streaming.engine import CdcStreamEngine
from ydb_cdc_processor_spark.streaming.web import StatusServer


class CdcApp:
    """Run N CDC pipelines (≙ N ``<cdc>`` elements) in one process.

    ``targets_root``/``checkpoints_root``: each pipeline gets
    ``<root>/<safe-name>`` (≙ one YDB target table + one consumer offset
    per reader).  ``n_buckets`` applies the hash-bucketed target to every
    pipeline.
    """

    def __init__(self, spark: SparkSession, pipelines: list[CdcPipeline],
                 targets_root: str, checkpoints_root: str,
                 n_buckets: int | None = None,
                 warnings: list[str] | None = None,
                 agg_views: dict[str, list] | None = None):
        """``agg_views``: ``{pipeline_name: [AggregateView, ...]}`` —
        rollups maintained continuously by that pipeline's stream."""
        self.spark = spark
        self.warnings = list(warnings or [])
        if not pipelines:
            # Application.java:70 — an empty config is a warning, not a crash
            self.warnings.append("No reader configs found!!")
        self.engines: list[CdcStreamEngine] = []
        for p in pipelines:
            safe = p.name.replace("/", "_").replace(":", "_")
            self.engines.append(CdcStreamEngine(
                spark, p,
                target_path=os.path.join(targets_root, safe),
                checkpoint_dir=os.path.join(checkpoints_root, safe),
                n_buckets=n_buckets,
                agg_views=(agg_views or {}).get(p.name)))
        self._server: StatusServer | None = None

    @classmethod
    def from_xml(cls, spark: SparkSession, xml_text: str, *, describe,
                 targets_root: str, checkpoints_root: str,
                 n_buckets: int | None = None) -> "CdcApp":
        """Build from a reference-format XML config.  Per-pipeline
        validation problems become app warnings (Application.java:95-97:
        ``can't create reader`` is logged and surfaced at /config, the
        rest of the app still starts)."""
        pipelines = load_config_xml(xml_text, spark, describe=describe,
                                    strict=False)
        warnings = [w for p in pipelines for w in p.warnings]
        return cls(spark, pipelines, targets_root, checkpoints_root,
                   n_buckets=n_buckets, warnings=warnings)

    # -- lifecycle (Application.java:79-84, 105-115) -------------------------

    def start(self, source_of, http_port: int | None = 0,
              **start_kwargs) -> "CdcApp":
        """Start every pipeline's stream (``source_of(pipeline) -> path``
        maps each pipeline to its changefeed directory) and, unless
        ``http_port`` is None, the shared status server."""
        for e in self.engines:
            e.start(source_of(e.pipeline), **start_kwargs)
        if http_port is not None:
            self._server = StatusServer(self.engines,
                                        warnings=self.warnings,
                                        port=http_port).start()
        return self

    def run_available(self, source_of) -> list[dict]:
        """Drain all currently-available input on every pipeline, then
        return the statuses (test/replay mode)."""
        queries = [e.start(source_of(e.pipeline), available_now=True)
                   for e in self.engines]
        for q in queries:
            q.awaitTermination()
        return self.status()

    @property
    def server(self) -> StatusServer | None:
        return self._server

    def status(self) -> list[dict]:
        """≙ ``GET /status`` — one entry per reader."""
        return [e.status_dict() for e in self.engines]

    def stop(self) -> None:
        """≙ ``Application.preDestroy`` — stop every reader, then the
        HTTP surface."""
        for e in self.engines:
            e.stop()
        if self._server is not None:
            self._server.close()
            self._server = None
