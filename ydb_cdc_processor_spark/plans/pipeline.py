"""Pipeline spec + startup validation (operators V1-V4, SURVEY.md §2).

The reference's plan-build: XML config (Application.java:86-103,
XmlConfig.java) → ``describeTable`` for the source schema
(YdbService.java:149-158) → server-side ``prepareDataQuery`` + client-side
type checks (CdcMsgParser.java:160-252) → a validated ``Supplier<YqlQuery>``.

Our analogue: a :class:`CdcPipeline` spec validated at build time:

- declared members ⊆ source columns with EXACT type equality
  (CdcMsgParser.java:200-214);
- delete query may reference ONLY primary-key columns
  (CdcMsgParser.java:216-221);
- the transform SQL is analyzed by Catalyst against an EMPTY temp view of
  the declared schema — analysis errors here ≙ YDB prepare errors
  (YdbService.java:137-146);
- action-mode synthesis: a ``<query>`` with ``actionMode``/``actionTable``
  wraps the user SELECT in the corresponding merge action
  (CdcMsgParser.java:225-249); an inline query body writes via the engine's
  direct sink (K5, CdcMsgParser.java:132-145).

Failed validation raises :class:`PipelineValidationError` — the reference
instead records warnings surfaced at ``GET /config``
(Application.java:95-97); the engine's :meth:`CdcPipeline.validate_warn`
offers the same soft mode.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ydb_cdc_processor_spark.types import struct_of


class ActionMode(enum.Enum):
    """Sink action modes (CdcMsgParser.java:225-249)."""

    UPSERT = "upsertInto"
    DELETE = "deleteFrom"
    UPDATE = "updateOn"
    INSERT = "insertInto"
    DIRECT = "direct"  # K5: inline query body performs its own write


class PipelineValidationError(ValueError):
    pass


@dataclass
class CdcPipeline:
    """A validated CDC view-maintenance pipeline (≙ one ``<cdc>`` element,
    XmlConfig.java:17-153).

    ``members`` is the declared batch struct ``{column: yql_type_name}``
    (≙ ``DECLARE $rows AS List<Struct<...>>``, README.md:81-89) and may be
    a subset of the source columns.  ``update_sql``/``delete_sql`` read the
    micro-batch through the temp view ``rows`` (≙ ``AS_TABLE($rows)``).
    A missing update/delete query turns that kind into the skip operator
    (T3, YqlQuery.java:168-183).
    """

    name: str
    source_schema: T.StructType
    pk: list[str]
    members: dict[str, str]
    update_sql: str | None = None
    delete_sql: str | None = None
    delete_members: dict[str, str] | None = None
    action_mode: ActionMode = ActionMode.DIRECT
    action_table: str | None = None
    target_keys: list[str] | None = None
    batch_size: int = 1000          # XmlConfig.java:18 default
    threads_count: int = 1          # XmlConfig.java:19 default
    timeout_seconds: int = 0        # XmlConfig.java:139-144 default (off)
    error_threshold: int = 0        # XmlConfig.java:146-150 default
    warnings: list[str] = field(default_factory=list)

    # ---- validation (V3, CdcMsgParser.java:160-252) ----

    def _check_members(self, members: dict[str, str], *,
                       pk_only: bool) -> list[str]:
        errs: list[str] = []
        declared = struct_of(members)
        src = {f.name: f for f in self.source_schema.fields}
        for f in declared.fields:
            if f.name not in src:
                errs.append(
                    f"Query of changefeed {self.name} has parameter with "
                    f"unknown column {f.name}")  # ≙ CdcMsgParser.java:200-207
            elif src[f.name].dataType != f.dataType:
                errs.append(
                    f"Query of changefeed {self.name} has parameter with "
                    f"wrong type of column {f.name}: declared "
                    f"{f.dataType.simpleString()}, source has "
                    f"{src[f.name].dataType.simpleString()}")  # :208-214
            if pk_only and f.name not in self.pk:
                errs.append(
                    f"Delete query of changefeed {self.name} uses non-primary-"
                    f"key column {f.name}")  # ≙ CdcMsgParser.java:216-221
        for k in self.pk:
            if k not in src:
                errs.append(f"Primary key column {k} missing from source schema")
        return errs

    def _analyze_sql(self, spark: SparkSession, sql: str,
                     members: dict[str, str]) -> list[str]:
        """Catalyst dry-run over an empty view — the ``prepareDataQuery``
        analogue (YdbService.java:137-146): catches unknown columns,
        type errors, bad function names before any data flows."""
        view = "rows"
        empty = spark.createDataFrame([], struct_of(members))
        empty.createOrReplaceTempView(view)
        try:
            spark.sql(sql).schema  # analysis happens here; no execution
            return []
        except Exception as ex:  # AnalysisException and friends
            return [f"Can't parse query of changefeed {self.name}: {ex}"]
        finally:
            spark.catalog.dropTempView(view)

    def validate(self, spark: SparkSession | None = None) -> "CdcPipeline":
        errs: list[str] = []
        if self.action_mode is not ActionMode.DIRECT and not self.action_table:
            errs.append(f"actionMode {self.action_mode.value} requires actionTable")
        if self.update_sql is not None:
            errs += self._check_members(self.members, pk_only=False)
            if spark is not None:
                errs += self._analyze_sql(spark, self.update_sql, self.members)
        if self.delete_sql is not None:
            dm = self.delete_members or {
                k: t for k, t in self.members.items() if k in self.pk}
            errs += self._check_members(dm, pk_only=True)
            if spark is not None:
                errs += self._analyze_sql(spark, self.delete_sql, dm)
        if errs:
            raise PipelineValidationError("; ".join(errs))
        return self

    def validate_warn(self, spark: SparkSession | None = None) -> "CdcPipeline":
        """Soft mode: collect warnings instead of raising — the reference's
        behavior (warnings shown at GET /config, WebController.java:40-48)."""
        try:
            self.validate(spark)
        except PipelineValidationError as ex:
            self.warnings.extend(str(ex).split("; "))
        return self

    # ---- config loading (V1) ----

    @classmethod
    def from_dict(cls, spec: dict, source_schema: T.StructType) -> "CdcPipeline":
        """Build from a plain dict (YAML/JSON-friendly) — the analogue of the
        JAXB XML config load (Application.java:86-103)."""
        return cls(
            name=spec["name"],
            source_schema=source_schema,
            pk=list(spec["pk"]),
            members=dict(spec["members"]),
            update_sql=spec.get("update_sql"),
            delete_sql=spec.get("delete_sql"),
            delete_members=spec.get("delete_members"),
            action_mode=ActionMode(spec.get("action_mode", "direct")),
            action_table=spec.get("action_table"),
            target_keys=spec.get("target_keys"),
            batch_size=int(spec.get("batch_size", 1000)),
            threads_count=int(spec.get("threads_count", 1)),
            timeout_seconds=int(spec.get("timeout_seconds", 0)),
            error_threshold=int(spec.get("error_threshold", 0)),
        )
