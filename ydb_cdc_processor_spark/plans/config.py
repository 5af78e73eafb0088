"""XML config loading (V1/V4, SURVEY.md §2) — wire-compatible with the
reference's config files.

The reference unmarshals ``<config>`` via JAXB (Application.java:86-103,
XmlConfig.java): shared ``<query id actionMode actionTable>`` elements plus
``<cdc changefeed consumer batchSize threadsCount timeoutSeconds
errorThreshold updateQueryId deleteQueryId>`` elements whose text body is
an inline YQL query.  Resolution rules (V4, CdcMsgParser.java:132-157):
an inline body beats ``updateQueryId``; a missing update/delete query
turns that kind into the skip operator.

We parse the same XML with stdlib ``xml.etree``, push each query text
through the YQL→Spark shim (plans/yql_compat.py), and emit validated
:class:`CdcPipeline` objects.  The changefeed path maps to a CDC JSON
directory; the source table name is derived by stripping the path's last
segment, exactly like Parser.parse (CdcMsgParser.java:105-110).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ydb_cdc_processor_spark.plans.pipeline import ActionMode, CdcPipeline
from ydb_cdc_processor_spark.plans.yql_compat import TranslatedQuery, translate_yql


@dataclass
class ConfigError(Exception):
    message: str

    def __str__(self) -> str:
        return self.message


def _resolve_query(cdc: ET.Element, attr: str,
                   shared: dict[str, ET.Element]) -> tuple[str, ET.Element] | None:
    """V4 — inline body beats the *QueryId reference
    (CdcMsgParser.java:132-157); returns (yql_text, element) or None."""
    inline = (cdc.text or "").strip()
    if attr == "updateQueryId" and inline:
        return inline, cdc
    qid = cdc.get(attr)
    if qid is not None:
        if qid not in shared:
            raise ConfigError(f"{attr} {qid!r} not found in <query> elements")
        q = shared[qid]
        return (q.text or "").strip(), q
    return None


def source_table_of(changefeed: str) -> str:
    """Strip the changefeed's last path segment → the source table path
    (CdcMsgParser.java:105-110: ``table_source/cdc_topic`` → ``table_source``).
    """
    if "/" not in changefeed:
        raise ConfigError(
            f"changefeed path {changefeed!r} has no table component")
    return changefeed.rsplit("/", 1)[0]


def load_config_xml(xml_text: str, spark: SparkSession | None, *,
                    describe, strict: bool = False) -> list[CdcPipeline]:
    """Parse a reference-format XML config into validated pipelines.

    ``describe(table_name) -> (StructType, pk_list)`` supplies the source
    schema (≙ YdbService.describeTable).  With ``strict=False`` validation
    failures become per-pipeline warnings, matching the reference's
    warning-not-crash behavior (Application.java:95-97).
    """
    root = ET.fromstring(xml_text)
    if root.tag != "config":
        raise ConfigError(f"expected <config> root, got <{root.tag}>")
    shared = {}
    for q in root.findall("query"):
        qid = q.get("id")
        if qid is None:
            raise ConfigError("<query> element missing id attribute")
        shared[qid] = q

    pipelines: list[CdcPipeline] = []
    for cdc in root.findall("cdc"):
        changefeed = cdc.get("changefeed")
        consumer = cdc.get("consumer")
        if not changefeed or not consumer:
            raise ConfigError("<cdc> requires changefeed and consumer attrs")
        table = source_table_of(changefeed)
        schema, pk = describe(table)

        upd = _resolve_query(cdc, "updateQueryId", shared)
        dlt = _resolve_query(cdc, "deleteQueryId", shared)

        members: dict[str, str] = {}
        update_sql = delete_sql = None
        action_mode, action_table = ActionMode.DIRECT, None
        warnings: list[str] = []

        if upd is not None:
            t: TranslatedQuery = translate_yql(upd[0])
            members = t.members
            update_sql = t.sql
            el_mode = upd[1].get("actionMode")
            if el_mode:  # <query actionMode=...> prefix synthesis
                action_mode = ActionMode(el_mode)
                action_table = upd[1].get("actionTable")
            elif t.action_mode != "direct":
                # the inline statement carries its own action clause — honor
                # its verb through the merge writer, exactly as the reference
                # executes the inline statement verbatim (YqlQuery.executeYql):
                # an inline `INSERT INTO t SELECT …` must run strict-insert
                # semantics (PK collisions fail), not silently become upsert
                action_mode = ActionMode(t.action_mode)
                action_table = t.action_table
        delete_members = None
        if dlt is not None:
            td = translate_yql(dlt[0])
            delete_sql = td.sql
            delete_members = td.members

        name = f"{changefeed}:{consumer}"
        p = CdcPipeline(
            name=name,
            source_schema=schema,
            pk=pk,
            members=members,
            update_sql=update_sql,
            delete_sql=delete_sql,
            delete_members=delete_members,
            action_mode=action_mode,
            action_table=action_table,
            batch_size=int(cdc.get("batchSize", 1000)),
            threads_count=int(cdc.get("threadsCount", 1)),
            timeout_seconds=int(cdc.get("timeoutSeconds", 0)),
            error_threshold=int(cdc.get("errorThreshold", 0)),
            warnings=warnings,
        )
        if strict:
            p.validate(spark)
        else:
            p.validate_warn(spark)
        pipelines.append(p)
    return pipelines
