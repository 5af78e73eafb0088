"""V1/V4 + T4 — XML config loading (reference wire format) and the
YQL→Spark translation shim, driven end-to-end through the batch engine
using the README's own example config (README.md:75-117)."""

import pytest

from ydb_cdc_processor_spark.engine import CdcBatchEngine
from ydb_cdc_processor_spark.plans.config import (
    ConfigError, load_config_xml, source_table_of)
from ydb_cdc_processor_spark.plans.pipeline import ActionMode
from ydb_cdc_processor_spark.plans.yql_compat import (
    YqlTranslationError, strptime_to_spark, translate_yql)
from ydb_cdc_processor_spark.sources import cdc_json
from ydb_cdc_processor_spark.sources.catalog import describe_table

# The README v1 query, adapted to the events fixture columns.
V1_YQL = """
DECLARE $rows AS List<Struct<
    event_id: Int64,
    ts: Text,
    event_type: Text,
    user_id: Int64,
    value: Double?
>>;

$parse=DateTime::Parse('%Y-%m-%dT%H:%M:%S');

UPSERT INTO mat_view1 SELECT
    event_id,
    Unwrap(DateTime::MakeTimestamp($parse(ts))) AS ts,
    event_type,
    user_id,
    value
FROM AS_TABLE($rows);
"""

V2_YQL = """
DECLARE $rows AS List<Struct<
    event_id: Int64,
    user_id: Int64,
    event_type: Text
>>;
$q = SELECT * FROM AS_TABLE($rows);
UPSERT INTO mat_view2 SELECT * FROM $q;
"""


def test_translate_v1_members_and_action():
    t = translate_yql(V1_YQL)
    assert t.members == {
        "event_id": "Int64", "ts": "Text", "event_type": "Text",
        "user_id": "Int64", "value": "Optional<Double>"}
    assert t.action_table == "mat_view1"
    assert "to_timestamp(ts, 'yyyy-MM-dd''T''HH:mm:ss')" in t.sql
    assert "coalesce(" in t.sql and "raise_error" in t.sql
    assert "AS_TABLE" not in t.sql and "$" not in t.sql
    assert t.sql.upper().startswith("SELECT")


def test_translate_v2_subquery_to_cte():
    t = translate_yql(V2_YQL)
    assert t.action_table == "mat_view2"
    assert t.sql.startswith("WITH q AS (SELECT * FROM rows)")


def test_translate_requires_declare():
    with pytest.raises(YqlTranslationError, match="DECLARE"):
        translate_yql("SELECT 1")


def test_strptime_mapping():
    assert strptime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_spark("%Y-%m-%dT%H:%M:%SZ") == "yyyy-MM-dd'T'HH:mm:ss'Z'"
    with pytest.raises(YqlTranslationError):
        strptime_to_spark("%Q")


def test_source_table_of():
    assert source_table_of("table_source/cdc_topic") == "table_source"
    assert source_table_of("a/b/c") == "a/b"
    with pytest.raises(ConfigError):
        source_table_of("nopath")


# Executable variant: ts declared Timestamp so the engine's typed decoder
# (P3 — ISO instant parse, YqlQuery.java:151-152) produces the timestamp;
# Unwrap exercises the fail-on-null translation at execution time.
E2E_YQL = """
DECLARE $rows AS List<Struct<
    event_id: Int64,
    ts: Timestamp,
    event_type: Text,
    user_id: Int64,
    value: Double?
>>;
UPSERT INTO mat_view1 SELECT
    event_id, ts, Unwrap(event_type) AS event_type, user_id, value
FROM AS_TABLE($rows);
"""

CONFIG_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<config>
    <query id="del_q"><![CDATA[
DECLARE $rows AS List<Struct<event_id: Int64>>;
SELECT event_id FROM AS_TABLE($rows);
]]></query>
    <cdc changefeed="events/cdc_topic" consumer="v1_consumer"
         batchSize="10" deleteQueryId="del_q"><![CDATA[{E2E_YQL}]]></cdc>
</config>
"""


def test_load_config_end_to_end(spark, sf_dir, tmp_path):
    """Parse the reference-format XML, then run a real batch through the
    resulting pipeline: CDC fixture → translated SQL → merged view."""
    def describe(table):
        assert table == "events"
        return describe_table(spark, sf_dir, "events")

    pipelines = load_config_xml(CONFIG_XML, spark, describe=describe)
    assert len(pipelines) == 1
    p = pipelines[0]
    assert p.warnings == [], p.warnings
    assert p.name == "events/cdc_topic:v1_consumer"
    assert p.batch_size == 10
    assert p.pk == ["event_id"]
    # the inline body's own UPSERT clause propagates (executed verbatim in
    # the reference via YqlQuery.executeYql — same verb, not forced DIRECT)
    assert p.action_mode is ActionMode.UPSERT
    assert p.action_table == "mat_view1"
    assert p.members["value"] == "Optional<Double>"
    assert p.members["ts"] == "Timestamp"
    assert p.delete_sql is not None

    fixture = str(tmp_path / "events_cdc")
    cdc_json.write_events_cdc_fixture(spark, sf_dir, fixture, limit=200)
    eng = CdcBatchEngine(spark, p, str(tmp_path / "view"))
    stats = eng.apply_raw_batch(cdc_json.read_cdc_batch(spark, fixture))
    assert stats.malformed == 3
    view = eng.read_view()
    assert view.count() == stats.upserted
    # the translated to_timestamp really retyped the ISO text column
    assert dict(view.dtypes)["ts"] == "timestamp"


def test_inline_action_verb_propagates(spark, sf_dir):
    """An inline body whose action clause is INSERT/UPDATE must keep that
    verb — the reference executes the inline statement verbatim
    (YqlQuery.executeYql); forcing DIRECT would silently turn a strict
    INSERT (PK collisions fail) into an upsert (collisions replace)."""
    def describe(table):
        return describe_table(spark, sf_dir, "events")
    for verb, mode in (("INSERT INTO", ActionMode.INSERT),
                       ("UPDATE", ActionMode.UPDATE),
                       ("UPSERT INTO", ActionMode.UPSERT)):
        tbl_clause = "t1 ON" if verb == "UPDATE" else "t1"
        xml = f"""<config>
          <cdc changefeed="events/t" consumer="c"><![CDATA[
DECLARE $rows AS List<Struct<event_id: Int64>>;
{verb} {tbl_clause} SELECT event_id FROM AS_TABLE($rows);
]]></cdc>
        </config>"""
        (p,) = load_config_xml(xml, spark, describe=describe)
        assert p.action_mode is mode, (verb, p.action_mode)
        assert p.action_table == "t1"


def test_load_config_bad_query_id():
    xml = """<config>
      <cdc changefeed="events/t" consumer="c" updateQueryId="missing"/>
    </config>"""
    with pytest.raises(ConfigError, match="missing"):
        load_config_xml(xml, None, describe=lambda t: (None, []))


def test_load_config_invalid_member_warns(spark, sf_dir):
    """A declared column absent from the source schema becomes a warning
    (reference surfaces it at GET /config, Application.java:95-97)."""
    xml = """<config>
      <cdc changefeed="events/t" consumer="c"><![CDATA[
DECLARE $rows AS List<Struct<no_such_col: Int64>>;
UPSERT INTO v SELECT no_such_col FROM AS_TABLE($rows);
]]></cdc>
    </config>"""
    def describe(table):
        return describe_table(spark, sf_dir, "events")
    (p,) = load_config_xml(xml, spark, describe=describe)
    assert any("unknown column no_such_col" in w for w in p.warnings)


README_V1_VERBATIM = """
DECLARE $rows AS List<Struct<
    event_time: Text,
    event_type: Text,
    product_id: Uint32,
    category_id: Uint64,
    category_code: Text?,
    user_id: Uint32,
    user_session: Text
>>;

$parse=DateTime::Parse('%Y-%m-%d %H:%M:%S %Z');

UPSERT INTO mat_view1 SELECT
    Unwrap(DateTime::MakeTimestamp($parse(event_time))) AS event_time,
    event_type,
    product_id,
    user_id,
    category_id,
    user_session
FROM AS_TABLE($rows);
"""

README_V2_VERBATIM = """
DECLARE $rows AS List<Struct<
    event_type: Text,
    category_id: Uint64,
    category_code: Text?,
    brand: Text?,
    price: Double,
    user_id: Uint32,
    user_session: Text
>>;
UPSERT INTO mat_view2 SELECT * FROM AS_TABLE($rows);
"""


def test_translate_reference_readme_verbatim():
    """The EXACT YQL bodies from the reference's README (README.md:75-117)
    translate: complete member extraction (incl. Uint32/Uint64 and the
    Text? optional shorthand), strptime conversion with the %Z zone
    directive, Unwrap wrapping, and action-clause extraction."""
    t1 = translate_yql(README_V1_VERBATIM)
    assert t1.members == {
        "event_time": "Text", "event_type": "Text",
        "product_id": "Uint32", "category_id": "Uint64",
        "category_code": "Optional<Text>", "user_id": "Uint32",
        "user_session": "Text"}
    assert t1.action_table == "mat_view1"
    assert "to_timestamp(event_time, 'yyyy-MM-dd HH:mm:ss zzz')" in t1.sql
    assert t1.sql.count("coalesce(") == 1 and "raise_error" in t1.sql
    assert "$" not in t1.sql and "AS_TABLE" not in t1.sql

    t2 = translate_yql(README_V2_VERBATIM)
    assert t2.members["brand"] == "Optional<Text>"
    assert t2.action_table == "mat_view2"
    assert t2.sql == "SELECT * FROM rows"

    # the declared members build a real Spark schema (type-surface check)
    from ydb_cdc_processor_spark.types import struct_of
    s = struct_of(t1.members)
    assert s["category_code"].nullable and not s["event_type"].nullable
