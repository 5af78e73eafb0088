"""P1-P3: envelope parsing, routing, key merge, typed decode.

Mirrors the unit-test plan of SURVEY.md §5 for the reference's
CdcMsgParser.parseJsonMessage (CdcMsgParser.java:45-83) and
YqlQuery.readValue (YqlQuery.java:89-166), which the reference itself
never tests (it has no test tree).
"""

import datetime

from pyspark.sql import Row

from ydb_cdc_processor_spark.operators import decode


def _raw(spark, lines):
    return spark.createDataFrame(
        [Row(value=l, _offset=i) for i, l in enumerate(lines)])


def test_route_update_erase_malformed(spark):
    df = decode.decode_envelope(_raw(spark, [
        '{"key":[1],"update":{"a":1}}',
        '{"key":[2],"erase":{}}',
        '{"key":[3],"newImage":{"a":3}}',
        '{"no_key":true}',
        '{"key":[5]}',
        'not json at all',
    ]))
    ops = [r.op for r in df.orderBy("_offset").collect()]
    assert ops == ["U", "D", "U", "X", "X", "X"]


def test_empty_update_falls_back_to_new_image(spark):
    # CdcMsgParser.java:62-69: update == {} → use newImage
    df = decode.decode_envelope(_raw(spark, [
        '{"key":[1],"update":{},"newImage":{"a":"7"}}',
        '{"key":[2],"update":{"a":"8"},"newImage":{"a":"9"}}',
    ]))
    rows = {r.key[0]: r.payload for r in df.collect()}
    assert rows["1"]["a"] == "7"   # fallback
    assert rows["2"]["a"] == "8"   # non-empty update wins


def test_key_merge_positional(spark):
    # P2: PK columns come POSITIONALLY from the key array, in PK order
    # (YqlQuery.java:55-69); non-key fields by name from the payload.
    members = {"b": "Int64", "a": "Int32", "x": "Text"}
    df = decode.decode_cdc(_raw(spark, [
        '{"key":[10,20],"update":{"x":"hi"}}',
    ]), members, pk=["a", "b"])
    r = df.collect()[0]
    assert (r.a, r.b, r.x, r.op) == (10, 20, "hi", "U")


def test_typed_decode_full_surface(spark):
    # P3: the complete readValue surface (YqlQuery.java:89-166).
    members = {
        "id": "Int64", "flag": "Bool", "i8": "Int8", "u32": "Uint32",
        "f": "Float", "d": "Double", "txt": "Text", "js": "Json",
        "bin": "Bytes", "uid": "Uuid", "dt": "Date",
        "dtt": "Datetime", "ts": "Timestamp", "iv": "Interval",
        "dec": "Decimal(22,9)", "opt": "Optional<Int64>",
    }
    line = ('{"key":[1],"update":{'
            '"flag":true,"i8":-5,"u32":4000000000,"f":1.5,"d":2.25,'
            '"txt":"t","js":{"k":1},"bin":"aGVsbG8=","uid":"u-1",'
            '"dt":"2024-03-05T10:11:12Z","dtt":"2024-03-05T10:11:12.999Z",'
            '"ts":"2024-03-05T10:11:12.345678Z","iv":42,'
            '"dec":"123.456789","opt":null}}')
    r = decode.decode_cdc(_raw(spark, [line]), members, pk=["id"]).collect()[0]
    assert r.id == 1 and r.flag is True and r.i8 == -5
    assert r.u32 == 4000000000
    assert r.f == 1.5 and r.d == 2.25 and r.txt == "t"
    assert r.js == '{"k":1}'          # nested JSON preserved verbatim
    assert bytes(r.bin) == b"hello"   # base64 (YqlQuery.java:137-138)
    assert r.uid == "u-1"
    assert r.dt == datetime.date(2024, 3, 5)
    # Datetime truncates to seconds (YqlQuery.java:148-150)
    assert r.dtt == datetime.datetime(2024, 3, 5, 10, 11, 12)
    assert r.ts.microsecond == 345678
    assert r.iv == 42
    assert float(r.dec) == 123.456789
    assert r.opt is None


def test_unsupported_types_rejected():
    import pytest
    from ydb_cdc_processor_spark.types import UnsupportedTypeError, parse_yql_type
    for t in ("Yson", "TzDate", "DyNumber", "NotAType"):
        with pytest.raises(UnsupportedTypeError):
            parse_yql_type(t)
