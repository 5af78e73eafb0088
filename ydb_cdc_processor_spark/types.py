"""YQL ⇄ Spark type surface.

Re-expresses the reference's complete supported type surface — the
``readValue`` decoder at /root/reference/src/main/java/tech/ydb/app/
YqlQuery.java:89-166 — as a declarative mapping from YQL type names to
Spark ``DataType``s plus, in :mod:`operators.decode`, per-type conversion
*expressions* (the reference converts row-at-a-time in Java; we emit
Catalyst expressions so the whole decode stays inside whole-stage codegen).

Deviations from the reference, all documented in SURVEY.md §1.3:

- ``Uint64`` maps to ``LongType`` for strict behavioral parity — the
  reference silently truncates through Java ``long`` (YqlQuery.java:126).
- ``Interval`` maps to ``LongType`` **seconds** (the reference parses
  seconds into a Duration, YqlQuery.java:153-154).
- ``Yson``, ``TzDate``, ``TzDatetime``, ``TzTimestamp``, ``DyNumber`` are
  unsupported, matching YqlQuery.java:139-141,155-160.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# YQL scalar name -> Spark type (YqlQuery.java:89-166).
_SCALARS: dict[str, T.DataType] = {
    "Bool": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "Uint8": T.ShortType(),
    "Uint16": T.IntegerType(),
    "Uint32": T.LongType(),
    "Uint64": T.LongType(),  # parity: reference truncates via Java long
    "Float": T.FloatType(),
    "Double": T.DoubleType(),
    "Text": T.StringType(),
    "Utf8": T.StringType(),
    "String": T.StringType(),
    "Json": T.StringType(),
    "JsonDocument": T.StringType(),
    "Bytes": T.BinaryType(),  # wire form is base64 text (YqlQuery.java:137-138)
    "Uuid": T.StringType(),
    "Date": T.DateType(),
    "Datetime": T.TimestampType(),  # second precision (YqlQuery.java:148-150)
    "Timestamp": T.TimestampType(),
    "Interval": T.LongType(),  # seconds (YqlQuery.java:153-154)
}

_UNSUPPORTED = {"Yson", "TzDate", "TzDatetime", "TzTimestamp", "DyNumber"}

_DECIMAL_RE = re.compile(r"^Decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_OPTIONAL_RE = re.compile(r"^Optional\s*<(.*)>$")


class UnsupportedTypeError(ValueError):
    """Analogue of the reference's ``IOException("Can't read node value …")``
    (YqlQuery.java:164-165) raised at plan-build time instead of runtime."""


@dataclass(frozen=True)
class YqlType:
    """A resolved YQL type: Spark type + nullability + original name."""

    yql_name: str
    spark_type: T.DataType
    nullable: bool

    @property
    def base_name(self) -> str:
        m = _OPTIONAL_RE.match(self.yql_name.strip())
        return (m.group(1) if m else self.yql_name).strip()


def parse_yql_type(name: str) -> YqlType:
    """Parse a YQL type name (``Optional<Int64>``, ``Decimal(22,9)``, …).

    ``Optional<T>`` maps to Spark nullability (YqlQuery.java:90-97);
    everything else is non-nullable, as the reference feeds non-optional
    members straight to the scalar decoders.
    """
    raw = name.strip()
    nullable = False
    m = _OPTIONAL_RE.match(raw)
    inner = raw
    if m:
        nullable = True
        inner = m.group(1).strip()
    dm = _DECIMAL_RE.match(inner)
    if dm:
        return YqlType(raw, T.DecimalType(int(dm.group(1)), int(dm.group(2))), nullable)
    if inner in _UNSUPPORTED:
        raise UnsupportedTypeError(
            f"YQL type {inner!r} is unsupported (parity with reference "
            "YqlQuery.java:139-141,155-160)")
    if inner not in _SCALARS:
        raise UnsupportedTypeError(f"Can't read node value of type {inner!r} "
                                   "(YqlQuery.java:164-165)")
    return YqlType(raw, _SCALARS[inner], nullable)


def struct_of(members: dict[str, str]) -> T.StructType:
    """Build a Spark ``StructType`` from ``{member: yql_type_name}`` —
    the analogue of the user's ``DECLARE $rows AS List<Struct<...>>``
    (reference README.md:81-89)."""
    fields = []
    for fname, tname in members.items():
        yt = parse_yql_type(tname)
        fields.append(T.StructField(fname, yt.spark_type, yt.nullable))
    return T.StructType(fields)


def yql_members(members: dict[str, str]) -> dict[str, YqlType]:
    return {f: parse_yql_type(t) for f, t in members.items()}
