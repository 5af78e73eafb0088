"""CDC envelope parsing + typed decode (operators P1-P3 of SURVEY.md §2).

The reference parses each message with Jackson in a per-row Java loop
(CdcMsgParser.parseJsonMessage, CdcMsgParser.java:45-83) and decodes typed
values member-by-member (YqlQuery.java:55-166).  Here the whole thing is ONE
declarative projection:

    raw json line
      → from_json(envelope_wire_schema)          -- single parse, JVM-side
      → op routing column                         -- P1
      → positional key merge + named payload      -- P2
      → per-type cast/unbase64/to_timestamp       -- P3

Everything stays inside whole-stage codegen — no Python runs per row, so
the decode scales linearly with executors at 100 TB.

Wire capture uses ``map<string,string>`` for the payload objects: Spark's
JSON parser captures non-string JSON tokens (numbers, nested objects) as
their raw text when the target type is string, which gives us:

- tolerance of unknown source columns (the reference reads only declared
  members, CdcMsgParser.java:200-207 — free column pruning);
- the ability to distinguish ``"update": {}`` (non-null empty map → fall
  back to ``newImage``) from an absent ``update`` (null map);
- nested JSON values (``Json``/``JsonDocument`` members) preserved verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ydb_cdc_processor_spark.types import YqlType, yql_members

# Operation routing values (P1).  The reference maps update→update-query,
# erase→delete-query and skips anything else (CdcMsgParser.java:59-83).
OP_UPSERT = "U"
OP_DELETE = "D"
OP_MALFORMED = "X"

ENVELOPE_WIRE_SCHEMA = T.StructType([
    T.StructField("key", T.ArrayType(T.StringType()), True),
    T.StructField("update", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("newImage", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("erase", T.MapType(T.StringType(), T.StringType()), True),
])


def convert_expr(col: Column, yt: YqlType) -> Column:
    """Typed value decode (P3) — one Catalyst expression per YQL type,
    mirroring ``readValue`` (YqlQuery.java:89-166):

    - ``Bytes``: wire is base64 text → ``unbase64`` (YqlQuery.java:137-138)
    - ``Date``: ISO instant → UTC date (YqlQuery.java:146-147)
    - ``Datetime``: ISO instant truncated to SECONDS (YqlQuery.java:148-150)
    - ``Timestamp``: full-precision ISO instant (YqlQuery.java:151-152)
    - ``Interval``: whole seconds as long (YqlQuery.java:153-154)
    - numerics/bool/decimal/uuid/json/text: plain cast (text for
      Decimal/Uuid per YqlQuery.java:99-102,144-145)

    NULL handling matches ``Optional`` semantics (YqlQuery.java:90-97):
    a null/absent node yields SQL NULL; non-null conversion failures yield
    NULL rather than an exception (Spark cast semantics) — the reference
    instead raises and skips the message; the malformed-row filter in
    :func:`decode_envelope` covers the envelope-level cases.
    """
    base = yt.base_name
    st = yt.spark_type
    if base == "Bytes":
        return F.unbase64(col)
    if base == "Date":
        # ISO instant or plain date; take the UTC calendar date.
        return F.to_date(F.substring(col, 1, 10))
    if base == "Datetime":
        return F.date_trunc("second", F.to_timestamp(col)).cast(T.TimestampType())
    if base == "Timestamp":
        return F.to_timestamp(col)
    if base == "Interval":
        return col.cast(T.LongType())
    return col.cast(st)


def decode_envelope(raw: DataFrame,
                    raw_col: str = "value") -> DataFrame:
    """P1 — parse + route.  Input: one string column of JSON lines.

    Output columns: ``key array<string>``, ``payload map<string,string>``,
    ``op`` (U/D/X).  Routing (after CdcMsgParser.java:59-83):

    - ``update`` present → U; payload is ``update`` unless it is EMPTY, in
      which case ``newImage``;
    - ``erase`` present → D (payload irrelevant; key only);
    - missing/invalid ``key`` or neither update/newImage/erase → X
      (reference logs and skips, CdcMsgParser.java:47-57,72-82).

    DOCUMENTED DEVIATION (COVERAGE.md "Documented deviations" #1): the
    reference's literal code (CdcMsgParser.java:61 duplicates the
    ``update.isObject()`` check) never reaches its ``newImage`` fallback —
    ``update:{}`` there yields a keys-only upsert with a NULL payload, and
    ``newImage`` WITHOUT ``update`` is skipped as unsupported.  This
    decoder implements what that fallback was written to do: the
    ``newImage`` payload is used in both cases (SURVEY.md §2 P1 prescribes
    this reading).

    Extra input columns (e.g. a source ``_offset``) are passed through.
    """
    env = raw.withColumn("_env", F.from_json(F.col(raw_col), ENVELOPE_WIRE_SCHEMA))
    upd, img = F.col("_env.update"), F.col("_env.newImage")
    key = F.col("_env.key")
    op = (
        F.when(_malformed_reason().isNotNull(), F.lit(OP_MALFORMED))
        .when(upd.isNotNull() | img.isNotNull(), F.lit(OP_UPSERT))
        .otherwise(F.lit(OP_DELETE))
    )
    payload = (
        F.when(upd.isNotNull() & (F.size(upd) > 0), upd)
        .when(img.isNotNull(), img)
        .otherwise(upd)
    )
    passthrough = [c for c in raw.columns if c != raw_col]
    return env.select(
        *passthrough,
        key.alias("key"),
        payload.alias("payload"),
        op.alias("op"),
    )


def _malformed_reason() -> F.Column:
    """Diagnostic reason for X-routed envelopes — THE definition of
    malformed, shared by :func:`decode_envelope`'s ``op`` routing and
    :func:`malformed_rows`' dead-letter view (one expression, so the
    DLQ can never desync from ``stats.malformed``).  NULL ⇔ routable.
    Evaluates over a ``_env`` struct column."""
    upd, img, ers = (F.col("_env.update"), F.col("_env.newImage"),
                     F.col("_env.erase"))
    return (
        F.when(F.col("_env").isNull(), F.lit("unparseable envelope"))
        .when(F.col("_env.key").isNull(), F.lit("missing key"))
        .when(upd.isNull() & img.isNull() & ers.isNull(),
              F.lit("no update/newImage/erase action"))
    )


def malformed_rows(raw: DataFrame, raw_col: str = "value",
                   keep: list[str] | None = None) -> DataFrame:
    """The dead-letter view: every envelope :func:`decode_envelope` would
    route to X, with the ORIGINAL raw line and a diagnostic ``reason`` —
    what an operator needs to fix the producer (the reference only logs
    and drops, CdcMsgParser.java:47-57; a 100 TB pipeline wants the
    evidence queryable, not scrolled away in executor logs).

    Output: ``keep`` columns + ``(raw STRING, reason STRING)``.
    """
    env = raw.withColumn("_env",
                         F.from_json(F.col(raw_col), ENVELOPE_WIRE_SCHEMA))
    reason = _malformed_reason()
    return (env.where(reason.isNotNull())
            .select(*(keep or []), F.col(raw_col).alias("raw"),
                    reason.alias("reason")))


def merge_key_columns(decoded: DataFrame,
                      members: dict[str, str],
                      pk: list[str],
                      keep: list[str] | None = None) -> DataFrame:
    """P2 + P3 — build the typed row.

    PK columns are read POSITIONALLY from the ``key`` array in primary-key
    order; non-key members by name from the payload; absent/null payload
    entries become NULL (YqlQuery.java:55-69).  ``members`` is the declared
    batch struct ``{name: yql_type}`` (≙ ``DECLARE $rows``), which may be a
    subset of source columns — undeclared payload entries are simply never
    referenced (ingest-time column pruning, CdcMsgParser.java:200-207).

    ``keep`` lists metadata columns (e.g. ``op``, ``_offset``) to carry
    through for routing/ordering.
    """
    types = yql_members(members)
    cols: list[Column] = []
    for name, yt in types.items():
        if name in pk:
            src = F.col("key").getItem(pk.index(name))
        else:
            src = F.element_at(F.col("payload"), name)
        cols.append(convert_expr(src, yt).alias(name))
    for extra in keep or []:
        cols.append(F.col(extra))
    return decoded.select(*cols)


def decode_cdc(raw: DataFrame,
               members: dict[str, str],
               pk: list[str],
               raw_col: str = "value",
               keep: list[str] | None = None,
               drop_malformed: bool = True) -> DataFrame:
    """Full P1→P3 pipeline: raw JSON lines → typed rows + ``op`` column."""
    decoded = decode_envelope(raw, raw_col=raw_col)
    if drop_malformed:
        decoded = decoded.where(F.col("op") != OP_MALFORMED)
    keep = ["op"] + [k for k in (keep or []) if k != "op"]
    return merge_key_columns(decoded, members, pk, keep=keep)
