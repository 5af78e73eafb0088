"""YQL → Spark SQL compatibility shim for reference-style CDC queries.

The reference's users write YQL over the batch (README.md:81-115):

    DECLARE $rows AS List<Struct<event_time: Text, …, category_code: Text?>>;
    $parse=DateTime::Parse('%Y-%m-%d %H:%M:%S %Z');
    UPSERT INTO mat_view1 SELECT
        Unwrap(DateTime::MakeTimestamp($parse(event_time))) AS event_time, …
    FROM AS_TABLE($rows);

This module translates that surface (exactly the constructs the reference
README exercises — SURVEY.md §2 T4) into our pipeline pieces:

- ``DECLARE $rows AS List<Struct<…>>`` → the declared members dict
  (``T?`` shorthand normalized to ``Optional<T>``);
- ``$name=DateTime::Parse('fmt')`` bindings + ``DateTime::MakeTimestamp(
  $name(col))`` → ``to_timestamp(col, spark_fmt)`` (strptime → Spark
  datetime pattern);
- ``Unwrap(expr)`` → ``coalesce(expr, raise_error(...))`` — fail-on-null,
  the reference's Unwrap contract;
- ``$q = SELECT …;`` subquery bindings → ``WITH q AS (…)`` CTEs;
- ``AS_TABLE($rows)`` → the ``rows`` temp view;
- a leading ``UPSERT INTO t`` / ``DELETE FROM t ON`` / ``UPDATE t ON`` /
  ``INSERT INTO t`` action clause → (action_mode, action_table) with the
  remaining SELECT as the transform — mirroring the prefix synthesis of
  CdcMsgParser.java:225-249.

Anything outside this surface passes through untouched — Spark SQL's
function library is a superset of what the README uses, and unknown YQL
constructs surface as Catalyst analysis errors at validation time
(the ``prepareDataQuery`` analogue).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_DECLARE_RE = re.compile(
    r"DECLARE\s+\$(?P<name>\w+)\s+AS\s+List\s*<\s*Struct\s*<(?P<body>.*?)>\s*>\s*;",
    re.IGNORECASE | re.DOTALL)
_PARSE_BIND_RE = re.compile(
    r"\$(?P<name>\w+)\s*=\s*DateTime::Parse\(\s*'(?P<fmt>[^']*)'\s*\)\s*;")
_SUBQUERY_BIND_RE = re.compile(
    r"\$(?P<name>\w+)\s*=\s*(?P<body>SELECT\b.*?);", re.IGNORECASE | re.DOTALL)
_ACTION_RE = re.compile(
    r"^\s*(?:(?P<upsert>UPSERT\s+INTO)|(?P<delete>DELETE\s+FROM)"
    r"|(?P<update>UPDATE)|(?P<insert>INSERT\s+INTO))\s+"
    r"`?(?P<table>[\w./]+)`?\s*(?:ON\s+)?(?P<rest>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL)

# strptime directive → Spark datetime pattern (only directives a CDC
# timestamp column plausibly uses; unknown directives raise).
_STRPTIME = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%Z": "zzz", "%z": "XX", "%y": "yy", "%j": "DDD",
    "%%": "%",
}


class YqlTranslationError(ValueError):
    pass


def strptime_to_spark(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i:i + 2]
            if d not in _STRPTIME:
                raise YqlTranslationError(f"unsupported strptime directive {d!r}")
            out.append(_STRPTIME[d])
            i += 2
        elif fmt[i].isalpha():
            # literal letters must be quoted in Spark patterns
            out.append(f"'{fmt[i]}'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _split_members(body: str) -> dict[str, str]:
    """Split ``a: T1, b: Struct-free T2`` at depth 0 (angle brackets and
    parens may nest inside type names)."""
    members: dict[str, str] = {}
    depth, cur = 0, []
    parts: list[str] = []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur))
    for part in parts:
        name, _, tname = part.partition(":")
        if not _:
            raise YqlTranslationError(f"bad struct member {part!r}")
        tname = tname.strip()
        if tname.endswith("?"):  # YQL shorthand: T? == Optional<T>
            tname = f"Optional<{tname[:-1].strip()}>"
        members[name.strip()] = tname
    return members


def _translate_unwrap(sql: str) -> str:
    """``Unwrap(expr)`` → fail-on-null.  Handles nested parens."""
    out = []
    i = 0
    pat = re.compile(r"\bUnwrap\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i:m.start()])
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end():j - 1]
        out.append(f"coalesce({inner}, "
                   f"raise_error('Unwrap failed: null value'))")
        i = j
    return "".join(out)


@dataclass
class TranslatedQuery:
    members: dict[str, str]
    sql: str                       # Spark SQL over the ``rows`` view
    action_mode: str = "direct"    # ActionMode value
    action_table: str | None = None
    warnings: list[str] = field(default_factory=list)


def translate_yql(yql: str) -> TranslatedQuery:
    """Translate a reference-style CDC YQL statement into (members,
    spark_sql, action).  See module docstring for the supported surface."""
    text = yql.strip()

    m = _DECLARE_RE.search(text)
    if not m:
        raise YqlTranslationError(
            "query must DECLARE $rows AS List<Struct<...>> "
            "(CdcMsgParser.java:169-188 contract)")
    rows_param = m.group("name")
    members = _split_members(m.group("body"))
    text = text[:m.start()] + text[m.end():]

    # DateTime::Parse bindings, then their application sites.
    fmts: dict[str, str] = {}
    def bind_parse(bm: re.Match) -> str:
        fmts[bm.group("name")] = strptime_to_spark(bm.group("fmt"))
        return ""
    text = _PARSE_BIND_RE.sub(bind_parse, text)
    for name, fmt in fmts.items():
        # the Spark pattern may itself contain single quotes ('T' literal);
        # double them to survive embedding in a SQL string literal
        lit = fmt.replace("'", "''")
        text = re.sub(
            r"DateTime::MakeTimestamp\(\s*\$" + name + r"\(\s*([\w.]+)\s*\)\s*\)",
            rf"to_timestamp(\1, '{lit}')", text)
        text = re.sub(
            r"\$" + name + r"\(\s*([\w.]+)\s*\)",
            rf"to_timestamp(\1, '{lit}')", text)

    # subquery bindings → CTEs
    ctes: list[tuple[str, str]] = []
    def bind_subq(bm: re.Match) -> str:
        ctes.append((bm.group("name"), bm.group("body").strip()))
        return ""
    text = _SUBQUERY_BIND_RE.sub(bind_subq, text)
    for name, _body in ctes:
        text = re.sub(r"\$" + name + r"\b", name, text)

    # AS_TABLE($rows) → rows view (in the main text AND the CTE bodies)
    def finish(sql: str) -> str:
        sql = re.sub(r"AS_TABLE\s*\(\s*\$" + rows_param + r"\s*\)", "rows",
                     sql, flags=re.IGNORECASE)
        if re.search(r"\$" + rows_param + r"\b", sql):
            raise YqlTranslationError(
                f"${rows_param} used outside AS_TABLE(...)")
        return _translate_unwrap(sql).strip().rstrip(";").strip()

    ctes = [(n, finish(b)) for n, b in ctes]
    text = finish(text)

    action_mode, action_table = "direct", None
    am = _ACTION_RE.match(text)
    if am:
        action_table = am.group("table")
        text = am.group("rest").strip()
        if am.group("upsert"):
            action_mode = "upsertInto"
        elif am.group("delete"):
            action_mode = "deleteFrom"
        elif am.group("update"):
            action_mode = "updateOn"
        else:
            action_mode = "insertInto"

    if ctes:
        with_clause = ", ".join(f"{n} AS ({b})" for n, b in ctes)
        text = f"WITH {with_clause} {text}"

    return TranslatedQuery(members=members, sql=text,
                           action_mode=action_mode, action_table=action_table)
