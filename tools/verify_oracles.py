"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
in DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (values normalized the way the
driver plausibly does: floats rounded, timestamps to ISO seconds,
columns sorted by name, rows sorted by their serialized form).

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _norm(v):
    import datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ", timespec="seconds") \
            if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols, rows) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), h


def main() -> None:
    import duckdb

    from ydb_cdc_processor_spark.registry import ORACLES, QUERIES
    from ydb_cdc_processor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify-oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only rows={len(srows)} cols={scols}")
            continue
        try:
            rel = con.execute(ORACLES[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        sn, sh = _hash_rows(scols, srows)
        on, oh = _hash_rows(ocols, orows)
        ok = (sn == on and sorted(scols) == sorted(ocols) and sh == oh)
        status = "ok  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status} {name}: spark({sn},{sh}) duck({on},{oh}) "
              f"cols={'=' if sorted(scols) == sorted(ocols) else f'{scols} vs {ocols}'}")
        if not ok and sn == on and sorted(scols) == sorted(ocols):
            # value mismatch — show first differing row
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ls = sorted("\x1f".join(_norm(r[i]) for i in order_s)
                        for r in srows)
            lo = sorted("\x1f".join(_norm(r[i]) for i in order_o)
                        for r in orows)
            for a, b in zip(ls, lo):
                if a != b:
                    print(f"     spark: {a.replace(chr(31), ' | ')}")
                    print(f"     duck : {b.replace(chr(31), ' | ')}")
                    break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
