"""Core CDC surface (SURVEY.md S2 operators over the synthetic tables) — split verbatim from registry.py.

Imported (in order) by registry.py; see the package
docstring for the ordering contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.aggregates import dec_avg, dec_sum, long_sum
from ydb_cdc_processor_spark.functions.partitioning import (
    ensure_min_partitions, salted_join)
from ydb_cdc_processor_spark.operators import (
    curation, dedup, merge, similarity, text)
from ydb_cdc_processor_spark.operators.curation import (
    PII_EMAIL, PII_IPV4, PII_PHONE)
from ydb_cdc_processor_spark.operators.last_wins import collapse_last_wins
from ydb_cdc_processor_spark.sources.catalog import load_table

from ydb_cdc_processor_spark.registry import (
    ORACLES, QUERIES, _scratch_dir, load_docs, register)

# ---------------------------------------------------------------------------
# Core CDC surface (SURVEY.md §2 operators over the synthetic tables)
# ---------------------------------------------------------------------------

@register("q_project_retype", """
SELECT event_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_sec,
       user_id, event_type, value
FROM events
""")
def q_project_retype(spark, sf_dir):
    """T4/P2 — projection + retype (≙ README v1 view, README.md:93-100):
    select a column subset and re-type the timestamp to second precision
    (the reference's Datetime semantics, YqlQuery.java:148-150)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        "user_id", "event_type", "value")


@register("q_select_star", """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
FROM events
""")
def q_select_star(spark, sf_dir):
    """K5/T1 — SELECT * passthrough (≙ README v2 view, README.md:114)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value", "props")


@register("q_filter_route", """
SELECT event_type,
       CASE WHEN value < 50 THEN 'skip' ELSE 'apply' END AS route,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, CASE WHEN value < 50 THEN 'skip' ELSE 'apply' END
""")
def q_filter_route(spark, sf_dir):
    """P1/T3 — routing split with per-branch counters (the decode router +
    skip-counting shape, CdcMsgParser.java:59-83 / YqlQuery.java:168-183)."""
    ev = load_table(spark, sf_dir, "events")
    route = F.when(F.col("value") < 50, F.lit("skip")).otherwise(F.lit("apply"))
    return (ev.withColumn("route", route)
              .groupBy("event_type", "route")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   dec_sum("value", "sum_value")))


@register("q_key_merge", """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
FROM events
""")
def q_key_merge(spark, sf_dir):
    """P2/P3 — FULL decode round-trip: rows → CDC JSON envelopes (key
    positional, payload by name) → decode_cdc → typed rows.  The oracle is
    the original table: proves envelope build + parse + typed decode are
    lossless (YqlQuery.java:55-166)."""
    from ydb_cdc_processor_spark.operators.decode import decode_cdc
    from ydb_cdc_processor_spark.sources.cdc_json import EVENTS_MEMBERS
    # CPU-bound to_json/from_json round-trip → spread the single-file scan
    ev = ensure_min_partitions(load_table(spark, sf_dir, "events"))
    raw = ev.select(F.to_json(F.struct(
        F.array(F.col("event_id").cast("string")).alias("key"),
        F.struct(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("ts"),
            F.col("user_id"), F.col("event_type"), F.col("value"),
            F.col("props")).alias("update"),
    )).alias("value"))
    typed = decode_cdc(raw, EVENTS_MEMBERS, pk=["event_id"])
    return typed.select("event_id", "ts", "user_id", "event_type",
                        "value", "props")


@register("q_last_wins", """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
""")
def q_last_wins(spark, sf_dir):
    """B2/B4 — per-key last-wins collapse: the reference's flush-on-kind-
    switch + per-partition ordering net effect (YqlWriter.java:184-207),
    as the engine's actual collapse_last_wins operator keyed by user."""
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts", "event_type", "value") \
        .withColumn("_ord", F.struct(F.col("ts"), F.col("event_id")))
    out = collapse_last_wins(ev, ["user_id"], order_col="_ord")
    return out.drop("_ord")


_ORDERS_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


@register("q_upsert_semantics", f"""
WITH delta AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0)
SELECT {_ORDERS_COLS} FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
UNION ALL
SELECT {_ORDERS_COLS} FROM delta
""")
def q_upsert_semantics(spark, sf_dir):
    """K1 — upsertInto as the engine's merge_upsert (matched→replace,
    not-matched→insert; CdcMsgParser.java:228-231)."""
    orders = load_table(spark, sf_dir, "orders")
    delta = (orders.where(F.col("o_orderkey") % 10 == 0)
             .withColumn("o_orderstatus", F.lit("U"))
             .withColumn("o_totalprice", F.col("o_totalprice") * 1.1))
    return merge.merge_upsert(orders, delta, ["o_orderkey"])


@register("q_delete_anti", f"""
SELECT {_ORDERS_COLS} FROM orders WHERE o_orderkey % 7 <> 0
""")
def q_delete_anti(spark, sf_dir):
    """K2 — deleteFrom as merge_delete (anti-join on the key set,
    CdcMsgParser.java:232-235)."""
    orders = load_table(spark, sf_dir, "orders")
    delete_keys = orders.where(F.col("o_orderkey") % 7 == 0) \
                        .select("o_orderkey")
    return merge.merge_delete(orders, delete_keys, ["o_orderkey"])


@register("q_update_on", f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       CASE WHEN o_orderkey % 10 = 0 THEN 'UPDATED' ELSE o_orderpriority END
         AS o_orderpriority
FROM orders
""")
def q_update_on(spark, sf_dir):
    """K3 — updateOn as merge_update: existing keys replaced, delta rows
    with unknown keys IGNORED (CdcMsgParser.java:236-239).  The delta
    deliberately contains never-seen keys (shifted by 1e9) to prove the
    not-matched rows are dropped."""
    orders = load_table(spark, sf_dir, "orders")
    changed = (orders.where(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_orderpriority", F.lit("UPDATED")))
    ghosts = changed.withColumn("o_orderkey",
                                F.col("o_orderkey") + F.lit(1000000000))
    return merge.merge_update(orders, changed.unionByName(ghosts),
                              ["o_orderkey"])


@register("q_insert_strict", f"""
SELECT {_ORDERS_COLS} FROM orders
UNION ALL
SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
       o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 13 = 0
""")
def q_insert_strict(spark, sf_dir):
    """K4 — insertInto strict append with collision detection
    (CdcMsgParser.java:240-243): fresh keys appended; a colliding batch
    raises StrictInsertError (unit-tested)."""
    orders = load_table(spark, sf_dir, "orders")
    fresh = (orders.where(F.col("o_orderkey") % 13 == 0)
             .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(1000000000))
             .withColumn("o_orderstatus", F.lit("N")))
    return merge.merge_insert(orders, fresh, ["o_orderkey"], strict=True)


@register("q_two_phase", """
SELECT l_orderkey, l_linenumber, p_name, s_name,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_orderkey % 50 = 0
""")
def q_two_phase(spark, sf_dir):
    """T2 — two-phase read-then-act (YqlQuery.java:198-247): phase 1 runs
    a user SELECT over the micro-batch (the ``rows`` temp view ≙
    AS_TABLE($rows)) joined against catalog tables; phase 2's schema
    inference is ``result.schema`` (free).  Dimension joins broadcast."""
    from ydb_cdc_processor_spark.engine import run_transform
    li = load_table(spark, sf_dir, "lineitem")
    batch = li.where(F.col("l_orderkey") % 50 == 0)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return run_transform(spark, batch, """
        SELECT l_orderkey, l_linenumber, p_name, s_name,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM rows
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
    """)


@register("q_batch_agg", """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q_batch_agg(spark, sf_dir):
    """T1 + inherited SQL surface — TPC-H Q1 shape: the canonical
    "arbitrary YQL over the batch" aggregation.  Decimal-routed sums keep
    the result bit-identical at any parallelism (functions/aggregates.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dec_sum("l_quantity", "sum_qty"),
                 dec_sum("l_extendedprice", "sum_base_price"),
                 dec_sum(disc_price, "sum_disc_price", scale=6),
                 dec_sum(charge, "sum_charge", scale=6),
                 dec_avg("l_quantity", "avg_qty"),
                 dec_avg("l_extendedprice", "avg_price"),
                 dec_avg("l_discount", "avg_disc", scale=6),
                 F.count(F.lit(1)).alias("count_order")))


@register("q_join_enrich", """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r_name, n_name
""")
def q_join_enrich(spark, sf_dir):
    """Inherited SQL surface — multi-way dimensional join (TPC-H Q5 shape).
    customer/nation/region broadcast (small dims); the only shuffle is
    lineitem⋈orders on orderkey + the final partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders") \
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region") \
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
              .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (joined.groupBy("r_name", "n_name")
            .agg(dec_sum(disc_price, "revenue", scale=6),
                 F.count(F.lit(1)).alias("n_items")))


@register("q_skip_count", """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_skipped
FROM events WHERE value < 10 GROUP BY event_type
""")
def q_skip_count(spark, sf_dir):
    """T3/O1 — counted-and-dropped subset (YqlQuery.java:168-183 +
    the throughput counter YqlWriter.java:217-231)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.where(F.col("value") < 10)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_skipped")))


