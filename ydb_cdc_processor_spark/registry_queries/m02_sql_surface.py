"""Inherited SQL surface (windows, rollup, set ops, scalars, sessionize) — split verbatim from registry.py.

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
# Inherited SQL surface — the reference's users can run ANY SELECT over the
# batch plus server tables (SURVEY.md §2 note after the operator table); our
# engine inherits the same breadth from Spark SQL.  These queries pin the
# breadth with oracles: windows, rollup, set ops, anti-join subqueries,
# global top-N, JSON access, scalar functions.
# ---------------------------------------------------------------------------


@register("q_window_topn", """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) t
WHERE rnk <= 3
""")
def q_window_topn(spark, sf_dir):
    """Per-key top-N via row_number window — no global sort; each key's
    partition ranks locally after one hash exchange."""
    from pyspark.sql import Window
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (orders.select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3))


@register("q_rollup", """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""")
def q_rollup(spark, sf_dir):
    """Grouping-sets rollup: per-group + subtotal + grand-total rows in one
    aggregation pass (Expand + partial agg, single shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("l_quantity", "sum_qty")))


@register("q_setops", """
(SELECT event_type FROM events WHERE value > 90
 INTERSECT
 SELECT event_type FROM events WHERE value < 10)
UNION
SELECT event_type FROM events WHERE user_id % 997 = 0
""")
def q_setops(spark, sf_dir):
    """Set operations (distinct semantics on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    hi = ev.where(F.col("value") > 90).select("event_type")
    lo = ev.where(F.col("value") < 10).select("event_type")
    some = ev.where(F.col("user_id") % 997 == 0).select("event_type")
    return hi.intersect(lo).union(some).distinct()


@register("q_no_orders", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
""")
def q_no_orders(spark, sf_dir):
    """NOT EXISTS subquery as a left-anti join (no correlated per-row
    subquery execution; one broadcast/shuffle anti-join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >=
                     F.lit("1998-01-01").cast("timestamp"))
              .select("o_custkey"))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_anti")
            .select("c_custkey", "c_name"))


@register("q_topn_global", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
""")
def q_topn_global(spark, sf_dir):
    """Global top-N: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge of N, never a full sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(100))


@register("q_json_extract", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""")
def q_json_extract(spark, sf_dir):
    """Json member access (the reference's Json/JsonDocument columns stay
    raw text, SURVEY.md §1.3; extraction on demand)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"))


@register("q_scalar_funcs", """
SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 1)) AS pri,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       concat(o_orderstatus, '-', o_orderpriority) AS tag
FROM orders
""")
def q_scalar_funcs(spark, sf_dir):
    """Scalar-function breadth (T4): string slicing/case, date part
    extraction, concatenation — all whole-stage-codegen expressions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("pri"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"))


@register("q_tumbling_agg", """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
""")
def q_tumbling_agg(spark, sf_dir):
    """Tumbling-window aggregation — the batch shape of the streaming
    windowed agg (``F.window`` aligns to the epoch, so 1-hour windows ≡
    date_trunc('hour')).  In streaming mode the same expression runs under
    a watermark for late data."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("value", "sum_value"))
            .select(F.col("w.start").alias("ws"), "event_type",
                    "n", "sum_value"))


@register("q_sessionize", """
WITH t AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                   > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
s AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM t)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       min(ts) AS sess_start, max(ts) AS sess_end
FROM s GROUP BY user_id, sess_no
""")
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session number → per-session rollup.  The classic
    scalable formulation — two window passes over one hash partitioning by
    user, no self-joins.  (Streaming equivalent: session_window /
    applyInPandasWithState.)  Gap compared in exact microseconds so both
    engines make identical boundary decisions."""
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = F.when(
        F.lag("ts").over(w).isNull() |
        ((us - F.unix_micros(F.lag("ts").over(w))) > 1800000000),
        F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (ev.withColumn("new_sess", new_sess)
         .withColumn("sess_no", F.sum("new_sess").over(cum).cast("long")))
    return (s.groupBy("user_id", "sess_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("sess_start"),
                 F.max("ts").alias("sess_end")))


