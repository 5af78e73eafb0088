"""TPC-H shapes + the maintained index/view store lifecycles — split verbatim from registry.py.

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
from ydb_cdc_processor_spark.registry_queries.m03_llm_pipeline import (
    _EMB_DIM, _HEX_BYTE, _MINHASH_BANDS, _MINHASH_EST, _MINHASH_SIG_COLS, _NORM_WORDS, _SHINGLE3, _srp_bucket_sql, q_dedup_clusters, q_similarity_ivf, q_similarity_lsh, q_similarity_topk)
from ydb_cdc_processor_spark.registry_queries.m04_temporal_sampling import (
    _HEX8)
from ydb_cdc_processor_spark.registry_queries.m05_curation import (
    q_audio_profile, q_distinct_kmv, q_pagerank)
from ydb_cdc_processor_spark.registry_queries.m06_scd_checksum import (
    q_bm25, q_table_checksum)

# Round 7 additions: canonical TPC-H shapes (Q1/Q3/Q4) + curation sampling
# and tokenizer-coverage operators
# ---------------------------------------------------------------------------

_Q1_CUT = "1998-07-01 00:00:00"


@register("q_pricing_summary", f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax)
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUT}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 pricing summary shape — the canonical scan-heavy
    wide-aggregate report: one filtered scan, one map-side-combined
    hash agg into a handful of groups, every double routed through the
    exact decimal fold (functions/aggregates.py) so the report is
    bit-identical at any parallelism.  Per-row products evaluate in the
    same association order as the oracle SQL."""
    li = load_table(spark, sf_dir, "lineitem") \
        .where(F.col("l_shipdate") <= F.lit(_Q1_CUT).cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(dec_sum("l_quantity", "sum_qty", 6),
                 dec_sum("l_extendedprice", "sum_base_price", 6),
                 dec_sum(disc_price, "sum_disc_price", 6),
                 dec_sum(charge, "sum_charge", 6),
                 dec_avg("l_quantity", "avg_qty", 6),
                 dec_avg("l_extendedprice", "avg_price", 6),
                 dec_avg("l_discount", "avg_disc", 6),
                 F.count(F.lit(1)).cast("long").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


@register("q_shipping_priority", f"""
SELECT l.l_orderkey,
       o.o_orderdate,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q1_CUT}'
  AND l.l_shipdate > TIMESTAMP '{_Q1_CUT}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""")
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shipping-priority shape: segment-filtered customers
    BROADCAST into the orders⋈lineitem join (the dimension side is
    config-scale after the filter — never shuffle the fact table for
    it), decimal-exact revenue agg, then ONE global top-10
    (TakeOrderedAndProject, no full sort).  Deterministic tiebreaks on
    (o_orderdate, l_orderkey) keep the boundary engine-stable."""
    cut = F.lit(_Q1_CUT).cast("timestamp")
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < cut)
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust), orders.o_custkey == F.col("c_custkey")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (j.groupBy("l_orderkey", "o_orderdate")
            .agg(dec_sum(rev, "revenue", 6))
            .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(),
                     F.col("l_orderkey").asc())
            .limit(10))


@register("q_order_priority_exists", """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape — the canonical EXISTS decorrelation: the
    subquery lowers to a LEFT SEMI hash join on the order key (each
    order emitted at most once regardless of matching line count — a
    plain inner join + distinct would shuffle the duplicates first),
    then a tiny hash agg on priority."""
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00")
                      .cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00")
                        .cast("timestamp"))))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_discount") > 0.05).select("l_orderkey"))
    return (orders.join(li, orders.o_orderkey == li.l_orderkey,
                        how="left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            .orderBy("o_orderpriority"))


@register("q_weighted_sample", """
WITH h AS (
  SELECT doc_id, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
  FROM documents WHERE n_chars > 0),
s AS (
  SELECT doc_id, n_chars,
         round(ln((CAST({hex8} AS DOUBLE) + 1) / 4294967296.0)
               / n_chars, 9) AS aes_key
  FROM h)
SELECT doc_id, n_chars, aes_key
FROM s ORDER BY aes_key DESC, doc_id ASC LIMIT 100
""".replace("{hex8}", " + ".join(
    f"(strpos('0123456789abcdef', substr(h8, {i}, 1)) - 1) "
    f"* {16 ** (8 - i)}" for i in range(1, 9))))
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (functions/sampling.weighted_sample): Efraimidis–Spirakis A-ES over
    the documents table with n_chars as the weight — longer docs
    proportionally likelier, no replacement, and the selected set is a
    pure function of the ids (stable across runs/partitionings/engines,
    unlike df.sample).  One codegen projection + one global top-k."""
    from ydb_cdc_processor_spark.functions.sampling import weighted_sample
    docs = load_docs(spark, sf_dir).select("doc_id", "n_chars")
    return (weighted_sample(docs, "doc_id", "n_chars", 100,
                             keep_key=True)
            .select("doc_id", "n_chars",
                    F.col("_aes_key").alias("aes_key")))


@register("q_vocab_coverage", r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS word
  FROM documents),
wn AS (SELECT doc_id, word FROM w WHERE word <> ''),
v AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY COUNT(*) DESC, word ASC) AS rnk
    FROM wn GROUP BY word) WHERE rnk <= 512),
cov AS (
  SELECT wn.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM wn LEFT JOIN v ON wn.word = v.word
  GROUP BY wn.doc_id)
SELECT d.doc_id,
       COALESCE(cov.n_tokens, 0) AS n_tokens,
       COALESCE(cov.n_oov, 0) AS n_oov,
       CAST(floor(cov.n_oov * 1000000.0 / cov.n_tokens) AS BIGINT) AS oov_ppm
FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
""")
def q_vocab_coverage(spark, sf_dir):
    """Per-document tokenizer-vocabulary coverage (text.vocab_coverage):
    corpus top-512 term vocab (frequency-ranked, term-asc tiebreak)
    broadcast back over the token stream; each doc reports its token
    count and out-of-vocabulary share in exact integer ppm (FLOOR of an
    IEEE division — no cross-engine rounding half-cases)."""
    return text.vocab_coverage(load_docs(spark, sf_dir), vocab_size=512)


@register("q_priority_shipping_mix", """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""")
def q_priority_shipping_mix(spark, sf_dir):
    """TPC-H Q12 shape — conditional-aggregate mix report: one fact⋈fact
    equi-join (both sides shuffle on the order key; nothing to
    broadcast) and CASE-guarded counts per group — the
    filter-inside-the-aggregate pattern every reporting workload uses."""
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
          .select("l_orderkey", "l_linestatus"))
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("long")
                 .alias("low_line_count"))
            .orderBy("l_linestatus"))


@register("q_promo_revenue", """
SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(38,6))) AS DOUBLE) AS promo_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-09-01 00:00:00'
""")
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape — promo revenue share: the part dimension
    BROADCASTs into the date-pruned lineitem scan, both the guarded and
    total revenue ride ONE exact decimal fold each, and the share is a
    single deterministic IEEE division of the two (no rounding needed —
    both operands are bit-identical on any engine)."""
    lo = F.lit("1997-06-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-09-01 00:00:00").cast("timestamp")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(38,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev) \
        .otherwise(F.lit(0).cast("decimal(38,6)"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg((F.lit(100.0) * F.sum(promo).cast("double")
                  / F.sum(rev).cast("double")).alias("promo_share")))


@register("q_discount_revenue_disjunct", """
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 5)
""")
def q_discount_revenue_disjunct(spark, sf_dir):
    """TPC-H Q19 shape — disjunctive mixed-table predicates: three OR'd
    (brand, size, quantity) clauses spanning both join sides.  The part
    side BROADCASTs with its derivable disjunct (brand ∈ {…}) pushed
    into its scan; the quantity conjuncts evaluate as the join residual.
    Catalyst's OR-factoring is what keeps the fact scan from reading
    rows no disjunct can accept."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = ((F.col("p_brand") == "Brand#1")
          & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
    c2 = ((F.col("p_brand") == "Brand#2")
          & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
    c3 = ((F.col("p_brand") == "Brand#3")
          & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 5))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (j.where(c1 | c2 | c3)
            .agg(dec_sum(rev, "revenue", 6),
                 F.count(F.lit(1)).cast("long").alias("n_lines")))


@register("q_small_quantity_revenue", """
WITH lim AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                / COUNT(*)) AS qty_lim
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN lim t ON t.l_partkey = l.l_partkey
WHERE l.l_quantity < t.qty_lim
""")
def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape — the correlated scalar subquery ("below 20% of
    this part's average quantity") decorrelated into a per-part
    aggregate joined back to the fact table: ONE extra hash agg +
    equi-join on the part key instead of a per-row subquery.  The
    average routes through the exact decimal fold so the 0.2× threshold
    is the identical double on any engine — the comparison can't
    straddle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (F.sum(F.col("l_quantity").cast("decimal(38,6)"))
                       .cast("double") / F.count(F.lit(1))))
        .alias("qty_lim"))
    return (li.join(lim, on="l_partkey")
            .where(F.col("l_quantity") < F.col("qty_lim"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                  .cast("double") / F.lit(7.0)).alias("avg_yearly"),
                 F.count(F.lit(1)).cast("long").alias("n_lines")))


@register("q_event_transitions", """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
""")
def q_event_transitions(spark, sf_dir):
    """Event-transition (first-order Markov) counts over each user's
    event sequence: ONE key shuffle for the per-user lead window, then a
    tiny hash agg on the (from, to) pair — the behavioral-analytics
    shape funnels and session models build on.  Deterministic tiebreak
    on event_id inside equal timestamps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    return (ev.withColumn("next_type", F.lead("event_type").over(w))
            .where(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy("event_type", "next_type"))


@register("q_ann_recall", f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (SELECT vec_id AS probe_id, emb AS p_emb FROM e WHERE vec_id % 100 = 0),
bs AS (SELECT probe_id, vec_id,
              round(list_cosine_similarity(emb, p_emb), 6) AS cos_sim
       FROM e CROSS JOIN p WHERE vec_id <> probe_id),
br AS (SELECT probe_id, vec_id,
              row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       FROM bs),
bt AS (SELECT probe_id, vec_id FROM br WHERE rnk <= 5),
cb AS (SELECT vec_id, emb, {_srp_bucket_sql(8, "emb")} AS bucket FROM e),
pb AS (SELECT vec_id AS probe_id, emb AS pemb, bucket FROM cb
       WHERE vec_id % 100 = 0),
ls AS (SELECT pb.probe_id, cb.vec_id,
              round(list_cosine_similarity(cb.emb, pb.pemb), 6) AS cos_sim
       FROM cb JOIN pb USING (bucket) WHERE cb.vec_id <> pb.probe_id),
lr AS (SELECT probe_id, vec_id,
              row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       FROM ls),
lt AS (SELECT probe_id, vec_id FROM lr WHERE rnk <= 5)
SELECT bt.probe_id,
       CAST(COUNT(lt.vec_id) AS BIGINT) AS n_hits,
       round(COUNT(lt.vec_id) / 5.0, 6) AS recall_at_5
FROM bt LEFT JOIN lt ON lt.probe_id = bt.probe_id AND lt.vec_id = bt.vec_id
GROUP BY bt.probe_id
ORDER BY bt.probe_id
""")
def q_ann_recall(spark, sf_dir):
    """ANN quality self-measurement — recall@5 of the SRP-LSH index
    against the exact brute-force ranking, per probe ("measure, don't
    guess" applied to the index itself: the number a 100 TB deployment
    watches when tuning n_planes/occupancy).  Both rankings reuse the
    oracle-replayable pipelines of q_similarity_topk / q_similarity_lsh;
    the recall join is probe-keyed and broadcast-sized."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    brute = similarity.cosine_topk(emb, probes, k=5) \
        .select("probe_id", "vec_id")
    lsh = (similarity.cosine_topk_lsh(emb, probes, k=5, n_planes=8,
                                      dim=_EMB_DIM)
           .select(F.col("probe_id").alias("l_probe"),
                   F.col("vec_id").alias("l_vec")))
    # both sides are |probes|×k rows — broadcast the LSH side so the
    # recall join never shuffles (flagged by tools/audit_plans.py)
    j = brute.join(F.broadcast(lsh),
                   (F.col("probe_id") == F.col("l_probe"))
                   & (F.col("vec_id") == F.col("l_vec")), how="left")
    return (j.groupBy("probe_id")
            .agg(F.count("l_vec").cast("long").alias("n_hits"),
                 F.round(F.count("l_vec") / F.lit(5.0), 6)
                  .alias("recall_at_5"))
            .orderBy("probe_id"))


@register("q_customer_order_distribution", """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape — the histogram-of-group-sizes DOUBLE
    aggregation: orders-per-customer via a LEFT join (zero-order
    customers must appear in the 0 bin — an inner join silently drops
    them), then the distribution over those counts.  Two hash aggs; the
    second one's input is already customer-cardinality, so the heavy
    shuffle happens exactly once."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_custkey", "o_orderkey")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          how="left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").cast("long").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register("q_forecast_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — the canonical pushdown probe: a single scan
    whose THREE conjuncts (date range, discount band, quantity cap) all
    push into the parquet reader, one exact decimal fold, no join, no
    shuffle beyond the final 1-row agg.  The query every engine uses to
    demonstrate scan-filter efficiency."""
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
                 & F.col("l_discount").between(0.05, 0.07)
                 & (F.col("l_quantity") < 24)))
    return li.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"),
                "revenue", 6),
        F.count(F.lit(1)).cast("long").alias("n_lines"))


@register("q_idle_customers", """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
           AS v
  FROM customer WHERE c_acctbal > 0.0)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""")
def q_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape — positive-account customers above the global
    average balance who have never ordered: a broadcast scalar subquery
    (one tiny agg crossed in) + a LEFT ANTI join against the orders fact
    + the segment rollup.  The average routes through the exact decimal
    fold so the > threshold is engine-identical."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal")
    avg_bal = (cust.where(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
                     .cast("double") / F.count(F.lit(1))).alias("v")))
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (cust.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("v"))
            .join(orders, cust.c_custkey == orders.o_custkey,
                  how="left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("n_custs"),
                 F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
                  .cast("double").alias("total_bal"))
            .orderBy("c_mktsegment"))


ORACLE_VECTOR_INDEX = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cell, emb AS cemb FROM e WHERE vec_id % 3 <> 2
         ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 16),
ca AS (SELECT vec_id, emb, cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY round(list_cosine_similarity(emb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM e CROSS JOIN cent),
cc AS (SELECT vec_id, emb, cell FROM ca WHERE cr = 1),
p AS (SELECT vec_id AS probe_id, emb AS pemb FROM e WHERE vec_id % 100 = 0),
pa AS (SELECT probe_id, pemb, cell,
              row_number() OVER (PARTITION BY probe_id
                ORDER BY round(list_cosine_similarity(pemb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM p CROSS JOIN cent),
pc AS (SELECT probe_id, pemb, cell FROM pa WHERE cr <= 4),
s AS (SELECT pc.probe_id, cc.vec_id,
             round(list_cosine_similarity(cc.emb, pc.pemb), 6) AS cos_sim
      FROM cc JOIN pc USING (cell) WHERE cc.vec_id <> pc.probe_id),
r AS (SELECT probe_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM s)
SELECT probe_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 5
"""


@register("q_vector_index", ORACLE_VECTOR_INDEX)
def q_vector_index(spark, sf_dir):
    """PERSISTENT IVF vector index (operators/vector_index.py): the
    quantizer trains on two-thirds of the corpus, the remaining third
    ingests through add_batch against the frozen centroids (the standard
    IVF serving contract), and the query reads ONLY the probes' nearest
    cells' store buckets.  The oracle replays the whole lifecycle in
    SQL — subset-sampled centroids, full-corpus assignment, cell-pruned
    candidate join, per-probe top-5."""
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    emb = load_table(spark, sf_dir, "embeddings")
    idx = VectorIndex(spark, _scratch_dir("vecidx_") + "/idx", n_cells=16)
    idx.build(emb.where(F.col("vec_id") % 3 != 2))
    idx.add_batch(emb.where(F.col("vec_id") % 3 == 2))
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    return idx.query(probes, k=5, n_probe=4)


@register("q_vector_index_stream", ORACLE_VECTOR_INDEX)
def q_vector_index_stream(spark, sf_dir):
    """The IVF index maintained from a STREAM
    (VectorIndex.start_stream): the quantizer trains on two-thirds of
    the corpus, the remaining third arrives as a checkpointed file
    stream (one file per trigger) whose micro-batches ingest via
    foreachBatch → add_batch.  Frozen-quantizer assignment is
    per-vector, so arrival batching cannot change the served results —
    the streaming lifecycle must land on exactly the batch lifecycle's
    answers, which is what the (shared) SQL oracle replays."""
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    emb = load_table(spark, sf_dir, "embeddings")
    base = _scratch_dir("vecidxs_")
    idx = VectorIndex(spark, base + "/idx", n_cells=16)
    idx.build(emb.where(F.col("vec_id") % 3 != 2))
    late = emb.where(F.col("vec_id") % 3 == 2)
    late.repartition(3).write.parquet(base + "/src")
    stream = (spark.readStream.schema(late.schema)
              .option("maxFilesPerTrigger", 1).parquet(base + "/src"))
    idx.start_stream(stream, base + "/ckpt").awaitTermination()
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    return idx.query(probes, k=5, n_probe=4)


@register("q_vector_index_pq", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id,
             list_transform(emb,
                            x -> x / sqrt(list_inner_product(emb, emb)))
               AS uv
      FROM e),
cent AS (SELECT vec_id AS cell, emb AS cemb FROM e WHERE vec_id % 3 <> 2
         ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 16),
ca AS (SELECT vec_id, cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY round(list_cosine_similarity(emb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM e CROSS JOIN cent),
cc AS (SELECT vec_id, cell FROM ca WHERE cr = 1),
p AS (SELECT vec_id AS probe_id, emb AS pemb FROM e WHERE vec_id % 100 = 0),
pa AS (SELECT probe_id, cell,
              row_number() OVER (PARTITION BY probe_id
                ORDER BY round(list_cosine_similarity(pemb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM p CROSS JOIN cent),
pc AS (SELECT probe_id, cell FROM pa WHERE cr <= 4),
smp AS (SELECT uv, md5(CAST(vec_id AS VARCHAR) || ':42') AS h
        FROM u WHERE vec_id % 3 <> 2 ORDER BY h LIMIT 64),
cb AS (SELECT CAST(row_number() OVER (ORDER BY h ASC) - 1 AS INTEGER) AS j,
              uv AS cw
       FROM smp),
cbm AS (SELECT m, j, list_slice(cw, m * 4 + 1, m * 4 + 4) AS cws
        FROM cb CROSS JOIN range(0, 16) t(m)),
ec AS (SELECT vec_id, m, j,
              round(list_inner_product(
                  list_slice(uv, m * 4 + 1, m * 4 + 4), cws), 6) AS s
       FROM u CROSS JOIN cbm),
enc AS (SELECT vec_id, m, j FROM (
          SELECT vec_id, m, j,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY s DESC, j ASC) AS rk
          FROM ec) t WHERE rk = 1),
tab AS (SELECT pu.vec_id AS probe_id, cbm.m, cbm.j,
               round(list_inner_product(
                   list_slice(pu.uv, cbm.m * 4 + 1, cbm.m * 4 + 4),
                   cbm.cws), 6) AS t
        FROM u pu CROSS JOIN cbm WHERE pu.vec_id % 100 = 0),
pairs AS (SELECT pc.probe_id, cc.vec_id
          FROM cc JOIN pc USING (cell)
          WHERE cc.vec_id <> pc.probe_id),
ip AS (SELECT pr.probe_id, pr.vec_id, SUM(t.t ORDER BY t.m) AS ips
       FROM pairs pr
       JOIN enc ON enc.vec_id = pr.vec_id
       JOIN tab t ON t.probe_id = pr.probe_id
               AND t.m = enc.m AND t.j = enc.j
       GROUP BY pr.probe_id, pr.vec_id),
r AS (SELECT probe_id, vec_id, round(ips, 6) AS pq_sim FROM ip)
SELECT probe_id, vec_id, pq_sim, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT probe_id, vec_id, pq_sim,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY pq_sim DESC, vec_id ASC) AS rnk
  FROM r) t
WHERE rnk <= 5
""")
def q_vector_index_pq(spark, sf_dir):
    """IVFADC as a MAINTAINED store (VectorIndex(m_sub=..., n_codes=...)
    — the 100 TB serving shape of Jégou et al. 2011 §IV): the coarse
    quantizer AND the PQ codebook train on two-thirds of the corpus,
    the remaining third ingests through add_batch ENCODED against the
    frozen codebook (codes live in the inverted lists at ingest — the
    store never holds a raw vector, ~96 bits/vec instead of 64
    doubles), and the query reads only the probed cells' buckets,
    scoring candidates by ADC table lookups.  Unlike
    q_similarity_ivf_pq (per-call re-train + re-encode of everything),
    the per-batch cost here is O(|batch|) and query cost is
    O(probed-cell occupancy) — the oracle replays the whole lifecycle
    with subset-trained centroids + codebook but full-corpus codes."""
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    emb = load_table(spark, sf_dir, "embeddings")
    idx = VectorIndex(spark, _scratch_dir("vecidxpq_") + "/idx",
                      n_cells=16, m_sub=16, n_codes=64)
    idx.build(emb.where(F.col("vec_id") % 3 != 2), dim=64)
    idx.add_batch(emb.where(F.col("vec_id") % 3 == 2))
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    return idx.query(probes, k=5, n_probe=4)


@register("q_media_scenes", f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 64),
byt AS (
  SELECT doc_id, i - 1 AS j, {{hexbyte}} AS byte
  FROM b, LATERAL unnest(generate_series(1, n)) AS t(i)
  WHERE i <= (n // 64) * 64),
fr AS (
  SELECT doc_id, j // 64 AS frame_idx,
         round(SUM(byte) / 64.0, 6) AS lum
  FROM byt GROUP BY doc_id, j // 64),
sc AS (
  SELECT doc_id, frame_idx, lum,
         lag(lum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
  FROM fr)
SELECT doc_id, frame_idx, lum,
       CASE WHEN prev IS NULL THEN TRUE
            ELSE abs(lum - prev) > 2.0 END AS is_scene
FROM sc
""".replace("{hexbyte}", _HEX_BYTE))
def q_media_scenes(spark, sf_dir):
    """Video scene-boundary detection (multimodal.frame_mean_luminance +
    scene_changes): per-frame luminance via ONE vectorized reshape+mean
    per Arrow batch over the blob (fake-codec frame convention — a real
    decoder slots into the same signature), then a pure-Catalyst per-doc
    lag window flags |Δlum| > threshold.  Luminance is a dyadic-exact
    sum/64, so the boundary comparison is engine-exact."""
    from ydb_cdc_processor_spark.operators import multimodal
    media = multimodal.media_from_documents(load_docs(spark, sf_dir))
    lum = multimodal.frame_mean_luminance(media, frame_bytes=64)
    return multimodal.scene_changes(lum, threshold=2.0)


@register("q_audio_trim", f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 64),
byt AS (
  SELECT doc_id, i - 1 AS j, {{hexbyte}} AS byte
  FROM b, LATERAL unnest(generate_series(1, n)) AS t(i)
  WHERE i <= (n // 64) * 64),
win AS (
  SELECT doc_id, j // 64 AS win_idx,
         round(sqrt(SUM((byte - 128.0) * (byte - 128.0)) / 64.0), 6) AS rms
  FROM byt GROUP BY doc_id, j // 64)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MIN(CASE WHEN rms >= 25.0 THEN win_idx END) * 64 AS BIGINT)
         AS trim_start,
       CAST((MAX(CASE WHEN rms >= 25.0 THEN win_idx END) + 1) * 64
            AS BIGINT) AS trim_end
FROM win GROUP BY doc_id
""".replace("{hexbyte}", _HEX_BYTE))
def q_audio_trim(spark, sf_dir):
    """Silence-trim offsets — the back half of voice-activity
    segmentation: over the windowed RMS profile (audio_window_rms, the
    voiced threshold shared with q_audio_profile), each clip reports the
    sample offsets of its first and last voiced window (NULL when the
    whole clip is quiet).  One hash agg over the profile; no second pass
    over the PCM."""
    from ydb_cdc_processor_spark.operators import multimodal
    media = multimodal.media_from_documents(load_docs(spark, sf_dir))
    rms = multimodal.audio_window_rms(media, window=64)
    voiced = F.when(F.col("rms") >= 25.0, F.col("win_idx"))
    return (rms.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_windows"),
                 (F.min(voiced) * 64).cast("long").alias("trim_start"),
                 ((F.max(voiced) + 1) * 64).cast("long").alias("trim_end")))


@register("q_neardup_index", f"""
WITH nrm AS ({_NORM_WORDS}),
sh AS (SELECT doc_id, unnest({_SHINGLE3}) AS s FROM nrm),
sig AS (SELECT doc_id, {_MINHASH_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_MINHASH_BANDS}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id)
SELECT p.doc_a, p.doc_b,
       round(({_MINHASH_EST}) / 16.0, 6) AS est_jaccard
FROM pairs p
JOIN sig a ON a.doc_id = p.doc_a
JOIN sig b ON b.doc_id = p.doc_b
""")
def q_neardup_index(spark, sf_dir):
    """Near-dup detection AT INGEST (operators/neardup_index.py): the
    corpus arrives as three micro-batches into a persistent banded-
    MinHash signature store (bucketed view co-located on (band,bucket));
    each batch reads only its touched store buckets and emits candidate
    pairs scored by signature agreement.  The UNION of the per-batch
    pair sets must equal the one-shot LSH pair set with the identical
    estimate — which is exactly what the oracle recomputes in SQL.
    (apply_batch returns eagerly-materialized pairs, so holding them
    across subsequent batches is safe.)"""
    from ydb_cdc_processor_spark.operators.neardup_index import NearDupIndex
    docs = load_docs(spark, sf_dir)
    idx = NearDupIndex(spark, _scratch_dir("ndidx_") + "/idx")
    parts = []
    for part in range(3):
        batch = docs.where(F.col("doc_id") % 3 == part)
        parts.append(idx.apply_batch(batch))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


@register("q_range_cluster", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
""")
def q_range_cluster(spark, sf_dir):
    """Range-clustered layout (functions/layout.cluster_write): lineitem
    is rewritten range-partitioned + sorted on l_shipdate, then a
    one-month revenue query runs over the CLUSTERED copy — the files
    outside the month are skipped via parquet min/max stats (layout
    disjointness pinned structurally by
    test_cluster_write_files_own_disjoint_ranges; result equality with
    the unclustered table is this oracle).  The rewrite is one sampled
    range shuffle — pay once at write, prune on every range scan."""
    from ydb_cdc_processor_spark.functions.layout import cluster_write
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount")
    path = _scratch_dir("rcluster_") + "/li"
    cluster_write(li, path, ["l_shipdate"], n_files=16)
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (spark.read.parquet(path)
            .where((F.col("l_shipdate") >= "1997-03-01")
                   & (F.col("l_shipdate") < "1997-04-01"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
                 .cast("double").alias("revenue")))


@register("q_checksum_incremental", """
WITH rows_h AS (
  SELECT substr(md5(
           COALESCE(md5(CAST(o_orderkey AS VARCHAR)), repeat('N', 32)) ||
           COALESCE(md5(CAST(o_custkey AS VARCHAR)), repeat('N', 32)) ||
           COALESCE(md5(o_orderstatus), repeat('N', 32)) ||
           COALESCE(md5(o_orderpriority), repeat('N', 32))), 1, 15) AS h15
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({hex15}) AS VARCHAR) AS digest,
       'cksum-v2' AS fmt
FROM rows_h
""".replace("{hex15}", " + ".join(
    f"(strpos('0123456789abcdef', substr(h15, {i}, 1)) - 1) "
    f"* {16 ** (15 - i)}" for i in range(1, 16))))
def q_checksum_incremental(spark, sf_dir):
    """INCREMENTALLY-maintained table checksum
    (functions/checksum.ChecksumView): the orders table arrives as three
    upsert micro-batches into a keyed view — the middle batch WRITES
    MODIFIED rows that the last batch updates back — and the digest is
    maintained per batch as +new/−old-image deltas (shard additivity),
    never recomputed over the view.  After the last batch the view
    equals the full table, so the maintained (n_rows, digest, fmt) must
    land bit-for-bit on the one-shot q_table_checksum oracle — O(batch)
    maintenance provably converging to the O(table) recompute."""
    from ydb_cdc_processor_spark.functions.checksum import ChecksumView
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    base = _scratch_dir("ckinc_")
    mv = ParquetMaterializedView(spark, base + "/view", ["o_orderkey"],
                                 schema=orders.schema)
    cv = ChecksumView(spark, base + "/ck", cols)
    batches = [
        orders.where(F.col("o_orderkey") % 3 != 2),
        orders.where(F.col("o_orderkey") % 3 == 2)
              .withColumn("o_orderpriority", F.lit("X-TEMP")),
        orders.where(F.col("o_orderkey") % 3 == 2),
    ]
    for i, b in enumerate(batches):
        old = None
        if mv.exists():
            old = (mv.read().join(b.select("o_orderkey"), on="o_orderkey",
                                  how="left_semi")
                   .localCheckpoint(eager=True))
        cv.apply_delta(b, old, batch_token=f"ck:{i}")
        mv.apply(b, action="upsertInto")
    s = cv.read()
    return spark.createDataFrame(
        [(s["n_rows"], s["digest"], s["fmt"])],
        "n_rows long, digest string, fmt string")


@register("q_neardup_index_stream", None)
def q_neardup_index_stream(spark, sf_dir):
    """Near-dup detection from a STREAM (NearDupIndex.start_stream):
    the corpus arrives as a checkpointed file stream (one file per
    trigger) into the persistent banded-MinHash store; per-batch
    candidate pairs append to a parquet sink tagged by batch id and are
    read back replay-collapsed (read_pairs).  The collapsed pair set
    must equal the one-shot LSH pair set with identical estimates —
    exactly what q_neardup_index's shared SQL oracle recomputes
    (any-batching == one-shot is also property-tested,
    test_neardup_index.py)."""
    from ydb_cdc_processor_spark.operators.neardup_index import NearDupIndex
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    base = _scratch_dir("ndidxs_")
    docs.repartition(3).write.parquet(base + "/src")
    idx = NearDupIndex(spark, base + "/idx")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(base + "/src"))
    idx.start_stream(stream, base + "/ckpt", base + "/pairs") \
       .awaitTermination()
    return (idx.read_pairs(base + "/pairs")
            .select("doc_a", "doc_b", "est_jaccard").distinct())


ORACLES["q_neardup_index_stream"] = ORACLES["q_neardup_index"]


@register("q_nation_trade_volume", """
WITH v AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01')
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM v GROUP BY supp_nation, cust_nation, l_year
""")
def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 volume-shipping shape: bilateral trade volume between
    two nations by ship year.  The nation filters broadcast and
    pre-prune supplier/customer BEFORE lineitem joins them, so the big
    table's join fan-in carries only the two nations' rows; the ship-
    date range pushes into the lineitem scan; revenue is the
    decimal-exact Σ price·(1−discount)."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"))), on="s_nationkey")
            .select("s_suppkey", "supp_nation"))
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("cust_nation"))), on="c_nationkey")
            .select("c_custkey", "cust_nation"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    return (li
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .where(((F.col("supp_nation") == "NATION_1")
                    & (F.col("cust_nation") == "NATION_2"))
                   | ((F.col("supp_nation") == "NATION_2")
                      & (F.col("cust_nation") == "NATION_1")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
                 .cast("double").alias("revenue")))


@register("q_market_share", """
WITH an AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM an GROUP BY o_year
""")
def q_market_share(spark, sf_dir):
    """TPC-H Q8 national-market-share shape: one nation's share of a
    region's revenue for one part type, by order year — the
    conditional-aggregate-over-star-join pattern.  Every dimension
    (part-type filter, region→nation chain, supplier nation)
    broadcasts; both the numerator's CASE sum and the denominator ride
    ONE decimal-exact aggregate pass; the share divides the two exact
    sums in IEEE doubles, identically on both engines.  The
    lineitem⋈orders and orders⋈customer joins sort-merge BY DESIGN —
    fact-fact joins at 100 TB must shuffle on their keys (AQE converts
    them to broadcast at runtime when the filtered side turns out
    small)."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "AMERICA").select("r_regionkey")
    cnation = (nation.join(F.broadcast(region),
                           nation.n_regionkey == region.r_regionkey)
               .select(F.col("n_nationkey").alias("c_nationkey")))
    snation = nation.select(F.col("n_nationkey").alias("s_nationkey"),
                            F.col("n_name").alias("supp_nation"))
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(cnation), on="c_nationkey")
            .select("c_custkey"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(snation), on="s_nationkey")
            .select("s_suppkey", "supp_nation"))
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1998-01-01"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    vol = d2("l_extendedprice") * (1 - d2("l_discount"))
    an = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
          .select(F.year("o_orderdate").cast("long").alias("o_year"),
                  vol.alias("volume"), "supp_nation"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (an.groupBy("o_year")
            .agg((F.sum(F.when(F.col("supp_nation") == "NATION_1",
                               F.col("volume")).otherwise(zero))
                  .cast("double")
                  / F.sum("volume").cast("double")).alias("mkt_share")))


@register("q_returned_items", """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""")
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 returned-item-reporting shape: top-20 customers by
    revenue lost to returns in one quarter.  The quarter filter pushes
    into the orders scan and the returnflag filter into lineitem's;
    nation broadcasts; the top-20 is a distributed TakeOrdered (never a
    global sort) with the customer key as the deterministic
    tie-breaker."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1996-04-01"))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
            .agg(F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
                 .cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


@register("q_top_supplier", """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""")
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 top-supplier shape (the view-based variant flattened):
    quarterly revenue per supplier, keep the maximum (ties included —
    the spec's semantics).  The max is a 1-row broadcast against the
    already-aggregated revenue frame, and the equality is float-safe
    cross-engine because both sides derive the revenue from the SAME
    decimal-exact sum."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
                .cast("double").alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("_mx"))
            .join(F.broadcast(supp),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue"))


@register("q_large_orders", """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 180)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""")
def q_large_orders(spark, sf_dir):
    """TPC-H Q18 large-volume-customer shape: orders whose total
    quantity exceeds a threshold, with customer detail — the
    aggregate-derived semi-join pattern.  The HAVING side is one
    map-side-combined agg over (l_orderkey); its survivors semi-join
    back into the detail pass; the threshold compares the EXACT decimal
    sum, so membership is bit-stable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    qdec = F.col("l_quantity").cast("decimal(38,6)")
    big = (li.groupBy("l_orderkey").agg(F.sum(qdec).alias("_q"))
           .where(F.col("_q") > 180).select("l_orderkey"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name")
    return (li.join(big, on="l_orderkey", how="left_semi")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum(qdec).cast("double").alias("sum_qty")))


@register("q_join_view", """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderpriority,
       c.c_name,
       CASE WHEN c.c_custkey % 4 = 1 THEN 'VIP'
            ELSE c.c_mktsegment END AS c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 7 <> 6
""")
def q_join_view(spark, sf_dir):
    """INCREMENTALLY-maintained JOIN view (operators/join_view.JoinView):
    orders LEFT JOIN customer kept current under CDC on BOTH sides —
    the delta-join IVM the reference's single-table maintenance cannot
    express.  Six micro-batches exercise every maintenance path: fact
    arrival with temporarily-wrong rows, LATE dim arrival (null
    enrichment filled in place via touched-bucket refresh), fact
    correction via old-image routing, a dim UPDATE fanning out to its
    fact rows, and a fact delete batch.  The end state must equal the
    one-shot SQL join of the final table states — O(batch)/O(touched-
    bucket) maintenance provably converging to the O(table) recompute."""
    from pyspark.sql import types as T

    from ydb_cdc_processor_spark.operators.join_view import JoinView
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders").select(*fact_cols)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    base = _scratch_dir("jv_")
    jv = JoinView(spark, base, fact_pk=["o_orderkey"], fk_col="o_custkey",
                  dim_pk="c_custkey",
                  dim_schema=T.StructType([f for f in cust.schema]),
                  n_buckets=8)

    def _old_images(pks):
        return (jv.read().select(*fact_cols)
                .join(pks, on="o_orderkey", how="left_semi")
                .localCheckpoint(eager=True))

    # 1. most of the dim arrives
    jv.apply_dim_delta(cust.where(F.col("c_custkey") % 4 != 3), None)
    # 2. most of the fact arrives; the %3==0 slice lands WRONG
    f1 = orders.where(F.col("o_orderkey") % 3 != 2).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X-TMP"))
        .otherwise(F.col("o_orderpriority")))
    jv.apply_fact_delta(f1, None)
    # 3. LATE dim slice — fills the null enrichments in place
    jv.apply_dim_delta(cust.where(F.col("c_custkey") % 4 == 3), None)
    # 4. the rest of the fact + correction of the wrong slice
    f2 = orders.where((F.col("o_orderkey") % 3 == 2)
                      | (F.col("o_orderkey") % 3 == 0))
    jv.apply_fact_delta(f2, _old_images(f2.select("o_orderkey")))
    # 5. dim UPDATE: the %4==1 customers move to the VIP segment
    vip = cust.where(F.col("c_custkey") % 4 == 1).withColumn(
        "c_mktsegment", F.lit("VIP"))
    jv.apply_dim_delta(
        vip, cust.where(F.col("c_custkey") % 4 == 1)
        .localCheckpoint(eager=True))
    # 6. fact DELETE batch, routed by old images
    dead = orders.where(F.col("o_orderkey") % 7 == 6)
    jv.apply_fact_delta(None, _old_images(dead.select("o_orderkey")))
    return jv.read()


@register("q_unpivot", """
WITH m AS (
  SELECT l_returnflag, 'quantity' AS measure,
         CAST(l_quantity AS DECIMAL(38,4)) AS v FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice',
         CAST(l_extendedprice AS DECIMAL(38,4)) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount',
         CAST(l_discount AS DECIMAL(38,4)) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax',
         CAST(l_tax AS DECIMAL(38,4)) FROM lineitem)
SELECT l_returnflag, measure,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS DOUBLE) AS total
FROM m GROUP BY l_returnflag, measure
""")
def q_unpivot(spark, sf_dir):
    """UNPIVOT (wide→long reshape): four lineitem measures melt into
    (measure, value) rows, then aggregate per (returnflag, measure) —
    the standard long-format feed for metric stores and plotting
    layers.  Spark's native ``unpivot`` lowers to ONE Expand inside the
    scan stage (rows replicate 4× map-side, no shuffle per measure, one
    hash agg after) — same shape CUBE uses; the oracle replays it as
    UNION ALL.  Values go through decimal so the four sums are exact
    cross-engine."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  *[F.col(f"l_{m}").cast("decimal(38,4)").alias(m)
                    for m in ("quantity", "extendedprice",
                              "discount", "tax")]))
    long = li.unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure", "v")
    return (long.groupBy("l_returnflag", "measure")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").cast("double").alias("total")))


@register("q_grouping_sets", """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority))
""")
def q_grouping_sets(spark, sf_dir):
    """Custom GROUPING SETS (the general form CUBE/ROLLUP specialize):
    exactly the three requested set combinations in one Expand +
    HashAggregate pass — never one scan per set.  Expressed through
    Spark SQL over a temp view (the DataFrame API exposes only
    cube/rollup; SQL is the native surface for arbitrary sets)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice")
    orders.createOrReplaceTempView("orders")
    # the registered oracle IS dialect-shared SQL — run the ONE string
    # on both engines instead of keeping a second copy in sync
    return spark.sql(ORACLES["q_grouping_sets"])


@register("q_secondary_index", """
SELECT o_custkey, o_orderkey FROM orders
WHERE o_custkey IN (7, 21, 42) AND o_orderkey % 7 <> 6
""")
def q_secondary_index(spark, sf_dir):
    """CDC-maintained secondary index (operators/secondary_index.
    SecondaryIndex): a value→pk index over orders.o_custkey kept
    current through three batches — an initial load whose %3==0 slice
    carries the WRONG custkey (+1), a correction batch whose old images
    route the stale entries' deletes, and a delete batch — then a
    3-customer point LOOKUP that reads only the probed values' buckets.
    The lookup must equal the SQL filter over the final table state:
    O(touched-bucket) maintenance + serving converging to the
    O(table) scan's answer."""
    from ydb_cdc_processor_spark.operators.secondary_index import (
        SecondaryIndex)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    ix = SecondaryIndex(spark, _scratch_dir("ix_") + "/ix",
                        pk=["o_orderkey"], col="o_custkey", n_buckets=8)
    b1 = orders.where(F.col("o_orderkey") % 3 != 2).withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 3 == 0,
                            F.col("o_custkey") + 1)
        .otherwise(F.col("o_custkey")))
    ix.apply_delta(b1, None)
    b2 = orders.where((F.col("o_orderkey") % 3 == 2)
                      | (F.col("o_orderkey") % 3 == 0))
    old2 = (b1.join(b2.select("o_orderkey"), on="o_orderkey",
                    how="left_semi").localCheckpoint(eager=True))
    ix.apply_delta(b2, old2)
    dead = orders.where(F.col("o_orderkey") % 7 == 6) \
        .localCheckpoint(eager=True)
    ix.apply_delta(None, dead)
    return ix.lookup([7, 21, 42])


@register("q_chained_views", """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % 7 <> 6
""")
def q_chained_views(spark, sf_dir):
    """CHAINED pipelines via the changefeed emitter (sources/
    changefeed_out.ChangefeedEmitter): view A's maintenance deltas are
    emitted as a wire-format JSON changefeed — key-routed partitions,
    dense per-partition offsets, at-least-once with a batch-token
    fence — and a SECOND CdcPipeline consumes that feed as its source,
    exactly how the reference composes multi-hop flows (any table,
    including a view target, can carry a changefeed — README.md:62-72).
    Three emitted batches (wrong-then-corrected rows, then deletes) put
    upserts AND erases for the same keys on the wire; the downstream
    view must land on the final table state."""
    from pyspark.sql import types as T

    from ydb_cdc_processor_spark.engine import CdcBatchEngine
    from ydb_cdc_processor_spark.plans.pipeline import CdcPipeline
    from ydb_cdc_processor_spark.sources import cdc_json
    from ydb_cdc_processor_spark.sources.changefeed_out import (
        ChangefeedEmitter)
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    base = _scratch_dir("chain_")
    em = ChangefeedEmitter(spark, base + "/feed", keys=["o_orderkey"],
                           n_partitions=4)
    b1 = orders.where(F.col("o_orderkey") % 3 != 2).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X-TMP"))
        .otherwise(F.col("o_orderpriority")))
    em.apply_delta(b1, None, batch_token="c1")
    b2 = orders.where((F.col("o_orderkey") % 3 == 2)
                      | (F.col("o_orderkey") % 3 == 0))
    em.apply_delta(b2, None, batch_token="c2")
    dead = orders.where(F.col("o_orderkey") % 7 == 6) \
        .localCheckpoint(eager=True)
    em.apply_delta(None, dead, batch_token="c3")

    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType())])
    p = CdcPipeline(
        name="chain_b", source_schema=schema, pk=["o_orderkey"],
        members={"o_orderkey": "Int64", "o_custkey": "Int64",
                 "o_totalprice": "Double", "o_orderpriority": "Text"},
        update_sql="SELECT o_orderkey, o_custkey, o_totalprice, "
                   "o_orderpriority FROM rows",
        delete_sql="SELECT o_orderkey FROM rows").validate(spark)
    b = CdcBatchEngine(spark, p, base + "/view_b")
    b.apply_raw_batch(cdc_json.read_cdc_batch(spark, base + "/feed"))
    return b.read_view()


@register("q_join_view_stream", """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderpriority,
       c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""")
def q_join_view_stream(spark, sf_dir):
    """The join view maintained from TWO live changefeeds
    (JoinView.start_streams): orders and customer each arrive as a
    checkpointed file stream (one file per trigger), staged so part of
    the fact BEATS its dim rows — the late dim batches must fill the
    null enrichments via touched-bucket refresh.  The end state must
    equal the one-shot SQL join of the full tables (restart convergence
    is separately pinned by test_join_view_streams_restart_converge)."""
    from pyspark.sql import types as T

    from ydb_cdc_processor_spark.operators.join_view import JoinView
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders").select(*fact_cols)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    base = _scratch_dir("jvs_")
    orders.repartition(2).write.parquet(base + "/fact_src")
    # dim split so its second file arrives after fact rows referencing it
    cust.where(F.col("c_custkey") % 2 == 0).coalesce(1) \
        .write.parquet(base + "/dim_src")
    cust.where(F.col("c_custkey") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(base + "/dim_src")
    jv = JoinView(spark, base + "/jv", fact_pk=["o_orderkey"],
                  fk_col="o_custkey", dim_pk="c_custkey",
                  dim_schema=T.StructType([f for f in cust.schema]),
                  n_buckets=8)
    for q in jv.start_streams(
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1).parquet(base + "/fact_src"),
            spark.readStream.schema(cust.schema)
            .option("maxFilesPerTrigger", 1).parquet(base + "/dim_src"),
            base + "/ckpt"):
        q.awaitTermination()
    return jv.read()


@register("q_waiting_suppliers", """
WITH j AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'),
a AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS ns,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nl
  FROM j GROUP BY l_orderkey)
SELECT s.s_name, COUNT(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE late = 1) lr
JOIN a ON lr.l_orderkey = a.l_orderkey AND a.ns >= 2 AND a.nl = 1
JOIN supplier s ON s.s_suppkey = lr.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY s.s_name
""")
def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 suppliers-who-kept-orders-waiting shape, adapted: this
    corpus has no l_receiptdate/l_commitdate, so "late" is l_shipdate
    more than 60 days after o_orderdate.  The two correlated EXISTS /
    NOT EXISTS subqueries lower to ONE per-order aggregate (distinct
    suppliers, distinct LATE suppliers) — a supplier "kept the order
    waiting" iff it shipped late on a multi-supplier order where it was
    the only late one.  numwait counts distinct such orders (the
    adapted spec; the oracle says DISTINCT too).  Plan shape: the
    lineitem⋈orders join and the per-order aggregate share the orderkey
    partitioning (one shuffle serves both), and the supplier/nation
    dimension broadcasts onto the slim qualifying pairs."""
    orders = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .withColumn("late", (F.col("l_shipdate")
                              > F.col("o_orderdate")
                              + F.expr("INTERVAL 60 DAYS")).cast("int"))
         .select("l_orderkey", "l_suppkey", "late"))
    agg = (j.groupBy("l_orderkey")
           .agg(F.countDistinct("l_suppkey").alias("ns"),
                F.countDistinct(F.when(F.col("late") == 1,
                                       F.col("l_suppkey"))).alias("nl"))
           .where((F.col("ns") >= 2) & (F.col("nl") == 1))
           .select("l_orderkey"))
    late_pairs = (j.where(F.col("late") == 1)
                  .select("l_orderkey", "l_suppkey").distinct()
                  .join(agg, on="l_orderkey"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(
                load_table(spark, sf_dir, "nation")
                .where(F.col("n_name") == "NATION_3")
                .select(F.col("n_nationkey").alias("s_nationkey"))),
                on="s_nationkey")
            .select("s_suppkey", "s_name"))
    return (late_pairs
            .join(F.broadcast(supp),
                  late_pairs.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


@register("q_min_cost_supplier", """
WITH eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS best
  FROM lineitem l JOIN eu ON l.l_suppkey = eu.s_suppkey
  GROUP BY l.l_partkey, l.l_suppkey),
m AS (SELECT l_partkey, MIN(best) AS pmin FROM offers GROUP BY l_partkey)
SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal,
       CAST(o.best AS DOUBLE) AS best_price
FROM offers o
JOIN m ON o.l_partkey = m.l_partkey AND o.best = m.pmin
JOIN part p ON p.p_partkey = o.l_partkey
JOIN eu ON eu.s_suppkey = o.l_suppkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
""")
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 minimum-cost-supplier shape, adapted: no partsupp table
    in this corpus, so the observed lineitem prices stand in for supply
    cost — for each STANDARD small part, the EUROPE supplier(s) whose
    best (minimum) extended price hits the part's regional minimum.
    The correlated MIN subquery lowers to an aggregate + self-join on
    the same grouping key (the per-(part,supplier) agg and the per-part
    min reuse one partkey shuffle); the min-equality compares EXACT
    decimals, so cross-engine tie sets are identical.  Region→nation→
    supplier all broadcast."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE").select("r_regionkey")
    eu = (load_table(spark, sf_dir, "supplier")
          .join(F.broadcast(
              nation.join(F.broadcast(region),
                          nation.n_regionkey == region.r_regionkey)
              .select(F.col("n_nationkey").alias("s_nationkey"))),
              on="s_nationkey")
          .select("s_suppkey", "s_name", "s_acctbal"))
    offers = (load_table(spark, sf_dir, "lineitem")
              .select("l_partkey", "l_suppkey", "l_extendedprice")
              .join(F.broadcast(eu.select("s_suppkey")),
                    F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(d2("l_extendedprice")).alias("best")))
    pmin = offers.groupBy("l_partkey").agg(F.min("best").alias("pmin"))
    part = (load_table(spark, sf_dir, "part")
            .where((F.col("p_type") == "STANDARD")
                   & (F.col("p_size") <= 10))
            .select("p_partkey", "p_name"))
    return (offers.join(pmin, on="l_partkey")
            .where(F.col("best") == F.col("pmin"))
            .join(F.broadcast(part),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(eu),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("p_partkey", "p_name", "s_name", "s_acctbal",
                    F.col("best").cast("double").alias("best_price")))


@register("q_product_profit", """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
""")
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 product-type-profit shape, adapted: profit per supplier
    nation per order year for parts matching a name pattern, with
    p_retailprice·quantity standing in for the missing partsupp supply
    cost.  The part-name filter broadcasts and prunes lineitem FIRST
    (the classic Q9 win — the pattern keeps ~1/8 of parts, so the
    orders join fan-in shrinks before the only fact-fact shuffle);
    supplier→nation broadcasts; the profit sum is decimal-exact then
    cast to double once."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_name").like("%gear%"))
            .select("p_partkey", "p_retailprice"))
    snation = (load_table(spark, sf_dir, "supplier")
               .join(F.broadcast(load_table(spark, sf_dir, "nation")
                                 .select(F.col("n_nationkey")
                                         .alias("s_nationkey"),
                                         F.col("n_name").alias("nation"))),
                     on="s_nationkey")
               .select("s_suppkey", "nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    profit = (d2("l_extendedprice") * (1 - d2("l_discount"))
              - d2("p_retailprice") * d2("l_quantity"))
    return (li.join(F.broadcast(part),
                    li.l_partkey == part.p_partkey)
            .join(F.broadcast(snation),
                  li.l_suppkey == snation.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("nation",
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("profit")))


@register("q_important_parts", """
WITH v AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM v WHERE value * 1000 > (SELECT SUM(value) FROM v)
""")
def q_important_parts(spark, sf_dir):
    """TPC-H Q11 important-stock shape, adapted: parts whose revenue
    through one nation's suppliers exceeds a fixed fraction of that
    nation's total — the scalar-subquery-threshold pattern.  The global
    total is a 1-row broadcast over the already-aggregated per-part
    frame (the per-part agg is computed once and feeds both sides);
    the comparison multiplies the part's EXACT decimal value by the
    inverse fraction instead of dividing the total, so no float enters
    the predicate on either engine."""
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(load_table(spark, sf_dir, "nation")
                              .where(F.col("n_name") == "NATION_5")
                              .select(F.col("n_nationkey")
                                      .alias("s_nationkey"))),
                  on="s_nationkey")
            .select("s_suppkey"))
    v = (load_table(spark, sf_dir, "lineitem")
         .select("l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount")
         .join(F.broadcast(supp),
               F.col("l_suppkey") == F.col("s_suppkey"))
         .groupBy("l_partkey")
         .agg(F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
              .alias("value")))
    total = v.agg(F.sum("value").alias("_total"))
    return (v.crossJoin(F.broadcast(total))
            .where(F.col("value") * 1000 > F.col("_total"))
            .select("l_partkey",
                    F.col("value").cast("double").alias("value")))


@register("q_dominant_supplier", """
WITH q AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_partkey, l.l_suppkey),
t AS (SELECT l_partkey, SUM(qty) AS total FROM q GROUP BY l_partkey)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM q JOIN t ON q.l_partkey = t.l_partkey AND q.qty * 2 > t.total
JOIN supplier s ON s.s_suppkey = q.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
""")
def q_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 potential-part-promotion shape, adapted: suppliers from
    one nation who shipped MORE THAN HALF of some small-part's 1997
    volume (the correlated half-of-total threshold, with shipped
    quantity standing in for the missing partsupp availqty).  The
    per-(part,supplier) agg and the per-part total reuse one partkey
    shuffle; the half-threshold compares 2·qty > total on EXACT
    decimals; the surviving pairs collapse to distinct suppliers and
    the supplier/nation dimensions broadcast."""
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_name").like("small%"))
            .select("p_partkey"))
    q = (load_table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01"))
         .select("l_partkey", "l_suppkey", "l_quantity")
         .join(F.broadcast(part),
               F.col("l_partkey") == F.col("p_partkey"))
         .groupBy("l_partkey", "l_suppkey")
         .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
              .alias("qty")))
    t = q.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(load_table(spark, sf_dir, "nation")
                              .where(F.col("n_name") == "NATION_7")
                              .select(F.col("n_nationkey")
                                      .alias("s_nationkey"))),
                  on="s_nationkey")
            .select("s_suppkey", "s_name"))
    dom = (q.join(t, on="l_partkey")
           .where(F.col("qty") * 2 > F.col("total"))
           .select("l_suppkey").distinct())
    # dom is dimension-bounded (≤ |supplier| rows) at ANY corpus scale —
    # broadcast it so the semi-join never shuffles the supplier table
    return (supp.join(F.broadcast(dom),
                      supp.s_suppkey == dom.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name"))


@register("q_supplier_part_counts", """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""")
def q_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 parts/supplier-relationship shape, adapted: how many
    distinct suppliers ship each surviving (brand, type, size) combo,
    with lineitem as the part↔supplier bridge and negative-balance
    suppliers standing in for the spec's complaint-filtered NOT IN
    exclusion.  The part filters broadcast-prune lineitem; the NOT IN
    is a broadcast anti-join (null-free key side, so the SQL NOT IN
    three-valued trap is inert); the distinct-count shuffles once on
    the grouping key."""
    part = (load_table(spark, sf_dir, "part")
            .where((F.col("p_brand") != "Brand#1")
                   & ~F.col("p_type").like("PROMO%")
                   & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    return (li.join(F.broadcast(part),
                    li.l_partkey == part.p_partkey)
            .join(F.broadcast(bad),
                  F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register("q_span_dedup", r"""
WITH nrm AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
  '\s+', ' ', 'g'), ' ') AS w FROM documents),
g AS (
  SELECT doc_id, i - 1 AS pos,
         md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])) AS h
  FROM nrm, LATERAL unnest(generate_series(1, len(w) - 4)) AS t(i)
  WHERE len(w) >= 5),
dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
grp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 5 - MIN(pos) AS BIGINT) AS n_tokens
FROM grp GROUP BY doc_id, island
""")
def q_span_dedup(spark, sf_dir):
    """Span-level duplicate detection (dedup.duplicate_spans — the
    ExactSubstr idea of Lee et al. 2021 relationally): 5-token windows
    repeated across ≥2 docs mark their positions; overlapping/adjacent
    marked windows merge into maximal per-doc spans via one lag+cumsum
    island window.  The boilerplate/license-header remover whole-doc
    dedup can't express — a doc is kept, only its repeated SPAN is
    flagged (strip_spans applies the removal)."""
    return dedup.duplicate_spans(load_docs(spark, sf_dir), k=5, min_docs=2)


@register("q_triangle_count", """
WITH pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, a.l_orderkey AS ok
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
edges AS (
  SELECT pa, pb FROM pr GROUP BY pa, pb
  HAVING COUNT(DISTINCT ok) >= 2),
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM edges e1
  JOIN edges e2 ON e2.pa = e1.pb
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
mem AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges) t),
cnt AS (SELECT node, COUNT(*) AS n FROM mem GROUP BY node)
SELECT nodes.node, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_triangles
FROM nodes LEFT JOIN cnt ON cnt.node = nodes.node
""")
def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (graph.triangle_count) over the
    co-purchase graph: parts are connected when they co-occur in ≥2
    orders (the support threshold prunes incidental pairs — the
    market-basket edge rule).  Degree-ordered wedge join: each triangle
    enumerated once as a<b<c, hubs charged to their smaller endpoints,
    both joins hash equi-joins — never a neighborhood² blow-up on one
    task."""
    from ydb_cdc_processor_spark.operators.graph import triangle_count
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pb"))
    edges = (a.join(b, on="ok")
             .where(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb")
             .agg(F.countDistinct("ok").alias("_n"))
             .where(F.col("_n") >= 2)
             .select(F.col("pa").alias("src"), F.col("pb").alias("dst")))
    return triangle_count(edges)


@register("q_hierarchy_paths", """
WITH RECURSIVE e AS (
  SELECT p_partkey AS node, p_partkey // 10 AS parent
  FROM part WHERE p_partkey // 10 >= 1),
nodes AS (
  SELECT DISTINCT n FROM (
    SELECT node AS n FROM e UNION ALL SELECT parent FROM e) t),
walk AS (
  SELECT n AS node, n AS anc, 0 AS depth FROM nodes
  UNION ALL
  SELECT w.node, p.parent, w.depth + 1
  FROM walk w JOIN e p ON p.node = w.anc
)
SELECT w.node, CAST(w.anc AS BIGINT) AS root,
       CAST(w.depth AS BIGINT) AS depth
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.node = w.anc)
""")
def q_hierarchy_paths(spark, sf_dir):
    """Hierarchy flattening (graph.tree_paths): every node's root and
    depth in a forest — the org-chart/BOM/category-tree traversal shape
    SQL needs a recursive CTE for (the oracle literally runs one).  The
    forest derives deterministically from part keys (parent = key/10).
    Spark-first: POINTER DOUBLING — ⌈log₂ depth⌉ self-join rounds, not
    depth-many chained joins; each round one hash equi-join."""
    from ydb_cdc_processor_spark.operators.graph import tree_paths
    parents = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.when(F.floor(F.col("p_partkey") / 10) >= 1,
               F.floor(F.col("p_partkey") / 10)).alias("parent"))
    return tree_paths(parents, max_depth=16)


@register("q_mixture_weights", """
WITH cnt AS (SELECT source AS grp, COUNT(*) AS n_docs
             FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_groups FROM cnt)
SELECT grp AS source, CAST(n_docs AS BIGINT) AS n_docs,
       round(n_docs * 1.0 / total, 6) AS actual_share,
       round((1.0 / n_groups) / (n_docs * 1.0 / total), 6) AS weight,
       round(least((1.0 / n_groups) / (n_docs * 1.0 / total), 4.0), 6)
         AS capped_weight
FROM cnt, tot
""")
def q_mixture_weights(spark, sf_dir):
    """Data-mixing weights (curation.mixture_weights): per-source
    sampling weights reshaping the corpus toward the uniform mixture,
    with the standard repeat-cap (≤4 epochs for over-sampled small
    sources).  One map-side-combined hash agg + two broadcast scalars;
    weights are single IEEE divisions over exact integer counts, so any
    engine replays them bit-for-bit."""
    return curation.mixture_weights(load_docs(spark, sf_dir),
                                    group_col="source", max_repeat=4.0)


@register("q_window_frames", """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_revenue,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  OVER w3 AS DOUBLE) / COUNT(*) OVER w3, 6) AS mov_avg3,
       round(percent_rank() OVER wo, 6) AS pct_rank,
       round(cume_dist() OVER wo, 6) AS cume,
       CAST(ntile(4) OVER wo AS INT) AS spend_tile,
       CAST(date_diff('day', lag(o_orderdate) OVER wo, o_orderdate)
            AS BIGINT) AS gap_days
FROM orders
WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""")
def q_window_frames(spark, sf_dir):
    """Window-frame suite over per-customer order history: running
    total (ROWS UNBOUNDED PRECEDING), 3-row moving average, rank
    fractions (percent_rank/cume_dist — rationals, no ties thanks to
    the (date, key) order), quartile tiles, inter-order gaps.  One
    shuffle on the partition key serves ALL six frames — Spark plans a
    single Window exchange; sums fold through DECIMAL for cross-engine
    exactness."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                 "o_orderkey")
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    w3 = wo.rowsBetween(-2, 0)
    dec = F.col("o_totalprice").cast("decimal(38,4)")
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(dec).over(run).cast("double").alias("run_revenue"),
        F.round(F.sum(dec).over(w3).cast("double")
                / F.count(F.lit(1)).over(w3), 6).alias("mov_avg3"),
        F.round(F.percent_rank().over(wo), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wo), 6).alias("cume"),
        F.ntile(4).over(wo).cast("int").alias("spend_tile"),
        F.datediff(F.col("o_orderdate"),
                   F.lag("o_orderdate").over(wo)).cast("long")
         .alias("gap_days"))


@register("q_distinct_view", """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM events GROUP BY user_id
""")
def q_distinct_view(spark, sf_dir):
    """INCREMENTALLY-maintained COUNT(DISTINCT) — the classic
    non-self-maintainable aggregate (operators/distinct_view.
    DistinctCountView): events arrive as three upsert micro-batches
    keyed by event_id — the middle batch REWRITES a third of the rows
    to a synthetic event type (inflating several groups' distinct sets)
    and the last batch restores them (deflating, the delete-side case a
    plain distinct-merge cannot undo).  Per-(user, value) refcounts
    maintained as ±deltas over touched buckets only; after the last
    batch the view equals the full table, so the maintained counts must
    land exactly on SQL COUNT(DISTINCT) — O(batch) maintenance
    provably converging to the O(table) recompute."""
    from ydb_cdc_processor_spark.operators.distinct_view import (
        DistinctCountView)
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    cols = ["event_id", "user_id", "event_type"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    base = _scratch_dir("dcv_")
    mv = ParquetMaterializedView(spark, base + "/rows", ["event_id"],
                                 schema=ev.schema)
    dv = DistinctCountView(spark, base + "/dcv", ["user_id"],
                           "event_type")
    batches = [
        ev.where(F.col("event_id") % 3 != 2),
        ev.where(F.col("event_id") % 3 == 2)
          .withColumn("event_type", F.lit("x-temp")),
        ev.where(F.col("event_id") % 3 == 2),
    ]
    for i, b in enumerate(batches):
        old = None
        if mv.exists():
            old = (mv.read().join(b.select("event_id"), on="event_id",
                                  how="left_semi")
                   .localCheckpoint(eager=True))
        dv.apply_delta(b, old, batch_token=f"dcv:{i}")
        mv.apply(b, action="upsertInto")
    return dv.read()


@register("q_quantile_view", """
WITH s AS (SELECT o_orderpriority, o_totalprice AS v, COUNT(*) AS rc
           FROM orders GROUP BY 1, 2),
c AS (SELECT o_orderpriority, v,
             SUM(rc) OVER (PARTITION BY o_orderpriority ORDER BY v) AS cum,
             SUM(rc) OVER (PARTITION BY o_orderpriority) AS n
      FROM s)
SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_rows,
       MIN(CASE WHEN cum * 4 >= n THEN v END) AS p25,
       MIN(CASE WHEN cum * 2 >= n THEN v END) AS p50,
       MIN(CASE WHEN cum * 4 >= n * 3 THEN v END) AS p75
FROM c GROUP BY o_orderpriority
""")
def q_quantile_view(spark, sf_dir):
    """INCREMENTALLY-maintained EXACT percentiles (operators/
    quantile_view.QuantileView) — order statistics, like COUNT
    (DISTINCT), are non-self-maintainable: a delete can move every
    quantile of its group.  Orders arrive as three upsert micro-batches
    keyed by o_orderkey — the middle batch REWRITES a third of the
    prices to a constant (dragging quantiles down) and the last batch
    restores them (the delete-side shift a scalar delta cannot undo).
    Per-(priority, price) weights maintained as ±deltas over touched
    buckets; after the last batch the view equals the full table, so
    the read must land exactly on the SQL discrete quantiles.  The read
    is integer-rational (cum·den ≥ n·num) — no float position math, so
    both engines agree bit-for-bit at exact-multiple positions."""
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    from ydb_cdc_processor_spark.operators.quantile_view import (
        QuantileView)
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ords = load_table(spark, sf_dir, "orders").select(*cols)
    base = _scratch_dir("qtv_")
    mv = ParquetMaterializedView(spark, base + "/rows", ["o_orderkey"],
                                 schema=ords.schema)
    qv = QuantileView(spark, base + "/qtv", ["o_orderpriority"],
                      "o_totalprice")
    batches = [
        ords.where(F.col("o_orderkey") % 3 != 2),
        ords.where(F.col("o_orderkey") % 3 == 2)
            .withColumn("o_totalprice", F.lit(1.0)),
        ords.where(F.col("o_orderkey") % 3 == 2),
    ]
    for i, b in enumerate(batches):
        old = None
        if mv.exists():
            old = (mv.read().join(b.select("o_orderkey"), on="o_orderkey",
                                  how="left_semi")
                   .localCheckpoint(eager=True))
        qv.apply_delta(b, old, batch_token=f"qtv:{i}")
        mv.apply(b, action="upsertInto")
    return qv.read()


@register("q_span_index", r"""
WITH nrm AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
  '\s+', ' ', 'g'), ' ') AS w FROM documents),
g AS (
  SELECT doc_id, doc_id % 3 AS b, i - 1 AS pos,
         md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])) AS h
  FROM nrm, LATERAL unnest(generate_series(1, len(w) - 4)) AS t(i)
  WHERE len(w) >= 5),
dd AS (SELECT DISTINCT h, doc_id, b FROM g),
rk AS (SELECT h, b, row_number() OVER (PARTITION BY h
                                       ORDER BY b, doc_id) AS rn
       FROM dd),
thr AS (SELECT h, MIN(CASE WHEN rn = 2 THEN b END) AS b2
        FROM rk GROUP BY h),
hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN thr USING (h)
  WHERE thr.b2 IS NOT NULL AND g.b >= thr.b2),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
grp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 5 - MIN(pos) AS BIGINT) AS n_tokens
FROM grp GROUP BY doc_id, island
""")
def q_span_index(spark, sf_dir):
    """Span duplication AT INGEST (operators/span_index.SpanDupIndex):
    the corpus arrives as three micro-batches into a persistent
    gram-frequency store (count-only bucketed AggregateView — no
    posting list); each batch updates counts first, then flags its own
    spans against everything ingested so far (AS-OF-INGEST semantics —
    earlier docs are not retro-flagged, which is exactly what the
    oracle replays: a gram counts as duplicated for a doc iff a second
    distinct doc holds it in the same or an earlier batch).  The union
    of per-batch span sets is the result; each doc flags in exactly one
    batch."""
    from ydb_cdc_processor_spark.operators.span_index import SpanDupIndex
    docs = load_docs(spark, sf_dir)
    idx = SpanDupIndex(spark, _scratch_dir("spanidx_") + "/idx", k=5,
                       min_docs=2)
    parts = []
    for part in range(3):
        batch = docs.where(F.col("doc_id") % 3 == part)
        parts.append(idx.apply_batch(batch, batch_token=f"b{part}"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_TIX_QUERY_TERMS = [("r1", "hash"), ("r1", "vector"),
                    ("r2", "stream"), ("r2", "join"), ("r3", "window")]

@register("q_text_index", """
WITH words AS (
  SELECT doc_id AS doc, w AS term FROM (
    SELECT doc_id, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
    FROM documents) t WHERE w <> ''),
tf AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM words GROUP BY doc, term),
dl AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS dl
       FROM words GROUP BY doc),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl),
q(qid, term) AS (VALUES {qvals}),
cand AS (
  SELECT q.qid, tf.doc, tf.term,
         (((s.n_docs - d.df) + CAST(0.5 AS DOUBLE))
            / (d.df + CAST(0.5 AS DOUBLE)))
         * ((tf.tf * CAST({k1p1} AS DOUBLE))
            / (tf.tf + CAST({k1} AS DOUBLE)
               * (CAST({omb} AS DOUBLE)
                  + CAST({b} AS DOUBLE) * dl.dl / s.avgdl))) AS s
  FROM tf JOIN q ON q.term = tf.term
  JOIN dft d ON d.term = tf.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s),
tot AS (
  SELECT qid, doc, SUM(s ORDER BY term) AS score
  FROM cand GROUP BY qid, doc),
rk AS (
  SELECT qid, doc, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc ASC) AS rank
  FROM tot)
SELECT qid, doc AS doc_id, CAST(rank AS INT) AS rank,
       round(score, 6) AS score
FROM rk WHERE rank <= 5
""".replace("{qvals}", ", ".join(f"('{q}', '{t}')"
                                 for q, t in _TIX_QUERY_TERMS))
   .replace("{k1p1}", repr(1.2 + 1.0)).replace("{k1}", repr(1.2))
   .replace("{omb}", repr(1.0 - 0.75)).replace("{b}", repr(0.75)))
def q_text_index(spark, sf_dir):
    """INCREMENTALLY-maintained BM25 retrieval (operators/text_index.
    TextIndex): documents arrive as three upsert micro-batches keyed by
    doc_id — the middle batch REWRITES a third of the docs to a
    placeholder body (postings and corpus stats must retract terms the
    rewrite dropped) and the last batch restores them.  One live
    (term, doc, tf, dl) row per posting in a term-co-located bucketed
    store; the ranked read touches ONLY the probed terms' buckets, with
    df exact from the touched read and n_docs/avgdl from a fenced 1-row
    scalar rollup.  After the last batch the index equals the full
    corpus, so top-5 per query must land exactly on the batch-SQL BM25
    (rational idf, sorted score fold, sum/count avgdl — the
    cross-engine-exact arithmetic q_bm25 established)."""
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    from ydb_cdc_processor_spark.operators.text_index import TextIndex
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    base = _scratch_dir("tix_")
    mv = ParquetMaterializedView(spark, base + "/rows", ["doc_id"],
                                 schema=docs.schema)
    ix = TextIndex(spark, base + "/tix", n_buckets=8)
    batches = [
        docs.where(F.col("doc_id") % 3 != 2),
        docs.where(F.col("doc_id") % 3 == 2)
            .withColumn("text", F.lit("interim placeholder body")),
        docs.where(F.col("doc_id") % 3 == 2),
    ]
    for i, b in enumerate(batches):
        old = None
        if mv.exists():
            old = (mv.read().join(b.select("doc_id"), on="doc_id",
                                  how="left_semi")
                   .localCheckpoint(eager=True))
        ix.apply_delta(b, old, batch_token=f"tix:{i}")
        mv.apply(b, action="upsertInto")
    q = spark.createDataFrame(_TIX_QUERY_TERMS, "qid string, term string")
    return ix.topk(q, k=5)


@register("q_filtered_ann", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cell, emb AS cemb FROM e WHERE vec_id % 3 <> 2
         ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 16),
ca AS (SELECT vec_id, emb, cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY round(list_cosine_similarity(emb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM e CROSS JOIN cent),
cc AS (SELECT vec_id, emb, cell FROM ca WHERE cr = 1),
p AS (SELECT vec_id AS probe_id, emb AS pemb FROM e WHERE vec_id % 100 = 0),
pa AS (SELECT probe_id, pemb, cell,
              row_number() OVER (PARTITION BY probe_id
                ORDER BY round(list_cosine_similarity(pemb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM p CROSS JOIN cent),
pc AS (SELECT probe_id, pemb, cell FROM pa WHERE cr <= 4),
s AS (SELECT pc.probe_id, cc.vec_id,
             round(list_cosine_similarity(cc.emb, pc.pemb), 6) AS cos_sim
      FROM cc JOIN pc USING (cell)
      WHERE cc.vec_id <> pc.probe_id AND cc.vec_id % 2 = 0),
r AS (SELECT probe_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM s)
SELECT probe_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 5
""")
def q_filtered_ann(spark, sf_dir):
    """FILTERED vector search (VectorIndex.query(allow=...)): top-5
    neighbors restricted to an allow-set (any metadata predicate —
    here the even ids).  Candidates pre-filter by a semi-join BEFORE
    scoring, so the top-k fills with permitted vectors instead of
    post-filter truncating below k (the classic post-filtering bug).
    Oracle replays the q_vector_index IVF lifecycle with the same
    predicate inside the candidate set."""
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    emb = load_table(spark, sf_dir, "embeddings")
    idx = VectorIndex(spark, _scratch_dir("fann_") + "/idx", n_cells=16)
    idx.build(emb.where(F.col("vec_id") % 3 != 2))
    idx.add_batch(emb.where(F.col("vec_id") % 3 == 2))
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    allow = emb.where(F.col("vec_id") % 2 == 0).select("vec_id")
    return idx.query(probes, k=5, n_probe=4, allow=allow)


@register("q_zorder", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-06-01'
  AND l_quantity >= 45
""")
def q_zorder(spark, sf_dir):
    """Z-ORDER layout (functions/layout.zorder_write): lineitem is
    rewritten Morton-interleaved on (l_shipdate, l_quantity), then a
    TWO-dimensional predicate (a quarter AND a quantity floor) runs
    over the clustered copy — parquet min/max stats prune files on
    BOTH dimensions, where q_range_cluster's single-key layout prunes
    only its leading column (pruning pinned structurally by
    test_zorder_write_prunes_both_dimensions; result equality with the
    unclustered table is this oracle)."""
    from ydb_cdc_processor_spark.functions.layout import zorder_write
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice", "l_discount")
    path = _scratch_dir("zorder_") + "/li"
    zorder_write(li, path, ["l_shipdate", "l_quantity"], n_files=16)
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (spark.read.parquet(path)
            .where((F.col("l_shipdate") >= "1997-03-01")
                   & (F.col("l_shipdate") < "1997-06-01")
                   & (F.col("l_quantity") >= 45))
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum(d2("l_extendedprice") * (1 - d2("l_discount")))
                 .cast("double").alias("revenue")))


@register("q_text_index_stream")
def q_text_index_stream(spark, sf_dir):
    """BM25 index maintained from a STREAM (TextIndex.start_stream):
    the corpus arrives as a checkpointed file stream (one file per
    trigger) of NEW documents into the persistent postings store;
    posting upserts are idempotent and the scalar stats delta is
    fenced per batch id, so the converged index equals the one-shot
    ingest — exactly what q_text_index's shared SQL oracle (full-corpus
    BM25) recomputes."""
    from ydb_cdc_processor_spark.operators.text_index import TextIndex
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    base = _scratch_dir("tixs_")
    docs.repartition(3).write.parquet(base + "/src")
    ix = TextIndex(spark, base + "/idx", n_buckets=8)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(base + "/src"))
    ix.start_stream(stream, base + "/ckpt").awaitTermination()
    q = spark.createDataFrame(_TIX_QUERY_TERMS, "qid string, term string")
    return ix.topk(q, k=5)


ORACLES["q_text_index_stream"] = ORACLES["q_text_index"]


_HYB_TERMS = [("h1", "join"), ("h1", "hash"),
              ("h2", "stream"), ("h2", "window")]

@register("q_hybrid_search", """
WITH words AS (
  SELECT doc_id AS doc, w AS term FROM (
    SELECT doc_id, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
    FROM documents) t WHERE w <> ''),
tf AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM words GROUP BY doc, term),
dl AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS dl
       FROM words GROUP BY doc),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents)
           AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl),
q(qid, term) AS (VALUES {qvals}),
cand AS (
  SELECT q.qid, tf.doc, tf.term,
         (((s.n_docs - d.df) + CAST(0.5 AS DOUBLE))
            / (d.df + CAST(0.5 AS DOUBLE)))
         * ((tf.tf * CAST(2.2 AS DOUBLE))
            / (tf.tf + CAST(1.2 AS DOUBLE)
               * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl.dl / s.avgdl))) AS s
  FROM tf JOIN q ON q.term = tf.term
  JOIN dft d ON d.term = tf.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s),
ltot AS (
  SELECT qid, doc, SUM(s ORDER BY term) AS score
  FROM cand GROUP BY qid, doc),
lex AS (
  SELECT qid, doc AS doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc ASC) AS rank
  FROM ltot),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (SELECT vec_id AS probe_id, emb AS p_emb FROM e
      WHERE vec_id IN (0, 300)),
cs AS (SELECT probe_id, vec_id,
              round(list_cosine_similarity(emb, p_emb), 6) AS cos_sim
       FROM e CROSS JOIN p WHERE vec_id <> probe_id),
vec AS (
  SELECT CASE WHEN probe_id = 0 THEN 'h1' ELSE 'h2' END AS qid,
         vec_id AS doc_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cs),
lists AS (
  SELECT qid, doc_id, rank, 0 AS li FROM lex WHERE rank <= 20
  UNION ALL
  SELECT qid, doc_id, rank, 1 AS li FROM vec WHERE rank <= 20),
f AS (SELECT qid, doc_id,
             SUM(CAST(1.0 AS DOUBLE) / (60 + rank) ORDER BY li) AS rrf,
             CAST(COUNT(*) AS INT) AS n_lists
      FROM lists GROUP BY qid, doc_id),
rk AS (SELECT qid, doc_id, rrf, n_lists,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY rrf DESC, doc_id ASC) AS rank
       FROM f)
SELECT qid, doc_id, CAST(rank AS INT) AS rank,
       round(rrf, 6) AS rrf_score, n_lists
FROM rk WHERE rank <= 10
""".replace("{qvals}", ", ".join(f"('{q}', '{t}')"
                                 for q, t in _HYB_TERMS)))
def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-20 and exact-cosine vector
    top-20 fused by reciprocal rank (similarity.rrf_fuse, k=60) into a
    top-10 per query — the standard lexical+dense composition.  RRF is
    rank-only, so the two engines' incomparable score scales never mix;
    the fused score folds its two 1/(60+rank) terms in LIST order
    (fixed-order float fold, the q_bm25 discipline).  documents and
    embeddings share the id space (TESTDATA), so vec_id IS doc_id."""
    docs = load_docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qterms = spark.createDataFrame(_HYB_TERMS, "qid string, term string")
    lex = text.bm25_topk(docs, qterms, k=20) \
        .select("qid", "doc_id", "rank")
    probes = emb.where(F.col("vec_id").isin(0, 300)) \
        .select(F.col("vec_id").alias("probe_id"), "embedding")
    vec = (similarity.cosine_topk(emb, probes, k=20)
           .select(F.when(F.col("probe_id") == 0, "h1").otherwise("h2")
                   .alias("qid"),
                   F.col("vec_id").alias("doc_id"),
                   F.col("rnk").alias("rank")))
    return similarity.rrf_fuse([lex, vec], k=60, topk=10)


@register("q_hybrid_index_search", """
WITH words AS (
  SELECT doc_id AS doc, w AS term FROM (
    SELECT doc_id, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
    FROM documents) t WHERE w <> ''),
tf AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM words GROUP BY doc, term),
dl AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS dl
       FROM words GROUP BY doc),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl),
q(qid, term) AS (VALUES {qvals}),
cand AS (
  SELECT q.qid, tf.doc, tf.term,
         (((s.n_docs - d.df) + CAST(0.5 AS DOUBLE))
            / (d.df + CAST(0.5 AS DOUBLE)))
         * ((tf.tf * CAST(2.2 AS DOUBLE))
            / (tf.tf + CAST(1.2 AS DOUBLE)
               * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl.dl / s.avgdl))) AS s
  FROM tf JOIN q ON q.term = tf.term
  JOIN dft d ON d.term = tf.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s),
ltot AS (
  SELECT qid, doc, SUM(s ORDER BY term) AS score
  FROM cand GROUP BY qid, doc),
lex AS (
  SELECT qid, doc AS doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc ASC) AS rank
  FROM ltot),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cell, emb AS cemb FROM e WHERE vec_id % 3 <> 2
         ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 16),
ca AS (SELECT vec_id, emb, cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY round(list_cosine_similarity(emb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM e CROSS JOIN cent),
cc AS (SELECT vec_id, emb, cell FROM ca WHERE cr = 1),
p AS (SELECT vec_id AS probe_id, emb AS pemb FROM e
      WHERE vec_id IN (0, 300)),
pa AS (SELECT probe_id, pemb, cell,
              row_number() OVER (PARTITION BY probe_id
                ORDER BY round(list_cosine_similarity(pemb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM p CROSS JOIN cent),
pc AS (SELECT probe_id, pemb, cell FROM pa WHERE cr <= 4),
cs AS (SELECT pc.probe_id, cc.vec_id,
              round(list_cosine_similarity(cc.emb, pc.pemb), 6) AS cos_sim
       FROM cc JOIN pc USING (cell) WHERE cc.vec_id <> pc.probe_id),
vec AS (
  SELECT CASE WHEN probe_id = 0 THEN 'h1' ELSE 'h2' END AS qid,
         vec_id AS doc_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cs),
lists AS (
  SELECT qid, doc_id, rank, 0 AS li FROM lex WHERE rank <= 20
  UNION ALL
  SELECT qid, doc_id, rank, 1 AS li FROM vec WHERE rank <= 20),
f AS (SELECT qid, doc_id,
             SUM(CAST(1.0 AS DOUBLE) / (60 + rank) ORDER BY li) AS rrf,
             CAST(COUNT(*) AS INT) AS n_lists
      FROM lists GROUP BY qid, doc_id),
rk AS (SELECT qid, doc_id, rrf, n_lists,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY rrf DESC, doc_id ASC) AS rank
       FROM f)
SELECT qid, doc_id, CAST(rank AS INT) AS rank,
       round(rrf, 6) AS rrf_score, n_lists
FROM rk WHERE rank <= 10
""".replace("{qvals}", ", ".join(f"('{q}', '{t}')"
                                 for q, t in _HYB_TERMS)))
def q_hybrid_index_search(spark, sf_dir):
    """Hybrid retrieval SERVED FROM THE PERSISTENT STORES: the
    maintained BM25 postings index (TextIndex — bucket-pruned lexical
    top-20) and the maintained IVF vector index (VectorIndex —
    cell-pruned dense top-20, frozen-quantizer lifecycle) fused by
    reciprocal rank into a top-10 per query.  This is the serving shape
    a 100 TB deployment runs: both indexes ingest continuously under
    CDC (their *_stream entries), and a query touches only probed
    terms' and probed cells' buckets — never a corpus scan.  The oracle
    replays both index lifecycles in SQL (q_text_index's converged-
    corpus BM25, q_vector_index's subset-sampled-centroid IVF) plus the
    list-order RRF fold."""
    from ydb_cdc_processor_spark.operators.text_index import TextIndex
    from ydb_cdc_processor_spark.operators.vector_index import VectorIndex
    docs = load_docs(spark, sf_dir).select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    base = _scratch_dir("hyix_")

    tix = TextIndex(spark, base + "/tix", n_buckets=8)
    tix.apply_delta(docs, None, batch_token="h0")
    vix = VectorIndex(spark, base + "/vix", n_cells=16)
    vix.build(emb.where(F.col("vec_id") % 3 != 2))
    vix.add_batch(emb.where(F.col("vec_id") % 3 == 2))

    qterms = spark.createDataFrame(_HYB_TERMS, "qid string, term string")
    lex = tix.topk(qterms, k=20).select("qid", "doc_id", "rank")
    probes = emb.where(F.col("vec_id").isin(0, 300)) \
        .select(F.col("vec_id").alias("probe_id"), "embedding")
    vec = (vix.query(probes, k=20, n_probe=4)
           .select(F.when(F.col("probe_id") == 0, "h1").otherwise("h2")
                   .alias("qid"),
                   F.col("vec_id").alias("doc_id"),
                   F.col("rnk").alias("rank")))
    return similarity.rrf_fuse([lex, vec], k=60, topk=10)


def _hexn(col: str, n: int) -> str:
    """DuckDB integer value of an ``n``-char hex column (no conv())."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {i}, 1)) - 1)"
        f" * {16 ** (n - i)}" for i in range(1, n + 1))


def _hll_num_sql() -> str:
    from ydb_cdc_processor_spark.functions.sketches import hll_alpha_num
    return repr(hll_alpha_num(8))


@register("q_hll_lang", f"""
WITH nrm AS (SELECT lang, string_split(regexp_replace(lower(trim(text)),
                                       '\\s+', ' ', 'g'), ' ') AS w
             FROM documents),
g AS (SELECT lang, unnest({_SHINGLE3}) AS gram FROM nrm),
g2 AS (SELECT lang, gram FROM g WHERE gram <> ''),
hx AS (SELECT lang, substr(md5(gram), 1, 2) AS hj,
             substr(md5(gram), 3, 12) AS hw
       FROM g2),
jr AS (SELECT lang, CAST({_hexn('hj', 2)} AS INTEGER) AS j,
             CAST({_hexn('hw', 12)} AS BIGINT) AS wv
       FROM hx),
rr AS (SELECT lang, j,
              CASE WHEN wv = 0 THEN 49
                   ELSE 49 - length(bin(wv)) END AS rho
       FROM jr),
regs AS (SELECT lang, j, max(rho) AS M FROM rr GROUP BY lang, j),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_regs,
             CAST(sum(CAST(1 AS BIGINT) << CAST(49 - M AS INTEGER))
                  AS BIGINT) AS s_present
      FROM regs GROUP BY lang),
e AS (SELECT lang, CAST(count(DISTINCT gram) AS BIGINT) AS n_exact
      FROM g2 GROUP BY lang)
SELECT a.lang, CAST(256 AS INTEGER) AS m,
       CAST(256 - a.n_regs AS INTEGER) AS v_zero,
       CAST(a.s_present + (256 - a.n_regs) * {1 << 49} AS BIGINT)
         AS s_scaled,
       round({{num}} / CAST(a.s_present + (256 - a.n_regs) * {1 << 49}
                            AS DOUBLE), 3) AS est_hll,
       e.n_exact
FROM a JOIN e USING (lang)
""".replace("{num}", _hll_num_sql()))
def q_hll_lang(spark, sf_dir):
    """Per-GROUP HyperLogLog distinct sketch (functions/sketches.
    hll_grouped): distinct 3-grams per language as 256 max-merged md5
    registers per group — fixed O(m) state per group where the global
    bottom-k sketch (`q_distinct_kmv`) cannot group at all, and the
    insert-only approximate complement of the exact retractable
    DistinctCountView.  Every field — including the register-sum digest
    `s_scaled` (exact BIGINT) and the estimate (ONE correctly-rounded
    IEEE division by a shared constant) — is bit-replayable by the
    oracle; exact counts ride alongside so the ~6.5% (m=256) error is
    visible in the gated result.  Plan: two map-side-combined hash aggs,
    exchanges carry ≤ |groups|·m register rows then |groups| rows."""
    from ydb_cdc_processor_spark.functions.sketches import hll_grouped
    docs = load_docs(spark, sf_dir)
    grams = (docs.select("lang", F.explode_outer(
                 dedup.shingles(F.col("text"), 3)).alias("gram"))
             .where((F.col("gram").isNotNull()) & (F.col("gram") != "")))
    est = hll_grouped(grams, ["lang"], "gram", p=8)
    exact = grams.groupBy("lang").agg(
        F.count_distinct("gram").alias("n_exact"))
    return est.join(exact, "lang")


@register("q_hll_view")
def q_hll_view(spark, sf_dir):
    """The per-group HLL sketch as a MAINTAINED store
    (operators/hll_view.HllView): the corpus's per-language 3-gram
    registers ingest in three micro-batches into a group-co-located
    bucketed view (per-batch cost ∝ batch groups' buckets, state a
    FIXED m=256 ints per group regardless of cardinality), and the
    serving read is the hll_estimate rollup.  Register max-merge is
    idempotent/commutative, so the final state equals the one-shot
    q_hll_lang sketch — which is exactly what the shared oracle
    replays.  The approximate, insert-only complement of
    q_distinct_view's exact refcounted IVM."""
    from ydb_cdc_processor_spark.operators.hll_view import HllView
    docs = load_docs(spark, sf_dir)
    grams = (docs.select("lang", "doc_id", F.explode_outer(
                 dedup.shingles(F.col("text"), 3)).alias("gram"))
             .where((F.col("gram").isNotNull()) & (F.col("gram") != "")))
    hv = HllView(spark, _scratch_dir("hllview_") + "/hll",
                 ["lang"], "gram", p=8)
    for i in range(3):
        hv.apply_delta(grams.where(F.col("doc_id") % 3 == i))
    exact = grams.groupBy("lang").agg(
        F.count_distinct("gram").alias("n_exact"))
    return hv.read().join(exact, "lang")


ORACLES["q_hll_view"] = ORACLES["q_hll_lang"]


@register("q_shuffle_shards", f"""
WITH k AS (SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS skey
           FROM documents),
s AS (SELECT doc_id, skey, substr(skey, 1, 8) AS h8 FROM k),
a AS (SELECT doc_id, skey,
             CAST(({_HEX8}) % 8 AS INTEGER) AS shard
      FROM s)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY skey, doc_id) AS BIGINT) AS seq
FROM a
""")
def q_shuffle_shards(spark, sf_dir):
    """Reproducible global shuffle for training-data delivery
    (functions/layout.shard_assignment): every row gets a (shard, seq)
    position that is a pure function of (seed, id) — rerunning the
    pipeline on any cluster layout reproduces the identical permutation
    (resumable epochs, comparable ablations), each shard is an unbiased
    ~1/n md5-uniform sample, and `layout.shuffle_write` materializes
    the order as shard=k/ parquet so training streams files with zero
    read-time shuffling.  Plan: one hash exchange on shard + one
    in-partition rank sort; n_shards sizes the sort unit, so at 100 TB
    shards are delivery-file-sized (10⁵-10⁶ of them) and no task ever
    sorts more than one shard."""
    from ydb_cdc_processor_spark.functions.layout import shard_assignment
    docs = load_docs(spark, sf_dir).select("doc_id")
    return shard_assignment(docs, "doc_id", 8, seed=42) \
        .select("doc_id", "shard", "seq")


_LPA_ROUNDS = "".join(f""",
v{r} AS (SELECT e.d AS node, l.label, CAST(count(*) AS BIGINT) AS c
         FROM l{r - 1} l JOIN e ON l.node = e.s GROUP BY e.d, l.label),
b{r} AS (SELECT node, label FROM (
           SELECT node, label,
                  row_number() OVER (PARTITION BY node
                                     ORDER BY c DESC, label ASC) AS rk
           FROM v{r}) t WHERE rk = 1),
l{r} AS (SELECT l.node, COALESCE(b.label, l.label) AS label
         FROM l{r - 1} l LEFT JOIN b{r} b ON l.node = b.node)"""
                      for r in (1, 2, 3))


@register("q_communities", f"""
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS s,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION
  SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR),
                  'c' || CAST(o.o_custkey AS VARCHAR)
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
l0 AS (SELECT node, node AS label FROM (
         SELECT DISTINCT node FROM (
           SELECT s AS node FROM e UNION ALL SELECT d FROM e) t) n)
{_LPA_ROUNDS}
SELECT node, label AS community FROM l3
""")
def q_communities(spark, sf_dir):
    """Community detection by synchronous label propagation
    (operators/graph.label_propagation): 3 neighbor-majority rounds
    over the undirected customer–supplier trade graph — the same edge
    derivation as `q_pagerank`, so the graph family (reachability =
    `q_dedup_clusters`, ranking = `q_pagerank`, triangles =
    `q_triangle_count`, communities = this) all speak over one graph.
    Every intermediate is an integer count or a string comparison —
    bit-replayable with NO float tolerance anywhere; the deterministic
    (most-frequent, then smallest) tie-break is what makes the
    classically randomized algorithm gateable."""
    from ydb_cdc_processor_spark.operators.graph import label_propagation
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    cs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                  .alias("c"),
                  F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                  .alias("s"))
          .distinct())
    edges = (cs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(
                 cs.select(F.col("s").alias("src"),
                           F.col("c").alias("dst"))))
    return label_propagation(edges, n_iter=3)


@register("q_similarity_pq", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id,
             list_transform(emb,
                            x -> x / sqrt(list_inner_product(emb, emb)))
               AS uv
      FROM e),
smp AS (SELECT uv, md5(CAST(vec_id AS VARCHAR) || ':42') AS h
        FROM u ORDER BY h LIMIT 64),
cb AS (SELECT CAST(row_number() OVER (ORDER BY h ASC) - 1 AS INTEGER) AS j,
              uv AS cw
       FROM smp),
cbm AS (SELECT m, j, list_slice(cw, m * 4 + 1, m * 4 + 4) AS cws
        FROM cb CROSS JOIN range(0, 16) t(m)),
ec AS (SELECT vec_id, m, j,
              round(list_inner_product(
                  list_slice(uv, m * 4 + 1, m * 4 + 4), cws), 6) AS s
       FROM u CROSS JOIN cbm),
enc AS (SELECT vec_id, m, j FROM (
          SELECT vec_id, m, j,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY s DESC, j ASC) AS rk
          FROM ec) t WHERE rk = 1),
p AS (SELECT vec_id AS probe_id, uv AS pv FROM u WHERE vec_id % 100 = 0),
tab AS (SELECT probe_id, m, j,
               round(list_inner_product(
                   list_slice(pv, m * 4 + 1, m * 4 + 4), cws), 6) AS t
        FROM p CROSS JOIN cbm),
ip AS (SELECT t.probe_id, enc.vec_id, SUM(t.t ORDER BY t.m) AS ips
       FROM enc JOIN tab t ON t.m = enc.m AND t.j = enc.j
       GROUP BY t.probe_id, enc.vec_id),
r AS (SELECT probe_id, vec_id, round(ips, 6) AS pq_sim
      FROM ip WHERE vec_id <> probe_id)
SELECT probe_id, vec_id, pq_sim, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT probe_id, vec_id, pq_sim,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY pq_sim DESC, vec_id ASC) AS rnk
  FROM r) t
WHERE rnk <= 5
""")
def q_similarity_pq(spark, sf_dir):
    """Product-quantized ANN (operators/similarity.cosine_topk_pq):
    L2-normalized vectors stored as 16 subspace codes of 6 bits (96
    bits vs 64 doubles ≈ 42× smaller — the index-fits-in-memory path at
    100 TB), queries scored by asymmetric-distance lookup tables (16
    element_at + adds per pair instead of a 64-wide dot).  Codebook =
    the md5-seeded sample pick; assignment = rounded subspace inner
    product, smallest-code tie-break; the ADC score folds the 16
    rounded table entries in subspace order (`SUM(t ORDER BY m)` on the
    oracle side — the q_bm25 ordered-fold trick).  Same probes as
    `q_similarity_ivf`; on this weakly-structured synthetic corpus
    (exact top-1 cosine ≈ 0.4) PQ recall@5 ≈ 0.38 vs IVF's 0.40
    (pinned by test_pq_recall_and_validation)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    return similarity.cosine_topk_pq(emb, probes, k=5, m_sub=16,
                                     n_codes=64, dim=64)


@register("q_similarity_ivf_pq", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
u AS (SELECT vec_id,
             list_transform(emb,
                            x -> x / sqrt(list_inner_product(emb, emb)))
               AS uv
      FROM e),
cent AS (SELECT vec_id AS cell, emb AS cemb FROM e
         ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 16),
ca AS (SELECT vec_id, cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY round(list_cosine_similarity(emb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM e CROSS JOIN cent),
cc AS (SELECT vec_id, cell FROM ca WHERE cr = 1),
p AS (SELECT vec_id AS probe_id, emb AS pemb FROM e WHERE vec_id % 100 = 0),
pa AS (SELECT probe_id, cell,
              row_number() OVER (PARTITION BY probe_id
                ORDER BY round(list_cosine_similarity(pemb, cemb), 6) DESC,
                         cell ASC) AS cr
       FROM p CROSS JOIN cent),
pc AS (SELECT probe_id, cell FROM pa WHERE cr <= 4),
smp AS (SELECT uv, md5(CAST(vec_id AS VARCHAR) || ':42') AS h
        FROM u ORDER BY h LIMIT 64),
cb AS (SELECT CAST(row_number() OVER (ORDER BY h ASC) - 1 AS INTEGER) AS j,
              uv AS cw
       FROM smp),
cbm AS (SELECT m, j, list_slice(cw, m * 4 + 1, m * 4 + 4) AS cws
        FROM cb CROSS JOIN range(0, 16) t(m)),
ec AS (SELECT vec_id, m, j,
              round(list_inner_product(
                  list_slice(uv, m * 4 + 1, m * 4 + 4), cws), 6) AS s
       FROM u CROSS JOIN cbm),
enc AS (SELECT vec_id, m, j FROM (
          SELECT vec_id, m, j,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY s DESC, j ASC) AS rk
          FROM ec) t WHERE rk = 1),
tab AS (SELECT pu.vec_id AS probe_id, cbm.m, cbm.j,
               round(list_inner_product(
                   list_slice(pu.uv, cbm.m * 4 + 1, cbm.m * 4 + 4),
                   cbm.cws), 6) AS t
        FROM u pu CROSS JOIN cbm WHERE pu.vec_id % 100 = 0),
pairs AS (SELECT pc.probe_id, cc.vec_id
          FROM cc JOIN pc USING (cell)
          WHERE cc.vec_id <> pc.probe_id),
ip AS (SELECT pr.probe_id, pr.vec_id, SUM(t.t ORDER BY t.m) AS ips
       FROM pairs pr
       JOIN enc ON enc.vec_id = pr.vec_id
       JOIN tab t ON t.probe_id = pr.probe_id
               AND t.m = enc.m AND t.j = enc.j
       GROUP BY pr.probe_id, pr.vec_id),
r AS (SELECT probe_id, vec_id, round(ips, 6) AS pq_sim FROM ip)
SELECT probe_id, vec_id, pq_sim, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT probe_id, vec_id, pq_sim,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY pq_sim DESC, vec_id ASC) AS rnk
  FROM r) t
WHERE rnk <= 5
""")
def q_similarity_ivf_pq(spark, sf_dir):
    """IVF × PQ composed ANN (operators/similarity_pq.
    cosine_topk_ivf_pq) — the IVFADC serving layout of the FAISS
    lineage as one declarative plan: the `q_similarity_ivf` coarse
    quantizer restricts each probe to its 4 nearest of 16 cells
    (candidate VOLUME ∝ n_probe/n_cells), and within those cells
    candidates are scored from their 16 PQ codes by ADC lookups
    (candidate PAYLOAD 96 bits, not 64 doubles).  Both halves are
    bit-identical to their standalone parents, so the oracle is the
    two parents' CTEs joined on cell — the composition adds no new
    arithmetic to trust."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    return similarity.cosine_topk_ivf_pq(emb, probes, k=5, n_cells=16,
                                         n_probe=4, m_sub=16,
                                         n_codes=64, dim=64)


@register("q_pq_recall", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (SELECT vec_id AS probe_id, emb AS p_emb FROM e WHERE vec_id % 100 = 0),
bs AS (SELECT probe_id, vec_id,
              round(list_cosine_similarity(emb, p_emb), 6) AS cos_sim
       FROM e CROSS JOIN p WHERE vec_id <> probe_id),
br AS (SELECT probe_id, vec_id,
              row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       FROM bs),
bt AS (SELECT probe_id, vec_id FROM br WHERE rnk <= 5),
u AS (SELECT vec_id,
             list_transform(emb,
                            x -> x / sqrt(list_inner_product(emb, emb)))
               AS uv
      FROM e),
smp AS (SELECT uv, md5(CAST(vec_id AS VARCHAR) || ':42') AS h
        FROM u ORDER BY h LIMIT 64),
cb AS (SELECT CAST(row_number() OVER (ORDER BY h ASC) - 1 AS INTEGER) AS j,
              uv AS cw
       FROM smp),
cbm AS (SELECT m, j, list_slice(cw, m * 4 + 1, m * 4 + 4) AS cws
        FROM cb CROSS JOIN range(0, 16) t(m)),
ec AS (SELECT vec_id, m, j,
              round(list_inner_product(
                  list_slice(uv, m * 4 + 1, m * 4 + 4), cws), 6) AS s
       FROM u CROSS JOIN cbm),
enc AS (SELECT vec_id, m, j FROM (
          SELECT vec_id, m, j,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY s DESC, j ASC) AS rk
          FROM ec) t WHERE rk = 1),
tab AS (SELECT pu.vec_id AS probe_id, cbm.m, cbm.j,
               round(list_inner_product(
                   list_slice(pu.uv, cbm.m * 4 + 1, cbm.m * 4 + 4),
                   cbm.cws), 6) AS t
        FROM u pu CROSS JOIN cbm WHERE pu.vec_id % 100 = 0),
ip AS (SELECT t.probe_id, enc.vec_id, SUM(t.t ORDER BY t.m) AS ips
       FROM enc JOIN tab t ON t.m = enc.m AND t.j = enc.j
       WHERE enc.vec_id <> t.probe_id
       GROUP BY t.probe_id, enc.vec_id),
qr AS (SELECT probe_id, vec_id,
              row_number() OVER (PARTITION BY probe_id
                                 ORDER BY round(ips, 6) DESC,
                                          vec_id ASC) AS rnk
       FROM ip),
qt AS (SELECT probe_id, vec_id FROM qr WHERE rnk <= 5)
SELECT bt.probe_id,
       CAST(COUNT(qt.vec_id) AS BIGINT) AS n_hits,
       round(COUNT(qt.vec_id) / 5.0, 6) AS recall_at_5
FROM bt LEFT JOIN qt ON qt.probe_id = bt.probe_id AND qt.vec_id = bt.vec_id
GROUP BY bt.probe_id
ORDER BY bt.probe_id
""")
def q_pq_recall(spark, sf_dir):
    """PQ quality self-measurement — recall@5 of the product-quantized
    ranking against the exact brute-force top-5, per probe: the number
    a 100 TB deployment watches when trading code budget (m_sub ×
    log2(n_codes) bits) against retrieval quality, computed engine-side
    exactly like `q_ann_recall` does for SRP-LSH.  Both rankings reuse
    their oracle-replayable pipelines; the recall join is probe-keyed
    and broadcast-sized."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 100 == 0) \
                .select(F.col("vec_id").alias("probe_id"), "embedding")
    brute = similarity.cosine_topk(emb, probes, k=5) \
        .select("probe_id", "vec_id")
    pq = (similarity.cosine_topk_pq(emb, probes, k=5, m_sub=16,
                                    n_codes=64, dim=64)
          .select(F.col("probe_id").alias("q_probe"),
                  F.col("vec_id").alias("q_vec")))
    j = brute.join(F.broadcast(pq),
                   (F.col("probe_id") == F.col("q_probe"))
                   & (F.col("vec_id") == F.col("q_vec")), how="left")
    return (j.groupBy("probe_id")
            .agg(F.count("q_vec").cast("long").alias("n_hits"),
                 F.round(F.count("q_vec") / F.lit(5.0), 6)
                  .alias("recall_at_5"))
            .orderBy("probe_id"))


