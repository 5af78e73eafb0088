"""SCD2 history, sink checksum, fuzzy match, BM25, n-gram coverage — split verbatim from registry.py.

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
    q_ngram_jaccard)
from ydb_cdc_processor_spark.registry_queries.m05_curation import (
    q_simjoin_prefix)

# Round 6 additions: SCD2 history, sink checksum, fuzzy match, BM25,
# duplicate-n-gram coverage
# ---------------------------------------------------------------------------

from ydb_cdc_processor_spark.functions.checksum import table_checksum  # noqa: E402
from ydb_cdc_processor_spark.operators import fuzzy, scd  # noqa: E402


@register("q_scd2_history", """
WITH w0 AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         lag(1) OVER w AS has_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM w0
  WHERE has_prev IS NULL OR prev IS DISTINCT FROM event_type),
hist AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM chg)
SELECT user_id, event_type, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM hist
""")
def q_scd2_history(spark, sf_dir):
    """SCD Type-2 history build from the event stream (operators/scd.py):
    every distinct consecutive ``event_type`` a user held, with its
    validity interval — the standard CDC history-sink companion to the
    reference's last-wins merge (CdcMsgParser.java:96-120 keeps only
    the latest row; this keeps them all, queryably).  One key shuffle,
    two windows over the same sort."""
    ev = load_table(spark, sf_dir, "events")
    return scd.scd2_history(ev, ["user_id"], "ts", ["event_type"],
                            tiebreak_col="event_id")


@register("q_table_checksum", """
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
def q_table_checksum(spark, sf_dir):
    """Order-independent sink-verification digest
    (functions/checksum.py): SUM of per-row 60-bit md5 integers +
    row count — "does the sink equal the source" as two scans and an
    equality check, the direct form of the health question the
    reference's status page answers with counts alone
    (WebController.java:25-84).  Commutative sum ⇒ partition- and
    engine-independent; digests of disjoint shards add."""
    orders = load_table(spark, sf_dir, "orders")
    return table_checksum(orders, ["o_orderkey", "o_custkey",
                                   "o_orderstatus", "o_orderpriority"])


@register("q_fuzzy_match", """
WITH v AS (SELECT DISTINCT c_name AS t FROM customer
           WHERE c_name IS NOT NULL)
SELECT a.t AS term_a, b.t AS term_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM v a JOIN v b ON a.t < b.t
WHERE abs(length(a.t) - length(b.t)) <= 1
  AND levenshtein(a.t, b.t) <= 1
""")
def q_fuzzy_match(spark, sf_dir):
    """Fuzzy entity matching (operators/fuzzy.py): all customer-name
    pairs within Levenshtein distance 1, via SymSpell
    deletion-neighborhood blocking — a lossless equi-join reduction
    verified by the exact distance.  The oracle is the brute-force
    all-pairs join: a hash match pins that the blocking loses NO pair
    (same losslessness contract as q_simjoin_prefix)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("term"))
    return fuzzy.fuzzy_pairs_edit1(cust, "term")


_BM25_QUERY_TERMS = [("q1", "join"), ("q1", "hash"),
                     ("q2", "window"), ("q2", "stream"), ("q2", "spark"),
                     ("q3", "vector"), ("q3", "dup")]

@register("q_bm25", """
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
                                 for q, t in _BM25_QUERY_TERMS))
   .replace("{k1p1}", repr(1.2 + 1.0)).replace("{k1}", repr(1.2))
   .replace("{omb}", repr(1.0 - 0.75)).replace("{b}", repr(0.75)))
def q_bm25(spark, sf_dir):
    """BM25 ranked retrieval (text.bm25_topk): top-5 documents for three
    multi-term queries.  Rational idf (no ln — cross-engine exact);
    the per-(query, doc) float sum folds in sorted term order on BOTH
    engines (Spark: array_sort + aggregate fold; oracle: ordered-
    aggregate SUM), because float addition is order-dependent."""
    q = spark.createDataFrame(_BM25_QUERY_TERMS, "qid string, term string")
    return text.bm25_topk(load_docs(spark, sf_dir), q, k=5)


@register("q_dup_ngram_coverage", """
WITH ws AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
  FROM ws, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
dfg AS (SELECT g, COUNT(*) AS nd FROM grams GROUP BY g),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM grams GROUP BY doc_id),
sh AS (SELECT grams.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM grams JOIN dfg ON dfg.g = grams.g
       WHERE dfg.nd >= 2 GROUP BY grams.doc_id)
SELECT d.doc_id,
       COALESCE(tot.n_grams, 0) AS n_grams,
       COALESCE(sh.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(tot.n_grams, 0) > 0
            THEN round(COALESCE(sh.n_shared, 0) / tot.n_grams, 6)
       END AS dup_frac
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN sh ON sh.doc_id = d.doc_id
""")
def q_dup_ngram_coverage(spark, sf_dir):
    """Duplicate-8-gram coverage per document (dedup.dup_ngram_coverage,
    Lee et al. 2021): the fraction of a document's distinct word
    8-grams that also occur in another document — the
    flag-don't-delete dedup signal.  Grams md5-hashed before any
    shuffle; text never shuffles."""
    return dedup.dup_ngram_coverage(load_docs(spark, sf_dir), n=8)


_SNAPSHOT_TIMES = ["2024-01-08 00:00:00", "2024-01-15 00:00:00",
                   "2024-01-25 00:00:00"]

@register("q_scd2_snapshot", """
WITH w0 AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         lag(1) OVER w AS has_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM w0
  WHERE has_prev IS NULL OR prev IS DISTINCT FROM event_type),
hist AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM chg),
probes(snap_ts) AS (VALUES {probes})
SELECT CAST(p.snap_ts AS TIMESTAMP) AS snap_ts, h.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM hist h JOIN probes p
  ON h.valid_from <= CAST(p.snap_ts AS TIMESTAMP)
 AND (h.valid_to IS NULL OR h.valid_to > CAST(p.snap_ts AS TIMESTAMP))
GROUP BY 1, 2
""".replace("{probes}", ", ".join(f"('{t}')" for t in _SNAPSHOT_TIMES)))
def q_scd2_snapshot(spark, sf_dir):
    """Time travel over the SCD2 history (scd.snapshot_at): the state of
    the world — how many users held each event_type — at three probe
    instants.  History built ONCE, snapshots are interval filters; at
    scale this is the audit/backfill query a history sink exists for."""
    ev = load_table(spark, sf_dir, "events")
    hist = scd.scd2_history(ev, ["user_id"], "ts", ["event_type"],
                            tiebreak_col="event_id")
    # one broadcast interval join against the probe instants — NOT a
    # per-probe snapshot_at union, which would rebuild the history
    # window once per probe (3x the event shuffle for 3 probes)
    probes = spark.createDataFrame(
        [(t,) for t in _SNAPSHOT_TIMES], "snap_ts string").select(
        F.col("snap_ts").cast("timestamp").alias("snap_ts"))
    joined = hist.join(
        F.broadcast(probes),
        (F.col("valid_from") <= F.col("snap_ts"))
        & (F.col("valid_to").isNull()
           | (F.col("valid_to") > F.col("snap_ts"))))
    return joined.groupBy("snap_ts", "event_type").agg(
        F.count(F.lit(1)).alias("n_users"))


@register("q_top_customers", """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
       AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""")
def q_top_customers(spark, sf_dir):
    """TPC-H Q10 shape — returned-item revenue per customer, top 20.
    Plan: both filters pushed to the scans (returnflag on lineitem,
    date window on orders), customer/nation BROADCAST, one hash agg on
    the customer key, TakeOrderedAndProject for the top-20 (never a
    global sort).  Decimal-routed revenue sum = bit-identical at any
    parallelism."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R"))
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate")
                      >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("o_orderdate")
                        < F.lit("1997-01-01").cast("timestamp"))))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey))
    return (joined.groupBy("c_custkey", "c_name", "n_name")
            .agg(dec_sum(rev, "revenue", scale=6),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


@register("q_data_card", """
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
           AS avg_chars,
         CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en
  FROM documents GROUP BY source)
SELECT source, n_docs, n_langs, total_chars, avg_chars,
       n_en / n_docs AS en_share
FROM per_source
""")
def q_data_card(spark, sf_dir):
    """Per-source data card — the summary block a dataset release ships
    (counts, language mix, size stats).  ONE hash agg over the corpus;
    the only distinct is per-group lang cardinality (partial-distinct
    expanded).  en_share is an exact bigint ratio → one IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("lang").cast("long").alias("n_langs"),
                 long_sum("n_chars", "total_chars"),
                 dec_avg("n_chars", "avg_chars"),
                 F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                  .cast("long").alias("n_en"))
            .select("source", "n_docs", "n_langs", "total_chars",
                    "avg_chars",
                    (F.col("n_en") / F.col("n_docs")).alias("en_share")))


@register("q_source_drift", """
WITH tagged AS (
  SELECT lang, doc_id % 2 AS half FROM documents),
cnt AS (
  SELECT lang,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS c0,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS c1
  FROM tagged GROUP BY lang),
tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS t0, CAST(SUM(c1) AS BIGINT) AS t1
  FROM cnt)
SELECT t.t0 AS n_a, t.t1 AS n_b,
       CAST(SUM(abs(c.c0 * t.t1 - c.c1 * t.t0)) AS BIGINT) AS l1_num,
       CAST(SUM(abs(c.c0 * t.t1 - c.c1 * t.t0)) AS BIGINT)
         / CAST(t.t0 * t.t1 AS DOUBLE) AS l1_drift
FROM cnt c CROSS JOIN tot t
GROUP BY t.t0, t.t1
""")
def q_source_drift(spark, sf_dir):
    """Distribution drift between two corpus snapshots (here: doc_id
    parity halves): L1 distance between their language distributions,
    computed EXACTLY in integers — Σ|c0·t1 − c1·t0| / (t0·t1) — so the
    order-dependent float-sum trap never appears.  The shape of a
    train/serve or week-over-week drift monitor: one hash agg on the
    category, a broadcast of the two totals, one division at the end."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select("lang", (F.col("doc_id") % 2).alias("half"))
    cnt = tagged.groupBy("lang").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long")
         .alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long")
         .alias("c1"))
    tot = cnt.agg(F.sum("c0").cast("long").alias("t0"),
                  F.sum("c1").cast("long").alias("t1"))
    diff = F.abs(F.col("c0") * F.col("t1") - F.col("c1") * F.col("t0"))
    return (cnt.crossJoin(F.broadcast(tot))
            .groupBy("t0", "t1")
            .agg(F.sum(diff).cast("long").alias("l1_num"))
            .select(F.col("t0").alias("n_a"), F.col("t1").alias("n_b"),
                    "l1_num",
                    (F.col("l1_num")
                     / (F.col("t0") * F.col("t1")).cast("double"))
                    .alias("l1_drift")))


ORACLES_SCD2 = ORACLES["q_scd2_history"]

@register("q_scd2_incremental", ORACLES_SCD2)
def q_scd2_incremental(spark, sf_dir):
    """Incrementally-maintained SCD2 history SINK (scd.Scd2View): the
    event stream applied as three micro-batches split by event_id
    parity classes — i.e. OUT OF ORDER in event time across batches —
    must produce the identical history a single batch build produces
    (same oracle as q_scd2_history).  Key-pruned reconstruct-and-
    rebuild: idempotent under replay, order-tolerant by construction."""
    ev = load_table(spark, sf_dir, "events")
    view = scd.Scd2View(
        spark, _scratch_dir("scd2_") + "/hist",
        ["user_id"], "ts", ["event_type"], tiebreak_col="event_id")
    for part in range(3):
        batch = ev.where(F.col("event_id") % 3 == part)
        view.apply_batch(batch, batch_token=f"b{part}")
    return view.read()


@register("q_containment", r"""
WITH n AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS pre
  FROM documents),
s AS (
  SELECT doc_id, pre,
         list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 0) + 2),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
  FROM n),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
  UNION
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM s a JOIN s b ON a.pre = b.pre AND a.doc_id < b.doc_id)
SELECT p.doc_a, p.doc_b,
       CAST(len(a.sh) AS BIGINT) AS n_a,
       CAST(len(b.sh) AS BIGINT) AS n_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / greatest(len(a.sh), 1), 6) AS contain_ab,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / greatest(len(b.sh), 1), 6) AS contain_ba
FROM pairs p
JOIN s a ON a.doc_id = p.doc_a
JOIN s b ON b.doc_id = p.doc_b
""")
def q_containment(spark, sf_dir):
    """Exact 3-gram CONTAINMENT (dedup.ngram_containment) over the same
    deterministic pair set as q_ngram_jaccard — the asymmetric signal
    for quote/boilerplate detection: a short doc embedded in a long one
    scores ~1 one way while its Jaccard stays tiny."""
    docs = load_docs(spark, sf_dir)
    ids = docs.select("doc_id")
    consec = (ids.select(F.col("doc_id").alias("doc_a"))
              .join(ids.select((F.col("doc_id")).alias("doc_b")),
                    F.col("doc_b") == F.col("doc_a") + 1))
    pre = docs.select("doc_id", F.substring(
        dedup.normalize_text(F.col("text")), 1, 40).alias("pre"))
    dup = (pre.alias("a").join(pre.alias("b"), "pre")
           .where(F.col("a.doc_id") < F.col("b.doc_id"))
           .select(F.col("a.doc_id").alias("doc_a"),
                   F.col("b.doc_id").alias("doc_b")))
    pairs = consec.union(dup).distinct()
    return dedup.ngram_containment(docs, pairs)


@register("q_pit_enrich", """
WITH w0 AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         lag(1) OVER w AS has_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM w0
  WHERE has_prev IS NULL OR prev IS DISTINCT FROM event_type),
hist AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM chg),
probes AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, h.event_type AS state_before
FROM probes p
LEFT JOIN hist h
  ON h.user_id = p.user_id
 AND h.valid_from < p.ts
 AND (h.valid_to IS NULL OR h.valid_to >= p.ts)
""")
def q_pit_enrich(spark, sf_dir):
    """Point-in-time enrichment — leakage-free feature backfill: each
    purchase event joined to the SCD2 state the user held STRICTLY
    BEFORE the event (half-open intervals make the covering row unique;
    a user's first event gets NULL).  Plan: history and probes both
    hash-partition on the user key, one SortMergeJoin with the interval
    refine as its residual condition — the standard "as-of the label's
    timestamp, never after" join every feature store needs."""
    ev = load_table(spark, sf_dir, "events")
    hist = scd.scd2_history(ev, ["user_id"], "ts", ["event_type"],
                            tiebreak_col="event_id")
    probes = (ev.where(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts"))
    h = hist.select(F.col("user_id").alias("h_user"),
                    F.col("event_type").alias("state_before"),
                    "valid_from", "valid_to")
    return (probes.join(
                h, (F.col("h_user") == F.col("user_id"))
                   & (F.col("valid_from") < F.col("ts"))
                   & (F.col("valid_to").isNull()
                      | (F.col("valid_to") >= F.col("ts"))),
                how="left")
            .select("event_id", "user_id", "ts", "state_before"))


# ---------------------------------------------------------------------------
