"""Round-6 curation operators (decontamination, PII, packing, graphs) — split verbatim from registry.py.

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
    _HEX_BYTE, _NORM_WORDS, _QSCORE_SQL, _SHINGLE2, _SHINGLE3, q_dedup_clusters, q_media_decode)
from ydb_cdc_processor_spark.registry_queries.m04_temporal_sampling import (
    _HEX8, q_stratified_sample)

# Round-6 curation operators (operators/curation.py): decontamination,
# repetition signals, PII redaction, sequence packing, temperature
# resampling, keep-best dedup, embedding centroids
# ---------------------------------------------------------------------------

@register("q_decontaminate", f"""
WITH nrm AS ({_NORM_WORDS}),
g AS (SELECT doc_id, unnest({_SHINGLE3}) AS gram FROM nrm),
bench AS (SELECT DISTINCT gram FROM g
          WHERE doc_id % 97 = 0 AND gram <> ''),
hits AS (SELECT g.doc_id, g.gram FROM g JOIN bench USING (gram)
         WHERE g.doc_id % 97 <> 0)
SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits,
       min(gram) AS first_hit
FROM hits GROUP BY doc_id
""")
def q_decontaminate(spark, sf_dir):
    """Test-set decontamination (curation.contamination): docs sharing
    any word 3-gram with the benchmark slice (doc_id % 97 = 0) are
    flagged with their distinct-hit count and a stable audit gram.
    The benchmark n-gram set BROADCASTS, so the corpus is scanned once
    with no shuffle before the per-doc hit count."""
    docs = load_docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return curation.contamination(corpus, bench, n=3)


@register("q_repetition_stats", f"""
WITH nrm AS ({_NORM_WORDS}),
pr AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS nd
       FROM nrm),
bg AS (SELECT doc_id, unnest({_SHINGLE2}) AS bigram FROM nrm),
bgc AS (SELECT doc_id, bigram, count(*) AS bg_n FROM bg
        WHERE bigram <> '' GROUP BY doc_id, bigram),
top AS (SELECT doc_id, bigram, bg_n,
               sum(bg_n) OVER (PARTITION BY doc_id) AS n_bigrams,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY bg_n DESC, bigram ASC) AS rk
        FROM bgc)
SELECT p.doc_id, CAST(p.n_words AS INT) AS n_words,
       CASE WHEN p.n_words = 0 THEN 0.0
            ELSE round(1.0 - CAST(p.nd AS DOUBLE) / p.n_words, 6)
       END AS dup_word_frac,
       t.bigram AS top_bigram,
       round(CAST(t.bg_n AS DOUBLE) / t.n_bigrams, 6) AS top_bigram_frac
FROM pr p LEFT JOIN (SELECT * FROM top WHERE rk = 1) t USING (doc_id)
""")
def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (curation.repetition_stats):
    duplicate-word fraction (pure per-row array expression, zero
    shuffle) + most-frequent-bigram share (map-side-combined bigram
    counts, explicit (count desc, bigram asc) tie order so every engine
    picks the same mode)."""
    return curation.repetition_stats(load_docs(spark, sf_dir))


@register("q_pii_redact", f"""
WITH t AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 13 = 0 THEN ' contact user'
         || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 17 = 0
         THEN ' call 555-010-4242 or ping 10.0.0.1 ok' ELSE '' END AS t2
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t2, '{PII_EMAIL}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t2, '{PII_PHONE}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(t2, '{PII_IPV4}')) AS BIGINT) AS n_ipv4,
  md5(regexp_replace(regexp_replace(regexp_replace(t2,
      '{PII_EMAIL}', '<EMAIL>', 'g'),
      '{PII_PHONE}', '<PHONE>', 'g'),
      '{PII_IPV4}', '<IP>', 'g')) AS redacted_md5
FROM t
""")
def q_pii_redact(spark, sf_dir):
    """PII detection + redaction (curation.pii_counts / redact_pii) over
    text with deterministically injected emails/phones/IPs (doc_id-mod
    families), so the regex paths are exercised on true positives.  The
    RE2-safe patterns match identically under Java regex (Spark) and
    RE2 (DuckDB); redaction equality is proven by md5 of the redacted
    text."""
    from ydb_cdc_processor_spark.operators.curation import (
        pii_counts, redact_pii)
    docs = load_docs(spark, sf_dir)
    t2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0,
               F.lit(" call 555-010-4242 or ping 10.0.0.1 ok"))
         .otherwise(F.lit("")))
    return docs.select(
        "doc_id", *pii_counts(t2),
        F.md5(redact_pii(t2)).alias("redacted_md5"))


@register("q_pack_sequences", """
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(trim(text))
                   - length(replace(trim(text), ' ', '')) + 1 END
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_id,
       CAST(cum_before % 512 AS BIGINT) AS seq_pos
FROM c
""")
def q_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing (curation.pack_sequences): docs
    ordered by (md5(id), id) fill 512-token training sequences greedily.
    The engine computes the running total as a two-level DISTRIBUTED
    prefix sum (256 md5-prefix shards + a broadcast offset table — no
    single-reducer global window); the oracle replays it as one flat
    window, proving the decomposition exact."""
    return curation.pack_sequences(load_docs(spark, sf_dir), budget=512)


_TEMP_HEX8 = _HEX8  # id-hash fraction digits, as in q_stratified_sample

@register("q_temperature_sample", f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS n_min FROM c),
r AS (SELECT lang, sqrt(CAST(n_min AS DOUBLE) / n) AS rate FROM c, m),
d AS (SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
      FROM documents)
SELECT d.doc_id, d.lang, round(r.rate, 6) AS keep_rate
FROM d JOIN r USING (lang)
WHERE CAST({_TEMP_HEX8} AS BIGINT) / 4294967296.0 < r.rate
""")
def q_temperature_sample(spark, sf_dir):
    """Temperature resampling (curation.temperature_sample, alpha=0.5):
    language l keeps sqrt(n_min/n_l) of its docs — the multilingual
    share^alpha mixture flattening.  Rates come from one tiny
    broadcast agg; keep decisions are engine-replayable id-hash
    fractions; sqrt is IEEE correctly-rounded on every engine."""
    out = curation.temperature_sample(load_docs(spark, sf_dir),
                                      group_col="lang", alpha=0.5)
    return out.select("doc_id", "lang", "keep_rate")


@register("q_dedup_keep_best", f"""
WITH cl AS ({{clusters}}),
q AS (SELECT doc_id, {_QSCORE_SQL} AS q_score FROM documents),
s AS (SELECT cl.cluster_id, cl.doc_id, q.q_score
      FROM cl JOIN q USING (doc_id)),
rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
           ORDER BY q_score DESC, doc_id ASC) AS rn
       FROM s)
SELECT r.cluster_id, CAST(r.doc_id AS BIGINT) AS keep,
       n.n_members, round(n.best_score, 6) AS best_score
FROM (SELECT * FROM rk WHERE rn = 1) r
JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             max(q_score) AS best_score
      FROM s GROUP BY cluster_id) n USING (cluster_id)
""")
def q_dedup_keep_best(spark, sf_dir):
    """Keep-BEST duplicate-cluster survivors
    (curation.keep_best_in_clusters): the MinHash near-dup clusters
    (same pipeline as q_dedup_clusters) each keep their highest-quality
    member (ties → smallest id) instead of keep-first — one hash join +
    one max_by hash agg, no per-cluster sort."""
    docs = load_docs(spark, sf_dir)
    cand = dedup.minhash_lsh_pairs(docs, hash_fn="md5")
    verified = dedup.ngram_jaccard(docs, cand).where(F.col("jaccard") >= 0.5)
    clusters = dedup.duplicate_clusters(verified.select("doc_a", "doc_b"))
    scores = docs.select(
        "doc_id", text.quality_score(F.col("text")).alias("q_score"))
    return curation.keep_best_in_clusters(clusters, scores)

# splice the full recursive-CTE cluster oracle in as a nested CTE (the
# {clusters} placeholder keeps the f-string readable above)
ORACLES["q_dedup_keep_best"] = ORACLES["q_dedup_keep_best"].replace(
    "{clusters}", ORACLES["q_dedup_clusters"])


@register("q_embed_centroids", """
SELECT label, CAST(i AS INT) AS dim,
       CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(38,10)))
            AS DOUBLE) / COUNT(*) AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM embeddings, UNNEST(range(0, len(embedding))) AS r(i)
GROUP BY label, i
""")
def q_embed_centroids(spark, sf_dir):
    """Per-label embedding centroids (the class-prototype/statistics
    pass over a vector column): posexplode → per-(label, dim)
    decimal-exact mean — order-independent, so Spark's partitioned agg
    and the single-threaded oracle agree bit-for-bit.  One shuffle of
    (label, dim) partial sums; vectors never collect to the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "_x"))
    return (ex.groupBy("label", F.col("dim").cast("int").alias("dim"))
            .agg(dec_avg(F.col("_x").cast("double"), "centroid", scale=10),
                 F.count(F.lit(1)).alias("n_vecs")))


@register("q_distinct_kmv", f"""
WITH nrm AS ({_NORM_WORDS}),
g AS (SELECT DISTINCT unnest({_SHINGLE3}) AS gram FROM nrm),
g2 AS (SELECT gram FROM g WHERE gram <> ''),
f AS (SELECT DISTINCT CAST({_HEX8} AS BIGINT) / 4294967296.0 AS frac
      FROM (SELECT substr(md5(gram), 1, 8) AS h8 FROM g2)),
km AS (SELECT frac FROM f ORDER BY frac ASC LIMIT 256),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_minima, max(frac) AS kth
      FROM km),
e AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM g2)
SELECT 256 AS k, s.n_minima, round(s.kth, 6) AS kth_frac,
       round(CASE WHEN s.n_minima < 256 THEN CAST(s.n_minima AS DOUBLE)
                  ELSE 255 / s.kth END, 3) AS est_distinct,
       e.n_exact
FROM s, e
""")
def q_distinct_kmv(spark, sf_dir):
    """KMV distinct-count sketch (functions/sketches.kmv_distinct) over
    the corpus 3-gram universe, with the exact count alongside so the
    estimate's error is visible in the gated result.  Every intermediate
    is an md5 fraction — the estimate is bit-replayable by the oracle,
    unlike approx_count_distinct's engine-internal HLL hash.  Plan:
    partial-distinct combine → vocab-sized exchange → per-partition
    bottom-k (TakeOrderedAndProject) → driver merge of 32×k fractions."""
    from ydb_cdc_processor_spark.functions.sketches import kmv_distinct
    docs = load_docs(spark, sf_dir)
    grams = (docs.select(F.explode_outer(
                 dedup.shingles(F.col("text"), 3)).alias("gram"))
             .where((F.col("gram").isNotNull()) & (F.col("gram") != "")))
    est = kmv_distinct(grams, "gram", k=256)
    exact = grams.select("gram").distinct().agg(
        F.count(F.lit(1)).alias("n_exact"))
    return est.crossJoin(F.broadcast(exact))


@register("q_heavy_hitters", f"""
WITH nrm AS ({_NORM_WORDS}),
wrd AS (SELECT unnest(w) AS term FROM nrm),
w2 AS (SELECT term FROM wrd WHERE term <> ''),
hb AS (SELECT term, d,
              substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 2) AS b
       FROM w2 CROSS JOIN range(0, 4) t(d)),
cnt AS (SELECT d, b, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY d, b),
v AS (SELECT DISTINCT term FROM w2),
vb AS (SELECT term, d,
              substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 2) AS b
       FROM v CROSS JOIN range(0, 4) t(d)),
est AS (SELECT term, MIN(c) AS est_count
        FROM vb JOIN cnt USING (d, b) GROUP BY term)
SELECT term, est_count, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT term, est_count,
         row_number() OVER (ORDER BY est_count DESC, term ASC) AS rnk
  FROM est) t
WHERE rnk <= 20
""")
def q_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters (functions/sketches.cms_top_terms,
    Cormode & Muthukrishnan 2005) over the corpus word stream: top-20
    terms by CMS estimate from a 4×256 counter table.  The corpus
    touches ONE map-side-combined aggregation (the exchange carries
    ~partitions·depth·width counter partials, never words); estimates
    join the vocabulary against the BROADCAST 1024-row counter table;
    buckets stay 2-hex-char strings so DuckDB replays the sketch
    bit-for-bit.  The counter table is cell-wise-sum MERGEABLE — the
    property that lets per-shard/per-day sketches combine at 100 TB
    without re-scanning."""
    from ydb_cdc_processor_spark.functions.sketches import cms_top_terms
    docs = load_docs(spark, sf_dir)
    words = (docs.select(F.explode_outer(
                 text.normalize_words(F.col("text"))).alias("term"))
             .where(F.col("term").isNotNull() & (F.col("term") != "")))
    return cms_top_terms(words, "term", depth=4, width_hex=2, k=20)


@register("q_time_travel", """
SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
FROM events WHERE event_id % 2 = 0
""")
def q_time_travel(spark, sf_dir):
    """Snapshot reads over a maintained view (operators/snapshot.
    SnapshotView): a keyed view ingests two upsert batches with a
    hardlink snapshot taken between them — O(#files) inode links, zero
    bytes copied, the local-filesystem spelling of Delta/Iceberg's
    immutable-snapshot design — and the query reads AS-OF version 1:
    exactly the batch-1 state, bit-stable across the later batch that
    rewrote every row (it doubles value) and a delete.  The reference's
    mutable target loses pre-batch states by design
    (YqlWriter.java:118-147); this is the warehouse answer."""
    from ydb_cdc_processor_spark.operators.merge import (
        ParquetMaterializedView)
    from ydb_cdc_processor_spark.operators.snapshot import SnapshotView
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double"))
    mv = ParquetMaterializedView(
        spark, _scratch_dir("timetravel_") + "/mv", ["event_id"],
        schema=ev.schema)
    snap = SnapshotView(mv, keep_last=3)
    mv.apply(ev.where(F.col("event_id") % 2 == 0))
    v1 = snap.snapshot(label="b1")
    mv.apply(ev.withColumn("value", F.col("value") * 2))  # rewrite all
    snap.snapshot(label="b2")
    mv.apply(ev.select("event_id").limit(10), action="deleteFrom")
    return snap.read_as_of(v1)


@register("q_bpe_encode", text.bpe_oracle_sql())
def q_bpe_encode(spark, sf_dir):
    """Apply a FIXED trained BPE merge table to every document
    (text.bpe_apply) — the "tokenize the corpus with the model's
    tokenizer" stage: delimiter-separated characters (U+001F, outside
    the corpus alphabet so merges can't cross token boundaries), then
    one codegen'd replace pass per merge rule in priority order.  No
    shuffle, no Python — a per-row expression chain that scales
    embarrassingly; the oracle SQL is GENERATED from the same merge
    table (text.bpe_oracle_sql) so the engines cannot drift.  Output:
    per-doc char count, BPE token count, chars-per-token compression."""
    return text.bpe_apply(load_docs(spark, sf_dir))


@register("q_rank_sketch", """
WITH vals AS (
  SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
         END AS BIGINT) AS n
  FROM documents),
clip AS (SELECT least(greatest(n, 0), 65535) AS v FROM vals),
nodes AS (SELECT l, CAST(floor(v / power(2, l)) AS BIGINT) AS node
          FROM clip CROSS JOIN range(0, 17) t(l)),
cells AS (SELECT d, substr(md5(CAST(d AS VARCHAR) || ':' ||
                 CAST(l AS VARCHAR) || ':' || CAST(node AS VARCHAR)),
                 1, 2) AS b
          FROM nodes CROSS JOIN range(0, 4) t2(d)),
cnt AS (SELECT d, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY d, b),
px AS (SELECT CAST(x AS BIGINT) AS x FROM (VALUES (8), (16), (32), (64),
              (128), (256), (512), (1024)) t(x)),
pdec AS (SELECT x, l,
                CAST(floor(least(x, 65536) / power(2, l + 1)) AS BIGINT)
                  * 2 AS node
         FROM px CROSS JOIN range(0, 17) t(l)
         WHERE CAST(floor(least(x, 65536) / power(2, l)) AS BIGINT)
               % 2 = 1),
pe AS (SELECT x, l, node,
              MIN(COALESCE(cnt.c, 0)) AS est
       FROM (SELECT x, l, node, d,
                    substr(md5(CAST(d AS VARCHAR) || ':' ||
                           CAST(l AS VARCHAR) || ':' ||
                           CAST(node AS VARCHAR)), 1, 2) AS b
             FROM pdec CROSS JOIN range(0, 4) t2(d)) pb
       LEFT JOIN cnt USING (d, b)
       GROUP BY x, l, node),
rk AS (SELECT px.x,
              CAST(COALESCE(SUM(pe.est), 0) AS BIGINT) AS est_rank
       FROM px LEFT JOIN pe USING (x) GROUP BY px.x),
ex AS (SELECT px.x, CAST(COUNT(vals.n) AS BIGINT) AS n_exact_lt
       FROM px LEFT JOIN vals ON vals.n < px.x GROUP BY px.x)
SELECT x, est_rank, n_exact_lt FROM rk JOIN ex USING (x)
""")
def q_rank_sketch(spark, sf_dir):
    """Rank/quantile estimation from a MERGEABLE fixed-size sketch
    (functions/sketches.dyadic_rank_estimates — the Cormode–Muthukrishnan
    dyadic count-min construction): each doc's token count writes one
    node per dyadic level into a 4×256 counter table, and
    rank(x) = |{v < x}| is the sum of ≤17 point estimates over the
    canonical dyadic cover of [0, x).  est ≥ true always (CMS only
    overestimates); exact ranks ride alongside so the error is visible
    in the gated result.  State is FIXED (depth·width cells) regardless
    of cardinality, cell-wise-sum mergeable across shards/days, and
    retractable when maintained via CmsView (linear counters) — the
    approximate complement of the exact QuantileView.  Plan: one
    map-side-combined pass over values×levels; probes decompose and
    join the broadcast counter table."""
    from ydb_cdc_processor_spark.functions.sketches import (
        dyadic_rank_estimates)
    docs = load_docs(spark, sf_dir)
    vals = docs.select(text.token_count(F.col("text")).alias("n"))
    xs = [8, 16, 32, 64, 128, 256, 512, 1024]
    probes = spark.createDataFrame([(x,) for x in xs], "x long")
    est = dyadic_rank_estimates(vals, "n", probes, "x",
                                levels=16, depth=4, width_hex=2)
    exact = (probes.join(vals, vals.n < probes.x, "left")
             .groupBy("x").agg(F.count(vals.n).alias("n_exact_lt")))
    return est.join(exact, "x")


@register("q_rank_sketch_view")
def q_rank_sketch_view(spark, sf_dir):
    """The dyadic rank sketch MAINTAINED under CDC: token-count node
    streams ingest through a CmsView in two micro-batches, a third
    batch DELETES one doc-slice's nodes and a fourth restores them
    (linear counters retract exactly), leaving the live counter table
    equal to the one-shot sketch — so rank estimates for the same
    probes replay q_rank_sketch's oracle.  The retractable maintained
    form of the quantile sketch: fixed depth·width state, per-batch
    cost one ±agg + touched-bucket merge."""
    from ydb_cdc_processor_spark.functions.sketches import (
        dyadic_node_stream, dyadic_probe_nodes)
    from ydb_cdc_processor_spark.operators.cms_view import CmsView
    docs = load_docs(spark, sf_dir)
    vals = docs.select("doc_id",
                       text.token_count(F.col("text")).alias("n"))
    nodes = lambda df: dyadic_node_stream(df, "n", levels=16)
    cv = CmsView(spark, _scratch_dir("rksview_") + "/cms", "node",
                 depth=4, width_hex=2)
    cv.apply_delta(nodes(vals.where(F.col("doc_id") % 2 == 0)),
                   batch_token="rk:b1")
    cv.apply_delta(nodes(vals.where(F.col("doc_id") % 2 == 1)),
                   batch_token="rk:b2")
    slice5 = nodes(vals.where(F.col("doc_id") % 5 == 0))
    cv.apply_delta(None, slice5, batch_token="rk:b3")   # delete
    cv.apply_delta(slice5, None, batch_token="rk:b4")   # restore
    xs = [8, 16, 32, 64, 128, 256, 512, 1024]
    probes = spark.createDataFrame([(x,) for x in xs], "x long")
    pn = dyadic_probe_nodes(probes, "x", levels=16)
    per_node = pn.join(cv.estimate(pn.select("node"), "node"),
                       pn.node == F.col("term"))
    est = (probes.join(per_node.groupBy("x")
                       .agg(F.sum("est_count").alias("_s")),
                       on="x", how="left")
           .select("x", F.coalesce(F.col("_s"), F.lit(0)).cast("long")
                   .alias("est_rank")))
    exact = (probes.join(vals, vals.n < probes.x, "left")
             .groupBy("x").agg(F.count(vals.n).alias("n_exact_lt")))
    return est.join(exact, "x")


ORACLES["q_rank_sketch_view"] = ORACLES["q_rank_sketch"]


@register("q_cms_view")
def q_cms_view(spark, sf_dir):
    """The count-min sketch as a MAINTAINED store under CDC
    (operators/cms_view.CmsView): corpus words ingest in two
    micro-batches, a third batch DELETES one doc-slice's words and a
    fourth re-inserts them (old-image retraction — counters are a
    LINEAR sketch, the property HllView lacks), leaving the live state
    equal to the one-shot sketch, which the shared q_heavy_hitters
    oracle replays.  State is a FIXED depth·width counter table
    (vocabulary-independent); per-batch cost one map-side-combined
    ±agg + touched-bucket merge; the top-k read prunes to the probed
    cells' buckets."""
    from ydb_cdc_processor_spark.operators.cms_view import CmsView
    docs = load_docs(spark, sf_dir)
    words = (docs.select("doc_id", F.explode_outer(
                 text.normalize_words(F.col("text"))).alias("term"))
             .where(F.col("term").isNotNull() & (F.col("term") != "")))
    cv = CmsView(spark, _scratch_dir("cmsview_") + "/cms", "term",
                 depth=4, width_hex=2)
    cv.apply_delta(words.where(F.col("doc_id") % 2 == 0),
                   batch_token="cms:b1")
    cv.apply_delta(words.where(F.col("doc_id") % 2 == 1),
                   batch_token="cms:b2")
    slice5 = words.where(F.col("doc_id") % 5 == 0)
    cv.apply_delta(None, slice5, batch_token="cms:b3")   # delete
    cv.apply_delta(slice5, None, batch_token="cms:b4")   # restore
    vocab = words.select("term").distinct()
    return cv.top_terms(vocab, k=20)


ORACLES["q_cms_view"] = ORACLES["q_heavy_hitters"]


@register("q_bucketed_join", """
SELECT o.o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
         AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
""")
def q_bucketed_join(spark, sf_dir):
    """Exchange-free co-located join via BUCKETED tables — the layout
    strategy for a join repeated at 100 TB: pay one bucketed write
    (``bucketBy(8, key).sortBy(key)``), then every subsequent join AND
    aggregation on that key runs with ZERO shuffle — the bucketed scan
    reports hash partitioning on the key, which satisfies both the
    sort-merge join and the groupBy (pinned by
    test_bucketed_join_no_exchange).  The merge hint keeps AQE from
    demoting the demo to a broadcast join at toy scale; results are
    identical to the plain join (the oracle)."""
    base = _scratch_dir("bkt_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", base + "/orders").mode("overwrite")
        .saveAsTable("bkt_orders"))
    (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", base + "/customer").mode("overwrite")
        .saveAsTable("bkt_customer"))
    o = spark.table("bkt_orders")
    c = spark.table("bkt_customer")
    return (o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dec_sum("o_totalprice", "sum_price")))


@register("q_dedup_paragraphs", """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE text IS NOT NULL AND text <> ''),
docs2 AS (
  SELECT doc_id, words,
         CAST(ceil(len(words) / 8.0) AS BIGINT) AS n_units
  FROM base),
units AS (
  SELECT doc_id, n_units, ui,
         array_to_string(words[ui*8+1 : ui*8+8], ' ') AS unit
  FROM docs2, unnest(generate_series(0, n_units - 1)) AS t(ui)),
counts AS (
  SELECT unit, COUNT(DISTINCT doc_id) AS nd FROM units GROUP BY unit),
kept AS (
  SELECT u.doc_id, u.ui, u.unit
  FROM units u JOIN counts c USING (unit) WHERE c.nd <= 1),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(unit, ' ' ORDER BY ui) AS text_dedup
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, d.n_units,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(r.text_dedup, '') AS text_dedup
FROM docs2 d LEFT JOIN rebuilt r USING (doc_id)
""")
def q_dedup_paragraphs(spark, sf_dir):
    """Cross-document unit dedup (curation.dedup_paragraphs) — the
    CCNet/RefinedWeb paragraph-dedup step: 8-word units whose content
    appears in ≥2 distinct documents are deleted from every document;
    each document's surviving units re-assemble in original order.
    Digest-keyed count + join (text never shuffles), one re-assembly
    agg; emptied docs keep an n_kept=0 row."""
    return curation.dedup_paragraphs(
        load_docs(spark, sf_dir), unit_words=8, max_docs=1)


@register("q_simjoin_prefix", """
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
toks AS (
  SELECT DISTINCT doc_id, w
  FROM sub, unnest(string_split(text, ' ')) AS t(w)
  WHERE w <> ''),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_inter,
       round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.95
""")
def q_simjoin_prefix(spark, sf_dir):
    """EXACT set-similarity join at Jaccard ≥ 0.95 via prefix filtering
    (dedup.jaccard_similarity_join, the SSJoin/PPJoin lowering): the
    oracle verifies EXACTNESS by brute force — the prefix filter must
    find every qualifying pair, not a sample.  At scale the Spark side
    joins only on each set's rarest tokens; the oracle's all-pairs
    token join is the O(n²) spec it must equal.

    Runs on a deterministic quarter of the corpus: the synthetic data
    is near-duplicated by construction (~1.5% of ALL pairs exceed 0.95
    — a 40-word vocabulary), so the full self-join's OUTPUT is
    quadratic (191k true pairs at sf0.1) and benches the result
    materialization, not the algorithm.  The subset keeps the gated
    run exercising every stage with a bounded answer; real Zipf-vocab
    corpora don't have this density, and the operator itself takes the
    whole DataFrame."""
    docs = load_docs(spark, sf_dir).where(F.col("doc_id") % 4 == 0)
    return dedup.jaccard_similarity_join(docs, threshold=0.95)


@register("q_event_anomaly", """
WITH t AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         COUNT(value) OVER w AS c,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, event_id, ts, value, c,
         s / c AS mean,
         greatest((s2 - s * s / c) / (c - 1), 0.0) AS var,
         (value - s / c) / sqrt(greatest((s2 - s * s / c) / (c - 1), 0.0))
           AS zv
  FROM t)
SELECT user_id, event_id, ts, value,
       CAST(c AS BIGINT) AS baseline_n,
       mean AS baseline_mean,
       zv AS zscore
FROM z WHERE c >= 10 AND var > 0 AND abs(zv) >= 2.0
""")
def q_event_anomaly(spark, sf_dir):
    """Trailing-window anomaly detection (temporal.rolling_anomalies):
    per-user z-score of each event against the previous ≤20 events'
    mean/stddev — one Window operator, one shuffle, decimal-exact sums
    so the z-scores hash-match the oracle bit-for-bit."""
    from ydb_cdc_processor_spark.operators.temporal import rolling_anomalies
    return rolling_anomalies(load_table(spark, sf_dir, "events"),
                             window_rows=20, min_points=10,
                             z_threshold=2.0)


@register("q_pivot_status", """
SELECT n.n_name AS nation,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filled,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_partial,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                THEN CAST(o.o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE)
         AS filled_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q_pivot_status(spark, sf_dir):
    """Pivot (long→wide reshape) — order counts per nation spread
    across order-status columns, plus a pivoted decimal-exact measure.
    Explicit pivot values skip Spark's extra distinct-values job and
    keep the plan a single hash aggregate; nation/customer dims are
    broadcast so the fact table never shuffles before the agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    joined = (orders
              .join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey))
    wide = (joined.groupBy(F.col("n_name").alias("nation"))
            .pivot("o_orderstatus", ["O", "F", "P"])
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("o_totalprice", "price")))
    return wide.select(
        "nation",
        F.coalesce("O_n", F.lit(0)).cast("long").alias("n_open"),
        F.coalesce("F_n", F.lit(0)).cast("long").alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).cast("long").alias("n_partial"),
        F.col("F_price").alias("filled_price"))


@register("q_sliding_agg", """
WITH ev AS (
  SELECT event_type, value,
         to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300
                      AS BIGINT)) AS w0
  FROM events),
arms AS (
  SELECT event_type, value, w0 AS ws FROM ev
  UNION ALL
  SELECT event_type, value, w0 - INTERVAL 5 MINUTE FROM ev)
SELECT CAST(ws AS TIMESTAMP) AS ws, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
FROM arms GROUP BY ws, event_type
""")
def q_sliding_agg(spark, sf_dir):
    """Sliding (hopping) window aggregation — 10-minute windows every 5
    minutes via ``F.window(slideDuration)``; each event lands in two
    windows.  The streaming twin is the same expression under a
    watermark.  The oracle expands the two arms explicitly (window
    starts are epoch-aligned, matching Spark's alignment rule)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "10 minutes", "5 minutes")
                       .alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("value", "sum_value"))
            .select(F.col("w.start").alias("ws"), "event_type",
                    "n", "sum_value"))


@register("q_histogram", """
WITH b AS (
  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1)
SELECT bin, CAST(bin * 25.0 AS DOUBLE) AS bin_lo,
       CAST((bin + 1) * 25.0 AS DOUBLE) AS bin_hi, n,
       n * 1.0 / SUM(n) OVER () AS frac
FROM b
""")
def q_histogram(spark, sf_dir):
    """Fixed-width histogram — the profiling primitive run before any
    quality-filter threshold is chosen.  One map-side-combined hash agg
    to ≤~20 bin rows; the share denominator is an unpartitioned window
    over those BIN rows only (cardinality = n_bins, never data rows —
    the single-reducer stage a naive global-total join would create on
    the raw table is avoided by aggregating first)."""
    ev = load_table(spark, sf_dir, "events")
    b = (ev.groupBy(F.floor(F.col("value") / 25.0).cast("long")
                    .alias("bin"))
         .agg(F.count(F.lit(1)).alias("n")))
    from pyspark.sql import Window
    return b.select(
        "bin", (F.col("bin") * 25.0).alias("bin_lo"),
        ((F.col("bin") + 1) * 25.0).alias("bin_hi"), "n",
        (F.col("n") * 1.0 / F.sum("n").over(
            Window.partitionBy())).alias("frac"))


@register("q_cube", """
SELECT COALESCE(o.o_orderstatus, 'ALL') AS status,
       COALESCE(n.n_name, 'ALL') AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
         AS sum_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE(o.o_orderstatus, n.n_name)
""")
def q_cube(spark, sf_dir):
    """CUBE (all 2^k grouping sets in one pass) — Spark expands the
    sets inside a single Expand+HashAggregate (rows replicate 4×
    pre-combine, no extra shuffle per set).  Dims broadcast; 'ALL'
    labels the rolled-up levels (the dims are non-null, so COALESCE is
    unambiguous)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    joined = (orders
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey))
    return (joined.cube("o_orderstatus", "n_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dec_sum("o_totalprice", "sum_price"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                    .alias("status"),
                    F.coalesce("n_name", F.lit("ALL")).alias("nation"),
                    "n_orders", "sum_price"))


@register("q_length_deciles", """
WITH t AS (
  SELECT lang, n_chars,
         ntile(10) OVER (PARTITION BY lang
                         ORDER BY n_chars ASC, doc_id ASC) AS decile
  FROM documents)
SELECT lang, CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM t GROUP BY lang, decile
""")
def q_length_deciles(spark, sf_dir):
    """Per-language document-length deciles (equi-depth bins) — the
    bucketing behind length-balanced corpus sampling.  ntile is an
    exact per-KEY window (deterministic tiebreak on doc_id so both
    engines cut ties identically); partitioning by language keeps the
    sort distributed per key.  A GLOBAL equi-depth cut at 100 TB would
    instead use approx quantile boundaries + a broadcast bin join —
    this entry is the exact per-group form."""
    from pyspark.sql import Window
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc())
    return (docs.select("lang", "n_chars",
                        F.ntile(10).over(w).alias("decile"))
            .groupBy("lang", "decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .select("lang", F.col("decile").cast("int").alias("decile"),
                    "n_docs", "min_chars", "max_chars"))


@register("q_group_regression", """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                  * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                  * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                  * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, c,
       (c * sxy - sx * sy) / (c * sxx - sx * sx) AS slope,
       (sy - (c * sxy - sx * sy) / (c * sxx - sx * sx) * sx) / c
         AS intercept,
       (c * sxy - sx * sy)
         / (sqrt(c * sxx - sx * sx) * sqrt(c * syy - sy * sy)) AS corr
FROM m
""")
def q_group_regression(spark, sf_dir):
    """Per-group least-squares fit + Pearson correlation computed from
    decimal-EXACT moment sums (Σx, Σy, Σx², Σy², Σxy) in one hash agg —
    the single-pass distributed form of corr()/regr_slope() whose
    result is bit-reproducible at any parallelism (the builtin corr
    accumulates doubles in partition order).  The closed-form slope /
    intercept / r are plain IEEE on identical inputs, so they
    hash-match unrounded.  (Type note: Spark squares DECIMAL(18,4) →
    exact (37,8); the oracle uses (19,4) because DuckDB has no int128
    promotion at width 36 and overflows — both are exact, which is all
    value equality needs.)"""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    d18 = lambda c: c.cast("decimal(18,4)")
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("c"),
              dec_sum(x, "sx"), dec_sum(y, "sy"),
              F.sum(d18(x) * d18(x)).cast("double").alias("sxx"),
              F.sum(d18(y) * d18(y)).cast("double").alias("syy"),
              F.sum(d18(x) * d18(y)).cast("double").alias("sxy")))
    c, sx, sy = F.col("c"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (c * sxy - sx * sy) / (c * sxx - sx * sx)
    return m.select(
        "l_returnflag", "c",
        slope.alias("slope"),
        ((sy - slope * sx) / c).alias("intercept"),
        ((c * sxy - sx * sy)
         / (F.sqrt(c * sxx - sx * sx) * F.sqrt(c * syy - sy * sy)))
        .alias("corr"))


@register("q_bpe_merges", r"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
    FROM documents) t
  WHERE w <> '' GROUP BY w),
pairs AS (
  SELECT substr(w, i, 2) AS pair, freq
  FROM words, unnest(generate_series(1, greatest(length(w) - 1, 1)))
       AS t(i))
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs WHERE length(pair) = 2
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
""")
def q_bpe_merges(spark, sf_dir):
    """One BPE merge iteration (text.bpe_merge_counts): top-20 adjacent
    character pairs by corpus frequency — computed over the DISTINCT
    word × frequency table, so the pair explode scales with |vocab|,
    not corpus tokens (the tokenizer-training trick that makes BPE
    feasible at 100 TB).  Top-k via TakeOrdered, ties on the pair."""
    return text.bpe_merge_counts(load_docs(spark, sf_dir), k=20)


@register("q_bigram_familiarity", r"""
WITH norm AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS words
  FROM documents WHERE trim(text) <> ''),
bg AS (
  SELECT doc_id, words[i] || ' ' || words[i + 1] AS bigram, words[i] AS w1
  FROM norm, unnest(generate_series(1, len(words) - 1)) AS t(i)
  WHERE len(words) >= 2),
bigram_counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bg GROUP BY bigram),
unigram_counts AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_w1 FROM (
    SELECT unnest(words) AS w1 FROM norm) t
  WHERE w1 <> '' GROUP BY w1),
scored AS (
  SELECT bg.doc_id, (bc.c_bg * 1000000000) // uc.c_w1 AS r
  FROM bg JOIN bigram_counts bc USING (bigram)
          JOIN unigram_counts uc USING (w1))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(r) AS BIGINT) / (COUNT(*) * 1000000000.0) AS familiarity
FROM scored GROUP BY doc_id
""")
def q_bigram_familiarity(spark, sf_dir):
    """Corpus-as-model LM quality score (text.bigram_familiarity): mean
    conditional bigram frequency per document — the CCNet/perplexity
    filter shape with rational arithmetic only (no ln; ratios scaled
    to exact integers before the per-doc sum, so the score
    hash-matches unrounded)."""
    return text.bigram_familiarity(load_docs(spark, sf_dir))


@register("q_inverted_index", r"""
SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:20], ' ')
         AS postings
FROM (
  SELECT DISTINCT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
  FROM documents) t
WHERE w <> ''
GROUP BY w
""")
def q_inverted_index(spark, sf_dir):
    """Term → capped posting-list build (text.inverted_index): df + the
    first 20 doc ids per term in ONE hash agg; per-row array_distinct
    avoids a pre-distinct shuffle and the cap bounds stopword rows.
    The posting list is emitted as a space-joined STRING, not an array:
    the driver's pandas canonicalizer sorts raw column values and dies
    on unhashable lists (the COVERAGE.md array-output rule — every
    registry entry must be scalar-columns-only, pinned by the schema
    audit in tests/test_queries.py)."""
    idx = text.inverted_index(load_docs(spark, sf_dir), max_postings=20)
    return idx.withColumn(
        "postings",
        F.array_join(F.col("postings").cast("array<string>"), " "))


@register("q_regional_revenue", """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""")
def q_regional_revenue(spark, sf_dir):
    """TPC-H Q5-shaped six-table star join: revenue per nation for one
    region and year, including the cycle-closing c_nationkey =
    s_nationkey condition.  The OLAP flagship for join planning: the
    date filter pushes into the orders scan, region/nation/supplier
    broadcast (customer too at these SFs via AQE), lineitem — the only
    big table — is never shuffled before its orders join; revenue is
    the decimal-exact Σ price·(1−discount)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    orders = (load_table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1997-01-01"))
              .select("o_orderkey", "o_custkey"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA").select("r_regionkey")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp),
                  (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum(d2("l_extendedprice")
                       * (F.lit(1) - d2("l_discount")))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@register("q_gap_fill", """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events),
ded AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM ev GROUP BY user_id, ts),
spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
  FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, g AS grid_ts
  FROM spans, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS t(g))
SELECT g.user_id, g.grid_ts, d.value
FROM grid g ASOF LEFT JOIN ded d
  ON g.user_id = d.user_id AND g.grid_ts >= d.ts
""")
def q_gap_fill(spark, sf_dir):
    """Time-series resampling with forward fill
    (temporal.resample_ffill): each user's irregular events projected
    onto an hourly grid carrying the latest observation at or before
    each grid point — grid explode is linear in per-key span, the fill
    is the union-sort-window as-of join (one key shuffle), and
    duplicate timestamps collapse deterministically (arg_max by
    event_id) so both engines fill identically."""
    from ydb_cdc_processor_spark.operators.temporal import resample_ffill
    return resample_ffill(load_table(spark, sf_dir, "events"),
                          step="1 hour", tiebreak_col="event_id")


_AHASH_SQL = f"""
b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         greatest(CAST(floor(sqrt(octet_length(encode(text)))) AS BIGINT), 1)
           AS side
  FROM documents WHERE octet_length(encode(text)) > 0),
byt AS (
  SELECT doc_id, side, i - 1 AS j, {_HEX_BYTE} AS byte
  FROM b, LATERAL unnest(generate_series(1, n)) AS t(i)
  WHERE i <= side * side),
pooled AS (
  SELECT doc_id,
         ((j // side) * 4 // side) * 4 + ((j % side) * 4 // side) AS px_idx,
         round(SUM(byte) / COUNT(*), 6) AS lum
  FROM byt GROUP BY doc_id,
           ((j // side) * 4 // side) * 4 + ((j % side) * 4 // side)),
px AS (
  SELECT b.doc_id, c.px_idx, COALESCE(p.lum, 0.0) AS lum
  FROM b CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS px_idx) c
  LEFT JOIN pooled p ON p.doc_id = b.doc_id AND p.px_idx = c.px_idx),
m AS (
  SELECT doc_id,
         CAST(SUM(CAST(lum AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean
  FROM px GROUP BY doc_id),
sig AS (
  SELECT px.doc_id,
         CAST(SUM(CASE WHEN px.lum > m.mean
                  THEN 1::BIGINT << px.px_idx ELSE 0 END) AS BIGINT)
           AS ahash
  FROM px JOIN m USING (doc_id) GROUP BY px.doc_id)
"""


@register("q_image_ahash", f"WITH {_AHASH_SQL}\nSELECT doc_id, ahash FROM sig")
def q_image_ahash(spark, sf_dir):
    """Perceptual aHash signatures over fake-codec thumbnails
    (multimodal.image_ahash): the oracle replays the byte→thumbnail
    pooling in SQL (hex-byte recovery, the q_media_decode CTE) and the
    bit aggregation — the signature is engine-replayable because the
    pixel mean routes through an exact decimal fold."""
    from ydb_cdc_processor_spark.operators import multimodal
    media = multimodal.media_from_documents(load_docs(spark, sf_dir))
    return multimodal.image_ahash(multimodal.decode_image(media))


@register("q_image_neardup", f"""
WITH {_AHASH_SQL}
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(bit_count(xor(a.ahash, c.ahash)) AS INT) AS hamming
FROM sig a JOIN sig c
  ON (a.ahash >> 8) = (c.ahash >> 8) AND a.doc_id < c.doc_id
WHERE bit_count(xor(a.ahash, c.ahash)) <= 3
""")
def q_image_neardup(spark, sf_dir):
    """Image near-dup pairs by aHash (multimodal.image_neardup):
    prefix-bucket equi-join + exact Hamming verify — the SimHash
    shape applied to the multimodal column.  Bucket-scoped pair
    semantics; the oracle computes the identical rule over its
    SQL-decoded signatures."""
    from ydb_cdc_processor_spark.operators import multimodal
    media = multimodal.media_from_documents(load_docs(spark, sf_dir))
    return multimodal.image_neardup(multimodal.decode_image(media))


@register("q_curation_pipeline_v2", r"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE text IS NOT NULL AND text <> ''),
docs2 AS (
  SELECT doc_id, words,
         CAST(ceil(len(words) / 8.0) AS BIGINT) AS n_units
  FROM base),
units AS (
  SELECT doc_id, ui, array_to_string(words[ui*8+1 : ui*8+8], ' ') AS unit
  FROM docs2, unnest(generate_series(0, n_units - 1)) AS t(ui)),
ucounts AS (
  SELECT unit, COUNT(DISTINCT doc_id) AS nd FROM units GROUP BY unit),
kept_units AS (
  SELECT u.doc_id, u.ui, u.unit
  FROM units u JOIN ucounts c USING (unit) WHERE c.nd <= 1),
rebuilt AS (
  SELECT doc_id, string_agg(unit, ' ' ORDER BY ui) AS td
  FROM kept_units GROUP BY doc_id),
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(td)), '\s+', ' ', 'g'),
                      ' ') AS w, td
  FROM rebuilt),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram, w[i] AS w1
  FROM norm, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2),
bigram_counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bg GROUP BY bigram),
unigram_counts AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_w1 FROM (
    SELECT unnest(w) AS w1 FROM norm) t
  WHERE w1 <> '' GROUP BY w1),
fam AS (
  SELECT bg.doc_id,
         CAST(SUM((bc.c_bg * 1000000000) // uc.c_w1) AS BIGINT)
           / (COUNT(*) * 1000000000.0) AS familiarity
  FROM bg JOIN bigram_counts bc USING (bigram)
          JOIN unigram_counts uc USING (w1)
  GROUP BY bg.doc_id),
gated AS (
  SELECT r.doc_id, r.td FROM rebuilt r
  JOIN fam f USING (doc_id) WHERE f.familiarity >= 0.0335),
t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CASE WHEN length(trim(td)) = 0 THEN 0
              ELSE length(trim(td))
                   - length(replace(trim(td), ' ', '')) + 1 END
           AS n_tokens
  FROM gated),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_id,
       CAST(cum_before % 512 AS BIGINT) AS seq_pos
FROM c
""")
def q_curation_pipeline_v2(spark, sf_dir):
    """Composite training-data pass v2, chaining this round's operators
    in ONE declarative plan: cross-document paragraph dedup (shared
    8-word units deleted) → corpus-as-model bigram-familiarity gate
    (score over the DEDUPED text, ≥ 0.0335) → deterministic sequence
    packing of the survivors into 512-token sequences.  Corpus
    statistics (unit counts, bigram/unigram counts) are computed inside
    the same plan — the familiarity model is fit on exactly the text
    that survived dedup, the ordering a real pipeline needs and a
    per-stage-materializing pipeline gets wrong."""
    from ydb_cdc_processor_spark.operators.text import bigram_familiarity
    docs = load_docs(spark, sf_dir)
    dd = curation.dedup_paragraphs(docs, unit_words=8, max_docs=1)
    # persist the deduped survivors: three downstream branches (bigram
    # stream, unigram counts, the packing input) would otherwise each
    # re-execute the whole dedup sub-DAG — measured 14.4 s → 6.9 s at
    # sf0.1.  At 100 TB this is the standard cache-the-stage-boundary
    # call; linear storage, saves two full recomputes.
    kept = (dd.where(F.col("n_kept") > 0)
            .select("doc_id", F.col("text_dedup").alias("text"))
            .persist())
    fam = bigram_familiarity(kept)
    gated = kept.join(
        fam.where(F.col("familiarity") >= 0.0335).select("doc_id"),
        on="doc_id", how="left_semi")
    return curation.pack_sequences(gated, budget=512)


def _PR_ITER_SQL(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT n.node, nn.n,
         (1.0::DOUBLE - 0.85::DOUBLE) / nn.n
         + 0.85::DOUBLE * COALESCE(s.inr, 0.0::DOUBLE) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.d AS node,
           CAST(SUM(CAST(r.rank / dg.deg AS DECIMAL(38,18))) AS DOUBLE)
             AS inr
    FROM {prev} r JOIN e ON r.node = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY e.d) s USING (node))"""


_PR_CTES = f"""
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS s,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION
  SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR),
                  'c' || CAST(o.o_custkey AS VARCHAR)
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM e UNION ALL SELECT d FROM e) t),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),
r0 AS (SELECT node, nn.n, 1.0::DOUBLE / nn.n AS rank
       FROM nodes CROSS JOIN nn),
{_PR_ITER_SQL('r0', 'r1')},
{_PR_ITER_SQL('r1', 'r2')},
{_PR_ITER_SQL('r2', 'r3')}"""

ORACLES_PAGERANK = _PR_CTES + """
SELECT node, rank FROM r3
"""

# Derived TOLERANT oracle for the double-precision fast mode: ranks are
# scaled to integers at 4 decimal digits (round(rank*1e4) — fast-vs-exact
# drift is ~1e-12 absolute while the closest rank to a rounding boundary
# across all SFs is >=1e-7 away, a 5-order safety margin, measured), and
# the head is selected TIE-INCLUSIVELY: every node whose scaled rank >=
# the 20th-largest scaled rank.  Ties at the cut (they exist at sf0.001)
# therefore widen the set deterministically instead of making membership
# depend on sub-ulp ordering.
ORACLES_PAGERANK_TOP = _PR_CTES + """,
s AS (SELECT node, CAST(ROUND(rank * 10000) AS BIGINT) AS rank_1e4 FROM r3),
c AS (SELECT MIN(rank_1e4) AS cut
      FROM (SELECT rank_1e4 FROM s ORDER BY rank_1e4 DESC LIMIT 20) t)
SELECT s.node, s.rank_1e4 FROM s, c WHERE s.rank_1e4 >= c.cut
"""


@register("q_pagerank", ORACLES_PAGERANK)
def q_pagerank(spark, sf_dir):
    """PageRank (operators/graph.pagerank), 3 synchronous power-
    iteration rounds over the undirected customer–supplier trade graph
    (distinct lineitem edges, both directions).  Each round is one
    rank⋈edges equi-join + one map-side-combined destination aggregate
    — the Pregel lowering; per-edge contributions round to DECIMAL
    before the exact sum, so the oracle's sequential 3-round unroll
    reproduces the ranks to well past the gates' 6-significant-digit
    canonicalization (measured: ~3% of nodes differ in the LAST ULP
    only — Spark and DuckDB round the double→DECIMAL(38,18) cast of
    rank/degree differently in rare mantissa patterns; everything else
    is bit-identical)."""
    from ydb_cdc_processor_spark.operators.graph import pagerank
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    pairs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                     .alias("c"),
                     F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                     .alias("s"))
             .distinct())
    # no persist here: graph.pagerank eagerly localCheckpoints the edge
    # list itself, which cuts the whole join+distinct derivation out of
    # every unrolled iteration (measured 10.3 s → ~6 s at sf0.1; an
    # explicit .persist() was measured SLOWER still, 19.7 s — it forces
    # InMemoryTableScan branches and defeats exchange reuse).
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(
                 pairs.select(F.col("s").alias("src"),
                              F.col("c").alias("dst"))))
    return pagerank(edges, n_iter=3, damping=0.85)


@register("q_pagerank_fast", ORACLES_PAGERANK_TOP)
def q_pagerank_fast(spark, sf_dir):
    """The double-precision fast mode of q_pagerank (graph.pagerank
    exact=False): identical Pregel plan minus the per-edge
    DECIMAL(38,18) round-trip in every iteration.  Double sums are
    parallelism-dependent in the last ulps, so raw ranks have no
    cross-engine oracle — instead the query emits a DERIVED gateable
    result: ranks scaled to 4-decimal integers and the tie-inclusive
    head (every node whose scaled rank >= the 20th-largest), which the
    exact-decimal SQL unroll reproduces bit-for-bit because the
    fast-vs-exact drift (~1e-12, pinned at 1e-9 relative by
    test_pagerank_fast_close_to_exact) is 5 orders of magnitude below
    the measured distance of any rank to a rounding boundary.  The cut
    is computed distributed (TakeOrdered 20 -> min, broadcast), never a
    global window."""
    from ydb_cdc_processor_spark.operators.graph import pagerank
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    pairs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                     .alias("c"),
                     F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                     .alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(
                 pairs.select(F.col("s").alias("src"),
                              F.col("c").alias("dst"))))
    pr = pagerank(edges, n_iter=3, damping=0.85, exact=False)
    # eager checkpoint: the scaled frame is referenced twice (cut
    # derivation + final filter) — without it the whole 3-iteration
    # chain can execute twice.  Bounded: one row per node.
    scaled = pr.select(
        "node",
        F.round(F.col("rank") * 10000, 0).cast("bigint").alias("rank_1e4")) \
        .localCheckpoint(eager=True)
    cut = (scaled.orderBy(F.col("rank_1e4").desc()).limit(20)
           .agg(F.min("rank_1e4").alias("_cut")))
    return (scaled.crossJoin(F.broadcast(cut))
            .where(F.col("rank_1e4") >= F.col("_cut"))
            .select("node", "rank_1e4"))


@register("q_funnel", """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
t1 AS (
  SELECT user_id, min(ts) AS view_ts FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM ev e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.view_ts
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM ev e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.click_ts
  GROUP BY e.user_id)
SELECT t1.user_id, t1.view_ts, t2.click_ts, t3.purchase_ts,
       (t3.purchase_ts IS NOT NULL
        AND epoch_us(t3.purchase_ts) - epoch_us(t1.view_ts) <= 3600000000)
         AS completed_1h
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
""")
def q_funnel(spark, sf_dir):
    """Funnel analysis (view → click → purchase): per user, the first
    view, the first click at-or-after it, the first purchase at-or-after
    that, and whether the whole funnel closed within one hour — the
    product-analytics staple.  Three stage aggregates, each a hash agg
    over a semi-filtered join on the user key (every join rides ONE hash
    partitioning by user_id; the stage tables are per-user aggregates,
    far smaller than the event stream).  Completion compared in exact
    microseconds so both engines agree at the boundary."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    t1 = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("view_ts")))
    t2 = (ev.where(F.col("event_type") == "click")
          .join(t1, on="user_id")
          .where(F.col("ts") >= F.col("view_ts"))
          .groupBy("user_id").agg(F.min("ts").alias("click_ts")))
    t3 = (ev.where(F.col("event_type") == "purchase")
          .join(t2, on="user_id")
          .where(F.col("ts") >= F.col("click_ts"))
          .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    return (t1.join(t2, on="user_id", how="left")
            .join(t3, on="user_id", how="left")
            .select("user_id", "view_ts", "click_ts", "purchase_ts",
                    (F.col("purchase_ts").isNotNull()
                     & ((F.unix_micros("purchase_ts")
                         - F.unix_micros("view_ts")) <= 3600000000))
                    .alias("completed_1h")))


@register("q_windowed_distinct", """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
""")
def q_windowed_distinct(spark, sf_dir):
    """Exact distinct users per (hour, event type) — the
    audience-measurement aggregate.  COUNT(DISTINCT) expands to Spark's
    two-phase expand+agg (partial distinct before the exchange); the
    approximate scale path for very wide windows is the KMV sketch
    (`q_distinct_kmv`), registered alongside."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("ws"),
                       "event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count(F.lit(1)).alias("n_events")))


@register("q_dataset_split", f"""
WITH t AS (
  SELECT doc_id, lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
  FROM documents),
s AS (
  SELECT doc_id, lang,
         CASE WHEN CAST({{hex8}} AS BIGINT) / 4294967296.0 < 0.8
              THEN 'train'
              WHEN CAST({{hex8}} AS BIGINT) / 4294967296.0 < 0.9
              THEN 'val' ELSE 'test' END AS split
  FROM t)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_id
FROM s GROUP BY split, lang
""".replace("{hex8}", _HEX8))
def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (functions/sampling.
    dataset_split, 80/10/10 by id hash): assignment is a scan
    expression — zero shuffles, stable under re-runs/repartitioning,
    and incremental (new docs join their split without moving old
    ones).  Gated as per-(split, lang) counts + min id so the oracle
    pins actual membership, not just totals."""
    from ydb_cdc_processor_spark.functions.sampling import dataset_split
    docs = load_docs(spark, sf_dir)
    out = dataset_split(docs, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    return (out.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_id")))


@register("q_exact_median", """
WITH v AS (
  SELECT l_extendedprice AS x FROM lineitem
  WHERE l_extendedprice IS NOT NULL),
n AS (SELECT COUNT(*) AS n FROM v),
k AS (SELECT CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 AS k FROM n)
SELECT (SELECT x FROM v ORDER BY x
        LIMIT 1 OFFSET (SELECT k - 1 FROM k)) AS median,
       (SELECT CAST(n AS BIGINT) FROM n) AS n_rows
""")
def q_exact_median(spark, sf_dir):
    """EXACT global median without a global sort
    (functions/aggregates.exact_quantile): pass 1 histograms into 1024
    bins (bounded ≤1024-row collect — metadata, not data), pass 2
    sorts only the target bin (~|data|/1024 rows).  The scale answer
    to "approx_percentile isn't exact and ORDER BY is a single
    reducer".  The oracle is the sorted-offset definition."""
    from ydb_cdc_processor_spark.functions.aggregates import exact_quantile
    li = load_table(spark, sf_dir, "lineitem")
    val, n = exact_quantile(li, "l_extendedprice", q=0.5)
    return spark.createDataFrame([(val, n)], "median double, n_rows long")


@register("q_audio_profile", f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 64),
byt AS (
  SELECT doc_id, i - 1 AS j, {_HEX_BYTE} AS byte
  FROM b, LATERAL unnest(generate_series(1, n)) AS t(i)
  WHERE i <= (n // 64) * 64),
win AS (
  SELECT doc_id, j // 64 AS win_idx,
         round(sqrt(SUM((byte - 128.0) * (byte - 128.0)) / 64.0), 6)
           AS rms
  FROM byt GROUP BY doc_id, j // 64)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN rms < 25.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quiet,
       CAST(SUM(CAST(rms AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
         AS mean_rms
FROM win GROUP BY doc_id
""")
def q_audio_profile(spark, sf_dir):
    """Audio loudness/silence profile (multimodal.audio_window_rms):
    binary column as 8-bit PCM → per-64-sample-window RMS (vectorized
    mapInPandas, one reshape per Arrow batch) → per-doc window count,
    quiet-window count and decimal-exact mean RMS — the
    voice-activity/silence-trim statistics of an audio curation pass.
    The Σ(x−128)² inner sum is integer-exact, so the rounded RMS
    doubles replay bit-for-bit from the oracle's hex-recovered bytes."""
    from ydb_cdc_processor_spark.operators import multimodal
    media = multimodal.media_from_documents(load_docs(spark, sf_dir))
    win = multimodal.audio_window_rms(media, window=64)
    return (win.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.sum(F.when(F.col("rms") < 25.0, 1).otherwise(0))
                 .cast("long").alias("n_quiet"),
                 dec_avg("rms", "mean_rms", scale=6)))


@register("q_cohort_retention", """
WITH ev AS (
  SELECT user_id,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
  FROM events),
cohort AS (
  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id),
active AS (
  SELECT DISTINCT e.user_id, c.cohort_day,
         CAST(date_diff('day', c.cohort_day, e.d) AS BIGINT) AS day_offset
  FROM ev e JOIN cohort c USING (user_id))
SELECT cohort_day, day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM active WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""")
def q_cohort_retention(spark, sf_dir):
    """Cohort retention (the product-analytics staple): users grouped
    by first-seen day, activity counted per day offset for the first
    week.  First-touch agg + one join back on the user key + a distinct
    over (user, offset) — the distinct rides the same hash partitioning
    as the final count's map-side combine."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d"))
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    active = (ev.join(cohort, on="user_id")
              .select("user_id", "cohort_day",
                      F.datediff(F.col("d"), F.col("cohort_day"))
                      .cast("long").alias("day_offset"))
              .where(F.col("day_offset") <= 7)
              .distinct())
    return (active.groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("n_active")))


@register("q_term_pmi", r"""
WITH toks AS (
  SELECT DISTINCT doc_id, w
  FROM (
    SELECT doc_id, unnest(string_split(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
    FROM documents) t
  WHERE w <> ''),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM toks),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS dfw FROM toks GROUP BY w),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w),
scored AS (
  SELECT p.w1, p.w2, p.n_both,
         p.n_both * 1.0 * nn.n / (d1.dfw * d2.dfw) AS lift
  FROM pairs p
  JOIN df d1 ON d1.w = p.w1 JOIN df d2 ON d2.w = p.w2
  CROSS JOIN n nn)
SELECT w1, w2, n_both, lift FROM scored
ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 25
""")
def q_term_pmi(spark, sf_dir):
    """Term co-occurrence lift (rational PMI — no log, so scores are
    IEEE-identical cross-engine): ``P(a,b)/(P(a)P(b))`` over document
    co-occurrence, top-25.  Per-doc pairing is the per-row
    O(tokens²/2) self-join on the doc key — bounded by per-document
    distinct tokens, never corpus-quadratic; df table and N broadcast.
    Collocation mining = the feature the tokenizer/phrase-merge step
    consumes."""
    toks = (load_docs(spark, sf_dir)
            .select("doc_id",
                    F.explode_outer(F.array_distinct(
                        text.normalize_words(F.col("text")))).alias("w"))
            .where(F.col("w").isNotNull() & (F.col("w") != "")))
    n = toks.select(F.countDistinct("doc_id").alias("n"))
    dfw = toks.groupBy("w").agg(F.count(F.lit(1)).alias("dfw"))
    ta = toks.select("doc_id", F.col("w").alias("w1"))
    tb = toks.select("doc_id", F.col("w").alias("w2"))
    pairs = (ta.join(tb, on="doc_id")
             .where(F.col("w1") < F.col("w2"))
             .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_both")))
    scored = (pairs
              .join(F.broadcast(dfw.select(F.col("w").alias("w1"),
                                           F.col("dfw").alias("_d1"))),
                    on="w1")
              .join(F.broadcast(dfw.select(F.col("w").alias("w2"),
                                           F.col("dfw").alias("_d2"))),
                    on="w2")
              .crossJoin(F.broadcast(n))
              .select("w1", "w2", "n_both",
                      (F.col("n_both") * 1.0 * F.col("n")
                       / (F.col("_d1") * F.col("_d2"))).alias("lift")))
    return (scored.orderBy(F.col("lift").desc(), F.col("w1").asc(),
                           F.col("w2").asc()).limit(25))


# ---------------------------------------------------------------------------
