"""Temporal joins, deterministic sampling, tf-idf, chunking — split verbatim from registry.py.

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
    _LANG_HITS_SQL, _NORM_WORDS)

# Temporal joins, deterministic sampling, tf-idf, chunking (round 5)
# ---------------------------------------------------------------------------

@register("q_asof_join", """
WITH probe AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'),
build AS (
  SELECT user_id, ts, max(value) AS signup_value FROM events
  WHERE event_type = 'signup' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
       round(p.value, 6) AS value,
       round(b.signup_value, 6) AS signup_value
FROM probe p ASOF LEFT JOIN build b
  ON p.user_id = b.user_id AND p.ts >= b.ts
""")
def q_asof_join(spark, sf_dir):
    """AS-OF JOIN (operators/temporal.py): each purchase enriched with
    the user's most recent at-or-before signup value.  Spark lacks the
    operator; the implementation is the union-sort-window lowering (ONE
    shuffle on the key, no range join).  DuckDB's native ASOF JOIN is
    the oracle.  Build side pre-deduped per (user, ts) so the at-tie
    pick is well-defined in both engines."""
    from ydb_cdc_processor_spark.operators.temporal import as_of_join
    events = load_table(spark, sf_dir, "events")
    probe = events.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    build = (events.where(F.col("event_type") == "signup")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("signup_value")))
    out = as_of_join(probe, build, keys=["user_id"],
                     probe_ts="ts", build_ts="ts",
                     payload=["signup_value"], suffix="")
    return out.select("event_id", "user_id",
                      F.round("value", 6).alias("value"),
                      F.round("signup_value", 6).alias("signup_value"))


@register("q_range_join", """
WITH bands AS (
  SELECT CAST(i AS BIGINT) AS band_id,
         CAST(890 + i * 20 AS DOUBLE) AS lo,
         CAST(890 + i * 20 + 45 AS DOUBLE) AS hi
  FROM range(0, 60) t(i))
SELECT p.p_partkey, b.band_id, b.lo, b.hi,
       round(p.p_retailprice, 6) AS price
FROM read_parquet('{SF}/part.parquet') p JOIN bands b
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
""".replace("read_parquet('{SF}/part.parquet')", "part"))
def q_range_join(spark, sf_dir):
    """Range join (operators/temporal.py): parts matched to overlapping
    price bands.  The plain BETWEEN theta-join is a cross product at
    scale; range_join_binned replicates each interval to the hash bins
    it overlaps and equi-joins on the bin (+ codegen refine).  The
    oracle runs the plain BETWEEN join."""
    from ydb_cdc_processor_spark.operators.temporal import range_join_binned
    part = load_table(spark, sf_dir, "part")
    bands = spark.range(0, 60).select(
        F.col("id").alias("band_id"),
        (890 + F.col("id") * 20).cast("double").alias("lo"),
        (890 + F.col("id") * 20 + 45).cast("double").alias("hi"))
    out = range_join_binned(part, bands, value_col="p_retailprice",
                            lo_col="lo", hi_col="hi", bin_width=20.0)
    return out.select("p_partkey", "band_id", "lo", "hi",
                      F.round("p_retailprice", 6).alias("price"))


_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(h8, {i}, 1)) - 1) * {16 ** (8 - i)}"
    for i in range(1, 9))

@register("q_stratified_sample", f"""
WITH d AS (
  SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
  FROM documents),
f AS (
  SELECT doc_id, lang,
         CAST({_HEX8} AS BIGINT) / 4294967296.0 AS frac
  FROM d)
SELECT doc_id, lang, round(frac, 6) AS frac
FROM f
WHERE frac < CASE lang WHEN 'en' THEN 0.3 WHEN 'zh' THEN 1.0
                       WHEN 'de' THEN 0.8 ELSE 0.5 END
""")
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (functions/sampling.py):
    per-language keep rates decided by an md5 id-hash fraction — stable
    across runs/partitionings/engines (df.sample() is neither).  The
    oracle reconstructs the identical hash fraction digit-by-digit."""
    from ydb_cdc_processor_spark.functions.sampling import (
        hash_fraction, stratified_sample)
    docs = load_docs(spark, sf_dir)
    out = stratified_sample(docs, id_col="doc_id", group_col="lang",
                            rates={"en": 0.3, "zh": 1.0, "de": 0.8},
                            default_rate=0.5)
    return out.select("doc_id", "lang",
                      F.round(hash_fraction(F.col("doc_id")), 6)
                       .alias("frac"))


@register("q_sample_per_group", """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
  FROM documents)
SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM r WHERE rk <= 20
""")
def q_sample_per_group(spark, sf_dir):
    """Deterministic k-per-group sampling (functions/sampling.py):
    exactly min(k, |group|) docs per language, ranked by md5(id) — a
    hash-ranked reservoir that is stable across runs, partitionings, and
    engines (the oracle replays the identical ranking)."""
    from pyspark.sql import Window
    from ydb_cdc_processor_spark.functions.sampling import sample_per_group
    docs = load_docs(spark, sf_dir)
    out = sample_per_group(docs, id_col="doc_id", group_col="lang", k=20)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc())
    return out.select("doc_id", "lang",
                      F.row_number().over(w).cast("int").alias("rk"))


@register("q_tfidf_top_terms", f"""
WITH nrm AS ({_NORM_WORDS}),
terms AS (SELECT doc_id, unnest(w) AS term FROM nrm),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM terms WHERE term <> '' GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf, df, n WHERE tf.term = df.term),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term ASC) AS rnk FROM s)
SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 3
""")
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by the rational tf-idf
    score tf×N/df (exact integer product + one IEEE division — ln is not
    correctly-rounded across engines, so the log variant cannot be
    hash-gated; see text.tfidf_top_terms)."""
    return text.tfidf_top_terms(load_docs(spark, sf_dir), k=3)


@register("q_curation_pipeline", f"""
WITH keep AS (
  SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
quality AS (
  SELECT d.doc_id, d.lang, d.text,
    CAST((CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0
               WHEN length(text) >= 20 THEN 0.5 ELSE 0.0 END
        + CASE WHEN (length(text) -
                     length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}\\s]',
                                           '', 'g')))
                    / greatest(length(text), 1) < 0.3 THEN 1.0 ELSE 0.0 END
        + CASE WHEN {_LANG_HITS_SQL["en"]} > 0 THEN 1.0 ELSE 0.5 END
         ) / 3.0 AS DOUBLE) AS q_score
  FROM documents d JOIN keep USING (doc_id)),
sampled AS (
  SELECT doc_id, lang, text FROM (
    SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
    FROM quality WHERE q_score >= 0.5) t
  WHERE CAST({_HEX8} AS BIGINT) / 4294967296.0 <
        CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END),
nrm AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS w
  FROM sampled
  WHERE length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) > 0),
st AS (
  SELECT doc_id, lang, w, unnest(range(0, greatest(len(w), 1), 48)) AS cs
  FROM nrm)
SELECT doc_id, lang,
       CAST(cs // 48 AS INT) AS chunk_idx,
       CAST(len(list_slice(w, cs + 1, cs + 64)) AS INT) AS n_words,
       md5(array_to_string(list_slice(w, cs + 1, cs + 64), ' '))
         AS chunk_fp
FROM st WHERE cs < len(w)
""")
def q_curation_pipeline(spark, sf_dir):
    """The composite training-data pass, operators chained end-to-end:
    exact dedup (keep min-id per content digest) → quality gate
    (q_score ≥ 0.5) → deterministic stratified sample (en at 0.5, the
    rest kept) → 64/48 word-window chunking, each chunk fingerprinted.
    One declarative plan — Catalyst fuses the gates into the scan; the
    only data shuffle is the dedup group-by (the keep-set then
    BROADCASTS into the semi-join, and `lang` rides the chunk explode
    via carry_cols instead of a chunk-set re-join — pinned by
    test_curation_pipeline_no_rejoin).  The oracle composes the same
    stages in SQL."""
    from ydb_cdc_processor_spark.functions.sampling import stratified_sample
    docs = load_docs(spark, sf_dir)
    keep = (dedup.exact_dedup_groups(docs)
            .select(F.col("keep_doc_id").alias("doc_id")))
    deduped = docs.join(keep, on="doc_id", how="left_semi")
    gated = deduped.where(
        text.quality_score(F.col("text")) >= 0.5)
    sampled = stratified_sample(gated, id_col="doc_id", group_col="lang",
                                rates={"en": 0.5}, default_rate=1.0)
    # lang rides the chunk explode via carry_cols — re-joining it back on
    # doc_id would shuffle the (larger) chunk set a third time
    chunks = text.chunk_documents(sampled.select("doc_id", "lang", "text"),
                                  chunk_words=64, stride=48,
                                  carry_cols=["lang"])
    return chunks.select("doc_id", "lang", "chunk_idx", "n_words",
                         F.md5("chunk_text").alias("chunk_fp"))


@register("q_doc_chunks", r"""
WITH nrm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                      ' ') AS w
  FROM documents
  WHERE length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) > 0),
st AS (
  SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 48)) AS cs
  FROM nrm)
SELECT doc_id,
       CAST(cs // 48 AS INT) AS chunk_idx,
       CAST(cs AS INT) AS chunk_start,
       CAST(len(list_slice(w, cs + 1, cs + 64)) AS INT) AS n_words,
       array_to_string(list_slice(w, cs + 1, cs + 64), ' ') AS chunk_text
FROM st WHERE cs < len(w)
""")
def q_doc_chunks(spark, sf_dir):
    """Fixed-size overlapping word-window chunking (64-word chunks every
    48 words — the standard pre-embedding segmentation).  Pure Catalyst
    sequence/explode/slice; chunks fan out as rows so downstream
    embedding parallelism scales with chunks."""
    return text.chunk_documents(load_docs(spark, sf_dir),
                                chunk_words=64, stride=48)


# ---------------------------------------------------------------------------
