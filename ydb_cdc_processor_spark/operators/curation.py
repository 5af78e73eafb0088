"""Training-data curation operators (SURVEY.md §7 M4 — beyond-reference
scope, the ops a 100 TB pre-training pipeline runs between raw crawl and
tokenized shards).

All built from codegen'd Catalyst expressions + hash/broadcast joins —
no Python in any hot path, and every decision (sampling, packing order,
representatives) is a pure function of row content so reruns, resumes
and re-partitionings reproduce byte-identical outputs (the same
determinism contract as functions/sampling.py).

Operators:

- :func:`contamination` — test-set decontamination by word n-gram
  overlap (the GPT-3/PaLM-style published recipe): flag corpus docs
  sharing any n-gram with a benchmark set.
- :func:`repetition_stats` — Gopher-style repetition signals
  (duplicate-word fraction, most-frequent-bigram share) used to drop
  degenerate/boilerplate text.
- :func:`pii_counts` / :func:`redact_pii` — regex PII detection and
  redaction (email / phone / IPv4), RE2-safe patterns so Spark (Java
  regex) and any RE2 engine (DuckDB, Go) match identically.
- :func:`pack_sequences` — deterministic document→training-sequence
  packing by token budget, as a DISTRIBUTED prefix sum (a global
  ``ORDER BY`` window would funnel 100 TB through one reducer).
- :func:`temperature_sample` — per-group temperature resampling
  (multilingual mixture flattening, share^alpha reweighting).
- :func:`keep_best_in_clusters` — duplicate-cluster representative
  selection by quality score (keep-best, not keep-first).
- :func:`dedup_paragraphs` — CCNet/RefinedWeb-style CROSS-document
  unit dedup: units repeated across documents (boilerplate) are
  deleted from every document, unique content survives in order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ydb_cdc_processor_spark.functions.sampling import hash_fraction
from ydb_cdc_processor_spark.operators.dedup import shingles
from ydb_cdc_processor_spark.operators.text import token_count


# ---------------------------------------------------------------------------
# Test-set decontamination
# ---------------------------------------------------------------------------

def contamination(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """Flag corpus documents that share any word ``n``-gram with a
    benchmark/eval set — the standard published decontamination step
    (exact n-gram collision, word-level, normalized text).

    Returns one row per contaminated document:
    ``(id_col, n_hits BIGINT, first_hit STRING)`` where ``n_hits`` is
    the number of DISTINCT benchmark n-grams found in the document and
    ``first_hit`` the lexicographically smallest (a stable audit
    sample).

    Plan shape (100 TB corpus, benchmark ≪ corpus — the real-world
    regime): the benchmark side collapses to a distinct n-gram set and
    is BROADCAST, so the corpus is scanned once, its n-grams exploded
    and hash-probed with no corpus shuffle; the only shuffle is the
    final per-doc count over the (tiny) hit set.  Never materializes
    corpus n-grams to disk.

    Documents shorter than ``n`` words contribute their whole text as a
    single short gram (same convention as dedup.shingles, mirrored by
    the SQL oracle).
    """
    # explode_outer, not explode: explode lets Catalyst infer a
    # `size(shingles(...)) > 0` pre-filter that re-evaluates the whole
    # shingle transform below the exchange (2× the dominant CPU, and on
    # a small input it lands in the single scan task) — the NULL rows
    # explode_outer keeps are dropped by the gram filter anyway
    bench_grams = (benchmark
                   .select(F.explode_outer(shingles(F.col(text_col), n))
                           .alias("gram"))
                   .where(F.col("gram") != "")
                   .distinct())
    doc_grams = (docs
                 .select(F.col(id_col),
                         F.explode_outer(shingles(F.col(text_col), n))
                          .alias("gram"))
                 .where(F.col("gram").isNotNull()))
    hits = doc_grams.join(F.broadcast(bench_grams), on="gram")
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_hits"),
                 F.min("gram").alias("first_hit")))


# ---------------------------------------------------------------------------
# Repetition / degeneracy signals (Gopher-style)
# ---------------------------------------------------------------------------

def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document repetition signals in the shape of the published
    Gopher rules: ``dup_word_frac`` (1 − distinct words / words — the
    duplicate-token share) and ``top_bigram_frac`` (occurrences of the
    most frequent word bigram / total bigrams — boilerplate and
    degenerate-loop detector).

    ``dup_word_frac`` is a pure per-row array expression (zero
    shuffle).  The bigram mode needs a (doc, bigram) count: explode →
    map-side-combined hash agg → per-doc argmax via one more hash agg
    keyed on the doc (a struct-min, NOT a window — no per-doc sort) —
    two shuffles of bigram-count rows (≪ text bytes), then a hash join
    back to the per-row stats.  Ties on count break to the
    lexicographically smallest bigram so engines agree.

    Output: ``(id_col, n_words INT, dup_word_frac DOUBLE,
    top_bigram STRING, top_bigram_frac DOUBLE)`` with fractions rounded
    to 6 digits (integer ratios — exact in IEEE, rounding is cosmetic
    cross-engine safety).
    """
    from ydb_cdc_processor_spark.operators.text import normalize_words
    words = F.col("_w")
    base = (docs
            .select(F.col(id_col),
                    normalize_words(F.col(text_col)).alias("_w"))
            .select(F.col(id_col),
                    F.size(words).alias("n_words"),
                    F.size(F.array_distinct(words)).alias("_nd"),
                    shingles_col(words, 2).alias("_bg")))
    per_row = base.select(
        F.col(id_col), "n_words",
        F.when(F.col("n_words") == 0, F.lit(0.0))
         .otherwise(F.round(F.lit(1.0) - F.col("_nd") / F.col("n_words"), 6))
         .alias("dup_word_frac"),
        F.col("_bg"))
    # explode_outer: explode would let Catalyst infer `size(_bg) > 0`
    # and push the whole bigram transform below the exchange as a
    # pre-filter — 2× the dominant CPU, serialized into the scan task
    # on small inputs (measured 8 s → 1 s at sf0.1)
    bg_counts = (per_row
                 .select(F.col(id_col), F.explode_outer("_bg").alias("bigram"))
                 .where(F.col("bigram") != "")
                 .groupBy(id_col, "bigram")
                 .agg(F.count(F.lit(1)).alias("bg_n")))
    # per-doc argmax as ONE hash agg (map-side combined), not a window
    # (a window would sort every (doc, bigram) row; the agg only keeps
    # one struct per doc).  The EXPLICIT total order — count desc, then
    # bigram asc — is encoded lexicographically as min(−count, bigram):
    # struct comparison is field-by-field in every engine.
    top = (bg_counts
           .groupBy(id_col)
           .agg(F.min(F.struct((-F.col("bg_n")).alias("nn"),
                               F.col("bigram").alias("bg"))).alias("_t"),
                F.sum("bg_n").alias("n_bigrams"))
           .select(F.col(id_col),
                   F.col("_t.bg").alias("top_bigram"),
                   F.round((-F.col("_t.nn")) / F.col("n_bigrams"), 6)
                    .alias("top_bigram_frac")))
    return (per_row.drop("_bg")
            .join(top, on=id_col, how="left")
            .select(F.col(id_col), "n_words", "dup_word_frac",
                    "top_bigram", "top_bigram_frac"))


def shingles_col(words: Column, n: int) -> Column:
    """n-gram array from an already-split word array (shares
    dedup.shingles' boundary convention: short docs yield one short
    gram)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# RE2-safe (no lookarounds/backrefs): Java regex and RE2 (DuckDB, Go)
# find the same non-overlapping matches left-to-right.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\d+\.\d+\.\d+\.\d+"

_PII = [("email", PII_EMAIL, "<EMAIL>"),
        ("phone", PII_PHONE, "<PHONE>"),
        ("ipv4", PII_IPV4, "<IP>")]


def pii_counts(text: Column) -> list[Column]:
    """Per-category PII match counts: ``n_email, n_phone, n_ipv4``
    columns (codegen regexp_count — one regex scan per category)."""
    return [F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat, _ in _PII]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category token.  Order matters:
    emails first (an email contains no phone/IP match but shares
    character classes), then phones, then IPv4 — the same fixed chain on
    every engine."""
    out = text
    for _, pat, token in _PII:
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# Deterministic sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 2048,
                   shard_hex_chars: int = 2) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences in a
    deterministic global order — the document→sequence packing step
    before tokenized-shard writing.  A document lands in the sequence
    where the running token total before it falls: sequence
    ``seq_id = floor(cum_before / budget)`` at offset
    ``seq_pos = cum_before % budget`` (greedy fill in hash order,
    overflow rides into the next sequence — the standard
    concat-then-split packing, so no token is dropped and no sequence
    but the last is under-full).

    The global order is ``(md5(id), id)`` — a deterministic shuffle that
    also decorrelates neighboring source documents (what training wants)
    and is reproducible by any engine.

    Scale shape: a global ordered window would move the whole corpus to
    ONE reducer, so the running total is a two-level distributed prefix
    sum instead: the md5-prefix (``shard_hex_chars`` hex chars → 256
    shards by default) both partitions the data and IS the leading key
    of the global order, so per-shard window cumsums + a broadcast
    256-row shard-offset table compose to the exact global prefix sum
    with one partitioned shuffle and no single-reducer stage.

    Output: ``(id_col, n_tokens BIGINT, seq_id BIGINT, seq_pos
    BIGINT)``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window
    h = F.md5(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col), h.alias("_h"),
        F.substring(h, 1, shard_hex_chars).alias("_shard"),
        token_count(F.col(text_col)).alias("n_tokens"))
    intra_w = (Window.partitionBy("_shard")
               .orderBy(F.col("_h").asc(), F.col(id_col).asc())
               .rowsBetween(Window.unboundedPreceding, -1))
    base = base.withColumn(
        "_intra", F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0)))
    # ~16^shard_hex_chars rows: a driver-sized table; the window below
    # runs on one partition BY DESIGN (it is tiny), then broadcasts.
    offs_w = (Window.orderBy(F.col("_shard").asc())
              .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (base.groupBy("_shard")
               .agg(F.sum("n_tokens").alias("_shard_total"))
               .withColumn("_offset",
                           F.coalesce(F.sum("_shard_total").over(offs_w),
                                      F.lit(0)))
               .select("_shard", "_offset"))
    packed = (base.join(F.broadcast(offsets), on="_shard")
              .withColumn("_cum_before", F.col("_offset") + F.col("_intra")))
    return packed.select(
        F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("_cum_before") / budget).cast("long").alias("seq_id"),
        (F.col("_cum_before") % budget).cast("long").alias("seq_pos"))


# ---------------------------------------------------------------------------
# Temperature resampling
# ---------------------------------------------------------------------------

def temperature_sample(docs: DataFrame, id_col: str = "doc_id",
                       group_col: str = "lang",
                       alpha: float = 0.5) -> DataFrame:
    """Flatten a skewed group mixture (the multilingual-training
    ``share^alpha`` reweighting): group ``g`` keeps rate
    ``(n_min / n_g)^(1-alpha)`` where ``n_min`` is the smallest group's
    count — the rarest group keeps everything, a group 100× larger
    keeps ``100^(alpha-1)`` of itself (``alpha=1`` → no resampling,
    ``alpha=0`` → fully uniform mixture).

    Keep decisions are id-hash fractions (functions/sampling.py), so
    the sample is deterministic and engine-replayable.  ``alpha=0.5``
    routes through ``sqrt`` (IEEE correctly-rounded everywhere);
    other exponents use ``pow``, whose last-ulp behavior is
    engine-specific — fine for sampling, but pin 0.5 when an exact
    cross-engine oracle must replay the rates.

    Plan: one tiny group-count agg (map-side combined), min via a
    1-row cross join, rates BROADCAST back onto the corpus — the corpus
    itself is never shuffled.  Returns kept rows plus their
    ``keep_rate`` (rounded to 6 digits, decision uses the unrounded
    value).
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    ratio = F.col("_n_min") / F.col("_n")
    rate = (F.sqrt(ratio) if alpha == 0.5
            else F.pow(ratio, F.lit(1.0 - alpha)))
    rates = (counts.crossJoin(F.broadcast(n_min))
             .select(group_col, rate.alias("_rate")))
    return (docs.join(F.broadcast(rates), on=group_col)
            .where(hash_fraction(F.col(id_col)) < F.col("_rate"))
            .withColumn("keep_rate", F.round("_rate", 6))
            .drop("_rate"))


# ---------------------------------------------------------------------------
# Keep-best duplicate-cluster representative
# ---------------------------------------------------------------------------

def keep_best_in_clusters(members: DataFrame, scores: DataFrame,
                          id_col: str = "doc_id",
                          cluster_col: str = "cluster_id",
                          score_col: str = "q_score") -> DataFrame:
    """Pick each duplicate cluster's representative by QUALITY rather
    than keep-first: the member with the highest ``score_col`` (ties →
    smallest id) survives.  ``members`` is (id, cluster) — e.g.
    dedup.duplicate_clusters output — and ``scores`` maps id → score.

    One hash join on the id + one hash agg on the cluster (max_by over
    a (score, −id)-ordered key).  Output: ``(cluster_col, keep BIGINT,
    n_members BIGINT, best_score DOUBLE)``.
    """
    scored = members.join(scores.select(F.col(id_col), F.col(score_col)),
                          on=id_col)
    # total order: higher score wins, ties → smaller id.  Encoded as a
    # lexicographic struct key (score, −id) so a single hash-agg max_by
    # suffices — no per-cluster window/sort shuffle.
    return (scored.groupBy(cluster_col)
            .agg(F.max_by(F.col(id_col),
                          F.struct(F.col(score_col).alias("s"),
                                   (-F.col(id_col)).alias("nid")))
                  .cast("long").alias("keep"),
                 F.count(F.lit(1)).alias("n_members"),
                 F.round(F.max(score_col), 6).alias("best_score")))


# ---------------------------------------------------------------------------
# Cross-document unit (paragraph) dedup — CCNet / RefinedWeb style
# ---------------------------------------------------------------------------

def dedup_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", unit_words: int = 8,
                     max_docs: int = 1) -> DataFrame:
    """Remove text units that repeat ACROSS documents (boilerplate,
    headers, license blocks) while keeping each document's unique
    content — the CCNet / RefinedWeb paragraph-dedup step, which
    operates within documents at unit granularity rather than dropping
    whole near-duplicate documents.

    A "unit" here is a run of ``unit_words`` consecutive words (real
    corpora split on blank lines; the synthetic corpus has no newlines,
    and fixed word windows exercise the identical plan).  A unit whose
    content appears in more than ``max_docs`` distinct documents is
    deleted from every document; survivors are re-assembled in their
    original order.

    Plan shape (100 TB): documents explode to units carrying their
    position; units collapse to a 128-bit content digest so the
    duplicate-count aggregate and the count→unit join shuffle digests,
    never text (CCNet ships sha1 paragraph digests for the same
    reason).  Three shuffles total — unit-count hash agg (map-side
    combined), digest equi-join back, per-document re-assembly agg —
    each keyed on a high-cardinality uniform column, so the plan scales
    with corpus bytes and has no skewed or all-pairs stage.

    Output: ``(id_col, n_units BIGINT, n_kept BIGINT, text_dedup
    STRING)`` — documents whose every unit was deleted keep a row with
    ``n_kept = 0`` and an empty string (the caller decides whether an
    emptied doc survives).
    """
    if unit_words <= 0:
        raise ValueError("unit_words must be positive")
    w = F.col("_w")
    # empty text splits to [""] (one phantom unit) in both Spark and
    # DuckDB — filter the TEXT, not the split size
    base = (docs
            .where(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
            .select(F.col(id_col).alias("doc"),
                    F.split(F.col(text_col), " ").alias("_w"))
            .withColumn("_n_units",
                        F.ceil(F.size(w) / F.lit(unit_words)).cast("long")))
    unit = F.concat_ws(
        " ", F.slice(w, (F.col("ui") * unit_words + 1).cast("int"),
                     unit_words))
    # explode_outer (not explode): see contamination() — explode lets
    # Catalyst infer a size()>0 pre-filter that re-evaluates the
    # sequence below the exchange; _n_units > 0 already guarantees
    # non-empty
    units = (base
             .select("doc", "_n_units",
                     F.explode_outer(
                         F.sequence(F.lit(0).cast("long"),
                                    F.col("_n_units") - 1)).alias("ui"),
                     "_w")
             .select("doc", "_n_units", "ui",
                     F.md5(unit).alias("dig"), unit.alias("unit")))
    counts = units.groupBy("dig").agg(
        F.countDistinct("doc").alias("_nd"))
    kept = (units.join(counts, on="dig")
            .where(F.col("_nd") <= max_docs))
    # per-doc re-assembly: order by position via array_sort on (ui,
    # unit) structs — no per-doc window sort, one hash agg.  Documents
    # that lost every unit are resurrected by a left join from the doc
    # list (n_kept = 0, empty text).
    rebuilt = (kept.groupBy("doc")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("ui", "unit"))),
                            lambda s: s["unit"])).alias("text_dedup")))
    return (base.select("doc", "_n_units")
            .join(rebuilt, on="doc", how="left")
            .select(F.col("doc").alias(id_col),
                    F.col("_n_units").alias("n_units"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                     .alias("n_kept"),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup")))


def mixture_weights(docs: DataFrame, group_col: str = "source",
                    weight_col: str | None = None,
                    max_repeat: float = 4.0) -> DataFrame:
    """Per-group SAMPLING WEIGHTS that reshape the corpus toward a
    target mixture — the static data-mixing step every multi-source
    training pipeline runs before sampling (uniform-target reweighting;
    a DoReMi-style learned target plugs into ``weight_col``).

    ``weight_col=None`` targets the UNIFORM mixture over groups: weight
    = target_share / actual_share = total / (n_groups · n_g).  A column
    name instead supplies per-row target masses (summed per group and
    normalized).  ``max_repeat`` caps the weight (an over-sampled small
    source repeats at most this many epochs — the standard repeat-cap);
    renormalization after capping is the sampler's job, so the cap is
    visible, not hidden.

    Single divisions over exact integer counts → IEEE-identical on any
    engine.  Output: ``(group, n_docs, actual_share, weight,
    capped_weight)``, one row per group — a broadcast-sized frame the
    sampler joins back onto the corpus.

    Scale shape: one map-side-combined hash agg over the corpus + a
    broadcast of the (tiny) per-group frame; nothing else."""
    cnt = docs.groupBy(F.col(group_col).alias("grp")) \
        .agg(F.count(F.lit(1)).alias("n_docs"))
    if weight_col is None:
        tgt = cnt.select("grp", F.lit(1.0).alias("_mass"))
    else:
        tgt = (docs.groupBy(F.col(group_col).alias("grp"))
               .agg(F.sum(weight_col).cast("double").alias("_mass")))
    tot = cnt.agg(F.sum("n_docs").cast("long").alias("_total"),
                  F.count(F.lit(1)).cast("long").alias("_n_groups"))
    mtot = tgt.agg(F.sum("_mass").cast("double").alias("_mtot"))
    j = (cnt.join(tgt, on="grp")
         .crossJoin(F.broadcast(tot))
         .crossJoin(F.broadcast(mtot)))
    actual = F.col("n_docs") / F.col("_total")
    target = F.col("_mass") / F.col("_mtot")
    weight = target / actual
    return j.select(
        F.col("grp").alias(group_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(actual, 6).alias("actual_share"),
        F.round(weight, 6).alias("weight"),
        F.round(F.least(weight, F.lit(float(max_repeat))), 6)
         .alias("capped_weight"))
