"""Text analysis operators (SURVEY.md §7 M4 — beyond-reference scope).

All pure Catalyst expressions over the ``documents`` table: language-ID
(stopword n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and rolling-hash
document fingerprinting.  No Python per row — these run inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "es": ["el", "la", "los", "es"],
    "fr": ["le", "la", "les", "est"],
    "zh": ["的", "是", "了", "在"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count: #single-spaces + 1 on the trimmed text.
    Expressed with length/replace (not regex split) so the same ANSI SQL
    runs identically on any engine — see oracle_sql()."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-word proxy: count of alnum runs + individual punctuation
    marks.  The pattern is RE2-safe (no lookarounds) so the identical regex
    runs on Spark, DuckDB, and Trino — see oracle_sql()."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))) \
        .cast("long")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    return ((F.length(text) - F.length(stripped)) /
            F.greatest(F.length(text), F.lit(1))).cast("double")


def _marker_padded(text: Column) -> Column:
    """Space-doubled, space-padded lowercase text: every word carries its
    own delimiters, so adjacent marker words ("the and") each match a
    ``' word '`` pattern without fighting over the shared space."""
    return F.concat(F.lit(" "),
                    F.replace(F.lower(text), F.lit(" "), F.lit("  ")),
                    F.lit(" "))


def _marker_pattern(words: list[str]) -> str:
    """One alternation of literal ``' word '`` patterns per language — a
    single regex scan instead of a length/replace chain per word.  Plain
    literals (no regex metachars in the marker sets), so Java regex and
    RE2 (DuckDB) count identical non-overlapping matches."""
    return "|".join(f" {w} " for w in words)


def marker_hits(text: Column, words: list[str]) -> Column:
    """Count occurrences of any marker word, space-delimited."""
    return _hits(_marker_padded(text), words)


def _hits(padded: Column, words: list[str]) -> Column:
    return F.regexp_count(padded, F.lit(_marker_pattern(words))).cast("long")


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-hit counts; 'und' if none.

    One regexp_count per language over a shared padded projection — 5
    regex scans per row total (was 20 length/replace chains, each
    allocating the full string)."""
    padded = _marker_padded(text)
    best = F.lit("und")
    best_n = F.lit(0).cast("long")
    for code, words in LANG_MARKERS.items():
        n = _hits(padded, words)
        cond = n > best_n
        best = F.when(cond, F.lit(code)).otherwise(best)
        best_n = F.when(cond, n).otherwise(best_n)
    return best


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punct + stopword presence.
    Mirrors the shape of C4/Gopher-style filters (public recipes)."""
    n = F.length(text)
    len_score = F.when((n >= 100) & (n <= 20000), F.lit(1.0)) \
                 .when(n >= 20, F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(marker_hits(text, LANG_MARKERS["en"]) > 0, F.lit(1.0)) \
               .otherwise(F.lit(0.5))
    return ((len_score + punct_ok + stop_ok) / F.lit(3.0)).cast("double")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint — stable across engines.

    md5 of the whitespace-normalized lowercase text: the cross-engine
    analogue of a rolling content hash (md5 is available verbatim in
    Spark, DuckDB, Trino, ...)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document feature frame used by the quality/stat queries."""
    t = F.col(text_col)
    return docs.select(
        "*",
        F.length(t).alias("n_len"),
        token_count(t).alias("n_tokens"),
        punct_ratio(t).alias("r_punct"),
        quality_score(t).alias("q_score"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


def normalize_words(text: Column) -> Column:
    """Word array of the whitespace-normalized lowercase text (shared by
    tf-idf and chunking; same normalization as dedup.normalize_text)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(norm, " "))


def tfidf_top_terms(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by a tf-idf-style score.

    Score = ``tf × N / df`` — the RATIONAL idf variant (no logarithm):
    one integer product and one IEEE-754 division, so Spark and any SQL
    oracle produce bit-identical doubles (``ln`` is not guaranteed
    correctly rounded across engines, which would poison hash equality;
    within a document the ranking differs from log-idf only in how hard
    rare terms are boosted).

    Plan shape (100 TB): explode → (doc, term) hash-agg (map-side
    combined) → term-level df agg → broadcast-sized join back + window
    top-k per doc.  Ties break on term text for determinism.
    """
    words = docs.select(F.col(id_col).alias("doc"),
                        F.explode(normalize_words(F.col(text_col)))
                         .alias("term")).where(F.col("term") != "")
    tf = words.groupBy("doc", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("n_docs"))
    from pyspark.sql import Window
    scored = (tf.join(df_, on="term").crossJoin(F.broadcast(n_docs))
              .select("doc", "term", "tf", "df",
                      (F.col("tf") * F.col("n_docs") / F.col("df"))
                      .cast("double").alias("score")))
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("doc").alias(id_col), "term", "tf", "df",
                    "score", F.col("rank").cast("int").alias("rank")))


def chunk_documents(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_words: int = 64,
                    stride: int = 48,
                    carry_cols: list[str] | None = None) -> DataFrame:
    """Split documents into fixed-size overlapping word-window chunks
    (the standard pre-embedding segmentation for long documents):
    windows of ``chunk_words`` words starting every ``stride`` words
    (overlap = chunk_words − stride).

    Pure Catalyst: sequence → explode → slice → concat_ws, no Python.
    Chunks fan out as rows, so downstream embedding/indexing parallelism
    scales with chunks, not documents.  Trailing windows shorter than
    ``stride`` would duplicate the previous chunk's tail, so start
    positions run while ``start < n_words`` only; empty docs yield no
    chunks.

    ``carry_cols``: document columns to carry onto every chunk row
    (language, source, quality score …) — they ride the explode for
    free, where re-joining them back on ``id_col`` afterwards would cost
    an extra shuffle of the (larger) chunk set.
    """
    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")
    carry = list(carry_cols or [])
    n = F.size(F.col("_words"))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                        F.lit(stride))
    chunk = F.slice("_words", F.col("chunk_start") + 1, chunk_words)
    return (docs.select(F.col(id_col), *carry,
                        normalize_words(F.col(text_col)).alias("_words"))
            .select(F.col(id_col), *carry, "_words",
                    F.explode(starts).alias("chunk_start"))
            .where((F.col("chunk_start") < n) & (n > 0))
            .select(F.col(id_col), *carry,
                    (F.col("chunk_start") / stride).cast("int")
                    .alias("chunk_idx"),
                    F.col("chunk_start").cast("int").alias("chunk_start"),
                    F.size(chunk).cast("int").alias("n_words"),
                    F.concat_ws(" ", chunk).alias("chunk_text")))


def bpe_merge_counts(docs: DataFrame, text_col: str = "text",
                     k: int = 20) -> DataFrame:
    """One BPE merge iteration at corpus scale: the top-``k`` adjacent
    CHARACTER pairs by corpus frequency — the statistic a tokenizer
    trainer computes per merge round (Sennrich et al. 2016).

    The classic scale trick is applied: pair counting runs over the
    DISTINCT word × frequency table, not the raw token stream — the
    corpus collapses to its vocabulary FIRST (one hash agg over words,
    output |vocab| rows), then the per-word character pairs explode
    from vocabulary rows only and re-aggregate weighted by word
    frequency.  100 TB of text with a 10M-word vocabulary explodes 10M
    rows, not 10T.  Final top-k is a TakeOrdered (no global sort);
    ties break lexicographically.

    Output: ``(pair STRING, n BIGINT)`` — count of occurrences of the
    two-character sequence across the corpus, weighted by word
    frequency, top-k by (n DESC, pair ASC).
    """
    words = (docs
             .select(F.explode_outer(
                 normalize_words(F.col(text_col))).alias("w"))
             .where(F.col("w").isNotNull() & (F.col("w") != ""))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    pairs = words.select(
        "freq",
        F.explode_outer(F.expr(
            "transform(sequence(1, greatest(length(w) - 1, 1)),"
            " i -> substring(w, i, 2))")).alias("pair"))
    return (pairs
            .where(F.length("pair") == 2)
            .groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(k))


def bigram_familiarity(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Language-model-style quality score WITHOUT a trained model: for
    each document, the mean conditional frequency of its word bigrams
    against corpus statistics — ``mean over bigrams of
    C(w1 w2) / C(w1)`` — the shape of the CCNet/perplexity filter with
    the corpus itself as the model.  Degenerate/boilerplate text scores
    near 1 (its bigrams are always seen), unusual text scores low.

    Rational arithmetic only (no ln — not correctly rounded across
    engines), and no float SUM either: each ratio is scaled to an
    INTEGER ``(c_bg · 10⁹) div c_w1`` (floor division — exact in both
    engines; a decimal cast of the double ratio would hit
    rounding-mode half-cases for dyadic counts like c_w1 = 2¹³), so
    the per-doc sum is exact integer arithmetic and the final mean is
    one deterministic IEEE division.  The 10⁻⁹ truncation bounds the
    scale headroom: c_bg must stay below ~9·10⁹ (fine — a bigram that
    common is a stopword pair).

    Plan shape: bigram explode → corpus bigram hash agg + unigram hash
    agg (both map-side combined, vocab-sized outputs) → two equi-joins
    of the doc bigram stream against the stat tables → per-doc agg.
    Output: ``(id_col, n_bigrams BIGINT, familiarity DOUBLE)``; docs
    with fewer than 2 words emit nothing.
    """
    bg = (docs
          .select(F.col(id_col).alias("doc"),
                  F.explode_outer(_word_bigrams(F.col(text_col)))
                   .alias("bigram"))
          .where(F.col("bigram").isNotNull()))
    bg = bg.withColumn("w1", F.split("bigram", " ")[0])
    bigram_counts = bg.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("c_bg"))
    unigram_counts = (docs
                      .select(F.explode_outer(
                          normalize_words(F.col(text_col))).alias("w1"))
                      .where(F.col("w1").isNotNull() & (F.col("w1") != ""))
                      .groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1")))
    scored = (bg.join(bigram_counts, on="bigram")
              .join(unigram_counts, on="w1")
              .select("doc",
                      F.expr("(c_bg * 1000000000L) div c_w1").alias("r")))
    return (scored.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 (F.sum("r") / (F.count(F.lit(1) ) * F.lit(1000000000.0)))
                 .alias("familiarity"))
            .select(F.col("doc").alias(id_col), "n_bigrams",
                    "familiarity"))


def _word_bigrams(text: Column) -> Column:
    """Word-bigram array of normalized text; single-word docs yield an
    empty array (NOT a padded short gram — a conditional-frequency
    score needs true bigrams only)."""
    words = normalize_words(text)
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    return F.when(n >= 2, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)))) \
        .otherwise(F.array().cast("array<string>"))


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_postings: int = 20) -> DataFrame:
    """Term → posting-list index build (the retrieval-side companion of
    a corpus pipeline): for every term, its document frequency and the
    first ``max_postings`` doc ids in ascending order.

    One explode of per-doc DISTINCT terms (array_distinct is per-row,
    no pre-shuffle) and ONE hash agg: df as a count, the capped posting
    list via sort_array(collect_list(...)) sliced to ``max_postings`` —
    the cap bounds both shuffle payload and output row width, which is
    what makes the build safe for stopword-like terms whose full
    posting lists would be |corpus|-sized.  (collect_list is bounded
    here ONLY by the cap applied after sorting; a production build for
    uncapped lists would write postings as rows, not arrays.)

    Output: ``(term STRING, df BIGINT, postings ARRAY<BIGINT>)``.
    """
    toks = (docs
            .select(F.col(id_col).alias("doc"),
                    F.explode_outer(F.array_distinct(
                        normalize_words(F.col(text_col)))).alias("term"))
            .where(F.col("term").isNotNull() & (F.col("term") != "")))
    return (toks.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.slice(F.sort_array(F.collect_list(
                     F.col("doc").cast("long"))), 1, max_postings)
                 .alias("postings")))


def bm25_topk(docs: DataFrame, queries: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 5,
              k1: float = 1.2, b: float = 0.75,
              qid_col: str = "qid", qterm_col: str = "term") -> DataFrame:
    """BM25 ranked retrieval: top-``k`` documents per query.

    ``queries``: a small DataFrame with one row per query term — columns
    ``qid_col`` (query id) and ``qterm_col`` (lower-cased term); query
    sets are config-sized: broadcast.  Output:
    ``(qid, doc_id, rank, score)``.

    Scoring follows Robertson/Sparck-Jones BM25 with the RATIONAL idf
    ``(N - df + 0.5) / (df + 0.5)`` instead of its logarithm — the same
    cross-engine-exactness call as ``tfidf_top_terms`` (ln is not
    correctly rounded across engines).  Note the rational form is
    order-preserving per TERM (for df < N/2) but the summed multi-term
    score is NOT ranking-equivalent to log-idf BM25 — rankings can
    differ from the textbook formula by design; what this buys is a
    bit-replayable cross-engine score.  The per-(query, doc) term-score
    sum folds in SORTED term
    order over a collected array, NOT via ``F.sum`` — float addition is
    order-dependent, and a fixed fold order is what lets any engine
    replay the exact double.

    Plan shape (100 TB): corpus side is the (doc, term) tf table —
    filtered by the BROADCAST query-term join BEFORE anything else, so
    only postings of query terms ever shuffle; dl/avgdl/df stats are
    one hash agg each; the final top-k is a per-qid window over the
    scored candidates (|queries| × bounded postings).
    """
    words = docs.select(F.col(id_col).alias("doc"),
                        F.explode(normalize_words(F.col(text_col)))
                         .alias("term")).where(F.col("term") != "")
    tf = words.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = words.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(F.countDistinct(F.col(id_col)).alias("n_docs")) \
                .crossJoin(dl.agg(F.avg("dl").alias("avgdl")))

    qterms = queries.select(F.col(qid_col).alias("qid"),
                            F.col(qterm_col).alias("term")).distinct()
    cand = (tf.join(F.broadcast(qterms), on="term")
              .join(dft, on="term")
              .join(dl, on="doc")
              .crossJoin(F.broadcast(stats)))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) \
        / (F.col("df") + F.lit(0.5))
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) \
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
           + F.lit(b) * F.col("dl") / F.col("avgdl")))
    scored = cand.select("qid", "doc", "term",
                         (idf * tf_part).cast("double").alias("s"))
    total = (scored.groupBy("qid", "doc")
             .agg(F.aggregate(
                 F.array_sort(F.collect_list(F.struct("term", "s"))),
                 F.lit(0.0), lambda acc, x: acc + x["s"]).alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(),
                                          F.col("doc").asc())
    return (total.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", F.col("doc").alias(id_col),
                    F.col("rank").cast("int").alias("rank"),
                    F.round(F.col("score"), 6).alias("score")))


def vocab_coverage(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   vocab_size: int = 512) -> DataFrame:
    """Tokenizer-vocabulary coverage per document: build the corpus
    top-``vocab_size`` term vocabulary (by total frequency,
    deterministic term-asc tiebreak), then measure each document's
    out-of-vocabulary token share — the standard pre-tokenizer health
    check for a training corpus (a doc whose tokens mostly miss the
    vocab will shatter into bytes/unknowns downstream).

    Output: ``(doc_id, n_tokens BIGINT, n_oov BIGINT, oov_ppm BIGINT)``
    — the OOV share in parts-per-million via FLOOR of an IEEE division
    (exact-integer cross-engine; a rounded double ratio can straddle
    half-boundaries between engines).  Token-less docs keep NULL ppm.

    Scale shape: one explode + hash agg for term counts, the vocab
    top-k is a single global TakeOrdered (vocab_size rows) broadcast
    back to the token stream — the corpus-size side never sorts and the
    coverage join streams map-side.  Two passes over the token stream
    (vocab build, coverage), both shuffle-light hash aggs.
    """
    words_all = docs.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(normalize_words(F.col(text_col))).alias("term"))
    words = words_all.where(F.col("term").isNotNull() & (F.col("term") != ""))
    vocab = (words.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.col("n").desc(), F.col("term").asc())
             .limit(vocab_size)
             .select("term", F.lit(True).alias("_inv")))
    cov = (words.join(F.broadcast(vocab), on="term", how="left")
           .groupBy("doc")
           .agg(F.count(F.lit(1)).alias("_nt"),
                F.sum(F.when(F.col("_inv").isNull(), 1)
                      .otherwise(0)).alias("_no")))
    return (docs.select(F.col(id_col).alias("doc"))
            .join(cov, on="doc", how="left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce(F.col("_nt"), F.lit(0)).cast("long")
                     .alias("n_tokens"),
                    F.coalesce(F.col("_no"), F.lit(0)).cast("long")
                     .alias("n_oov"),
                    F.floor(F.col("_no") * F.lit(1_000_000.0)
                            / F.col("_nt")).cast("long").alias("oov_ppm")))


#: the toy FIXED tokenizer shared by bpe_apply's default and the
#: q_bpe_encode oracle (a tokenizer is CONFIG, not data — merges ship
#: with the model exactly like a PQ codebook ships with the index)
BPE_MERGES_EN = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("an", "d"), ("t", "o"), ("in", "g"), ("e", "s"), ("o", "f"),
    ("i", "s"),
]

#: token delimiter for the merge passes — U+001F (unit separator),
#: outside any normalized corpus alphabet; '|' or space would collide
#: with corpus characters and let a merge match across token boundaries
_BPE_SEP = "\x1f"


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]] | None = None,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply a FIXED, trained BPE merge table to every document — the
    "tokenize 100 TB with the model's tokenizer" pipeline stage — as a
    chain of codegen'd string replaces, no Python in the hot path.

    Construction: whitespace-normalized lowercase text, spaces mapped
    to ``_`` (the word-boundary marker), split into delimiter-separated
    characters (``\\x1f`` — outside the corpus alphabet, so a merge can
    never match across token boundaries), then ONE ``replace`` pass per
    merge rule in priority order: ``<SEP>a<SEP>b<SEP> → <SEP>ab<SEP>``.
    Plain leftmost non-overlapping replacement reproduces BPE's
    greedy-leftmost pairing for repeated tokens (``l l l`` → ``ll l``);
    the deliberate, documented simplification vs canonical BPE is one
    pass per rule instead of rescan-until-fixed-point — deterministic,
    and bit-identical in any engine with ``replace()``, which is what
    makes the whole tokenizer oracle-replayable.

    Output: ``(id_col, n_chars BIGINT, n_bpe_tokens BIGINT,
    compression DOUBLE)`` — compression = chars per token, rounded 6.

    Plan shape (100 TB): a per-row expression chain (len(merges) + 3
    string ops) inside whole-stage codegen — embarrassingly parallel,
    zero shuffles before the caller's aggregation.
    """
    if merges is None:
        merges = BPE_MERGES_EN
    S = _BPE_SEP
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                            r"\s+", " ")
    marked = F.replace(norm, F.lit(" "), F.lit("_"))
    s = F.concat(F.lit(S),
                 F.regexp_replace(marked, "(.)", f"$1{S}"))
    for a, b in merges:
        s = F.replace(s, F.lit(f"{S}{a}{S}{b}{S}"),
                      F.lit(f"{S}{a}{b}{S}"))
    n_delims = F.length(s) - F.length(F.replace(s, F.lit(S), F.lit("")))
    n_chars = F.length(marked).cast("long")
    n_tok = (F.when(n_chars == 0, F.lit(0))
             .otherwise(n_delims - 1).cast("long"))
    return docs.select(
        F.col(id_col), n_chars.alias("n_chars"),
        n_tok.alias("n_bpe_tokens"),
        F.when(n_tok == 0, F.lit(None).cast("double"))
         .otherwise(F.round(n_chars.cast("double") / n_tok, 6))
         .alias("compression"))


def bpe_oracle_sql(merges: list[tuple[str, str]] | None = None) -> str:
    """The DuckDB replay of :func:`bpe_apply` over ``documents`` —
    generated from the SAME merge table so the two engines cannot
    drift."""
    if merges is None:
        merges = BPE_MERGES_EN
    s = ("chr(31) || regexp_replace(replace(regexp_replace(lower(trim(text)),"
         " '\\s+', ' ', 'g'), ' ', '_'), '(.)', '\\1' || chr(31), 'g')")
    for a, b in merges:
        pat = f"chr(31) || '{a}' || chr(31) || '{b}' || chr(31)"
        rep = f"chr(31) || '{a}{b}' || chr(31)"
        s = f"replace({s}, {pat}, {rep})"
    marked = ("replace(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),"
              " ' ', '_')")
    return f"""
WITH b AS (
  SELECT doc_id,
         CAST(length({marked}) AS BIGINT) AS n_chars,
         CAST(length({s}) - length(replace({s}, chr(31), ''))
              AS BIGINT) AS n_delims
  FROM documents)
SELECT doc_id, n_chars,
       CAST(CASE WHEN n_chars = 0 THEN 0 ELSE n_delims - 1 END
            AS BIGINT) AS n_bpe_tokens,
       CASE WHEN n_chars = 0 THEN NULL
            ELSE round(CAST(n_chars AS DOUBLE)
                       / (n_delims - 1), 6) END AS compression
FROM b
"""
