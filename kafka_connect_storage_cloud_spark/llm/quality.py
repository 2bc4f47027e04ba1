"""Text-analysis operators: language ID, quality scoring, token counting,
winnowing fingerprints. All JVM-side expressions (no Python UDFs) with DuckDB
oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

# Small per-language stopword lists (public common words). The heuristic is
# argmax of stopword hit-rate; deterministic alphabetic tiebreak.
STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "que"),
    "zh": ("de", "le", "shi", "bu", "zai", "you", "he", "wo"),
}

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"
FINGERPRINT_GRAM = 5
FINGERPRINT_WINDOW = 8
# Karp-Rabin gram hash: Σ code(c_j)·FP_BASE^(G-1-j) mod FP_MOD. Identical
# integer arithmetic in Spark (ascii) and DuckDB (unicode); max term
# 257^4 · 0x10FFFF ≈ 4.9e15, sum of 5 well inside int64.
FP_BASE = 257
FP_MOD = 2147483647


def _word_count() -> Column:
    return F.size(F.split(F.lower(F.col("text")), r"\s+"))


def _stop_hits(lang: str) -> Column:
    """Count of tokens that are stopwords of `lang` (array_intersect-free:
    size(filter(ws, w -> w IN (...))) keeps duplicates counted)."""
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(split(lower(text), '\\\\s+'), w -> w IN ({quoted})))")


def _ws_stop_hits(lang: str) -> Column:
    """_stop_hits over a pre-split `ws` array column. Splitting once and
    referencing the column keeps the analyzed tree small: embedding
    split(lower(text)) inside every per-language expression made Catalyst
    analysis (driver-side) dominate wall time on small inputs."""
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(ws, w -> w IN ({quoted})))")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit-rate language ID with deterministic tiebreak. Pure
    expression pipeline — two stacked projections, zero shuffle (no output
    sort: at corpus scale a global sort of per-doc scores is wasted work,
    and the oracle compare is order-insensitive)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = docs.select("doc_id", F.split(F.lower("text"), r"\s+").alias("ws"))
    wc = F.greatest(F.size("ws"), F.lit(1))
    scored = ws.select(
        "doc_id",
        *[H.round6(_ws_stop_hits(lang) / wc).alias(f"score_{lang}") for lang in sorted(STOPWORDS)],
    )
    # argmax with alphabetic tiebreak: best = max (score, reversed-lang) pair
    best = F.greatest(
        *[
            F.struct(F.col(f"score_{lang}").alias("s"), F.lit(-i).alias("ord"), F.lit(lang).alias("lang"))
            for i, lang in enumerate(sorted(STOPWORDS))
        ]
    )
    return scored.withColumn("detected_lang", best["lang"])


def _sql_stop_hits(lang: str) -> str:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ({quoted})))"


def _sql_lang_id() -> str:
    score_cols = ",\n  ".join(
        f"(floor(CAST({_sql_stop_hits(lang)} AS DOUBLE) / GREATEST(len(string_split_regex(lower(text), '\\s+')), 1) * 1000000.0 + 0.5) / 1000000.0) AS score_{lang}"
        for lang in sorted(STOPWORDS)
    )
    # mirror Spark's greatest(struct(s, -i, lang)) argmax: max score wins,
    # earliest-alphabetical lang wins ties
    langs = sorted(STOPWORDS)
    unpivot = "\nUNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, score_{lang} AS s FROM scored" for lang in langs
    )
    return f"""
WITH scored AS (SELECT doc_id, {score_cols} FROM documents),
scores AS ({unpivot}),
best AS (
  SELECT doc_id, lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn FROM scores
  ) WHERE rn = 1
)
SELECT scored.*, best.lang AS detected_lang
FROM scored JOIN best USING (doc_id) ORDER BY doc_id
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval audit: confusion matrix of detected language vs the
    labeled `lang` column, with each cell's share of its label row. The
    detector output joins labels on doc_id (co-partitioned corpus join);
    the matrix itself is |langs|² rows and the per-label totals broadcast."""
    detected = lang_id(spark, sf_dir).select("doc_id", "detected_lang")
    labels = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = labels.join(detected, "doc_id")
    cells = joined.groupBy("lang", "detected_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = joined.groupBy("lang").agg(F.count(F.lit(1)).alias("label_total"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "detected_lang",
            "n_docs",
            H.round6(F.col("n_docs") / F.col("label_total")).alias("share_of_label"),
        )
        .orderBy("lang", "detected_lang")
    )


def _sql_lang_id_confusion() -> str:
    return f"""
WITH det AS ({_sql_lang_id().replace('ORDER BY doc_id', '')}),
joined AS (
  SELECT d.lang, det.detected_lang FROM documents d JOIN det ON d.doc_id = det.doc_id
),
cells AS (SELECT lang, detected_lang, COUNT(*) AS n_docs FROM joined GROUP BY 1, 2),
totals AS (SELECT lang, COUNT(*) AS label_total FROM joined GROUP BY 1)
SELECT c.lang, c.detected_lang, c.n_docs,
       {H.sql_round6("c.n_docs / CAST(t.label_total AS DOUBLE)")} AS share_of_label
FROM cells c JOIN totals t ON c.lang = t.lang
ORDER BY c.lang, c.detected_lang
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation, English
    stopword density, mean word length band, alpha ratio."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    # one projection computes lower(text)/split once; the scoring projection
    # references the small columns — same values, far smaller analyzed tree
    base = docs.select(
        "doc_id",
        "n_chars",
        F.split(F.lower("text"), r"\s+").alias("ws"),
        F.length(F.regexp_replace(F.lower(F.col("text")), r"\s+", "")).alias("n_nonspace"),
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_text"),
    )
    wc = F.greatest(F.size("ws"), F.lit(1))
    stop_ratio = _ws_stop_hits("en") / wc
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    mean_wlen = F.col("n_nonspace") / wc
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 8), F.lit(1.0)).otherwise(F.lit(0.5))
    alpha_ratio = F.col("n_alpha") / F.greatest(F.col("n_text"), F.lit(1))
    score = H.round6(
        0.3 * len_score + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)) + 0.2 * wlen_score + 0.2 * alpha_ratio
    )
    return base.select(
        "doc_id",
        H.round6(len_score).alias("len_score"),
        H.round6(stop_ratio).alias("stop_ratio"),
        H.round6(alpha_ratio).alias("alpha_ratio"),
        score.alias("quality"),
    )


_SQL_WC = "GREATEST(len(string_split_regex(lower(text), '\\s+')), 1)"

_SQL_QUALITY_EXPR = (
    "0.3 * LEAST(n_chars / 500.0, 1.0)"
    f" + 0.3 * LEAST(CAST({_sql_stop_hits('en')} AS DOUBLE) / {_SQL_WC} * 5, 1.0)"
    " + 0.2 * (CASE WHEN CAST(len(regexp_replace(lower(text), '\\s+', '', 'g')) AS DOUBLE) / "
    f"{_SQL_WC} BETWEEN 3 AND 8 THEN 1.0 ELSE 0.5 END)"
    # parenthesized (ratio first, then * 0.2) to mirror the Column expr's
    # op order exactly — (0.2*a)/b vs 0.2*(a/b) differ by 1 ULP, observed
    # as a round6 tie flip at sf0.1 (doc 3440)
    " + 0.2 * (CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)"
    " / GREATEST(len(text), 1))"
)

SQL_QUALITY_SCORE = f"""
SELECT doc_id,
  {H.sql_round6("LEAST(n_chars / 500.0, 1.0)")} AS len_score,
  {H.sql_round6(f"CAST({_sql_stop_hits('en')} AS DOUBLE) / {_SQL_WC}")} AS stop_ratio,
  {H.sql_round6("CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / GREATEST(len(text), 1)")} AS alpha_ratio,
  {H.sql_round6(_SQL_QUALITY_EXPR)} AS quality
FROM documents ORDER BY doc_id
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    single punctuation) per document."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        _word_count().alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_REGEX}', 0)")).alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
  len(string_split_regex(lower(text), '\\s+')) AS ws_tokens,
  len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS bpe_tokens,
  len(text) AS n_chars_actual
FROM documents ORDER BY doc_id
"""


def _doc_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fps): each eligible document's distinct winnowing
    fingerprints — the shared builder of doc_fingerprint (compact stats)
    and winnowing_pairs (cross-doc overlap pairs)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # char-code array of lower(text), then g_p = Σ cs[p+j]·B^(G-1-j) mod M
    cs = "transform(sequence(1, greatest(length(text), 1)), i -> ascii(substring(lower(text), i, 1)))"
    poly = " + ".join(
        f"element_at(cs, p + {j}) * {FP_BASE ** (FINGERPRINT_GRAM - 1 - j)}"
        for j in range(FINGERPRINT_GRAM)
    )
    ghs = (
        f"transform(sequence(1, greatest(size(cs) - {FINGERPRINT_GRAM - 1}, 1)), "
        f"p -> CAST(({poly}) % {FP_MOD} AS BIGINT))"
    )
    base = (
        docs.select("doc_id", F.expr(cs).alias("cs"))
        .where(F.size("cs") >= FINGERPRINT_GRAM + FINGERPRINT_WINDOW - 1)
        .select("doc_id", F.expr(ghs).alias("ghs"))
    )
    w = FINGERPRINT_WINDOW
    # least(element_at...) instead of array_min(slice(...)): no per-window
    # array allocation in the lambda, ~2x on the gram-bound constant
    window_min = "least(" + ", ".join(
        f"element_at(ghs, p - {j})" for j in range(w - 1, -1, -1)
    ) + ")"
    fps = f"array_distinct(transform(sequence({w}, size(ghs)), p -> {window_min}))"
    return base.select("doc_id", F.expr(fps).alias("fps"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al.): hash every char
    FINGERPRINT_GRAM-gram, take the min hash of each sliding window of
    FINGERPRINT_WINDOW grams, dedupe. Output per doc: fingerprint count and
    min/max for compactness.

    A document's fingerprints depend only on its own text, so the whole op
    is ONE narrow projection over per-row arrays (transform + element_at +
    array_distinct) — no gram explode, no per-doc sort window, no shuffle.
    The exploded form sorted |corpus|·|chars| rows; this form is why the op
    stays linear at 100 TB. Gram hashes are a Karp-Rabin polynomial over
    char codes (the winnowing paper's rolling hash) — pure integer math,
    ~10x cheaper than a cryptographic hash per gram and portable to the
    oracle via identical arithmetic (char codes from ascii()/unicode()).
    Docs with fewer than FINGERPRINT_WINDOW grams have no full window and
    drop out (same as the windowed form's pos >= W-1 filter and the
    oracle's GROUP BY)."""
    return _doc_fps(spark, sf_dir).select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


_SQL_FP_POLY = " + ".join(
    f"cs[p + {j}] * {FP_BASE ** (FINGERPRINT_GRAM - 1 - j)}" for j in range(FINGERPRINT_GRAM)
)
_SQL_FP_WINMIN = "least(" + ", ".join(
    f"ghs[p - {j}]" for j in range(FINGERPRINT_WINDOW - 1, -1, -1)
) + ")"

SQL_DOC_FINGERPRINT = f"""
WITH base AS (
  SELECT doc_id,
         [unicode(substr(lower(text), CAST(i AS INT), 1))
          for i in generate_series(1, GREATEST(len(text), 1))] AS cs
  FROM documents
),
eligible AS (
  SELECT * FROM base
  WHERE len(cs) >= {FINGERPRINT_GRAM + FINGERPRINT_WINDOW - 1}
),
ghs_t AS (
  SELECT doc_id,
         [CAST(({_SQL_FP_POLY}) % {FP_MOD} AS BIGINT)
          for p in generate_series(1, len(cs) - {FINGERPRINT_GRAM - 1})] AS ghs
  FROM eligible
),
fps_t AS (
  SELECT doc_id,
         list_distinct([{_SQL_FP_WINMIN}
                        for p in generate_series({FINGERPRINT_WINDOW}, len(ghs))]) AS fps
  FROM ghs_t
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM fps_t
"""

REP_N = 2
REP_FLAG = 0.1  # r3: was 0.2 — vacuous on this corpus (max dup_fraction
# 0.182 across all SFs, so `flagged` never fired and quality_filter's
# "repetitive;" reason was dead). 0.1 sits between p99 and the max at
# every SF: 8/500 (sf0.001), 9/500 (sf0.01), 39/5000 (sf0.1) flagged —
# the filter demonstrably filters, still rare enough to be an outlier
# screen.


def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filter: the fraction of word
    n-grams that are duplicates of an earlier occurrence, plus the share of
    the single most frequent n-gram. One explode + one groupBy per doc (the
    grams of a doc are co-located, so the shuffle carries 1 row/doc)."""
    from ..functions import text as T

    # a doc's grams are its own: every statistic is a per-row reduction
    # over the gram array — zero shuffle, zero join (the same explode
    # elimination that cut minhash 40%). Sorting the array turns the
    # top-gram count into a max run length.
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("ws", T.words())
        .withColumn("s", F.array_sort(T.shingles_from_ws(REP_N)))
    )
    top_c = F.when(
        F.size("s") >= 2,
        F.expr(
            "aggregate(sequence(1, size(s) - 1),"
            " named_struct('cur', CAST(1 AS BIGINT), 'best', CAST(1 AS BIGINT)),"
            " (acc, i) -> IF(element_at(s, i + 1) = element_at(s, i),"
            "   named_struct('cur', acc.cur + 1, 'best', greatest(acc.best, acc.cur + 1)),"
            "   named_struct('cur', CAST(1 AS BIGINT), 'best', acc.best)),"
            " acc -> acc.best)"
        ),
    ).otherwise(F.lit(1))
    per_doc = docs.select(
        "doc_id",
        F.size("s").cast("long").alias("n_grams"),
        F.size(F.array_distinct("s")).cast("long").alias("d_grams"),
        top_c.alias("top_c"),
    )
    rep = H.round6(1 - F.col("d_grams") / F.col("n_grams"))
    return (
        per_doc
        .select(
            "doc_id",
            "n_grams",
            "d_grams",
            rep.alias("dup_fraction"),
            H.round6(F.col("top_c") / F.col("n_grams")).alias("top_gram_share"),
            (1 - F.col("d_grams") / F.col("n_grams") > REP_FLAG).alias("flagged"),
        )
    )


def _sql_repetition() -> str:
    from ..functions import text as T

    return f"""
WITH grams AS ({T.sql_shingles(REP_N)}),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT shingle) AS d_grams
  FROM grams GROUP BY doc_id
),
tops AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, shingle, COUNT(*) AS c FROM grams GROUP BY doc_id, shingle
  ) GROUP BY doc_id
)
SELECT p.doc_id, p.n_grams, p.d_grams,
       (floor((1 - CAST(d_grams AS DOUBLE) / n_grams) * 1000000.0 + 0.5) / 1000000.0) AS dup_fraction,
       (floor(CAST(top_c AS DOUBLE) / n_grams * 1000000.0 + 0.5) / 1000000.0) AS top_gram_share,
       (1 - CAST(d_grams AS DOUBLE) / n_grams) > {REP_FLAG} AS flagged
FROM per_doc p JOIN tops t ON p.doc_id = t.doc_id
ORDER BY p.doc_id
"""


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish regex tokens per
    whitespace word (the standard sub-word blow-up metric a tokenizer eval
    reports per language before committing a vocab). High-fertility
    languages burn budget in tokens_per_source_budget-style plans — this
    is the table that feeds that correction.

    One zero-shuffle projection (both tokenizations are per-row regex
    reductions, same expressions as token_count) then a
    map-side-combined groupBy onto |langs| keys."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    per_doc = docs.select(
        "lang",
        _word_count().cast("long").alias("ws"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_REGEX}', 0)"))
        .cast("long")
        .alias("bpe"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_total"),
            F.sum("bpe").alias("bpe_total"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_total",
            "bpe_total",
            H.round6(F.col("bpe_total") / F.col("ws_total").cast("double")).alias("fertility"),
        )
        .orderBy("lang")
    )


SQL_TOKENIZER_FERTILITY = f"""
WITH per_doc AS (
  SELECT lang,
         len(string_split_regex(lower(text), '\\s+')) AS ws,
         len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS bpe
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_total,
       CAST(SUM(bpe) AS BIGINT) AS bpe_total,
       {H.sql_round6("CAST(SUM(bpe) AS DOUBLE) / SUM(ws)")} AS fertility
FROM per_doc GROUP BY lang ORDER BY lang
"""


QUALITY_MIN = 0.5


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual keep/drop decision of a corpus-prep pipeline: compose
    quality scoring, repetition flagging, and language-ID agreement into one
    verdict per document with machine-readable reasons.

    All three inputs are pure per-row reductions over the same document, so
    the whole verdict fuses into ONE corpus scan with ZERO shuffle (r3: the
    repetition input previously ran its own scan and joined back on doc_id —
    a corpus-wide shuffle join of two projections of the same table). The
    repetition flag needs only dup_fraction (size vs array_distinct of the
    shingle array), not the top-gram run length, so no sort is paid here;
    the expressions are byte-identical to quality_score / lang_id /
    repetition_score so the composed oracle still matches value-for-value."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars", "lang")
    return quality_verdict(docs)


def quality_verdict(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """The fused keep/drop verdict as a pure projection over any documents
    frame (doc_id, text, n_chars, lang) — batch AND streaming share this
    exact expression tree (it is stateless per-row, so it runs unmodified
    inside a readStream plan; see streaming.pipeline.corpus_ingest_stream).
    `carry` names extra input columns passed through to the output."""
    from ..functions import text as T
    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        *carry,
        F.split(F.lower("text"), r"\s+").alias("ws"),
        F.length(F.regexp_replace(F.lower(F.col("text")), r"\s+", "")).alias("n_nonspace"),
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_text"),
    ).withColumn("sh", T.shingles_from_ws(REP_N))
    wc = F.greatest(F.size("ws"), F.lit(1))
    stop_ratio = _ws_stop_hits("en") / wc
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    mean_wlen = F.col("n_nonspace") / wc
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 8), F.lit(1.0)).otherwise(F.lit(0.5))
    alpha_ratio = F.col("n_alpha") / F.greatest(F.col("n_text"), F.lit(1))
    quality = H.round6(
        0.3 * len_score + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)) + 0.2 * wlen_score + 0.2 * alpha_ratio
    )
    best = F.greatest(
        *[
            F.struct(
                H.round6(_ws_stop_hits(lang) / wc).alias("s"),
                F.lit(-i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(STOPWORDS))
        ]
    )
    # same dup_fraction > REP_FLAG predicate as repetition_score.flagged
    rep_flagged = (
        1 - F.size(F.array_distinct("sh")) / F.size("sh").cast("double") > REP_FLAG
    )
    q = base.select(
        "doc_id",
        "lang",
        *carry,
        quality.alias("quality"),
        best["lang"].alias("detected_lang"),
        rep_flagged.alias("rep_flagged"),
    )
    reasons = F.concat(
        F.when(F.col("quality") < QUALITY_MIN, F.lit("low_quality;")).otherwise(F.lit("")),
        F.when(F.col("rep_flagged"), F.lit("repetitive;")).otherwise(F.lit("")),
        F.when(F.col("detected_lang") != F.col("lang"), F.lit("lang_mismatch;")).otherwise(
            F.lit("")
        ),
    )
    return (
        q.withColumn("reasons", reasons)
        .select(
            "doc_id",
            "quality",
            "rep_flagged",
            "detected_lang",
            "lang",
            (F.col("reasons") == "").alias("keep"),
            "reasons",
            *carry,
        )
    )


def _sql_quality_filter() -> str:
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({SQL_QUALITY_SCORE})),
r AS (SELECT doc_id, flagged AS rep_flagged FROM ({_sql_repetition()})),
lid AS (SELECT doc_id, detected_lang FROM ({_sql_lang_id()})),
verdict AS (
  SELECT q.doc_id, q.quality, r.rep_flagged, lid.detected_lang, d.lang,
         (CASE WHEN q.quality < {QUALITY_MIN} THEN 'low_quality;' ELSE '' END ||
          CASE WHEN r.rep_flagged THEN 'repetitive;' ELSE '' END ||
          CASE WHEN lid.detected_lang <> d.lang THEN 'lang_mismatch;' ELSE '' END) AS reasons
  FROM q JOIN r ON q.doc_id = r.doc_id
         JOIN lid ON q.doc_id = lid.doc_id
         JOIN documents d ON q.doc_id = d.doc_id
)
SELECT doc_id, quality, rep_flagged, detected_lang, lang,
       reasons = '' AS keep, reasons
FROM verdict ORDER BY doc_id
"""


DIVERSITY_MIN = 0.88  # Gini-Simpson floor: below this a doc is repeat-heavy.
# Sited between the corpus p01 (~0.86 at every SF) and p05 (~0.90) so the
# screen flags the genuine low-diversity tail (~1-2% of docs) at all SFs —
# the vacuous-flag lint (test_oracle_dtypes) pins that it keeps splitting.


def token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity as the Gini-Simpson index over token
    frequencies: 1 - Σ(c_i/N)² — the boilerplate/low-information screen
    that complements repetition_score (repetition catches adjacent n-gram
    runs; this catches a document that is 500 copies of the same 5 words
    in any order). Integer-exact: 1 - Σc²/N² with both sums in int64, one
    double division at the end.

    Zero shuffle: the token counts of a doc are a reduction over its own
    sorted token array (the run-length walk repetition_score uses for its
    top-gram count, extended to accumulate Σ run²), so the whole op is a
    scan of stacked projections."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id", F.array_sort(F.split(F.lower("text"), r"\s+")).alias("s")
    )
    # walk the sorted array: on value change add run² to ss, else extend run
    ss = F.when(
        F.size("s") >= 2,
        F.expr(
            "aggregate(sequence(1, size(s) - 1),"
            " named_struct('cur', CAST(1 AS BIGINT), 'ss', CAST(0 AS BIGINT)),"
            " (acc, i) -> IF(element_at(s, i + 1) = element_at(s, i),"
            "   named_struct('cur', acc.cur + 1, 'ss', acc.ss),"
            "   named_struct('cur', CAST(1 AS BIGINT), 'ss', acc.ss + acc.cur * acc.cur)),"
            " acc -> acc.ss + acc.cur * acc.cur)"
        ),
    ).otherwise(F.lit(1))
    per_doc = base.select(
        "doc_id",
        F.size("s").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("s")).cast("long").alias("distinct_tokens"),
        ss.alias("sum_sq"),
    )
    div = 1 - F.col("sum_sq") / (F.col("n_tokens") * F.col("n_tokens")).cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "distinct_tokens",
        H.round6(div).alias("gini_diversity"),
        (
            1 - F.col("sum_sq") / (F.col("n_tokens") * F.col("n_tokens")).cast("double")
            < DIVERSITY_MIN
        ).alias("flagged_low_diversity"),
    )


SQL_TOKEN_DIVERSITY = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS distinct_tokens,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_tokens, CAST(distinct_tokens AS BIGINT) AS distinct_tokens,
       {H.sql_round6("1 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens)")} AS gini_diversity,
       1 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens) < {DIVERSITY_MIN} AS flagged_low_diversity
FROM per_doc ORDER BY doc_id
"""


ORACLES = {
    "lang_id": _sql_lang_id(),
    "lang_id_confusion": _sql_lang_id_confusion(),
    "quality_score": SQL_QUALITY_SCORE,
    "token_count": SQL_TOKEN_COUNT,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "repetition_score": _sql_repetition(),
    "quality_filter": _sql_quality_filter(),
    "tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "token_diversity": SQL_TOKEN_DIVERSITY,
}


# ---------------------------------------------------------------------------
# gopher_rules_filter — the published Gopher quality heuristics
# ---------------------------------------------------------------------------

# Rae et al. 2021 ("Scaling Language Models: ... Gopher"), Appendix A —
# the standard rule set web-scale text pipelines apply before model-based
# scoring. Thresholds are the paper's.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_DISTINCT = 2
# The paper's stop set is ("the","be","to","of","and","that","have","with");
# we use the engine's EN stopword list (lang_id's STOPWORDS) so the rule is
# exercised on the synthetic vocabulary too — same mechanism, same
# threshold, documented deviation.
GOPHER_STOPSET = STOPWORDS["en"]


def gopher_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule filter: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, alphabetic-word fraction, and distinct-stopword
    presence, each an exact-integer or round6-rounded measure so the
    keep/drop verdict is engine-identical. One scan, zero shuffles —
    pure projection like quality_score."""
    stopset = ", ".join(f"'{w}'" for w in GOPHER_STOPSET)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = docs.withColumn("ws", F.expr("split(lower(text), '\\\\s+')"))
    m = ws.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.expr("aggregate(ws, CAST(0 AS BIGINT), (a, w) -> a + length(w))").alias("_chars"),
        (
            (F.length("text") - F.length(F.regexp_replace("text", "#", "")))
            + (F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))) / F.lit(3)
        ).cast("long").alias("_symbols"),
        F.expr("size(filter(ws, w -> w rlike '[a-z]'))").alias("_alpha_words"),
        F.expr(f"size(array_distinct(filter(ws, w -> w IN ({stopset}))))").alias("n_stop_distinct"),
    )
    mean_wlen = H.round6(F.col("_chars") / F.col("n_words").cast("double"))
    sym_ratio = H.round6(F.col("_symbols") / F.col("n_words").cast("double"))
    alpha_frac = H.round6(F.col("_alpha_words") / F.col("n_words").cast("double"))
    scored = m.select(
        "doc_id",
        "n_words",
        mean_wlen.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        "n_stop_distinct",
    )
    keep = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("n_stop_distinct") >= GOPHER_MIN_STOP_DISTINCT)
    )
    return scored.withColumn("keep", keep)


SQL_WORDS_Q = "string_split_regex(lower(text), '\\s+')"


def _sql_gopher() -> str:
    stopset = ", ".join(f"'{w}'" for w in GOPHER_STOPSET)
    return f"""
WITH ws AS (SELECT doc_id, text, {SQL_WORDS_Q} AS ws FROM documents),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS _chars,
         CAST((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS _symbols,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS _alpha_words,
         len(list_distinct(list_filter(ws, w -> w IN ({stopset})))) AS n_stop_distinct
  FROM ws
)
SELECT doc_id, n_words,
       {H.sql_round6("CAST(_chars AS DOUBLE) / n_words")} AS mean_word_len,
       {H.sql_round6("CAST(_symbols AS DOUBLE) / n_words")} AS symbol_ratio,
       {H.sql_round6("CAST(_alpha_words AS DOUBLE) / n_words")} AS alpha_frac,
       CAST(n_stop_distinct AS INT) AS n_stop_distinct,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
       AND ({H.sql_round6("CAST(_chars AS DOUBLE) / n_words")} BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN})
       AND ({H.sql_round6("CAST(_symbols AS DOUBLE) / n_words")} <= {GOPHER_MAX_SYMBOL_RATIO})
       AND ({H.sql_round6("CAST(_alpha_words AS DOUBLE) / n_words")} >= {GOPHER_MIN_ALPHA_FRAC})
       AND (n_stop_distinct >= {GOPHER_MIN_STOP_DISTINCT}) AS keep
FROM m ORDER BY doc_id
"""


ORACLES["gopher_rules_filter"] = _sql_gopher()


YIELD_THRESHOLDS = tuple(round(0.1 * i, 1) for i in range(1, 10))


def quality_threshold_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep yield curve: for each candidate quality bar t, the
    document and whitespace-token volume surviving `quality >= t` — the
    curve read to pick the quality threshold that fits a token budget
    (quality_dup_profile shows where the corpus sits; this shows what each
    cut would cost). Composition of the shared quality_score scan with a
    9-literal explode; every doc lands in every threshold group, so totals
    are in-group aggregates — one scan, one small shuffle, no cross join."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = quality_score(spark, sf_dir).select("doc_id", "quality").join(
        docs.select(
            "doc_id", F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("ws_tokens")
        ),
        "doc_id",
    )
    exploded = base.withColumn(
        "threshold",
        F.explode(F.array(*[F.lit(float(t)) for t in YIELD_THRESHOLDS])),
    )
    kept = F.col("quality") >= F.col("threshold")
    return (
        exploded.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum("ws_tokens").alias("tokens_total"),
            F.sum(F.when(kept, F.col("ws_tokens")).otherwise(F.lit(0))).alias("tokens_kept"),
        )
        .select(
            "threshold",
            "n_docs",
            "n_kept",
            "tokens_total",
            "tokens_kept",
            H.round6(F.col("n_kept") / F.col("n_docs").cast("double")).alias("doc_yield"),
            H.round6(F.col("tokens_kept") / F.col("tokens_total").cast("double")).alias(
                "token_yield"
            ),
        )
        .orderBy("threshold")
    )


SQL_QUALITY_THRESHOLD_YIELD = f"""
WITH scored AS (
  SELECT doc_id, {H.sql_round6(_SQL_QUALITY_EXPR)} AS quality,
         CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS ws_tokens
  FROM documents
),
exploded AS (
  SELECT quality, ws_tokens,
         UNNEST([{", ".join(f"CAST({t} AS DOUBLE)" for t in YIELD_THRESHOLDS)}]) AS threshold
  FROM scored
),
agg AS (
  SELECT threshold,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN quality >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(ws_tokens) AS BIGINT) AS tokens_total,
         CAST(SUM(CASE WHEN quality >= threshold THEN ws_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
  FROM exploded GROUP BY 1
)
SELECT threshold, n_docs, n_kept, tokens_total, tokens_kept,
       {H.sql_round6("n_kept / CAST(n_docs AS DOUBLE)")} AS doc_yield,
       {H.sql_round6("tokens_kept / CAST(tokens_total AS DOUBLE)")} AS token_yield
FROM agg ORDER BY threshold
"""

ORACLES["quality_threshold_yield"] = SQL_QUALITY_THRESHOLD_YIELD


# ---------------------------------------------------------------------------
# quality_ablation_matrix (round 7)
# ---------------------------------------------------------------------------

def quality_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-stack ablation: for every quality screen in the prep pipeline
    (the three quality_filter reasons + the Gopher rule set + the
    Gini-diversity screen), how many documents and tokens it drops, its
    drop rate, and its UNIQUE contribution (docs no other filter catches)
    — plus the any_filter union row. The table that answers 'which screen
    earns its false-positive risk' before a 100-TB prep run; the
    dedup_method_matrix of the quality family.

    Plan: the three verdict flags ride ONE fused scan (quality_filter);
    gopher and diversity are two more per-row projections of the same
    table, composed by doc_id equi-joins (an audit runs this shape once;
    the production path is the fused quality_verdict projection). The
    6-way fan-out explodes a literal struct array over the 5-boolean
    projection — corpus-sized rows but 3 columns wide — and aggregates to
    a 6-row table map-side."""
    v = quality_filter(spark, sf_dir).select("doc_id", "reasons")
    g = gopher_rules_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("gk")
    )
    t = token_diversity(spark, sf_dir).select(
        "doc_id", "n_tokens", F.col("flagged_low_diversity").alias("ld")
    )
    flags = (
        v.join(g, "doc_id")
        .join(t, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.col("reasons").contains("low_quality").alias("f_low_quality"),
            F.col("reasons").contains("repetitive").alias("f_repetitive"),
            F.col("reasons").contains("lang_mismatch").alias("f_lang_mismatch"),
            (~F.col("gk")).alias("f_gopher"),
            F.col("ld").alias("f_low_diversity"),
        )
        # 3-boolean projection read by the fan-out AND the nfail column —
        # materialize so the three source projections scan documents once
        .localCheckpoint(eager=True)
    )
    names = ("low_quality", "repetitive", "lang_mismatch", "gopher", "low_diversity")
    nfail = None
    for n in names:
        c = F.col(f"f_{n}").cast("int")
        nfail = c if nfail is None else nfail + c
    nf = flags.withColumn("nfail", nfail)
    structs = [
        F.struct(F.lit(n).alias("name"), F.col(f"f_{n}").alias("failed"))
        for n in names
    ] + [
        F.struct(
            F.lit("any_filter").alias("name"), (F.col("nfail") > 0).alias("failed")
        )
    ]
    fan = nf.select(
        "n_tokens", "nfail", F.explode(F.array(*structs)).alias("u")
    ).select(
        "n_tokens", "nfail", F.col("u.name").alias("filter"), F.col("u.failed").alias("failed")
    )
    return (
        fan.groupBy("filter")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("failed").cast("long")).alias("n_dropped"),
            F.sum(F.when(F.col("failed"), F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "tok_dropped"
            ),
            F.sum((F.col("failed") & (F.col("nfail") == 1)).cast("long")).alias(
                "n_unique_dropped"
            ),
        )
        .select(
            "filter",
            "n_docs",
            "n_dropped",
            H.round6(F.col("n_dropped").cast("double") / F.col("n_docs").cast("double")).alias(
                "drop_rate"
            ),
            "tok_dropped",
            "n_unique_dropped",
        )
        .orderBy("filter")
    )


def _sql_quality_ablation() -> str:
    fails = {
        "low_quality": "contains(v.reasons, 'low_quality')",
        "repetitive": "contains(v.reasons, 'repetitive')",
        "lang_mismatch": "contains(v.reasons, 'lang_mismatch')",
        "gopher": "NOT g.gk",
        "low_diversity": "t.ld",
    }
    nfail = " + ".join(f"CAST(f_{n} AS INT)" for n in fails)
    structs = ", ".join(
        f"struct_pack(name := '{n}', failed := f_{n})" for n in fails
    ) + ", struct_pack(name := 'any_filter', failed := nfail > 0)"
    flag_cols = ",\n         ".join(f"{e} AS f_{n}" for n, e in fails.items())
    return f"""
WITH v AS (SELECT doc_id, reasons FROM ({_sql_quality_filter()})),
g AS (SELECT doc_id, keep AS gk FROM ({_sql_gopher()})),
t AS (SELECT doc_id, n_tokens, flagged_low_diversity AS ld FROM ({SQL_TOKEN_DIVERSITY})),
flags AS (
  SELECT v.doc_id, t.n_tokens,
         {flag_cols}
  FROM v JOIN g USING (doc_id) JOIN t USING (doc_id)
),
nf AS (SELECT *, {nfail} AS nfail FROM flags),
fan AS (
  SELECT n_tokens, nfail, unnest([{structs}]) AS u FROM nf
)
SELECT u.name AS filter,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN u.failed THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       {H.sql_round6("CAST(SUM(CASE WHEN u.failed THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)")} AS drop_rate,
       CAST(SUM(CASE WHEN u.failed THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_dropped,
       CAST(SUM(CASE WHEN u.failed AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_dropped
FROM fan GROUP BY 1 ORDER BY 1
"""


ORACLES["quality_ablation_matrix"] = _sql_quality_ablation()


# ---------------------------------------------------------------------------
# quality_reliability_bins — score-vs-rules calibration (r9 session 3)
# ---------------------------------------------------------------------------

RELIABILITY_BIN_MIC = 100000  # 0.1-wide score bins in 1e6-micro units


def quality_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the heuristic quality score against the
    INDEPENDENT Gopher rule verdict: docs are binned by score value
    (0.1-wide bins on the 1e6-micro integer recovered from the round6
    score — integer div, no float floor ambiguity), and each bin reports
    mean score ("confidence") vs Gopher pass rate ("accuracy") plus their
    gap. The repeated `ece` column is the expected calibration error
    Σ n_b·|gap_b| / N computed on the 1e6-quantized per-bin gaps (the
    rule-12 discipline: no double sums — integer numerators, ONE
    division at the end). A well-calibrated score tracks the rule filter
    monotonically; a large positive gap in high bins means the score
    overrates documents the rules reject — exactly the audit run before
    swapping quality_filter's bar for a learned-score threshold.

    Scale: composes the two single-scan projections (quality_score,
    gopher_rules_filter) with one doc_id equi-join and a ≤10-row rollup;
    the global ECE window runs over those ≤10 rows."""
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    g = gopher_rules_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("long").alias("passed")
    )
    j = q.join(g, "doc_id").select(
        F.floor(F.col("quality") * 1000000 + F.lit(0.5)).cast("long").alias("q_mic"),
        "passed",
    )
    per = (
        j.withColumn(
            "bin", F.least(F.expr(f"q_mic div {RELIABILITY_BIN_MIC}"), F.lit(9))
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("passed").alias("n_pass"),
            F.sum("q_mic").alias("sum_q_mic"),
        )
        .withColumn("conf_mic", F.expr("sum_q_mic div n_docs"))
        .withColumn("pass_mic", F.expr("(n_pass * 1000000) div n_docs"))
        .withColumn("gap_mic", F.col("pass_mic") - F.col("conf_mic"))
    )
    wall = Window.partitionBy()
    per = per.withColumn(
        "ece_num", F.sum(F.col("n_docs") * F.abs(F.col("gap_mic"))).over(wall)
    ).withColumn("n_total", F.sum("n_docs").over(wall))
    return per.select(
        F.col("bin").cast("long").alias("bin"),
        "n_docs",
        "n_pass",
        (
            F.col("sum_q_mic").cast("double")
            / (F.col("n_docs") * F.lit(1000000)).cast("double")
        ).alias("mean_quality"),
        (F.col("n_pass").cast("double") / F.col("n_docs").cast("double")).alias(
            "pass_rate"
        ),
        (F.col("gap_mic").cast("double") / F.lit(1000000).cast("double")).alias("gap"),
        (
            F.col("ece_num").cast("double")
            / (F.col("n_total") * F.lit(1000000)).cast("double")
        ).alias("ece"),
    )


def _sql_reliability_bins() -> str:
    return f"""
WITH rbq AS (SELECT doc_id, quality FROM ({SQL_QUALITY_SCORE})),
rbg AS (SELECT doc_id, keep FROM ({_sql_gopher()})),
rbj AS (
  SELECT CAST(FLOOR(q.quality * 1000000 + 0.5) AS BIGINT) AS q_mic,
         CASE WHEN g.keep THEN 1 ELSE 0 END AS passed
  FROM rbq q JOIN rbg g USING (doc_id)
),
rbb AS (
  SELECT LEAST(q_mic // {RELIABILITY_BIN_MIC}, 9) AS bin, q_mic, passed FROM rbj
),
rbper AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(passed) AS BIGINT) AS n_pass,
         CAST(SUM(q_mic) AS BIGINT) AS sum_q_mic
  FROM rbb GROUP BY 1
),
rbst AS (
  SELECT *, sum_q_mic // n_docs AS conf_mic,
         (n_pass * 1000000) // n_docs AS pass_mic
  FROM rbper
),
rbg2 AS (SELECT *, pass_mic - conf_mic AS gap_mic FROM rbst)
SELECT CAST(bin AS BIGINT) AS bin, n_docs, n_pass,
       CAST(sum_q_mic AS DOUBLE) / CAST(n_docs * 1000000 AS DOUBLE) AS mean_quality,
       CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_rate,
       CAST(gap_mic AS DOUBLE) / CAST(1000000 AS DOUBLE) AS gap,
       CAST(SUM(n_docs * ABS(gap_mic)) OVER () AS DOUBLE)
         / CAST(SUM(n_docs) OVER () * 1000000 AS DOUBLE) AS ece
FROM rbg2
"""


ORACLES["quality_reliability_bins"] = _sql_reliability_bins()
