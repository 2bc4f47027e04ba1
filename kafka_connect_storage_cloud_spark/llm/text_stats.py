"""Corpus vocabulary statistics: OOV coverage, bigram association, Zipf
profile. The tokenizer-adjacent audits a training-data pipeline runs before
committing to a vocabulary or a mixing recipe (complements lm_rarity_score
and bpe_pair_stats in corpus/pipeline.py).

- vocab_coverage : per-document coverage against the corpus's top-V
                   vocabulary — the OOV-rate audit that sizes a tokenizer
                   vocab. Vocab is a top-V aggregate (tiny) broadcast
                   against the token stream; per-doc rollup is one
                   map-side-combined groupBy on doc_id.
- bigram_lift    : adjacent-pair association strength as the exact ratio
                   P(ab)/(P(a)P(b)) (the exp of PMI — no libm log, so the
                   value is portable). Bigrams are built inside the token
                   array (zero extra shuffle); only the top-B pairs by
                   count are scored, and the two unigram joins run on that
                   B-row table against the broadcast unigram counts.
- zipf_profile   : rank-frequency table of the top tokens with cumulative
                   share — running sums stay on exact int64 counts, the
                   only double is one final division per row.

All three oracle-exact against DuckDB. At 100 TB the token stream never
materializes to the driver; the only global coordination is the top-V/B
aggregate (bounded rows) and two scalar totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..session import read_table, spread_scan

VOCAB_V = 256
BIGRAM_TOP = 40
BIGRAM_MIN = 3
ZIPF_TOP = 100


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spread_scan(read_table(spark, sf_dir, "documents"))
        .select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
    )


_SQL_DOC_TOKENS = (
    "SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

def vocab_coverage(spark: SparkSession, sf_dir: str, v: int = VOCAB_V) -> DataFrame:
    """Per-document token coverage against the corpus top-v vocabulary.
    coverage = in-vocab occurrences / total occurrences."""
    toks = _doc_tokens(spark, sf_dir)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    vocab = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= v)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        H.round6(
            (F.col("n_tokens") - F.col("n_oov")).cast("double") / F.col("n_tokens")
        ).alias("coverage"),
    )


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (
  SELECT doc_id, token FROM ({_SQL_DOC_TOKENS}) WHERE token <> ''
),
counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
vocab AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk FROM counts
  ) WHERE rk <= {VOCAB_V}
),
per_doc AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY 1
)
SELECT doc_id, n_tokens, n_oov,
       {H.sql_round6('CAST(n_tokens - n_oov AS DOUBLE) / n_tokens')} AS coverage
FROM per_doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bigram_lift
# ---------------------------------------------------------------------------

def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association strength of the top adjacent token pairs:
    lift = (c_ab / N_bigrams) / ((c_a / N_tokens) * (c_b / N_tokens)),
    each division/multiplication in fixed IEEE order on both engines.
    Bigrams are formed inside the per-document token array (no join);
    the global token/bigram totals are two scalar aggregates (the same
    driver-side closure pattern as the ANN matmul matrix)."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), r"\s+").alias("toks")
    )
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 0)),"
                " i -> struct(toks[i-1] AS t1, toks[i] AS t2))"
            )
        ).alias("bg")
    ).select(F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2")).filter(
        (F.col("t1") != "") & (F.col("t2") != "")
    )
    toks = _doc_tokens(spark, sf_dir)
    n_tok = toks.count()
    n_big = bigrams.count()
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    bg_counts = bigrams.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c_ab"))
    w = Window.orderBy(F.col("c_ab").desc(), F.col("t1"), F.col("t2"))
    top = (
        bg_counts.filter(F.col("c_ab") >= BIGRAM_MIN)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BIGRAM_TOP)
    )
    uni_a = uni.select(F.col("token").alias("tk1"), F.col("cnt").alias("c_a"))
    uni_b = uni.select(F.col("token").alias("tk2"), F.col("cnt").alias("c_b"))
    joined = (
        top.join(F.broadcast(uni_a), F.col("t1") == F.col("tk1"))
        .join(F.broadcast(uni_b), F.col("t2") == F.col("tk2"))
        .drop("tk1", "tk2")
    )
    lift = (
        (F.col("c_ab").cast("double") / F.lit(float(n_big)))
        / (
            (F.col("c_a").cast("double") / F.lit(float(n_tok)))
            * (F.col("c_b").cast("double") / F.lit(float(n_tok)))
        )
    )
    return joined.select(
        "t1",
        "t2",
        "c_ab",
        "c_a",
        "c_b",
        H.round6(lift).alias("lift"),
    ).orderBy(F.col("c_ab").desc(), "t1", "t2")


SQL_BIGRAM_LIFT = f"""
WITH docs AS (
  SELECT string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
bigrams AS (
  SELECT toks[i] AS t1, toks[i+1] AS t2
  FROM docs, UNNEST(range(1, greatest(len(toks), 1))) AS r(i)
  WHERE toks[i] <> '' AND toks[i+1] <> ''
),
toks AS (SELECT token FROM ({_SQL_DOC_TOKENS}) WHERE token <> ''),
totals AS (
  SELECT (SELECT COUNT(*) FROM toks) AS n_tok,
         (SELECT COUNT(*) FROM bigrams) AS n_big
),
uni AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
bg AS (SELECT t1, t2, COUNT(*) AS c_ab FROM bigrams GROUP BY 1, 2),
top AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY c_ab DESC, t1, t2) AS rk
    FROM bg WHERE c_ab >= {BIGRAM_MIN}
  ) WHERE rk <= {BIGRAM_TOP}
)
SELECT t.t1, t.t2, t.c_ab, a.cnt AS c_a, b.cnt AS c_b,
       {H.sql_round6(
           '(CAST(t.c_ab AS DOUBLE) / CAST(tt.n_big AS DOUBLE)) / '
           '((CAST(a.cnt AS DOUBLE) / CAST(tt.n_tok AS DOUBLE)) * '
           '(CAST(b.cnt AS DOUBLE) / CAST(tt.n_tok AS DOUBLE)))'
       )} AS lift
FROM top t
JOIN uni a ON t.t1 = a.token
JOIN uni b ON t.t2 = b.token
CROSS JOIN totals tt
ORDER BY t.c_ab DESC, t.t1, t.t2
"""


# ---------------------------------------------------------------------------
# zipf_profile
# ---------------------------------------------------------------------------

def zipf_profile(spark: SparkSession, sf_dir: str, top: int = ZIPF_TOP) -> DataFrame:
    """Rank-frequency profile of the top tokens. Cumulative share runs on
    exact integer counts (running int sum, then one division per row) —
    no float accumulation order anywhere."""
    toks = _doc_tokens(spark, sf_dir)
    n_tok = toks.count()
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn("cum_cnt", F.sum("cnt").over(wcum))
        .filter(F.col("rank") <= top)
        .select(
            "rank",
            "token",
            "cnt",
            H.round6(F.col("cnt").cast("double") / F.lit(float(n_tok))).alias("share"),
            H.round6(F.col("cum_cnt").cast("double") / F.lit(float(n_tok))).alias(
                "cum_share"
            ),
        )
    )


SQL_ZIPF_PROFILE = f"""
WITH toks AS (SELECT token FROM ({_SQL_DOC_TOKENS}) WHERE token <> ''),
counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, token
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
  FROM counts
),
total AS (SELECT COUNT(*) AS n_tok FROM toks)
SELECT rank, token, cnt,
       {H.sql_round6('CAST(cnt AS DOUBLE) / CAST(t.n_tok AS DOUBLE)')} AS share,
       {H.sql_round6('CAST(cum_cnt AS DOUBLE) / CAST(t.n_tok AS DOUBLE)')} AS cum_share
FROM ranked CROSS JOIN total t
WHERE rank <= {ZIPF_TOP}
ORDER BY rank
"""


QUERIES = {
    "vocab_coverage": vocab_coverage,
    "bigram_lift": bigram_lift,
    "zipf_profile": zipf_profile,
}

ORACLES = {
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "bigram_lift": SQL_BIGRAM_LIFT,
    "zipf_profile": SQL_ZIPF_PROFILE,
}


# ---------------------------------------------------------------------------
# vocab_drift_tvd — distribution drift between corpus halves
# ---------------------------------------------------------------------------

DRIFT_TOP = 20


def vocab_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift monitor: total-variation distance between the token
    distributions of two deterministic corpus halves (the batch-over-batch
    drift check a feed pipeline alerts on), plus the top drifting tokens.

    TVD = ½·Σ|p_i − q_i| stays EXACT until one final division: with int
    counts c1/c2 and totals N1/N2, each term is |c1_i·N2 − c2_i·N1|
    (int64) and TVD = Σterm / (2·N1·N2). No log-based divergence — libm
    isn't portable; TVD is, exactly. One shuffle on token (both halves'
    counts ride the same key); the global term-sum is a scalar aggregate."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    half = (H.h32(F.concat(F.lit("drift:"), F.col("doc_id").cast("string"))) % 2).alias(
        "half"
    )
    toks = (
        docs.select(half, F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
        )
    )
    totals = counts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2")).collect()[0]
    n1, n2 = int(totals["n1"]), int(totals["n2"])
    term = F.abs(F.col("c1") * F.lit(n2) - F.col("c2") * F.lit(n1))
    scored = counts.withColumn("term", term)
    tvd_row = scored.agg(F.sum("term").alias("tsum")).collect()[0]
    tvd = float(tvd_row["tsum"]) / (2.0 * float(n1) * float(n2))
    w = Window.orderBy(F.col("term").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DRIFT_TOP)
        .select(
            "rk",
            "token",
            "c1",
            "c2",
            H.round6(
                F.col("term").cast("double") / F.lit(2.0 * float(n1) * float(n2))
            ).alias("tvd_contribution"),
            H.round6(F.lit(tvd)).alias("corpus_tvd"),
        )
        .orderBy("rk")
    )


SQL_VOCAB_DRIFT_TVD = f"""
WITH toks AS (
  SELECT {H.sql_h32("'drift:' || CAST(doc_id AS VARCHAR)")} % 2 AS half,
         unnest(string_split_regex(lower(text), '\\s+')) AS token
  FROM documents
),
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM toks WHERE token <> '' GROUP BY 1
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM counts),
scored AS (
  SELECT c.token, c.c1, c.c2,
         ABS(c.c1 * t.n2 - c.c2 * t.n1) AS term,
         t.n1, t.n2
  FROM counts c CROSS JOIN tot t
),
g AS (SELECT SUM(term) AS tsum, ANY_VALUE(n1) AS n1, ANY_VALUE(n2) AS n2 FROM scored),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY term DESC, token) AS rk FROM scored
)
SELECT r.rk, r.token, r.c1, r.c2,
       {H.sql_round6('CAST(r.term AS DOUBLE) / (2.0 * CAST(r.n1 AS DOUBLE) * CAST(r.n2 AS DOUBLE))')}
         AS tvd_contribution,
       {H.sql_round6('CAST(g.tsum AS DOUBLE) / (2.0 * CAST(g.n1 AS DOUBLE) * CAST(g.n2 AS DOUBLE))')}
         AS corpus_tvd
FROM ranked r CROSS JOIN g
WHERE r.rk <= {DRIFT_TOP}
ORDER BY r.rk
"""


QUERIES["vocab_drift_tvd"] = vocab_drift_tvd
ORACLES["vocab_drift_tvd"] = SQL_VOCAB_DRIFT_TVD


# ---------------------------------------------------------------------------
# ngram_novelty — first-occurrence n-gram attribution (corpus freshness)
# ---------------------------------------------------------------------------

NOVELTY_GRAM_N = 3


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct n-grams whose
    FIRST corpus occurrence (min doc_id over an ingestion-ordered id) is
    this doc — the 'how much genuinely new text does each document add'
    curve curation pipelines use to decide when a source is mined out
    (novelty ~0 = the source now only repeats the corpus).

    Scale shape: one shingle explode, a map-side-combined (doc, gram)
    distinct, a min-aggregation keyed on the gram hash, and a gram-keyed
    join back — all shuffles carry gram-cardinality rows, never text."""
    from ..functions import text as T

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = (
        T.with_shingles(docs, NOVELTY_GRAM_N)
        .select("doc_id", H.h32(F.col("shingle")).alias("g"))
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long")).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        H.round6(F.col("n_novel") / F.col("n_grams").cast("double")).alias("novelty"),
    )


def _sql_ngram_novelty() -> str:
    from ..functions import text as T

    return f"""
WITH shingles AS ({T.sql_shingles(NOVELTY_GRAM_N)}),
grams AS (SELECT DISTINCT doc_id, {H.sql_h32('shingle')} AS g FROM shingles),
first_occ AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
per_doc AS (
  SELECT gr.doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN gr.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM grams gr JOIN first_occ f ON gr.g = f.g
  GROUP BY gr.doc_id
)
SELECT doc_id, n_grams, n_novel,
       {H.sql_round6("CAST(n_novel AS DOUBLE) / n_grams")} AS novelty
FROM per_doc ORDER BY doc_id
"""


QUERIES["ngram_novelty"] = ngram_novelty
ORACLES["ngram_novelty"] = _sql_ngram_novelty()


NEG_ALPHA_NOTE = "count^0.75 == sqrt(cnt * sqrt(cnt)) — sqrt is IEEE-correctly rounded on both engines"


def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec/NCE negative-sampling distribution: per token, the
    count^0.75-smoothed sampling weight and probability (the smoothing that
    keeps frequent tokens from dominating the negatives). Portability:
    x^0.75 computes as sqrt(x * sqrt(x)) — two correctly-rounded sqrts and
    one multiply, bit-identical on both engines, where libm pow(x, 0.75)
    would drift in last ULPs. Probabilities derive from micro-quantized
    weights summed as exact integers (order-free)."""
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = F.sqrt(F.col("cnt") * F.sqrt(F.col("cnt")))  # cnt^0.75
    wmicro = F.floor(w * 1000000.0 + F.lit(0.5)).cast("bigint")
    scored = toks.withColumn("w_micro", wmicro)
    total = F.sum("w_micro").over(Window.partitionBy())
    return (
        scored.select(
            "token",
            "cnt",
            H.round6(F.col("w_micro") / 1000000.0).alias("weight"),
            H.round6(F.col("w_micro") / total.cast("double")).alias("prob"),
        )
        .orderBy("token")
    )


SQL_NEGATIVE_SAMPLING_TABLE = f"""
WITH toks AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token FROM documents
  ) WHERE token != '' GROUP BY token
),
scored AS (
  SELECT token, cnt,
         CAST(floor(sqrt(cnt * sqrt(cnt)) * 1000000.0 + 0.5) AS BIGINT) AS w_micro
  FROM toks
)
SELECT token, cnt,
       {H.sql_round6("w_micro / 1000000.0")} AS weight,
       {H.sql_round6("w_micro / CAST(SUM(w_micro) OVER () AS DOUBLE)")} AS prob
FROM scored ORDER BY token
"""

QUERIES["negative_sampling_table"] = negative_sampling_table
ORACLES["negative_sampling_table"] = SQL_NEGATIVE_SAMPLING_TABLE


# ---------------------------------------------------------------------------
# vocab_growth_curve — Heaps'-law vocabulary growth over the streamed corpus
# ---------------------------------------------------------------------------

HEAPS_DECILES = 10
HEAPS_SALT = "heaps:"


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: stream the corpus in a deterministic salted-hash
    order, cut it into deciles, and report per decile the cumulative token
    volume and the cumulative DISTINCT vocabulary — the curve that predicts
    how a tokenizer's type inventory grows with corpus size (sublinear if
    the corpus is natural text, near-linear if it is id/noise-heavy).

    Tracked at TWO granularities: unigram word types (the classic Heaps
    curve — saturates fast on a closed vocabulary) and 3-word shingle
    types (the unit the minhash/dedup family fingerprints — its
    combinatorial space keeps growing, which is exactly what sizes a band
    store or Bloom dedup filter as ingest proceeds).

    Scale: the global NTILE sort runs over a (doc_id, hash) projection —
    ~16 bytes/row — and the decile joins back to the text by doc_id, so
    document bodies NEVER flow through the single-partition window task
    (the r5 form sorted the full corpus text through one executor).
    Each type's FIRST decile is one inverted-index aggregate (min over
    the type's doc deciles — map-side combined); the curve itself is a
    10-row window. Every number is an exact integer count, so both engines
    agree bit-for-bit."""
    from ..functions import text as T

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    h = H.h32(F.concat(F.lit(HEAPS_SALT), F.col("doc_id").cast("string")))
    w_ord = Window.orderBy(F.col("__h").asc(), F.col("doc_id").asc())
    deciles = (
        docs.select("doc_id", h.alias("__h"))
        .withColumn("decile", F.ntile(HEAPS_DECILES).over(w_ord))
        .drop("__h")
    )
    staged = docs.join(deciles, "doc_id")
    toks = staged.select(
        "decile", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    sh = T.with_shingles(staged, 3).select("decile", "shingle")
    per_decile = toks.groupBy("decile").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = (
        toks.groupBy("token").agg(F.min("decile").alias("decile"))
        .groupBy("decile").agg(F.count(F.lit(1)).alias("new_types"))
    )
    first_sh = (
        sh.groupBy("shingle").agg(F.min("decile").alias("decile"))
        .groupBy("decile").agg(F.count(F.lit(1)).alias("new_shingles"))
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.join(first_seen, "decile", "left")
        .join(first_sh, "decile", "left")
        .select(
            "decile",
            "n_tokens",
            F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
            F.coalesce(F.col("new_shingles"), F.lit(0)).alias("new_shingles"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w_cum))
        .withColumn("cum_types", F.sum("new_types").over(w_cum))
        .withColumn("cum_shingles", F.sum("new_shingles").over(w_cum))
        .orderBy("decile")
    )


def _sql_vocab_growth() -> str:
    h = H.sql_h32(f"'{HEAPS_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH staged AS (
  SELECT doc_id, text, NTILE({HEAPS_DECILES}) OVER (ORDER BY {h}, doc_id) AS decile
  FROM documents
),
toks AS (
  SELECT decile, unnest(string_split_regex(lower(text), '\\s+')) AS token FROM staged
),
toks_ne AS (SELECT * FROM toks WHERE token <> ''),
sh AS (
  SELECT decile, unnest(
    CASE WHEN len(ws) >= 3
         THEN [array_to_string(ws[i : i + 2], ' ') for i in generate_series(1, len(ws) - 2)]
         ELSE [array_to_string(ws, ' ')] END
  ) AS shingle
  FROM (SELECT decile, string_split_regex(lower(text), '\\s+') AS ws FROM staged)
),
per_decile AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks_ne GROUP BY decile),
first_seen AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_types FROM (
    SELECT token, MIN(decile) AS decile FROM toks_ne GROUP BY token
  ) GROUP BY decile
),
first_sh AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_shingles FROM (
    SELECT shingle, MIN(decile) AS decile FROM sh GROUP BY shingle
  ) GROUP BY decile
)
SELECT p.decile, p.n_tokens,
       COALESCE(f.new_types, 0) AS new_types,
       COALESCE(g.new_shingles, 0) AS new_shingles,
       CAST(SUM(p.n_tokens) OVER (ORDER BY p.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(f.new_types, 0)) OVER (ORDER BY p.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types,
       CAST(SUM(COALESCE(g.new_shingles, 0)) OVER (ORDER BY p.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_shingles
FROM per_decile p
LEFT JOIN first_seen f ON p.decile = f.decile
LEFT JOIN first_sh g ON p.decile = g.decile
ORDER BY p.decile
"""


QUERIES["vocab_growth_curve"] = vocab_growth_curve
ORACLES["vocab_growth_curve"] = _sql_vocab_growth()


# ---------------------------------------------------------------------------
# ngram_memorization_audit — cross-document long-n-gram repetition risk (r6)
# ---------------------------------------------------------------------------

MEM_N = 13  # the memorization-dedup standard unit (Lee et al. 2022 dedups
# exact duplicated spans; 13 words ~ the 50-token scale at which verbatim
# repetition across documents predicts model memorization)


def ngram_memorization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk summary: how much of the corpus' distinct 13-word
    n-gram inventory repeats ACROSS documents, and how many documents carry
    at least one such repeated span. High shares mean verbatim boilerplate/
    mirror content that a trained model will reproduce token-for-token —
    the signal that gates a span-level dedup pass (dedup_substring is the
    within-pair confirm; this is the corpus-level gate).

    Scale: one shingle scan to the distinct (doc, h) set, one h-keyed
    doc-frequency aggregate (map-side combined), one summary row. The
    distinct-count shuffles are keyed on h/doc_id — no pair joins, no
    windows."""
    from ..functions import text as T

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = (
        T.with_shingles(docs, MEM_N)
        .select("doc_id", H.h32(F.col("shingle")).alias("h"))
        .distinct()
    )
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(dfreq, "h")
    rep = F.col("df") >= 2
    agg = j.agg(
        F.countDistinct("h").alias("n_grams"),
        F.countDistinct(F.when(rep, F.col("h"))).alias("n_repeated"),
        F.max("df").alias("max_df"),
        F.countDistinct("doc_id").alias("n_docs_with_grams"),
        F.countDistinct(F.when(rep, F.col("doc_id"))).alias("docs_affected"),
    )
    return agg.select(
        "n_grams",
        "n_repeated",
        H.round6(
            F.col("n_repeated").cast("double") / F.col("n_grams").cast("double")
        ).alias("repeated_share"),
        "max_df",
        "n_docs_with_grams",
        "docs_affected",
        H.round6(
            F.col("docs_affected").cast("double")
            / F.col("n_docs_with_grams").cast("double")
        ).alias("docs_share"),
    ).where(F.col("n_grams") > 0)  # empty corpus -> empty frame, not a null row


def _sql_memorization() -> str:
    from ..functions import text as T

    h = H.sql_h32("shingle")
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, {h} AS h FROM ({T.sql_shingles(MEM_N)})
),
dfreq AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
j AS (SELECT sh.doc_id, sh.h, dfreq.df FROM sh JOIN dfreq ON sh.h = dfreq.h)
SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT CASE WHEN df >= 2 THEN h END) AS BIGINT) AS n_repeated,
       {H.sql_round6("CAST(COUNT(DISTINCT CASE WHEN df >= 2 THEN h END) AS DOUBLE) / CAST(COUNT(DISTINCT h) AS DOUBLE)")} AS repeated_share,
       CAST(MAX(df) AS BIGINT) AS max_df,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_with_grams,
       CAST(COUNT(DISTINCT CASE WHEN df >= 2 THEN doc_id END) AS BIGINT) AS docs_affected,
       {H.sql_round6("CAST(COUNT(DISTINCT CASE WHEN df >= 2 THEN doc_id END) AS DOUBLE) / CAST(COUNT(DISTINCT doc_id) AS DOUBLE)")} AS docs_share
FROM j
HAVING COUNT(DISTINCT h) > 0
"""


QUERIES["ngram_memorization_audit"] = ngram_memorization_audit
ORACLES["ngram_memorization_audit"] = _sql_memorization()


# ---------------------------------------------------------------------------
# vocab_drift_chi2 (round 7)
# ---------------------------------------------------------------------------

CHI2_TOP = 15


def vocab_drift_chi2(spark: SparkSession, sf_dir: str, top: int = CHI2_TOP) -> DataFrame:
    """Two-sample chi-square drift test between the token distributions of
    the same deterministic corpus halves vocab_drift_tvd monitors — the
    statistic a pipeline alerts on when TVD alone is too insensitive to
    rare-token shifts (chi-square weights a shift by 1/expected, so a rare
    token moving matters as much as a common one).

    For token t with counts c1/c2 in halves of size N1/N2, the pooled
    two-cell chi-square term reduces exactly to

        term_t = (c1*N2 - c2*N1)^2 / (N1 * N2 * (c1 + c2))

    (algebra: obs-exp per cell is +-(c1*N2 - c2*N1)/(N1+N2)). The
    numerator can exceed int64 (c*N ~ 1e11 at sf0.1, squared 1e22), so the
    delta is cast to DOUBLE before squaring ON BOTH ENGINES — the per-term
    expression is then a fixed-order IEEE computation, portable. The sum
    across terms is NOT portable as doubles (partial-agg order), so each
    term is quantized to 1e-9 ints and the int64 sum divides once
    (DETERMINISM.md rules 2/4: chi-square replaces the libm-dependent
    KL/G-test exactly as TVD replaced |p-q| divergence).

    Scale: identical shape to vocab_drift_tvd — one shuffle on token
    (vocab-sized counts frame), a scalar totals aggregate, and a top-N
    window over the vocab-sized frame. Reference tie-in: the reference's
    per-partition record-count rotation audit (TopicPartitionWriter.java
    recordCount) is the volume analog; this is the content-drift version.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    half = (H.h32(F.concat(F.lit("drift:"), F.col("doc_id").cast("string"))) % 2).alias(
        "half"
    )
    toks = docs.select(
        half, F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    totals = counts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2")).collect()[0]
    n1 = int(totals["n1"] or 0)
    n2 = int(totals["n2"] or 0)
    if n1 == 0 or n2 == 0:  # empty/degenerate corpus: no two-sample test
        return counts.select(
            F.lit(0).alias("rk"),
            "token",
            "c1",
            "c2",
            F.lit(0.0).alias("chi2_term"),
            F.lit(0.0).alias("corpus_chi2"),
            F.lit(0).alias("dof"),
        ).where(F.lit(False))
    delta = (F.col("c1") * F.lit(n2) - F.col("c2") * F.lit(n1)).cast("double")
    term = (delta * delta) / (
        F.lit(float(n1)) * F.lit(float(n2)) * (F.col("c1") + F.col("c2")).cast("double")
    )
    scored = counts.withColumn("term", term).withColumn(
        "term_q", F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    g = scored.agg(
        F.sum("term_q").alias("qsum"), F.count(F.lit(1)).alias("vocab")
    ).collect()[0]
    chi2 = float(g["qsum"]) / 1e9
    dof = int(g["vocab"]) - 1
    w = Window.orderBy(F.col("term_q").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .select(
            "rk",
            "token",
            "c1",
            "c2",
            H.round6(F.col("term")).alias("chi2_term"),
            H.round6(F.lit(chi2)).alias("corpus_chi2"),
            F.lit(dof).alias("dof"),
        )
        .orderBy("rk")
    )


SQL_VOCAB_DRIFT_CHI2 = f"""
WITH toks AS (
  SELECT {H.sql_h32("'drift:' || CAST(doc_id AS VARCHAR)")} % 2 AS half,
         unnest(string_split_regex(lower(text), '\\s+')) AS token
  FROM documents
),
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM toks WHERE token <> '' GROUP BY 1
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM counts),
scored AS (
  SELECT c.token, c.c1, c.c2,
         (CAST(c.c1 * t.n2 - c.c2 * t.n1 AS DOUBLE) * CAST(c.c1 * t.n2 - c.c2 * t.n1 AS DOUBLE))
           / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE) * CAST(c.c1 + c.c2 AS DOUBLE)) AS term
  FROM counts c CROSS JOIN tot t
  WHERE t.n1 > 0 AND t.n2 > 0
),
q AS (
  SELECT *, CAST(FLOOR(term * 1e9 + 0.5) AS BIGINT) AS term_q FROM scored
),
g AS (SELECT CAST(SUM(term_q) AS BIGINT) AS qsum, COUNT(*) AS vocab FROM q),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY term_q DESC, token) AS rk FROM q
)
SELECT r.rk, r.token, r.c1, r.c2,
       {H.sql_round6('r.term')} AS chi2_term,
       {H.sql_round6('CAST(g.qsum AS DOUBLE) / 1e9')} AS corpus_chi2,
       CAST(g.vocab - 1 AS INT) AS dof
FROM ranked r CROSS JOIN g
WHERE r.rk <= {CHI2_TOP}
ORDER BY r.rk
"""


QUERIES["vocab_drift_chi2"] = vocab_drift_chi2
ORACLES["vocab_drift_chi2"] = SQL_VOCAB_DRIFT_CHI2

# ---------------------------------------------------------------------------
# token_lorenz_gini (round 9) — token-mass inequality per source
# ---------------------------------------------------------------------------

LORENZ_TILES = 10


def token_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini coefficient of token mass per source: docs are
    ranked ascending by token count (doc_id tie-break), cut into
    LORENZ_TILES exact NTILE deciles (functions/ranking.ntile_of_rank —
    the same arithmetic NTILE uses, no second window), and each decile
    reports its doc count, token sum, and cumulative token share. The
    Gini uses the exact rank identity G = (2·Σ rn·x − (n+1)·Σx)/(n·Σx):
    numerator and denominator are int64 (Σ rn·x overflows past ~3·10⁹
    docs·avg-tokens per source — pre-quantize beyond that, the chi2
    square-in-double rule), divided once into a double identically on
    both engines. The data-mixing audit that answers 'is 90% of this
    source's token budget coming from 10% of its documents?'.

    Scale: the token count is a per-row expression (no explode, no
    shuffle); ranking windows are partitioned by source, so sources
    parallelize; a single-source corpus degenerates to one partition —
    the with_global_rank histogram-cumulative decomposition
    (rarity_buckets_edges pattern) applies if that source is corpus-sized.
    Sources with zero total tokens drop (division guard, both engines);
    token_lorenz_gini_edges IS that shipped decomposition, bit-identical
    under the same oracle string."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).cast("long").alias("n_tok"),
    )
    wsrc = Window.partitionBy("source")
    wrank = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    ranked = (
        docs.withColumn("rn", F.row_number().over(wrank))
        .withColumn("n", F.count(F.lit(1)).over(wsrc))
        .withColumn("tot", F.sum("n_tok").over(wsrc))
    )
    return _lorenz_tail(ranked)


def _lorenz_tail(ranked: DataFrame) -> DataFrame:
    """Decile aggregation + Gini from a (source, n_tok, rn, n, tot) frame
    — shared by the window form and the two-pass-rank edges twin so both
    provably run one expression tree past the ranking step."""
    from ..functions.ranking import ntile_of_rank

    ranked = (
        ranked.where(F.col("tot") > 0)
        .withColumn("decile", ntile_of_rank(F.col("rn"), F.col("n"), LORENZ_TILES))
        .withColumn("rx", F.col("rn") * F.col("n_tok"))
    )
    tiles = ranked.groupBy("source", "decile", "n", "tot").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tok_decile"),
        F.sum("rx").alias("srx_part"),
    )
    wcum = Window.partitionBy("source").orderBy("decile")
    return (
        tiles.withColumn("cum_tok", F.sum("tok_decile").over(wcum))
        .withColumn("srx", F.sum("srx_part").over(Window.partitionBy("source")))
        .select(
            "source",
            "decile",
            "n_docs",
            "tok_decile",
            (F.col("cum_tok").cast("double") / F.col("tot").cast("double")).alias(
                "cum_tok_share"
            ),
            (
                (
                    F.lit(2) * F.col("srx")
                    - (F.col("n") + F.lit(1)) * F.col("tot")
                ).cast("double")
                / (F.col("n") * F.col("tot")).cast("double")
            ).alias("gini"),
        )
    )


def token_lorenz_gini_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of token_lorenz_gini: the per-source ranking window
    decomposed via the two-pass histogram form
    (functions/ranking.with_global_rank, part_cols=["source"]) — a source
    holding half a 100 TB corpus sorts only its DISTINCT token-count
    values in one task, never its rows; per-source totals come from a
    metadata-sized aggregate join instead of a partition-wide window.
    Bit-identical to the window form (same total order, same doc_id
    tie-break), so it reuses the SAME oracle string — the
    rarity_buckets_edges / rfm_segmentation_edges discipline."""
    from ..functions.ranking import with_global_rank

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).cast("long").alias("n_tok"),
    )
    totals = docs.groupBy("source").agg(F.sum("n_tok").alias("tot"))
    ranked = with_global_rank(
        docs,
        "n_tok",
        "doc_id",
        part_cols=["source"],
        rank_name="rn",
        total_name="n",
    ).join(totals, "source")
    return _lorenz_tail(ranked)


SQL_TOKEN_LORENZ_GINI = f"""
WITH ldocs AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
lrank AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(SUM(n_tok) OVER (PARTITION BY source) AS BIGINT) AS tot,
         NTILE({LORENZ_TILES}) OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS decile
  FROM ldocs
),
ltile AS (
  SELECT source, decile, n, tot,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tok_decile,
         CAST(SUM(rn * n_tok) AS BIGINT) AS srx_part
  FROM lrank WHERE tot > 0 GROUP BY 1, 2, 3, 4
),
lcum AS (
  SELECT *,
         CAST(SUM(tok_decile) OVER (PARTITION BY source ORDER BY decile) AS BIGINT) AS cum_tok,
         CAST(SUM(srx_part) OVER (PARTITION BY source) AS BIGINT) AS srx
  FROM ltile
)
SELECT source, decile, n_docs, tok_decile,
       CAST(cum_tok AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_tok_share,
       CAST(2 * srx - (n + 1) * tot AS DOUBLE)
         / CAST(n * tot AS DOUBLE) AS gini
FROM lcum
"""

QUERIES["token_lorenz_gini"] = token_lorenz_gini
ORACLES["token_lorenz_gini"] = SQL_TOKEN_LORENZ_GINI

QUERIES["token_lorenz_gini_edges"] = token_lorenz_gini_edges
ORACLES["token_lorenz_gini_edges"] = SQL_TOKEN_LORENZ_GINI  # bit-identical twin


# ---------------------------------------------------------------------------
# doc_readability (round 9) — Flesch reading-ease, exact rational form
# ---------------------------------------------------------------------------

# Flesch milli-point thresholds: FRE >= 90 easy, >= 60 standard, >= 30
# difficult, else very_difficult. Compared cross-multiplied in int64.
FRE_BANDS = ((90000, "easy"), (60000, "standard"), (30000, "difficult"))


def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with the syllable count replaced
    by its standard cheap proxy (vowel-group runs [aeiouy]+ — the
    approximation every large-corpus readability pass uses; true
    syllabification needs a dictionary). The score
    206.835 - 1.015 w/s - 84.6 v/w is brought over ONE common
    denominator: fre = (206835 s w - 1015 w^2 - 84600 v s)/(1000 s w) in
    exact int64 with a single final double division, and the band labels
    compare the numerator cross-multiplied against the 90/60/30
    thresholds -- no float ever decides a label. Sentences are [.!?]+
    runs; all three counters floor at 1 so short fragments score rather
    than divide by zero.

    Scale: stateless per-row projection -- no shuffle at all; the three
    regexp counters run in one whole-stage-codegen pass over the text."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        F.greatest(F.size(T.words()), F.lit(1)).alias("wc"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("sc"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
            F.lit(1),
        ).alias("vg"),
    )
    num = (
        F.lit(206835) * F.col("sc") * F.col("wc")
        - F.lit(1015) * F.col("wc") * F.col("wc")
        - F.lit(84600) * F.col("vg") * F.col("sc")
    )
    den = F.col("sc") * F.col("wc")
    band = F.lit("very_difficult")
    for milli, label in reversed(FRE_BANDS):
        band = F.when(num >= F.lit(milli) * den, F.lit(label)).otherwise(band)
    return base.select(
        "doc_id",
        F.col("wc").alias("words"),
        F.col("sc").alias("sentences"),
        F.col("vg").alias("vowel_groups"),
        (num.cast("double") / (den * F.lit(1000)).cast("double")).alias("fre"),
        band.alias("band"),
    )


SQL_DOC_READABILITY = """
WITH frb AS (
  SELECT doc_id,
         GREATEST(len(string_split_regex(lower(text), '\\s+')), 1) AS wc,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sc,
         GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS vg
  FROM documents
),
frn AS (
  SELECT doc_id, wc, sc, vg,
         206835 * sc * wc - 1015 * wc * wc - 84600 * vg * sc AS num,
         sc * wc AS den
  FROM frb
)
SELECT doc_id, wc AS words, sc AS sentences, vg AS vowel_groups,
       CAST(num AS DOUBLE) / CAST(den * 1000 AS DOUBLE) AS fre,
       CASE WHEN num >= 90000 * den THEN 'easy'
            WHEN num >= 60000 * den THEN 'standard'
            WHEN num >= 30000 * den THEN 'difficult'
            ELSE 'very_difficult' END AS band
FROM frn
"""

QUERIES["doc_readability"] = doc_readability
ORACLES["doc_readability"] = SQL_DOC_READABILITY


# ---------------------------------------------------------------------------
# boilerplate_shingles (round 9) — within-source repeated-shingle audit
# ---------------------------------------------------------------------------

BOILER_MIN_DOCS = 5  # a shingle present in >= 5 distinct docs of one source


def boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate profile: a word-3-gram shingle is
    boilerplate when it appears in >= BOILER_MIN_DOCS distinct documents
    of the SAME source (headers, footers, navigation chrome -- the
    template text near-dup passes miss because each page differs
    elsewhere). Emits, per source: distinct-shingle and boilerplate
    counts, and two exact shares -- boiler_share (what fraction of the
    source's shingle VOCABULARY is template) and mass_share (what
    fraction of doc-shingle OCCURRENCES that template covers, weighting
    by how often it repeats). No join: the (source, shingle)->doc-count
    cells already carry everything, so the op is two cascaded
    map-side-combinable groupBys over the distinct pairs.

    Scale: shingle hashes dedup PER DOC inside the array (transform +
    array_distinct -- no corpus-wide DISTINCT shuffle); both groupBys
    partial-aggregate map-side. h32
    collisions can merge two shingles within a source (the documented
    minhash trade; at 2^32 space and per-source vocab << 2^16 the
    expected merge count is << 1)."""
    docs = spread_scan(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", T.words().alias("ws")
    )
    h_sh = H.spark_sql_h32("x")
    pairs = (
        docs.withColumn("sharr", T.shingles_from_ws(3))
        # per-doc dedup INSIDE the array (JVM transform + array_distinct):
        # the corpus-wide DISTINCT shuffle disappears; each (source, h)
        # then counts docs directly with map-side combine (measured 4.5 s
        # -> the containment class drops to one aggregation)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(f"array_distinct(transform(sharr, x -> {h_sh}))")).alias("h"),
        )
    )
    cells = pairs.groupBy("source", "h").agg(F.count(F.lit(1)).alias("nd"))
    per_src = cells.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("nd") >= BOILER_MIN_DOCS, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_boiler"
        ),
        F.sum("nd").alias("total_pairs"),
        F.sum(F.when(F.col("nd") >= BOILER_MIN_DOCS, F.col("nd")).otherwise(F.lit(0))).alias(
            "boiler_pairs"
        ),
    )
    ndocs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return per_src.join(ndocs, "source").select(
        "source",
        "n_docs",
        "n_shingles",
        "n_boiler",
        "boiler_pairs",
        (F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double")).alias(
            "boiler_share"
        ),
        (F.col("boiler_pairs").cast("double") / F.col("total_pairs").cast("double")).alias(
            "mass_share"
        ),
    )


_SQL_H32_SH = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"

SQL_BOILERPLATE_SHINGLES = f"""
WITH bpws AS (
  SELECT doc_id, source, {T.SQL_WORDS} AS ws FROM documents
),
bpsh AS (
  SELECT DISTINCT doc_id, source, {_SQL_H32_SH} AS h
  FROM (
    SELECT doc_id, source, unnest(
      CASE WHEN len(ws) >= 3
           THEN [array_to_string(ws[i : i + 2], ' ')
                 for i in generate_series(1, len(ws) - 2)]
           ELSE [array_to_string(ws, ' ')] END
    ) AS sh
    FROM bpws
  )
),
bpc AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS nd
  FROM bpsh GROUP BY 1, 2
),
bps AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN nd >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler,
         CAST(SUM(nd) AS BIGINT) AS total_pairs,
         CAST(SUM(CASE WHEN nd >= {BOILER_MIN_DOCS} THEN nd ELSE 0 END) AS BIGINT)
           AS boiler_pairs
  FROM bpc GROUP BY 1
),
bpn AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
)
SELECT s.source, n.n_docs, s.n_shingles, s.n_boiler, s.boiler_pairs,
       CAST(s.n_boiler AS DOUBLE) / CAST(s.n_shingles AS DOUBLE) AS boiler_share,
       CAST(s.boiler_pairs AS DOUBLE) / CAST(s.total_pairs AS DOUBLE) AS mass_share
FROM bps s JOIN bpn n USING (source)
"""

QUERIES["boilerplate_shingles"] = boilerplate_shingles
ORACLES["boilerplate_shingles"] = SQL_BOILERPLATE_SHINGLES


# ---------------------------------------------------------------------------
# token_ge2_inequality (round 9) — decomposable inequality of doc lengths
# ---------------------------------------------------------------------------


def token_ge2_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-entropy GE(2) inequality of per-document token counts,
    decomposed BETWEEN and WITHIN sources -- the additively decomposable
    companion to token_lorenz_gini (Gini does not split; GE(2) = half the
    squared coefficient of variation does, with no logs -- rule 4).
    Exact forms: GE2_total = (N*Q - S^2)/(2S^2) with Q = Sigma n_i^2;
    GE2_between = (N*B - S^2)/(2S^2) with B = Sigma_g floor(S_g^2/N_g)
    computed WITHOUT overflow via the euclidean split
    q*S_g + (r*S_g) div N_g (q, r = divmod(S_g, N_g) -- no 10^6 scaling,
    so S_g^2 never materializes); GE2_within = N*(Q - B)/(2S^2). The
    floor on B biases between/within by < n_sources/(2S^2) -- quantized
    identically on both engines. Each source row carries its OWN GE2 plus
    the global decomposition (window-replicated constants).

    Scale: one map-side-combined per-doc count, one per-source aggregate,
    windows over |sources| rows. Q caps int64 at ~10^9 docs of 10^3
    tokens; past that, n_i^2 must pre-quantize (chi2 square-in-double
    rule)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(T.words()).alias("n")
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("n").alias("sg"),
        F.sum(F.col("n") * F.col("n")).alias("qg"),
    )
    w = Window.partitionBy()
    dec = (
        per_src.withColumn("bg", F.expr("(sg div ng) * sg + ((sg % ng) * sg) div ng"))
        .withColumn("nn", F.sum("ng").over(w))
        .withColumn("ss", F.sum("sg").over(w))
        .withColumn("qq", F.sum("qg").over(w))
        .withColumn("bb", F.sum("bg").over(w))
    )
    two_s2 = (F.lit(2) * F.col("ss") * F.col("ss")).cast("double")
    two_sg2 = (F.lit(2) * F.col("sg") * F.col("sg")).cast("double")
    return dec.select(
        "source",
        F.col("ng").alias("n_docs"),
        F.col("sg").alias("tokens"),
        (
            (F.col("ng") * F.col("qg") - F.col("sg") * F.col("sg")).cast("double")
            / two_sg2
        ).alias("ge2_source"),
        (
            (F.col("nn") * F.col("qq") - F.col("ss") * F.col("ss")).cast("double")
            / two_s2
        ).alias("ge2_total"),
        (
            (F.col("nn") * F.col("bb") - F.col("ss") * F.col("ss")).cast("double")
            / two_s2
        ).alias("ge2_between"),
        ((F.col("nn") * (F.col("qq") - F.col("bb"))).cast("double") / two_s2).alias(
            "ge2_within"
        ),
    )


SQL_TOKEN_GE2 = """
WITH gedoc AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n
  FROM documents
),
gesrc AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(n) AS BIGINT) AS sg,
         CAST(SUM(n * n) AS BIGINT) AS qg
  FROM gedoc GROUP BY 1
),
gedec AS (
  SELECT source, ng, sg, qg,
         (sg // ng) * sg + ((sg % ng) * sg) // ng AS bg,
         CAST(SUM(ng) OVER () AS BIGINT) AS nn,
         CAST(SUM(sg) OVER () AS BIGINT) AS ss,
         CAST(SUM(qg) OVER () AS BIGINT) AS qq,
         CAST(SUM((sg // ng) * sg + ((sg % ng) * sg) // ng) OVER () AS BIGINT)
           AS bb
  FROM gesrc
)
SELECT source, ng AS n_docs, sg AS tokens,
       CAST(ng * qg - sg * sg AS DOUBLE) / CAST(2 * sg * sg AS DOUBLE)
         AS ge2_source,
       CAST(nn * qq - ss * ss AS DOUBLE) / CAST(2 * ss * ss AS DOUBLE)
         AS ge2_total,
       CAST(nn * bb - ss * ss AS DOUBLE) / CAST(2 * ss * ss AS DOUBLE)
         AS ge2_between,
       CAST(nn * (qq - bb) AS DOUBLE) / CAST(2 * ss * ss AS DOUBLE)
         AS ge2_within
FROM gedec
"""

QUERIES["token_ge2_inequality"] = token_ge2_inequality
ORACLES["token_ge2_inequality"] = SQL_TOKEN_GE2


# ---------------------------------------------------------------------------
# conformal_quality_coverage (round 9) — split-conformal outlier threshold
# ---------------------------------------------------------------------------

CONF_ALPHA_DEN = 10  # alpha = 1/10


def conformal_quality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-conditional split-conformal low-quality detector, audited.
    Per source: docs split by the portable content hash
    h32('conf' || doc_id) % 2 (0 calibrates, 1 is the audit holdout --
    id PARITY is correlated with source in block-assigned id layouts, so
    the split must hash), the alpha = 0.1 conformal threshold is the k-th
    SMALLEST calibration quality score with the finite-sample rank
    k = (n_cal + 1) div 10 (integer ceil-free conformal rank, so
    P(score < thr) <= k/(n_cal+1) <= alpha under exchangeability), and
    the holdout measures the realized flag rate against that bound.
    Scores ride quality_score's round6 output recovered to exact micro
    ints (floor(q*10^6 + 0.5) of a 6-dp value is lossless); the
    threshold rank uses the deterministic tie order (score, doc_id).
    exceeds_2x flags sources whose realized rate is more than twice the
    conformal bound -- the exchangeability-violation alarm a training
    pipeline acts on (scores drifting between the two halves).

    Scale: per-doc scoring is the quality_score projection; ranking is
    per-source over calibration rows only (window on the score column,
    same class as the exact-percentile family). The doc_id join back to
    sources is the one corpus-sized equijoin (AQE-planned)."""
    from .quality import quality_score

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = (
        quality_score(spark, sf_dir)
        .select(
            "doc_id",
            F.floor(F.col("quality") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("sm"),
        )
        .join(docs, "doc_id")
        .withColumn(
            "is_cal",
            H.h32(F.concat(F.lit("conf"), F.col("doc_id").cast("string"))) % 2 == 0,
        )
        .localCheckpoint(eager=True)  # cal stats + rank + holdout sides
    )
    cal = scored.where(F.col("is_cal"))
    cal_n = cal.groupBy("source").agg(F.count(F.lit(1)).alias("n_cal")).withColumn(
        "k_rank", F.expr(f"(n_cal + 1) div {CONF_ALPHA_DEN}")
    )
    wsrc = Window.partitionBy("source").orderBy("sm", "doc_id")
    thr = (
        cal.withColumn("rn", F.row_number().over(wsrc))
        .join(cal_n, "source")
        .where(F.col("rn") == F.col("k_rank"))
        .select("source", "n_cal", "k_rank", F.col("sm").alias("thr_micro"))
    )
    test = scored.where(~F.col("is_cal"))
    audit = (
        test.join(thr, "source")
        .groupBy("source", "n_cal", "k_rank", "thr_micro")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("sm") < F.col("thr_micro"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_flagged"),
        )
    )
    return audit.select(
        "source",
        "n_cal",
        "n_test",
        "k_rank",
        "thr_micro",
        "n_flagged",
        (F.col("n_flagged").cast("double") / F.col("n_test").cast("double")).alias(
            "flag_rate"
        ),
        (F.col("k_rank").cast("double") / (F.col("n_cal") + 1).cast("double")).alias(
            "alpha_hat"
        ),
        (
            F.col("n_flagged") * (F.col("n_cal") + 1)
            > F.lit(2) * F.col("k_rank") * F.col("n_test")
        ).alias("exceeds_2x"),
    )


def _sql_conformal() -> str:
    from .quality import _SQL_QUALITY_EXPR

    return f"""
WITH cqs AS (
  SELECT doc_id, source,
         CAST(FLOOR(({_SQL_QUALITY_EXPR}) * 1000000.0 + 0.5) AS BIGINT) AS sm
  FROM documents
),
cqcal AS (
  SELECT * FROM cqs
  WHERE CAST(('0x' || substr(md5('conf' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 2 = 0
),
cqn AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cal,
         (CAST(COUNT(*) AS BIGINT) + 1) // {CONF_ALPHA_DEN} AS k_rank
  FROM cqcal GROUP BY 1
),
cqrn AS (
  SELECT source, sm,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY sm, doc_id) AS rn
  FROM cqcal
),
cqthr AS (
  SELECT n.source, n.n_cal, n.k_rank, r.sm AS thr_micro
  FROM cqn n JOIN cqrn r ON n.source = r.source AND r.rn = n.k_rank
),
cqaud AS (
  SELECT t.source, t.n_cal, t.k_rank, t.thr_micro,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN s.sm < t.thr_micro THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged
  FROM cqs s JOIN cqthr t ON s.source = t.source
  WHERE CAST(('0x' || substr(md5('conf' || CAST(s.doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 2 = 1
  GROUP BY 1, 2, 3, 4
)
SELECT source, n_cal, n_test, k_rank, thr_micro, n_flagged,
       CAST(n_flagged AS DOUBLE) / CAST(n_test AS DOUBLE) AS flag_rate,
       CAST(k_rank AS DOUBLE) / CAST(n_cal + 1 AS DOUBLE) AS alpha_hat,
       n_flagged * (n_cal + 1) > 2 * k_rank * n_test AS exceeds_2x
FROM cqaud
"""


QUERIES["conformal_quality_coverage"] = conformal_quality_coverage
ORACLES["conformal_quality_coverage"] = _sql_conformal()


# ---------------------------------------------------------------------------
# quality_quantile_normalize (round 9) — per-source score renormalization
# ---------------------------------------------------------------------------


def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize quality scores ACROSS sources: each doc's score
    is replaced by the global score at its within-source quantile, so a
    harsh-scored source and a lenient one become comparable before a
    single corpus-wide threshold is applied (the cross-source calibration
    step quality_threshold_yield assumes away). Exact integer mapping:
    within-source rank r of n (ties -> doc_id), target global position
    k = ceil(r*N/n) computed overflow-free via the euclidean split
    r*(N div n) + (r*(N mod n) + n - 1) div n, and the normalized score
    is the global k-th smallest (same tie order). Scores are
    quality_score's round6 output recovered to micro ints (the conformal
    treatment).

    Scale: BOTH rank passes use functions/ranking.with_global_rank --
    histogram-cumulative decomposition, never an unpartitioned
    row_number (the zorder r6 rule); the k lookup is an equi-join on the
    global rank. The euclidean k keeps int64 to n^2 < 2^63 (~3*10^9 docs
    per source)."""
    from .quality import quality_score
    from ..functions.ranking import with_global_rank

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = (
        quality_score(spark, sf_dir)
        .select(
            "doc_id",
            F.floor(F.col("quality") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("sm"),
        )
        .join(docs, "doc_id")
        .localCheckpoint(eager=True)  # source-rank + global-rank sides
    )
    src_ranked = with_global_rank(
        scored, "sm", "doc_id", part_cols=("source",), rank_name="r", total_name="n"
    )
    glob_ranked = with_global_rank(
        scored.select("doc_id", "sm"), "sm", "doc_id", rank_name="gr", total_name="nn"
    )
    lookup = glob_ranked.select(
        F.col("gr").alias("k"), F.col("sm").alias("norm_micro")
    )
    # corpus total WITHOUT a 1-row cross join (BNLJ lint class): the
    # per-source totals are a |sources|-row metadata frame; a global
    # window sum there gives N, joined back by source (plain equi-join)
    totals = (
        src_ranked.groupBy("source")
        .agg(F.max("n").alias("_n"))
        .withColumn("nn", F.sum("_n").over(Window.partitionBy()))
        .select("source", "nn")
    )
    out = (
        src_ranked.join(totals, "source")
        .withColumn("k", F.expr("r * (nn div n) + (r * (nn % n) + n - 1) div n"))
        .join(lookup, "k")
    )
    return out.select(
        "doc_id",
        "source",
        F.col("sm").alias("score_micro"),
        F.col("r").alias("src_rank"),
        F.col("n").alias("n_src"),
        "k",
        "norm_micro",
        (F.col("norm_micro") - F.col("sm")).alias("shift_micro"),
    )


def _sql_qqnorm() -> str:
    from .quality import _SQL_QUALITY_EXPR

    return f"""
WITH qqs AS (
  SELECT doc_id, source,
         CAST(FLOOR(({_SQL_QUALITY_EXPR}) * 1000000.0 + 0.5) AS BIGINT) AS sm
  FROM documents
),
qqsrc AS (
  SELECT doc_id, source, sm,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY sm, doc_id) AS r,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn
  FROM qqs
),
qqglob AS (
  SELECT sm AS norm_micro,
         ROW_NUMBER() OVER (ORDER BY sm, doc_id) AS k
  FROM qqs
)
SELECT s.doc_id, s.source, s.sm AS score_micro,
       s.r AS src_rank, s.n AS n_src, s.k, g.norm_micro,
       g.norm_micro - s.sm AS shift_micro
FROM (
  SELECT doc_id, source, sm, r, n,
         r * (nn // n) + (r * (nn % n) + n - 1) // n AS k
  FROM qqsrc
) s JOIN qqglob g USING (k)
"""


QUERIES["quality_quantile_normalize"] = quality_quantile_normalize
ORACLES["quality_quantile_normalize"] = _sql_qqnorm()


# ---------------------------------------------------------------------------
# token_hapax_profile (round 9) — lexical-richness tail per source
# ---------------------------------------------------------------------------


def token_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis-legomena profile per source: how much of each source's
    vocabulary (and token mass) sits in words seen exactly once or
    twice. High hapax share = productive/heterogeneous text (or OCR
    noise); collapsing hapax share across snapshots is the classic
    symptom of template flooding. Pure integer counts with two final
    divisions; the vocabulary is per-source (the drift ops' convention).

    Scale: token stream -> per-(source, token) counts (map-side
    combine) -> per-source rollup; no join, no window."""
    toks = read_table(spark, sf_dir, "documents").select(
        "source", F.explode(T.words()).alias("tok")
    ).where(F.col("tok") != "")
    cells = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        cells.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("c").alias("tokens"),
            F.sum(F.when(F.col("c") == 1, F.lit(1)).otherwise(F.lit(0))).alias("hapax"),
            F.sum(F.when(F.col("c") == 2, F.lit(1)).otherwise(F.lit(0))).alias("dis"),
        )
        .select(
            "source",
            "vocab",
            "tokens",
            "hapax",
            "dis",
            (F.col("hapax").cast("double") / F.col("vocab").cast("double")).alias(
                "hapax_vocab_share"
            ),
            (F.col("hapax").cast("double") / F.col("tokens").cast("double")).alias(
                "hapax_mass_share"
            ),
        )
    )


SQL_TOKEN_HAPAX = f"""
WITH hxt AS (
  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
hxc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM hxt WHERE tok <> '' GROUP BY 1, 2
),
hxs AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c) AS BIGINT) AS tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis
  FROM hxc GROUP BY 1
)
SELECT source, vocab, tokens, hapax, dis,
       CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_vocab_share,
       CAST(hapax AS DOUBLE) / CAST(tokens AS DOUBLE) AS hapax_mass_share
FROM hxs
"""

QUERIES["token_hapax_profile"] = token_hapax_profile
ORACLES["token_hapax_profile"] = SQL_TOKEN_HAPAX


# ---------------------------------------------------------------------------
# term_burstiness — Church–Gale within-doc concentration (r9 session 3)
# ---------------------------------------------------------------------------

BURSTY_DF_MIN = 5  # the top-term pick ignores terms seen in < 5 docs


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church–Gale burstiness profile per source: for every (source, term),
    burstiness b = tf / df_s — mean occurrences per CONTAINING document
    (tf = occurrences within the source, df_s = distinct docs of the
    source containing the term). Content words arrive in bursts (b ≫ 1 —
    one topical doc repeats them), function words spread thin (b ≈ 1) —
    so a source whose vocabulary mass is dominated by bursty terms is
    template/spam-like (the TERM-level cousin of boilerplate_shingles'
    shingle-level audit). Emitted per source: vocabulary and occurrence-
    mass shares of bursty terms (b > 2, i.e. the all-int64 rule
    tf > 2·df_s), and the burstiest established term (df_s ≥ 5) via the
    deterministic struct-min argmax on the 1e6-micro integer ratio
    (tf·10⁶ div df_s — integer division, no float compare), term-asc ties.

    Scale: one token explode shuffling once on (source, term) with
    map-side combine (the df/tf pass carries |per-source vocabulary|
    rows, not |tokens|), then a per-source rollup — the idf_topterms
    shuffle shape with the distinct-doc count folded into the same
    aggregate."""
    docs = spread_scan(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    terms = docs.select(
        "doc_id", "source", F.explode(T.words()).alias("term")
    ).where(F.col("term") != "")
    per = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("dfs"),
    )
    sc = per.withColumn("b_mic", F.expr("tf * 1000000 div dfs")).withColumn(
        "bursty", F.col("tf") > F.lit(2) * F.col("dfs")
    )
    agg = sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.when(F.col("bursty"), 1).otherwise(0)).alias("n_bursty"),
        F.sum("tf").alias("mass"),
        F.sum(F.when(F.col("bursty"), F.col("tf")).otherwise(0)).alias("mass_bursty"),
        F.min(
            F.when(
                F.col("dfs") >= BURSTY_DF_MIN,
                F.struct(
                    (-F.col("b_mic")).alias("nb"), F.col("term").alias("t")
                ),
            )
        ).alias("top"),
    )
    return agg.select(
        "source",
        "n_terms",
        "n_bursty",
        (F.col("n_bursty").cast("double") / F.col("n_terms").cast("double")).alias(
            "vocab_share_bursty"
        ),
        (F.col("mass_bursty").cast("double") / F.col("mass").cast("double")).alias(
            "mass_share_bursty"
        ),
        F.col("top.t").alias("top_term"),
        ((-F.col("top.nb")).cast("double") / F.lit(1000000).cast("double")).alias(
            "top_burstiness"
        ),
    )


SQL_TERM_BURSTINESS = f"""
WITH tbterms AS (
  SELECT doc_id, source, unnest({T.SQL_WORDS}) AS term FROM documents
),
tbne AS (SELECT * FROM tbterms WHERE term <> ''),
tbper AS (
  SELECT source, term,
         CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dfs
  FROM tbne GROUP BY 1, 2
),
tbsc AS (
  SELECT *, (tf * 1000000) // dfs AS b_mic, tf > 2 * dfs AS bursty FROM tbper
),
tbagg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CASE WHEN bursty THEN 1 ELSE 0 END) AS BIGINT) AS n_bursty,
         CAST(SUM(tf) AS BIGINT) AS mass,
         CAST(SUM(CASE WHEN bursty THEN tf ELSE 0 END) AS BIGINT) AS mass_bursty,
         MIN(CASE WHEN dfs >= {BURSTY_DF_MIN}
                  THEN {{'nb': -b_mic, 't': term}} END) AS top
  FROM tbsc GROUP BY 1
)
SELECT source, n_terms, n_bursty,
       CAST(n_bursty AS DOUBLE) / CAST(n_terms AS DOUBLE) AS vocab_share_bursty,
       CAST(mass_bursty AS DOUBLE) / CAST(mass AS DOUBLE) AS mass_share_bursty,
       top.t AS top_term,
       CAST(-top.nb AS DOUBLE) / CAST(1000000 AS DOUBLE) AS top_burstiness
FROM tbagg
"""

QUERIES["term_burstiness"] = term_burstiness
ORACLES["term_burstiness"] = SQL_TERM_BURSTINESS
