"""Substring-granular dedup (Lee et al. 2022 'Deduplicating Training Data
Makes Language Models Better' style) and a deterministic Bloom-filter
membership prefilter — the two passes a corpus pipeline runs between
document-level hashing and expensive pairwise comparison.

- dedup_substring: token-window (W-gram) hashes shared across >=2 docs mark
  duplicated positions; overlapping windows merge into maximal duplicated
  token spans per doc (the unit you'd actually cut out of training data).
- dedup_bloom: membership test of a new batch against an existing corpus
  through a k-hash Bloom signature, with the exact check run only behind the
  filter — plus false-positive accounting, since the bit array is
  deterministic (md5-derived) in both engines.

Scale: the substring pass shuffles (window-hash -> doc list) exactly like the
minhash path — uniform md5 keys, map-side combined; span merging is one
window per doc over its few flagged positions. The Bloom path's bit set is
k·|old| positions, orders of magnitude smaller than the corpus — broadcast
(here, a broadcast hash join; on a real cluster the same bits pack into a
`spark.util.sketch.BloomFilter` built via stat.approxQuantile-style JVM agg);
only bloom-positive docs reach the exact-text shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_table, spread_scan

WINDOW_W = 8  # tokens per duplicated-substring window

_NORM = "regexp_replace(trim(lower(text)), '\\\\s+', ' ')"
_SQL_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(read_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.split(F.expr(_NORM), " ").alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per doc: every W-token window whose
    hash appears in >=2 distinct docs flags its token range; overlapping or
    adjacent ranges merge (running-max-end gaps-and-islands) into spans.
    Output per doc: span count, widest span, duplicated-token fraction."""
    base = _doc_tokens(spark, sf_dir)
    # 60-bit integer window hashes (md5 prefix): same join/groupBy semantics
    # as the full digest but the shuffle carries 8-byte keys, not 32-char
    # strings — ~4x less exchange volume on the corpus-sized stage
    sh_hash = (
        f"CAST(conv(substring(md5(array_join(slice(toks, p, {WINDOW_W}), ' ')), 1, 15),"
        f" 16, 10) AS BIGINT)"
    )
    shingled = base.where(F.col("n_tokens") >= WINDOW_W).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, n_tokens - {WINDOW_W - 1}),"
                f" p -> struct(p AS p, {sh_hash} AS sh))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.p").alias("p"), F.col("s.sh").alias("sh"))
    dup_windows = (
        shingled.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("sh")
    )
    flagged = shingled.join(dup_windows, "sh").select(
        "doc_id", "p", (F.col("p") + F.lit(WINDOW_W - 1)).alias("endp")
    )
    w_prev = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    spans = (
        flagged.withColumn(
            "new_span",
            (F.col("p") > F.coalesce(F.max("endp").over(w_prev), F.lit(-1)) + 1).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(w_run))
        .groupBy("doc_id", "span_id")
        .agg((F.max("endp") - F.min("p") + 1).alias("span_len"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.max("span_len").alias("max_span_tokens"),
            F.sum("span_len").alias("dup_tokens"),
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("max_span_tokens", F.lit(0)).alias("max_span_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (
                F.floor(
                    F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens") * 1000000.0 + 0.5
                )
                / 1000000.0
            ).alias("dup_token_fraction"),
        )
    )


SQL_DEDUP_SUBSTRING = f"""
WITH base AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks FROM documents
),
sized AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM base),
shingled AS (
  SELECT doc_id, p,
         CAST(('0x' || substr(md5(array_to_string(toks[p : p + {WINDOW_W - 1}], ' ')), 1, 15)) AS BIGINT) AS sh
  FROM sized, UNNEST(generate_series(1, n_tokens - {WINDOW_W - 1})) AS g(p)
  WHERE n_tokens >= {WINDOW_W}
),
dup_windows AS (SELECT sh FROM shingled GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
flagged AS (
  SELECT s.doc_id, s.p, s.p + {WINDOW_W - 1} AS endp
  FROM shingled s JOIN dup_windows d USING (sh)
),
marked AS (
  SELECT doc_id, p, endp,
         CASE WHEN p > COALESCE(MAX(endp) OVER (PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_span
  FROM flagged
),
islands AS (
  SELECT doc_id, p, endp,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MAX(endp) - MIN(p) + 1 AS span_len
  FROM islands GROUP BY doc_id, span_id
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, MAX(span_len) AS max_span_tokens,
         CAST(SUM(span_len) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT s.doc_id, s.n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.max_span_tokens, 0) AS max_span_tokens,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       floor(COALESCE(p.dup_tokens, 0) / s.n_tokens * 1000000.0 + 0.5) / 1000000.0
         AS dup_token_fraction
FROM sized s LEFT JOIN per_doc p USING (doc_id)
ORDER BY s.doc_id
"""

# --- Bloom-filter membership prefilter --------------------------------------

BLOOM_K = 4
BLOOM_M = 1 << 18  # bits


def dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch membership against an existing corpus through a Bloom
    signature: even doc_ids are the indexed corpus, odd are the new batch.
    A new doc is bloom-positive iff all K md5-derived bit positions of its
    normalized text are set by some old doc; the exact content check then
    splits true duplicates from false positives. Deterministic bits => the
    false-positive count itself is oracle-checkable."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_NORM).alias("norm")
    )
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    def bits(df: DataFrame) -> DataFrame:
        ks = F.array(*[F.lit(k) for k in range(BLOOM_K)])
        return df.select(
            "doc_id", F.explode(ks).alias("k"), "norm"
        ).select(
            "doc_id",
            "k",
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("bloom"), F.col("k"), F.lit("|"), F.col("norm"))), 1, 15),
                    16,
                    10,
                ).cast("bigint")
                % BLOOM_M
            ).alias("bit"),
        )

    old_bits = bits(old).select("bit").distinct()
    probe = bits(new)
    hits = (
        probe.join(F.broadcast(old_bits.withColumn("set_", F.lit(1))), "bit", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("bit").alias("n_bits"),
            F.count_distinct(F.when(F.col("set_").isNotNull(), F.col("bit"))).alias("n_hit"),
        )
        .select("doc_id", (F.col("n_hit") == F.col("n_bits")).cast("int").alias("bloom_positive"))
    )
    # exact is the OLD corpus's distinct norms — corpus-derived, so no
    # broadcast hint (the Bloom bit array above is the bounded broadcast;
    # this audit side shuffle-joins on norm at scale, AQE broadcasts small)
    exact = old.select(F.col("norm").alias("norm_old")).distinct()
    verdicts = (
        new.join(hits, "doc_id")
        .join(exact, F.col("norm") == F.col("norm_old"), "left")
        .select(
            "doc_id",
            "bloom_positive",
            F.col("norm_old").isNotNull().cast("int").alias("true_dup"),
        )
    )
    return verdicts.withColumn(
        "false_positive",
        ((F.col("bloom_positive") == 1) & (F.col("true_dup") == 0)).cast("int"),
    )


SQL_DEDUP_BLOOM = f"""
WITH docs AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
old AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
new_batch AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
old_bits AS (
  SELECT DISTINCT CAST(('0x' || substr(md5('bloom' || k || '|' || norm), 1, 15)) AS BIGINT)
         % {BLOOM_M} AS bit
  FROM old, UNNEST(generate_series(0, {BLOOM_K - 1})) AS g(k)
),
probe AS (
  SELECT doc_id, CAST(('0x' || substr(md5('bloom' || k || '|' || norm), 1, 15)) AS BIGINT)
         % {BLOOM_M} AS bit
  FROM new_batch, UNNEST(generate_series(0, {BLOOM_K - 1})) AS g(k)
),
hits AS (
  SELECT p.doc_id,
         CASE WHEN COUNT(DISTINCT CASE WHEN o.bit IS NOT NULL THEN p.bit END)
                   = COUNT(DISTINCT p.bit) THEN 1 ELSE 0 END AS bloom_positive
  FROM probe p LEFT JOIN old_bits o ON p.bit = o.bit
  GROUP BY p.doc_id
),
verdicts AS (
  SELECT n.doc_id, h.bloom_positive,
         CASE WHEN EXISTS (SELECT 1 FROM old o WHERE o.norm = n.norm) THEN 1 ELSE 0 END AS true_dup
  FROM new_batch n JOIN hits h USING (doc_id)
)
SELECT doc_id, bloom_positive, true_dup,
       CASE WHEN bloom_positive = 1 AND true_dup = 0 THEN 1 ELSE 0 END AS false_positive
FROM verdicts ORDER BY doc_id
"""

QUERIES = {
    "dedup_substring": dedup_substring,
    "dedup_bloom": dedup_bloom,
}
ORACLES = {
    "dedup_substring": SQL_DEDUP_SUBSTRING,
    "dedup_bloom": SQL_DEDUP_BLOOM,
}
