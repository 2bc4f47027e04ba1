"""Deterministic sampling / splitting operators (replay-stable, engine-
portable — hash-ranked, never rand()):

- reservoir_sample : fixed-size uniform sample per group (the k docs with
                     the smallest salted hash per (lang) — equivalent in
                     distribution to reservoir sampling, but deterministic
                     and mergeable: the min-k of a union is the min-k of
                     the per-partition min-k's, so executors keep k rows
                     each and the driver never sees the corpus).
- train_test_split : hash-bucket assignment to train/val/test with a
                     leakage audit — per-split counts plus the count of
                     NORMALIZED-TEXT collisions that cross splits (near-dup
                     leakage is the thing a split audit actually checks).

Complements stratified_sample (rate-based thinning) in pipeline.py: the
reservoir keeps an exact per-group SIZE, the split partitions the corpus
exhaustively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

RESERVOIR_K = 25
RESERVOIR_SALT = "reservoir:"
SPLIT_SALT = "split:"
SPLIT_TRAIN, SPLIT_VAL = 80, 90  # bucket < 80 train, < 90 val, else test


def reservoir_sample(spark: SparkSession, sf_dir: str, k: int = RESERVOIR_K) -> DataFrame:
    """Exactly k docs per language (fewer only if the stratum is smaller),
    chosen as the k smallest salted hashes — uniform over the stratum,
    identical on every run/engine/partitioning."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    h = H.h32(F.concat(F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= k)
        .select("lang", "draw_rank", "doc_id", "source")
    )


SQL_RESERVOIR_SAMPLE = f"""
WITH hashed AS (
  SELECT doc_id, lang, source,
         {H.sql_h32(f"'{RESERVOIR_SALT}' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS draw_rank
  FROM hashed
)
SELECT lang, draw_rank, doc_id, source
FROM ranked WHERE draw_rank <= {RESERVOIR_K}
ORDER BY lang, draw_rank
"""


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split + leakage audit. A doc's split comes
    from its salted id hash; leakage counts distinct normalized texts that
    appear in more than one split (exact-dup leakage across the boundary
    — what contamination screens must catch before training).

    Scale: split assignment is a pure projection; the audit is one
    groupBy on the text hash (same shuffle key as dedup_exact) carrying
    (distinct-splits, doc-count) partial aggregates."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = H.h32(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
    )
    norm = H.h60(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    assigned = docs.select(split.alias("split"), norm.alias("th"))
    # one shuffle on th: per-text distinct-split count, joined back to the
    # per-(split, text) pairs on the same key (co-partitioned equi-join)
    th_splits = assigned.groupBy("th").agg(F.countDistinct("split").alias("n_splits"))
    pairs = assigned.groupBy("split", "th").agg(F.count(F.lit(1)).alias("n_docs_text"))
    audited = pairs.join(th_splits, "th")
    return (
        audited.groupBy("split")
        .agg(
            F.sum("n_docs_text").alias("n_docs"),
            F.count(F.lit(1)).alias("n_distinct_texts"),
            F.sum((F.col("n_splits") > 1).cast("long")).alias("leaked_texts"),
        )
        .select("split", "n_docs", "n_distinct_texts", "leaked_texts")
    )


_SPLIT_HASH = H.sql_h32(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")
_SQL_SPLIT = (
    f"CASE WHEN {_SPLIT_HASH} % 100 < {SPLIT_TRAIN} THEN 'train' "
    f"WHEN {_SPLIT_HASH} % 100 < {SPLIT_VAL} THEN 'val' "
    "ELSE 'test' END"
)

_SQL_TEXT_HASH = H.sql_h60("regexp_replace(lower(text), '\\s+', ' ', 'g')")

SQL_TRAIN_TEST_SPLIT = f"""
WITH assigned AS (
  SELECT {_SQL_SPLIT} AS split,
         {_SQL_TEXT_HASH} AS th
  FROM documents
),
th_splits AS (
  SELECT th, COUNT(DISTINCT split) AS n_splits FROM assigned GROUP BY th
),
pairs AS (
  SELECT split, th, COUNT(*) AS n_docs_text FROM assigned GROUP BY 1, 2
)
SELECT p.split,
       CAST(SUM(p.n_docs_text) AS BIGINT) AS n_docs,
       COUNT(*) AS n_distinct_texts,
       CAST(SUM(CASE WHEN s.n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked_texts
FROM pairs p JOIN th_splits s USING (th)
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "reservoir_sample": reservoir_sample,
    "train_test_split": train_test_split,
}

ORACLES = {
    "reservoir_sample": SQL_RESERVOIR_SAMPLE,
    "train_test_split": SQL_TRAIN_TEST_SPLIT,
}


# ---------------------------------------------------------------------------
# kfold_assignment (round 7)
# ---------------------------------------------------------------------------

KFOLD_K = 5
KFOLD_SALT = "kfold:"


def kfold_assignment(spark: SparkSession, sf_dir: str, k: int = KFOLD_K) -> DataFrame:
    """Deterministic k-fold cross-validation assignment with a stratum
    balance audit: fold = salted-hash(doc_id) mod k (replay-stable,
    engine-portable — the same contract as train_test_split), audited per
    (lang, fold): doc count, token count, and the doc-count load factor
    vs the uniform |stratum|/k expectation. The table a training pipeline
    reads before trusting that per-fold metrics are comparable — a fold
    that drew 1.4x its share of one language measures a different
    distribution, not a different model.

    Scale: one corpus scan into a |langs| x k aggregate (map-side
    combined); the expectation join is |langs| rows broadcast. Exact
    integers until the one load-factor division per row."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    fold = (
        H.h32(F.concat(F.lit(KFOLD_SALT), F.col("doc_id").cast("string"))) % k
    ).alias("fold")
    n_tokens = F.size(F.expr(r"filter(split(lower(text), '\\s+'), w -> w <> '')"))
    cells = (
        docs.select("lang", fold, n_tokens.alias("n_tok"))
        .groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        # |langs| x k rows; feeds the stratum totals AND the output join —
        # checkpoint so the corpus scan runs once
        .localCheckpoint(eager=True)
    )
    strata = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_stratum"))
    return (
        cells.join(F.broadcast(strata), "lang")
        .select(
            "lang",
            "fold",
            "n_docs",
            "n_tokens",
            "n_stratum",
            H.round6(
                F.col("n_docs").cast("double")
                * F.lit(float(k))
                / F.col("n_stratum").cast("double")
            ).alias("load_factor"),
        )
        .orderBy("lang", "fold")
    )


SQL_KFOLD_ASSIGNMENT = f"""
WITH cells AS (
  SELECT lang,
         {H.sql_h32(f"'{KFOLD_SALT}' || CAST(doc_id AS VARCHAR)")} % {KFOLD_K} AS fold,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
),
strata AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_stratum FROM cells GROUP BY 1)
SELECT c.lang, c.fold, c.n_docs, c.n_tokens, s.n_stratum,
       {H.sql_round6(f"CAST(c.n_docs AS DOUBLE) * {float(KFOLD_K)} / CAST(s.n_stratum AS DOUBLE)")} AS load_factor
FROM cells c JOIN strata s USING (lang)
ORDER BY c.lang, c.fold
"""


QUERIES["kfold_assignment"] = kfold_assignment
ORACLES["kfold_assignment"] = SQL_KFOLD_ASSIGNMENT
