"""Training-schedule operators: what a pipeline decides AFTER curation —
how much of each source to sample, in what order to feed documents, and
which token spans a denoising objective masks.

- mixture_temperature_weights : per-source sampling weights with temperature
  alpha = 1/2 (the mT5/XLM-R rebalance: w ∝ p^alpha lifts low-resource
  sources; sqrt is the one exponent that is portably IEEE-exact, and the
  repo's no-libm-pow rule holds).
- curriculum_stages : order the corpus easy -> hard by the unigram-LM
  rarity proxy (lm_rarity_score) and cut it into NTILE stages with exact
  cumulative token offsets — the artifact a curriculum loader consumes.
- span_corruption_plan : deterministic T5-style span-masking plan
  (15% density, span length 3) with positions drawn from the portable
  hash — replay-identical noise without an RNG.

Determinism: every ratio is integer-aggregated first and divided once at
the end; sqrt is correctly-rounded IEEE so sqrt(p) agrees bit-for-bit
across engines; per-source sqrt weights are 1e-6-quantized to ints BEFORE
the normalizing sum (summing raw doubles across groups would depend on
partial-agg order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table
from .corpus import SQL_LM_RARITY, lm_rarity_score

CURR_STAGES = 4  # curriculum phases (ntile cut)
SPAN_LEN = 3  # T5 mean span length (fixed, not sampled — determinism)
# mask density 15% at span length 3 -> spans = round(n/20) in exact ints
SPAN_DENSITY_DEN = 20

_SPARK_WORDS = "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
_SQL_WORDS_NE = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture: per source, token share p, the
    alpha=1/2 sampling weight sqrt(p)/Σ sqrt(p), and the effective epoch
    count weight·total/n_tokens (how many times that source's data is seen
    when the mixture serves `total` tokens). The knob that keeps a 100-TB
    web crawl from drowning the books/code sources.

    Scale: one corpus scan projecting (source, token count) — counts
    aggregate map-side to |sources| rows; everything after runs on that
    broadcastable aggregate. Weights quantize sqrt(p) to 1e-6 ints before
    the normalizing sum, so the denominator is an exact integer on both
    engines regardless of aggregation order."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.expr(f"size({_SPARK_WORDS})").cast("long").alias("n_toks")
    )
    grp = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    w_all = Window.partitionBy()
    total = F.sum("n_tokens").over(w_all)
    sq_micro = F.floor(
        F.sqrt(F.col("n_tokens").cast("double") / total.cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    staged = grp.select("source", "n_docs", "n_tokens", total.alias("total_tokens"),
                        sq_micro.alias("sq_micro"))
    tot_sq = F.sum("sq_micro").over(Window.partitionBy())
    weight_raw = F.col("sq_micro").cast("double") / tot_sq.cast("double")
    return staged.select(
        "source",
        "n_docs",
        "n_tokens",
        H.round6(F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double")).alias("p_share"),
        H.round6(weight_raw).alias("weight"),
        H.round6(
            weight_raw * F.col("total_tokens").cast("double") / F.col("n_tokens").cast("double")
        ).alias("effective_epochs"),
    )


SQL_MIXTURE_TEMPERATURE = f"""
WITH per_doc AS (
  SELECT source, CAST(len({_SQL_WORDS_NE}) AS BIGINT) AS n_toks FROM documents
),
grp AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM per_doc GROUP BY source
),
staged AS (
  SELECT source, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sq_micro
  FROM grp
)
SELECT source, n_docs, n_tokens,
       {H.sql_round6("CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)")} AS p_share,
       {H.sql_round6("CAST(sq_micro AS DOUBLE) / CAST(SUM(sq_micro) OVER () AS DOUBLE)")} AS weight,
       {H.sql_round6("CAST(sq_micro AS DOUBLE) / CAST(SUM(sq_micro) OVER () AS DOUBLE) * CAST(total_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS effective_epochs
FROM staged ORDER BY source
"""


def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: rank every document easy -> hard by the
    unigram-LM rarity proxy (fluent/common-token docs first), cut the
    ranking into CURR_STAGES ntiles, and carry the exact cumulative token
    offset at which each doc is reached — what a curriculum data loader
    needs to seek stage boundaries.

    Scale: difficulty comes from lm_rarity_score (broadcast vocabulary,
    map-side-combined sums); the global window then runs over the (doc_id,
    difficulty, n_tokens) PROJECTION — metadata-sized rows, never the text.
    At 100 TB the same plan holds: the sort ships ~24 bytes/doc, and the
    stage id can drive a partitioned rewrite of the corpus afterwards."""
    rarity = lm_rarity_score(spark, sf_dir)
    w = Window.orderBy("mean_rarity_micro", "doc_id")
    return rarity.select(
        "doc_id",
        "n_tokens",
        "mean_rarity_micro",
        F.ntile(CURR_STAGES).over(w).alias("stage"),
        (
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("n_tokens")
        ).alias("tokens_before"),
    )


SQL_CURRICULUM_STAGES = f"""
WITH rarity AS ({SQL_LM_RARITY.replace("ORDER BY doc_id", "")})
SELECT doc_id, n_tokens, mean_rarity_micro,
       NTILE({CURR_STAGES}) OVER (ORDER BY mean_rarity_micro, doc_id) AS stage,
       CAST(SUM(n_tokens) OVER (ORDER BY mean_rarity_micro, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens AS BIGINT) AS tokens_before
FROM rarity ORDER BY mean_rarity_micro, doc_id
"""


def curriculum_stages_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curriculum_stages, scale-safe: identical output (same stages, same
    exact cumulative token offsets) WITHOUT the unpartitioned row-level
    window. The rank over (mean_rarity_micro, doc_id) decomposes into the
    difficulty HISTOGRAM's cumulative edges (a window over |distinct
    difficulty values| rows — metadata-sized) plus a per-difficulty-value
    window (distributed). Exact two-pass rank, so the NTILE twin's oracle
    verifies this plan unchanged and the exact-vs-edges agreement is
    identically 1.0 — see functions/ranking.py for the decomposition.

    At 25B docs the single-window form sorts ~600 GB in ONE task; this
    form's biggest single sort is one difficulty value's tie group."""
    from ..functions.ranking import ntile_of_rank, with_global_rank

    rarity = lm_rarity_score(spark, sf_dir)
    ranked = with_global_rank(
        rarity,
        "mean_rarity_micro",
        "doc_id",
        cum_cols=("n_tokens",),
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "mean_rarity_micro",
        ntile_of_rank(F.col("__rank"), F.col("__total"), CURR_STAGES).alias("stage"),
        (F.col("__cum_n_tokens") - F.col("n_tokens")).cast("long").alias("tokens_before"),
    )


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5 span-corruption plan: per document, the number of
    noise spans (15% token density / span length 3, exact integer math),
    the count of distinct masked token positions (spans may overlap — the
    plan reports realized coverage), and the realized mask ratio in
    micro-units. Span starts are drawn from the portable doc_id||span
    hash, so the same document gets the same noise on every run, engine,
    and replay — an RNG-free denoising objective.

    Scale: a PURE per-row projection — the span list, position flatten,
    and distinct-count all happen inside one JVM expression over each row;
    no shuffle, no UDF, no state."""
    start_h = H.spark_sql_h32("CAST(doc_id AS STRING) || ':' || CAST(j AS STRING)")
    expr = (
        f"size(array_distinct(flatten(transform("
        f"transform(sequence(1, n_spans), j -> 1 + {start_h} % greatest(1, n_tokens - {SPAN_LEN - 1})), "
        f"s -> filter(sequence(s, s + {SPAN_LEN - 1}), p -> p <= n_tokens)))))"
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"size({_SPARK_WORDS})").cast("long").alias("n_tokens")
    )
    planned = docs.select(
        "doc_id",
        "n_tokens",
        F.expr(f"greatest(1, (n_tokens + {SPAN_DENSITY_DEN // 2}) div {SPAN_DENSITY_DEN})").alias("n_spans"),
    )
    return planned.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.expr(expr).cast("long").alias("masked_positions"),
        F.expr(f"({expr} * 1000000) div n_tokens").cast("long").alias("mask_ratio_micro"),
    )


def _sql_span_plan() -> str:
    start_h = H.sql_h32("CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    masked = (
        f"len(list_distinct(flatten(list_transform("
        f"list_transform(generate_series(1, n_spans), j -> 1 + {start_h} % greatest(1, n_tokens - {SPAN_LEN - 1})), "
        f"s -> list_filter(generate_series(s, s + {SPAN_LEN - 1}), p -> p <= n_tokens)))))"
    )
    return f"""
WITH sized AS (
  SELECT doc_id, CAST(len({_SQL_WORDS_NE}) AS BIGINT) AS n_tokens FROM documents
),
planned AS (
  SELECT doc_id, n_tokens,
         GREATEST(1, (n_tokens + {SPAN_DENSITY_DEN // 2}) // {SPAN_DENSITY_DEN}) AS n_spans
  FROM sized
)
SELECT doc_id, n_tokens, n_spans,
       CAST({masked} AS BIGINT) AS masked_positions,
       CAST(({masked} * 1000000) // n_tokens AS BIGINT) AS mask_ratio_micro
FROM planned ORDER BY doc_id
"""


QUERIES = {
    "mixture_temperature_weights": mixture_temperature_weights,
    "curriculum_stages": curriculum_stages,
    "curriculum_stages_edges": curriculum_stages_edges,
    "span_corruption_plan": span_corruption_plan,
}

ORACLES = {
    "mixture_temperature_weights": SQL_MIXTURE_TEMPERATURE,
    "curriculum_stages": SQL_CURRICULUM_STAGES,
    # exact two-pass rank == exact NTILE output: the same oracle verifies both
    "curriculum_stages_edges": SQL_CURRICULUM_STAGES,
    "span_corruption_plan": _sql_span_plan(),
}


MLM_MASK_PCT = 15  # fraction of tokens selected for prediction, percent
# of the selected tokens: 80% -> [MASK], 10% -> random token, 10% -> kept
MLM_MASK_SPLIT, MLM_RAND_SPLIT = 8, 9  # h % 10 < 8 mask; < 9 random; else keep


def mlm_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic BERT-style MLM masking plan: per document, ~15% of
    token positions are selected by portable hash, and each selected
    position is assigned its action by a second hash — 80% [MASK], 10%
    random-token substitution, 10% kept unchanged. RNG-free: the same doc
    masks identically on every run, engine, and replay (the
    span_corruption_plan sibling for encoder-style objectives).

    Scale: pure per-row projection — position selection and the action
    split are array expressions over sequence(1, n_tokens); no shuffle,
    no UDF. Counts are exact integers."""
    sel_h = H.spark_sql_h32("CAST(doc_id AS STRING) || '@' || CAST(p AS STRING)")
    act_h = H.spark_sql_h32("CAST(doc_id AS STRING) || '#' || CAST(p AS STRING)")
    sel = f"filter(sequence(1, n_tokens), p -> {sel_h} % 100 < {MLM_MASK_PCT})"
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"size({_SPARK_WORDS})").cast("long").alias("n_tokens")
    )
    return docs.select(
        "doc_id",
        "n_tokens",
        F.expr(f"size({sel})").cast("long").alias("n_selected"),
        F.expr(f"size(filter({sel}, p -> {act_h} % 10 < {MLM_MASK_SPLIT}))")
        .cast("long")
        .alias("n_masked"),
        F.expr(
            f"size(filter({sel}, p -> {act_h} % 10 >= {MLM_MASK_SPLIT} "
            f"AND {act_h} % 10 < {MLM_RAND_SPLIT}))"
        )
        .cast("long")
        .alias("n_random"),
        F.expr(f"size(filter({sel}, p -> {act_h} % 10 >= {MLM_RAND_SPLIT}))")
        .cast("long")
        .alias("n_kept"),
    )


def _sql_mlm_plan() -> str:
    sel_h = H.sql_h32("CAST(doc_id AS VARCHAR) || '@' || CAST(p AS VARCHAR)")
    act_h = H.sql_h32("CAST(doc_id AS VARCHAR) || '#' || CAST(p AS VARCHAR)")
    sel = f"list_filter(generate_series(1, n_tokens), p -> {sel_h} % 100 < {MLM_MASK_PCT})"
    return f"""
WITH sized AS (
  SELECT doc_id, CAST(len({_SQL_WORDS_NE}) AS BIGINT) AS n_tokens FROM documents
)
SELECT doc_id, n_tokens,
       CAST(len({sel}) AS BIGINT) AS n_selected,
       CAST(len(list_filter({sel}, p -> {act_h} % 10 < {MLM_MASK_SPLIT})) AS BIGINT) AS n_masked,
       CAST(len(list_filter({sel}, p -> {act_h} % 10 >= {MLM_MASK_SPLIT} AND {act_h} % 10 < {MLM_RAND_SPLIT})) AS BIGINT) AS n_random,
       CAST(len(list_filter({sel}, p -> {act_h} % 10 >= {MLM_RAND_SPLIT})) AS BIGINT) AS n_kept
FROM sized ORDER BY doc_id
"""


QUERIES["mlm_masking_plan"] = mlm_masking_plan
ORACLES["mlm_masking_plan"] = _sql_mlm_plan()
