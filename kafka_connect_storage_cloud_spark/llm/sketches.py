"""Portable cardinality / frequency sketches, oracle-checked bit-for-bit.

At 100 TB you cannot afford exact COUNT(DISTINCT) or full-frequency tables
for monitoring; sketches bound the state per group to O(k) regardless of
input size. Spark's built-in approx_count_distinct (HLL++) is not
reproducible against another engine, so these operators rebuild the three
classic sketches from the portable md5 hash (functions/hashing.py) — every
intermediate is either an int64 or a fixed-order IEEE double, so Spark and
DuckDB agree exactly and the estimate itself is oracle-checkable:

- kmv_distinct        K-minimum-values distinct-count estimate per group.
- hll_distinct        HyperLogLog (m=64 registers) with an EXACT integer
                      harmonic denominator: each register term 2^(-reg) is
                      scaled by 2^55 -> int64, so the sum is exact and the
                      single final division is deterministic. (No ln-based
                      small-range correction: ln() is libm-dependent.)
- cms_heavy_hitters   count-min sketch (d=4 rows x w=256 buckets) point
                      estimates vs true counts for the top tokens.

Each op also computes the exact answer next to the sketch estimate — the
audit a pipeline runs at small SF to pick k/m/w before trusting the sketch
at full scale (same switch-to-scale-path gate as ann_recall_audit).

Scale design: kmv keeps K rows/group past the first distinct-shuffle;
hll's register table is at most m rows/group built by a two-level
map-side-combined groupBy; cms materializes d*w = 1024 cells total.
Reference tie-in: the connector's per-partition record counts
(TopicPartitionWriter.java recordCount) are the exact-counting analog;
these are the bounded-state versions a monitoring rollup would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as text_fn
from ..session import read_table, spread_scan

KMV_K = 64
HLL_M = 64  # 2^6 buckets
HLL_ALPHA = 0.709  # standard alpha for m=64
POW2_60 = float(1 << 60)
POW2_55_INT = 1 << 55
CMS_ROWS = 4
CMS_WIDTH = 256
CMS_TOP = 20


def _user_hash(salt: str) -> F.Column:
    return H.h60(F.concat(F.lit(salt), F.col("user_id").cast("string")))


def _sql_user_hash(salt: str) -> str:
    return H.sql_h60(f"'{salt}' || CAST(user_id AS VARCHAR)")


def _exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )


_SQL_EXACT = "SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1"


# ---------------------------------------------------------------------------
# kmv_distinct
# ---------------------------------------------------------------------------

def _kmv_estimate(hashes: DataFrame, exact: DataFrame, k: int = KMV_K) -> DataFrame:
    """Shared KMV estimation tail: bottom-k of a distinct (event_type, h)
    frame -> estimate columns, joined against an (event_type, n_exact)
    audit frame. The batch op and the streaming drain
    (streaming.pipeline.kmv_sketch_stream_stats) both end here, so their
    outputs agree by construction — min-k sets are MERGEABLE (a union's
    k smallest distinct hashes all sit inside their member's k smallest),
    which is what makes the stream's per-batch bottom-k store lossless."""
    w = Window.partitionBy("event_type").orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_hash"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(POW2_60)) / F.col("kth_hash").cast("double")
    )
    return agg.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        F.floor(est + F.lit(0.5)).cast("bigint").alias("kmv_est"),
        H.round6(
            F.abs(F.floor(est + F.lit(0.5)) - F.col("n_exact")) / F.col("n_exact")
        ).alias("rel_err"),
    )


def kmv_distinct(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    """K-minimum-values estimate of distinct users per event_type.

    est = (k-1) * 2^60 / h_(k) where h_(k) is the k-th smallest distinct
    hash; if a group has fewer than k distinct hashes the estimate is the
    exact kept count. One distinct-shuffle on (event_type, h), then the
    row_number window reuses that partitioning; only k rows per group
    survive to the final agg (_kmv_estimate, shared with the streaming
    drain)."""
    hashes = (
        read_table(spark, sf_dir, "events")
        .select("event_type", _user_hash("kmv:").alias("h"))
        .distinct()
    )
    return _kmv_estimate(hashes, _exact_distinct(spark, sf_dir), k)


SQL_KMV_DISTINCT = f"""
WITH hashes AS (
  SELECT DISTINCT event_type, {_sql_user_hash('kmv:')} AS h FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hashes
),
kept AS (
  SELECT event_type, COUNT(*) AS n_kept,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS kth_hash
  FROM ranked WHERE rn <= {KMV_K} GROUP BY 1
),
exact AS ({_SQL_EXACT}),
est AS (
  SELECT k.event_type, e.n_exact,
         CASE WHEN k.n_kept < {KMV_K} THEN CAST(k.n_kept AS DOUBLE)
              ELSE ({float(KMV_K - 1)} * {POW2_60}) / CAST(k.kth_hash AS DOUBLE)
         END AS est
  FROM kept k JOIN exact e USING (event_type)
)
SELECT event_type, n_exact,
       CAST(FLOOR(est + 0.5) AS BIGINT) AS kmv_est,
       {H.sql_round6('ABS(FLOOR(est + 0.5) - n_exact) / n_exact')} AS rel_err
FROM est ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hll_distinct
# ---------------------------------------------------------------------------

def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type, m=64 registers.

    bucket = h % 64; rho = 1 + leading-zeros of the remaining 54-bit word
    (via the length of its binary representation — portable to DuckDB).
    The harmonic denominator sums 2^(55-reg) as exact int64 (empty buckets
    contribute 2^55), so the only floating step is the final constant/int
    division. Two-level groupBy: (type, bucket) max-rho then per-type sum —
    both map-side combined, state bounded by m rows per group.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", _user_hash("hll:").alias("h")
    )
    ev = ev.select(
        "event_type",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rem"),
    ).withColumn(
        "rho",
        F.when(F.col("rem") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("rem")))
        ),
    )
    regs = ev.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg"))
    per_type = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - reg)")).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    denom = (
        F.col("present_sum")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(POW2_55_INT)
    ).cast("double")
    est = (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(POW2_55_INT))) / denom
    out = per_type.join(_exact_distinct(spark, sf_dir), "event_type").select(
        "event_type",
        "n_exact",
        F.floor(est + F.lit(0.5)).cast("bigint").alias("hll_est"),
        (F.lit(HLL_M) - F.col("n_present")).cast("int").alias("n_empty_buckets"),
        H.round6(
            F.abs(F.floor(est + F.lit(0.5)) - F.col("n_exact")) / F.col("n_exact")
        ).alias("rel_err"),
    )
    return out


SQL_HLL_DISTINCT = f"""
WITH hashed AS (
  SELECT event_type,
         {_sql_user_hash('hll:')} % {HLL_M} AS bucket,
         {_sql_user_hash('hll:')} // {HLL_M} AS rem
  FROM events
),
rho AS (
  SELECT event_type, bucket,
         CASE WHEN rem = 0 THEN 55 ELSE 55 - LENGTH(bin(rem)) END AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS reg FROM rho GROUP BY 1, 2
),
per_type AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << (55 - reg)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs GROUP BY 1
),
exact AS ({_SQL_EXACT}),
est AS (
  SELECT p.event_type, e.n_exact, p.n_present,
         (({HLL_ALPHA} * {float(HLL_M * HLL_M)}) * {float(POW2_55_INT)}) /
           CAST(p.present_sum + ({HLL_M} - p.n_present) * {POW2_55_INT} AS DOUBLE) AS est
  FROM per_type p JOIN exact e USING (event_type)
)
SELECT event_type, n_exact,
       CAST(FLOOR(est + 0.5) AS BIGINT) AS hll_est,
       CAST({HLL_M} - n_present AS INT) AS n_empty_buckets,
       {H.sql_round6('ABS(FLOOR(est + 0.5) - n_exact) / n_exact')} AS rel_err
FROM est ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters
# ---------------------------------------------------------------------------

def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )


_SQL_TOKENS = (
    "SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token FROM documents"
)


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates for the corpus's top tokens.

    Sketch: d=4 rows x w=256 buckets — each token occurrence increments one
    cell per row (cell = h32('cms{i}:'||token) % w). The sketch is one
    groupBy producing at most 1024 cells regardless of corpus size; the
    estimate for a token is the MIN over its d cells (always >= true
    count; `inflation` shows the collision overshoot). Probes are the top
    CMS_TOP tokens by exact count (the audit set), exploded to their d
    cells and equi-joined against the sketch — no cross join.
    """
    toks = _tokens(spark, sf_dir)
    sketch = (
        toks.select(F.explode(_cms_cells_expr()).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )
    true_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    return _cms_estimate(sketch, true_counts)


def _cms_cells_expr():
    """The d-cell fan-out of a `token` column — ONE expression shared by
    the batch op, the curve op's w=256 member, and the streaming twin
    (the winnowing identical-expression rule)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (H.h32(F.concat(F.lit(f"cms{i}:"), F.col("token"))) % CMS_WIDTH).alias(
                    "bucket"
                ),
            )
            for i in range(CMS_ROWS)
        ]
    )


def _cms_estimate(sketch: DataFrame, true_counts: DataFrame) -> DataFrame:
    """Shared estimation tail: top-K probe set from exact counts, d-cell
    probe explode, MIN-over-cells estimate. Both the one-shot operator
    and the streaming drain call this on their (sketch, true_counts)
    frames — counts are ADDITIVE, so merged partials feed it unchanged."""
    w = Window.orderBy(F.col("true_count").desc(), F.col("token"))
    top = true_counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= CMS_TOP
    )
    probes = top.select(
        "token", "true_count", "rk", F.explode(_cms_cells_expr()).alias("c")
    ).select("token", "true_count", "rk", "c.row", "c.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token", "true_count", "rk")
        .agg(F.min("cell_count").alias("cms_est"))
    )
    return est.select(
        "token",
        "true_count",
        "cms_est",
        (F.col("cms_est") - F.col("true_count")).alias("inflation"),
    )


def _sql_cms_cells(src: str) -> str:
    parts = []
    for i in range(CMS_ROWS):
        h = H.sql_h32(f"'cms{i}:' || token")
        parts.append(
            f"SELECT token, {i} AS row, {h} % {CMS_WIDTH} AS bucket FROM {src}"
        )
    return " UNION ALL ".join(parts)


SQL_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT token FROM ({_SQL_TOKENS}) WHERE token <> ''
),
cells AS ({_sql_cms_cells('toks')}),
sketch AS (
  SELECT row, bucket, COUNT(*) AS cell_count FROM cells GROUP BY 1, 2
),
true_counts AS (
  SELECT token, COUNT(*) AS true_count FROM toks GROUP BY 1
),
top AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY true_count DESC, token) AS rk
  FROM true_counts QUALIFY rk <= {CMS_TOP}
),
probes AS ({_sql_cms_cells('top')}),
est AS (
  SELECT p.token, MIN(s.cell_count) AS cms_est
  FROM probes p JOIN sketch s USING (row, bucket)
  GROUP BY 1
)
SELECT t.token, t.true_count, e.cms_est,
       e.cms_est - t.true_count AS inflation
FROM top t JOIN est e USING (token)
ORDER BY t.true_count DESC, t.token
"""


# ---------------------------------------------------------------------------
# hll_merge_invariant
# ---------------------------------------------------------------------------

def hll_merge_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the HLL registers — the property that makes
    the sketch valid on a 1000-executor cluster: registers built on two
    disjoint halves of the stream (offset parity) and merged with MAX must
    equal the registers built in one pass, bucket for bucket, and so must
    the estimates. Mirrors rollup_incremental_merge's merge==recompute
    invariant for the sketch domain."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "event_id", _user_hash("hll:").alias("h")
    )
    rho = ev.select(
        "event_type",
        (F.col("event_id") % 2).alias("half"),
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rem"),
    ).withColumn(
        "rho",
        F.when(F.col("rem") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("rem")))
        ),
    )
    direct = rho.groupBy("event_type", "bucket").agg(F.max("rho").alias("reg_direct"))
    halves = rho.groupBy("event_type", "half", "bucket").agg(F.max("rho").alias("reg"))
    merged = halves.groupBy("event_type", "bucket").agg(F.max("reg").alias("reg_merged"))
    cmp = direct.join(merged, ["event_type", "bucket"])
    return (
        cmp.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum((F.col("reg_direct") != F.col("reg_merged")).cast("long")).alias(
                "n_register_diffs"
            ),
        )
        .select(
            "event_type",
            "n_buckets",
            "n_register_diffs",
            (F.col("n_register_diffs") == 0).alias("merge_ok"),
        )
    )


SQL_HLL_MERGE_INVARIANT = f"""
WITH hashed AS (
  SELECT event_type, event_id % 2 AS half,
         {_sql_user_hash('hll:')} % {HLL_M} AS bucket,
         {_sql_user_hash('hll:')} // {HLL_M} AS rem
  FROM events
),
rho AS (
  SELECT event_type, half, bucket,
         CASE WHEN rem = 0 THEN 55 ELSE 55 - LENGTH(bin(rem)) END AS rho
  FROM hashed
),
direct AS (
  SELECT event_type, bucket, MAX(rho) AS reg_direct FROM rho GROUP BY 1, 2
),
halves AS (
  SELECT event_type, half, bucket, MAX(rho) AS reg FROM rho GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bucket, MAX(reg) AS reg_merged FROM halves GROUP BY 1, 2
)
SELECT d.event_type,
       COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN d.reg_direct <> m.reg_merged THEN 1 ELSE 0 END) AS BIGINT) AS n_register_diffs,
       SUM(CASE WHEN d.reg_direct <> m.reg_merged THEN 1 ELSE 0 END) = 0 AS merge_ok
FROM direct d JOIN merged m ON d.event_type = m.event_type AND d.bucket = m.bucket
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "kmv_distinct": kmv_distinct,
    "hll_distinct": hll_distinct,
    "cms_heavy_hitters": cms_heavy_hitters,
    "hll_merge_invariant": hll_merge_invariant,
}

ORACLES = {
    "kmv_distinct": SQL_KMV_DISTINCT,
    "hll_distinct": SQL_HLL_DISTINCT,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "hll_merge_invariant": SQL_HLL_MERGE_INVARIANT,
}


# ---------------------------------------------------------------------------
# Binned quantile sketch — the 4th classic mergeable sketch next to
# KMV / HLL / CMS: a fixed 64-bucket histogram of per-doc token counts whose
# quantile read-out is audited against the exact percentile. Bin totals are
# plain integer sums, so shards merge by addition (the property that lets a
# 1000-executor job keep one tiny histogram per slice instead of sorting
# 100 TB for a median).
# ---------------------------------------------------------------------------

QSK_BINS = 64
QSK_MAX = 256  # bin width QSK_MAX/QSK_BINS tokens; tail clamps into the last bin
# (size QSK_MAX to the measured domain — width 4 puts read-out error ~bin/2)
QSK_QS = (50, 90, 99)


def _qsk_tokens_expr():
    return F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("tokens")


def _qsk_audit(hist: DataFrame, freq: DataFrame) -> DataFrame:
    """Shared quantile-sketch read-out: hist = (lang, bin, c) histogram
    cells, freq = (lang, tokens, cnt) exact value counts. Both inputs are
    ADDITIVE, which is what lets the streaming twin
    (streaming.pipeline.histogram_sketch_stream) SUM-merge per-batch
    partials and end in this exact tail. The exact pick is the smallest
    value whose cumulative count reaches ceil(q/100·n) — identical to the
    classic row_number-at-rank pick over the expanded multiset."""
    width = QSK_MAX // QSK_BINS
    wl = Window.partitionBy("lang").orderBy("bin")
    cum = hist.withColumn("cum", F.sum("c").over(wl)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("lang"))
    )
    wt = Window.partitionBy("lang").orderBy("tokens")
    fcum = freq.withColumn("cumt", F.sum("cnt").over(wt)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("lang"))
    )
    rows = []
    for q in QSK_QS:
        rank = F.ceil(F.col("n") * q / 100.0)
        est = (
            cum.where(F.col("cum") >= rank)
            .groupBy("lang")
            .agg(F.min("bin").alias("bin"), F.max("n").alias("n"))
            .select(
                "lang",
                F.lit(q).alias("q"),
                ((F.col("bin") + 1) * width).cast("long").alias("sketch_value"),
                "n",
            )
        )
        exact = (
            fcum.where(F.col("cumt") >= F.ceil(F.col("n") * q / 100.0))
            .groupBy("lang")
            .agg(F.min("tokens").alias("exact_value"))
        )
        rows.append(
            est.join(exact, "lang").select(
                "lang",
                "q",
                "sketch_value",
                "exact_value",
                H.round6(
                    F.abs(F.col("sketch_value") - F.col("exact_value"))
                    / F.col("exact_value").cast("double")
                ).alias("rel_err"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("lang", "q")


def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: P50/P90/P99 of the per-doc token count — the sketch
    estimate (upper edge of the first histogram bin whose cumulative count
    reaches the rank) next to the exact percentile (ordered pick at
    ceil(q/100 * n), the classic nearest-rank definition) and the relative
    error. The histogram is 64 integer cells per language regardless of
    corpus size; the exact side exists to audit the read-out. Binning,
    value counts, and the read-out are shared with the streaming twin
    (_qsk_audit)."""
    width = QSK_MAX // QSK_BINS
    docs = read_table(spark, sf_dir, "documents").select("lang", _qsk_tokens_expr())
    binned = docs.withColumn(
        "bin",
        F.least(F.floor(F.col("tokens") / width), F.lit(QSK_BINS - 1)).cast("int"),
    )
    hist = binned.groupBy("lang", "bin").agg(F.count(F.lit(1)).alias("c"))
    freq = docs.groupBy("lang", "tokens").agg(F.count(F.lit(1)).alias("cnt"))
    return _qsk_audit(hist, freq)


def _sql_quantile_sketch() -> str:
    width = QSK_MAX // QSK_BINS
    per_q = []
    for q in QSK_QS:
        per_q.append(f"""
SELECT e.lang, {q} AS q,
       CAST((s.bin + 1) * {width} AS BIGINT) AS sketch_value,
       e.exact_value,
       {H.sql_round6(f"ABS((s.bin + 1) * {width} - e.exact_value) / CAST(e.exact_value AS DOUBLE)")} AS rel_err
FROM (
  SELECT lang, MIN(bin) AS bin FROM cum WHERE cum >= CEIL(n * {q} / 100.0) GROUP BY lang
) s JOIN (
  SELECT lang, tokens AS exact_value FROM (
    SELECT lang, tokens, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tokens) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM toks
  ) WHERE rn = CEIL(n * {q} / 100.0)
) e ON s.lang = e.lang""")
    u = "\nUNION ALL\n".join(per_q)
    return f"""
WITH toks AS (
  SELECT lang, CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS tokens
  FROM documents
),
binned AS (
  SELECT lang, CAST(LEAST(tokens // {width}, {QSK_BINS - 1}) AS INT) AS bin FROM toks
),
hist AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY 1, 2),
cum AS (
  SELECT lang, bin, c,
         SUM(c) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM hist
)
SELECT * FROM (\n{u}\n) ORDER BY lang, q
"""


QUERIES["quantile_sketch_audit"] = quantile_sketch_audit
ORACLES["quantile_sketch_audit"] = _sql_quantile_sketch()


# ---------------------------------------------------------------------------
# kmv_set_ops (round 7)
# ---------------------------------------------------------------------------

KMVSET_K = 64


def kmv_set_ops(spark: SparkSession, sf_dir: str, k: int = KMVSET_K) -> DataFrame:
    """KMV (theta-sketch) SET OPERATIONS between source pairs over the
    3-word-shingle universe, graded against the exact answer — the audit
    that sizes k before trusting sketch-only overlap monitoring at 100 TB,
    where the exact per-pair shingle intersection (source_overlap_jaccard's
    whole-text analog) is a full corpus-pair join you run once, not nightly.

    KMV sketches are MERGEABLE: each source keeps only its k smallest
    distinct shingle hashes (WindowGroupLimit prunes to k rows per source
    map-side), so the pair stage runs on |sources| x k rows — independent
    of corpus size. Per pair (a, b), the k smallest of mins_a UNION mins_b
    form the union sketch (identical to the k smallest of the true union):

        union_est = (k-1) * 2^60 / h_(k)      (exact kept count if < k)
        jacc_est  = |{h in union-k-min : h in mins_a AND h in mins_b}| / k'
        inter_est = floor(jacc_est * union_est + 0.5)

    (Beyer et al., 'On synopses for distinct-value estimation under
    multiset operations', SIGMOD'07.) Every intermediate is int64; the
    two divisions and one product are single fixed-order double ops.

    Scale: one distinct-shuffle on (source, h); the k-min window prunes
    map-side; the exact legs (per-source distinct counts + pair
    intersection self-join) are the audit baseline this op exists to
    retire at scale. Pair enumeration is |sources|^2 metadata.
    """
    docs = spread_scan(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    sh = (
        text_fn.with_shingles(docs, 3)
        .select(
            "source",
            H.h60(F.concat(F.lit("kmvset:"), F.col("shingle"))).alias("h"),
        )
        .distinct()
        # one materialization serves the k-min window, the per-source totals,
        # and both sides of the exact intersection self-join — without it the
        # raw corpus scan re-runs per consumer (20 scans observed in the plan)
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("source").orderBy("h")
    mins = sh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per_src = sh.groupBy("source").agg(F.count(F.lit(1)).alias("d"))
    a_ex = sh.select(F.col("source").alias("source_a"), "h")
    b_ex = sh.select(F.col("source").alias("source_b"), "h")
    inter_exact = (
        a_ex.join(b_ex, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    pa = per_src.select(F.col("source").alias("source_a"), F.col("d").alias("d_a"))
    pb = per_src.select(F.col("source").alias("source_b"), F.col("d").alias("d_b"))
    pairs = pa.crossJoin(pb).where(F.col("source_a") < F.col("source_b"))
    ma = mins.select(F.col("source").alias("source_a"), "h").withColumn(
        "side_a", F.lit(1)
    )
    mb = mins.select(F.col("source").alias("source_b"), "h").withColumn(
        "side_b", F.lit(1)
    )
    ua = pairs.join(ma, "source_a").select("source_a", "source_b", "h", "side_a")
    ub = pairs.join(mb, "source_b").select(
        "source_a", "source_b", "h", F.lit(None).cast("int").alias("side_a")
    )
    u = (
        ua.unionByName(ub.withColumn("side_b", F.lit(1)), allowMissingColumns=True)
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max(F.coalesce(F.col("side_a"), F.lit(0))).alias("in_a"),
            F.max(F.coalesce(F.col("side_b"), F.lit(0))).alias("in_b"),
        )
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    kept = u.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= k)
    agg = kept.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")).alias("m"),
    )
    union_est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(POW2_60)) / F.col("kth").cast("double")
    )
    jacc_est = F.col("m").cast("double") / F.col("n_kept").cast("double")
    out = (
        pairs.join(agg, ["source_a", "source_b"])
        .join(inter_exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            (
                F.col("d_a") + F.col("d_b") - F.coalesce("inter_exact", F.lit(0))
            ).alias("union_exact"),
            F.coalesce("inter_exact", F.lit(0)).alias("inter_exact"),
            F.floor(union_est + F.lit(0.5)).cast("bigint").alias("union_est"),
            F.floor(jacc_est * union_est + F.lit(0.5)).cast("bigint").alias("inter_est"),
            H.round6(jacc_est).alias("jacc_est"),
            H.round6(
                F.coalesce("inter_exact", F.lit(0)).cast("double")
                / (
                    F.col("d_a") + F.col("d_b") - F.coalesce("inter_exact", F.lit(0))
                ).cast("double")
            ).alias("jacc_exact"),
        )
        .orderBy("source_a", "source_b")
    )
    return out


def _sql_kmv_set_ops() -> str:
    shingle_src = f"""
  SELECT source, unnest(
    CASE WHEN len(ws) >= 3
         THEN [array_to_string(ws[i : i + 2], ' ') for i in generate_series(1, len(ws) - 2)]
         ELSE [array_to_string(ws, ' ')] END
  ) AS shingle
  FROM (SELECT source, string_split_regex(lower(text), '\\s+') AS ws FROM documents)
"""
    h = H.sql_h60("'kmvset:' || shingle")
    return f"""
WITH sh AS (
  SELECT DISTINCT source, {h} AS h FROM ({shingle_src})
),
mins AS (
  SELECT * FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM sh
  ) WHERE rn <= {KMVSET_K}
),
per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS d FROM sh GROUP BY 1),
inter_exact AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS inter_exact
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT pa.source AS source_a, pa.d AS d_a, pb.source AS source_b, pb.d AS d_b
  FROM per_src pa CROSS JOIN per_src pb
  WHERE pa.source < pb.source
),
u AS (
  SELECT source_a, source_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.source_a, p.source_b, m.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN mins m ON m.source = p.source_a
    UNION ALL
    SELECT p.source_a, p.source_b, m.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN mins m ON m.source = p.source_b
  ) GROUP BY 1, 2, 3
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {KMVSET_K}
),
agg AS (
  SELECT source_a, source_b,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(CASE WHEN rn = {KMVSET_K} THEN h END) AS kth,
         CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM kept GROUP BY 1, 2
),
est AS (
  SELECT p.source_a, p.source_b, p.d_a, p.d_b,
         COALESCE(i.inter_exact, 0) AS inter_exact,
         a.n_kept, a.m,
         CASE WHEN a.n_kept < {KMVSET_K} THEN CAST(a.n_kept AS DOUBLE)
              ELSE ({float(KMVSET_K - 1)} * {POW2_60}) / CAST(a.kth AS DOUBLE)
         END AS union_est_d,
         CAST(a.m AS DOUBLE) / CAST(a.n_kept AS DOUBLE) AS jacc_est_d
  FROM pairs p
  JOIN agg a USING (source_a, source_b)
  LEFT JOIN inter_exact i USING (source_a, source_b)
)
SELECT source_a, source_b,
       CAST(d_a + d_b - inter_exact AS BIGINT) AS union_exact,
       inter_exact,
       CAST(FLOOR(union_est_d + 0.5) AS BIGINT) AS union_est,
       CAST(FLOOR(jacc_est_d * union_est_d + 0.5) AS BIGINT) AS inter_est,
       {H.sql_round6('jacc_est_d')} AS jacc_est,
       {H.sql_round6('CAST(inter_exact AS DOUBLE) / CAST(d_a + d_b - inter_exact AS DOUBLE)')} AS jacc_exact
FROM est
ORDER BY source_a, source_b
"""


QUERIES["kmv_set_ops"] = kmv_set_ops
ORACLES["kmv_set_ops"] = _sql_kmv_set_ops()


# ---------------------------------------------------------------------------
# cms_error_curve (round 9) — width-tuning curve for the count-min sketch
# ---------------------------------------------------------------------------

CMS_CURVE_WIDTHS = (64, 128, 256, 512)


def cms_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min analogue of minhash_band_tuning: the SAME token
    stream sketched at widths 64/128/256/512 (d = CMS_ROWS everywhere),
    probed with the same top-K exact-count audit set, summarized as
    per-width inflation (est - true, always >= 0). The curve is the
    measurement that SIZES a production sketch: inflation should halve
    per width doubling (collision mass ~ N/w); the emitted
    mean_inflation makes that check one subtraction across rows.

    Scale: the fan-out is |widths| x d cells per token occurrence in ONE
    explode (no per-width rescan); every downstream frame is bounded by
    |widths| x d x max(width) sketch cells + |widths| x K probe rows."""
    toks = _tokens(spark, sf_dir)
    cells = F.array(
        *[
            F.struct(
                F.lit(w).alias("w"),
                F.lit(i).alias("row"),
                (H.h32(F.concat(F.lit(f"cms{i}:"), F.col("token"))) % w).alias("bucket"),
            )
            for w in CMS_CURVE_WIDTHS
            for i in range(CMS_ROWS)
        ]
    )
    sketch = (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.w").alias("w"), F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )
    true_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    wnd = Window.orderBy(F.col("true_count").desc(), F.col("token"))
    top = true_counts.withColumn("rk", F.row_number().over(wnd)).filter(
        F.col("rk") <= CMS_TOP
    )
    probes = top.select("token", "true_count", F.explode(cells).alias("c")).select(
        "token", "true_count", F.col("c.w").alias("w"), F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    est = (
        probes.join(F.broadcast(sketch), ["w", "row", "bucket"])
        .groupBy("w", "token", "true_count")
        .agg(F.min("cell_count").alias("cms_est"))
    )
    return (
        est.withColumn("inflation", F.col("cms_est") - F.col("true_count"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum("inflation").alias("total_inflation"),
            F.max("inflation").alias("max_inflation"),
        )
        .select(
            F.col("w").alias("width"),
            "n_probes",
            "total_inflation",
            "max_inflation",
            (
                F.col("total_inflation").cast("double") / F.col("n_probes").cast("double")
            ).alias("mean_inflation"),
        )
    )


def _sql_cms_curve_cells(src: str) -> str:
    parts = []
    for w in CMS_CURVE_WIDTHS:
        for i in range(CMS_ROWS):
            h = H.sql_h32(f"'cms{i}:' || token")
            parts.append(
                f"SELECT token, {w} AS w, {i} AS row, {h} % {w} AS bucket FROM {src}"
            )
    return " UNION ALL ".join(parts)


SQL_CMS_ERROR_CURVE = f"""
WITH ectoks AS (
  SELECT token FROM ({_SQL_TOKENS}) WHERE token <> ''
),
eccells AS ({_sql_cms_curve_cells('ectoks')}),
ecsketch AS (
  SELECT w, row, bucket, CAST(COUNT(*) AS BIGINT) AS cell_count
  FROM eccells GROUP BY 1, 2, 3
),
ectrue AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count FROM ectoks GROUP BY 1
),
ectop AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY true_count DESC, token) AS rk
  FROM ectrue QUALIFY rk <= {CMS_TOP}
),
ecprobes AS ({_sql_cms_curve_cells('ectop')}),
ecest AS (
  SELECT p.w, p.token, t.true_count, MIN(s.cell_count) AS cms_est
  FROM ecprobes p
  JOIN ectop t USING (token)
  JOIN ecsketch s ON p.w = s.w AND p.row = s.row AND p.bucket = s.bucket
  GROUP BY 1, 2, 3
)
SELECT w AS width,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(cms_est - true_count) AS BIGINT) AS total_inflation,
       CAST(MAX(cms_est - true_count) AS BIGINT) AS max_inflation,
       CAST(SUM(cms_est - true_count) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_inflation
FROM ecest
GROUP BY 1
"""

QUERIES["cms_error_curve"] = cms_error_curve
ORACLES["cms_error_curve"] = SQL_CMS_ERROR_CURVE
