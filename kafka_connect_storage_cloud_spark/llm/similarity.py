"""Similarity search over the embeddings table (array<float>, 64-dim).

Determinism contract: float dot products depend on accumulation order, so
both engines cast components float -> DOUBLE -> DECIMAL(12,9) (the double hop
matters: DuckDB's direct float->decimal rounds differently) and sum exactly
in decimal; the final cosine division happens on identical doubles.

Scale design:
- brute force: queries are broadcast, so the big side streams once with no
  shuffle; per-partition top-k then global top-k (the window is over
  |queries| x |candidates-per-partition|, never the full corpus).
- LSH (random hyperplanes): signature via portable bit hashes, bucket join
  bounds the candidate set; the scale path when the corpus won't stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

DEC = "decimal(12,9)"
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 -> query vector
TOP_K = 10
LSH_BITS = 8


def _dec_vec(col: str) -> Column:
    return F.expr(f"transform({col}, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,9)))")


def _dot(a: str, b: str) -> Column:
    """Exact decimal dot product, emitted as double."""
    return F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS DECIMAL(32,18)), (acc, v) -> CAST(acc + v AS DECIMAL(32,18))) AS DOUBLE)"
    )


def _norm(vec_dec: str) -> Column:
    return F.sqrt(_dot(vec_dec, vec_dec))


def _with_dec_and_norm(df: DataFrame) -> DataFrame:
    df = df.withColumn("v", _dec_vec("embedding"))
    return df.withColumn("nrm", _norm("v"))


def embedding_cosine_dups(spark: SparkSession, sf_dir: str, threshold: float = 0.9) -> DataFrame:
    """Near-duplicate embedding pairs with cosine >= threshold, blocked by
    label (cluster id) — the blocking key that bounds the pair count; swap in
    LSH buckets for unlabeled corpora."""
    emb = _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(_dot("va", "vb") / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "label", "cosine")
        .orderBy("vec_a", "vec_b")
    )


_SQL_DEC_VEC = "list_transform({col}, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(12,9)))"
_SQL_DOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "s -> CAST(s[1] * s[2] AS DECIMAL(32,18)))) AS DOUBLE)"
)


def _sql_emb() -> str:
    v = _SQL_DEC_VEC.format(col="embedding")
    dot_vv = _SQL_DOT.format(a="v", b="v")
    return f"""
emb AS (SELECT vec_id, label, {v} AS v FROM embeddings),
emb_n AS (SELECT vec_id, label, v, sqrt({dot_vv}) AS nrm FROM emb)
"""


SQL_EMBEDDING_COSINE_DUPS = f"""
WITH {_sql_emb()}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       ROUND({_SQL_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) AS cosine
FROM emb_n a JOIN emb_n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_SQL_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) >= 0.9
ORDER BY vec_a, vec_b
"""


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k per query vector. The query set is broadcast; the
    corpus streams through one stage, then a per-query window ranks."""
    emb = _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(QUERY_MOD)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


SQL_ANN_TOPK_BRUTEFORCE = f"""
WITH {_sql_emb()},
queries AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM emb_n WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND({_SQL_DOT.format(a='q.qv', b='c.v')} / (q.qn * c.nrm), 6) AS cosine
  FROM queries q JOIN emb_n c ON q.query_id <> c.vec_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
       AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def _lsh_signature() -> Column:
    """LSH_BITS-bit random-hyperplane signature. Hyperplane j's component i
    is +1/-1 from the portable h32 of 'j:i' — reproducible in SQL."""
    bit_exprs = []
    for j in range(LSH_BITS):
        # sign_i = 1 if h32(concat(j,':',i)) is even else -1
        proj = (
            f"aggregate(zip_with(v, sequence(0, size(v) - 1), "
            f"(x, i) -> CASE WHEN (CAST(conv(substring(md5(concat('{j}', ':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2) = 0 "
            f"THEN x ELSE -x END), "
            f"CAST(0 AS DECIMAL(32,18)), (acc, x) -> CAST(acc + x AS DECIMAL(32,18)))"
        )
        bit_exprs.append(f"(CASE WHEN {proj} > 0 THEN {2**j} ELSE 0 END)")
    return F.expr(" + ".join(bit_exprs)).cast("int")


def ann_topk_lsh(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact rerank within
    bucket. The scale path — candidate set is the bucket, not the corpus."""
    # the bucket signature (8 md5-seeded projections) is the expensive part
    # and feeds both join sides — materialize it once (no exchange reuse
    # across the sides of the bucket join otherwise)
    emb = (
        _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
        .withColumn("bucket", _lsh_signature())
        .localCheckpoint()
    )
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(QUERY_MOD)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bucket"),
    )
    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket"),
    )
    scored = (
        cands.join(F.broadcast(queries), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _sql_lsh_signature() -> str:
    bits = []
    for j in range(LSH_BITS):
        proj = (
            f"list_sum(list_transform(list_zip(v, generate_series(0, len(v) - 1)), "
            f"s -> CASE WHEN (CAST(('0x' || substr(md5('{j}' || ':' || CAST(s[2] AS VARCHAR)), 1, 8)) AS BIGINT) % 2) = 0 "
            f"THEN CAST(s[1] AS DECIMAL(32,18)) ELSE CAST(-s[1] AS DECIMAL(32,18)) END))"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2**j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS INT)"


SQL_ANN_TOPK_LSH = f"""
WITH {_sql_emb()},
embb AS (SELECT *, {_sql_lsh_signature()} AS bucket FROM emb_n),
queries AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket
            FROM embb WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND({_SQL_DOT.format(a='q.qv', b='c.v')} / (q.qn * c.nrm), 6) AS cosine
  FROM queries q JOIN embb c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
       AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""

ORACLES = {
    "embedding_cosine_dups": SQL_EMBEDDING_COSINE_DUPS,
    "ann_topk_bruteforce": SQL_ANN_TOPK_BRUTEFORCE,
    "ann_topk_lsh": SQL_ANN_TOPK_LSH,
}
