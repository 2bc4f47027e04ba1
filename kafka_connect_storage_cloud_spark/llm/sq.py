"""Scalar quantization (SQ8) over the embeddings table — the OTHER standard
vector-compression path next to PQ (FAISS IndexScalarQuantizer): each
dimension is linearly quantized to 8 bits against its corpus-wide
[min, max] range, cutting candidate storage 4x (vs float32) with cheap
asymmetric scoring (raw query x reconstructed candidate).

Determinism contract: everything stays in the quantized int64 component
domain (SCALE, see similarity.py). Codes and reconstructions are pure
integer arithmetic — (v-min)*255 div range and min + code*range div 255,
both operands non-negative so Spark's trunc `div` equals DuckDB's floor
`//` — and the scoring dot products are the exact int64 sums used
everywhere else, so every rank decision is bit-identical to the oracle.

Scale shape:
- dim stats: one posexplode + 64-key map-side-combined groupBy; the
  64-row result becomes literal arrays in the encode expression (never a
  per-row join).
- encode: pure JVM-side transform/zip_with projection — zero shuffle.
- recall audit: the fixed query set (similarity._query_pick) scores the
  reconstructed corpus in one Arrow matmul stream, exactly the
  ann_topk_bruteforce shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table
from .similarity import (
    N_QUERIES,
    TOP_K,
    _dec_vec,
    _query_pick,
    _sql_emb,
    _sql_query_pick,
    _SQL_DOT,
)

SQ_LEVELS = 255  # 8-bit codes


def _dim_ranges(spark: SparkSession, sf_dir: str):
    """Per-dimension (min, max) over the quantized components — 64 rows,
    the bounded 'training' of the scalar quantizer."""
    emb = read_table(spark, sf_dir, "embeddings").select(_dec_vec("embedding").alias("v"))
    rows = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    rows.sort(key=lambda r: r["pos"])
    return [int(r["mn"]) for r in rows], [int(r["mx"]) for r in rows]


def _encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, rv): each vector with its SQ8 reconstruction, computed
    as one JVM projection against the literal range arrays."""
    mn, mx = _dim_ranges(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dec_vec("embedding").alias("v")
    )
    mn_arr = "array(" + ",".join(f"{v}L" for v in mn) + ")"
    rng_arr = "array(" + ",".join(f"{(b - a) if b > a else 1}L" for a, b in zip(mn, mx)) + ")"
    code = (
        f"zip_with(zip_with(v, {mn_arr}, (x, m) -> x - m), {rng_arr}, "
        f"(d, r) -> (d * {SQ_LEVELS}) div r)"
    )
    recon = (
        f"zip_with(zip_with({code}, {rng_arr}, (c, r) -> (c * r) div {SQ_LEVELS}), "
        f"{mn_arr}, (q, m) -> q + m)"
    )
    return emb.select("vec_id", "v", F.expr(code).alias("codes"), F.expr(recon).alias("rv"))


def embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 encode audit: per vector the exact squared reconstruction error
    plus code-range checksums (sum/min/max of the 8-bit codes) — the
    compression-quality table you check before serving from SQ8 codes."""
    enc = _encoded(spark, sf_dir)
    err = (
        "aggregate(zip_with(v, rv, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, e) -> acc + e)"
    )
    return enc.select(
        "vec_id",
        F.expr(err).alias("recon_err_sq"),
        F.expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)").alias("code_sum"),
        F.expr("array_min(codes)").cast("long").alias("code_min"),
        F.expr("array_max(codes)").cast("long").alias("code_max"),
    )


def sq8_recall_audit(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Recall@k of SQ8 asymmetric scoring (raw query x reconstructed
    candidate cosine) against the exact top-k — the quantization-loss gate,
    same audit shape as pq_recall_audit/ann_recall_audit."""
    import numpy as np
    import pandas as pd

    enc = _encoded(spark, sf_dir)
    qrows = _query_pick(enc).select("vec_id", "v").collect()  # bounded N_QUERIES
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat).astype(np.float64) / 1e16)

    def topk_stream(col):
        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    yield pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
                    continue
                c_mat = np.stack(pdf[col].to_numpy()).astype(np.int64)
                c_norm = np.sqrt(
                    np.einsum("ij,ij->i", c_mat, c_mat).astype(np.float64) / 1e16
                )
                cos = ((c_mat @ q_mat.T).astype(np.float64) / 1e16) / (
                    c_norm[:, None] * q_norm[None, :]
                )
                cos6 = np.floor(cos * 1000000.0 + 0.5) / 1000000.0
                n, m = cos6.shape
                yield pd.DataFrame(
                    {
                        "query_id": np.tile(q_ids, n),
                        "neighbor_id": np.repeat(pdf["vec_id"].to_numpy(), m),
                        "cosine": cos6.ravel(),
                    }
                )

        scored = (
            enc.select("vec_id", col)
            .mapInPandas(score, "query_id long, neighbor_id long, cosine double")
            .where(F.col("query_id") != F.col("neighbor_id"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
        )

    exact = topk_stream("v")
    approx = topk_stream("rv")
    n_exact = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        n_exact.join(n_hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            H.round6(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def _sql_enc() -> str:
    """CTE chain: emb_n (from similarity) + ranges + encoded (v, rv)."""
    code = (
        f"[((e.v[j] - r.mnl[j]) * {SQ_LEVELS}) // r.rngl[j] for j in "
        "generate_series(1, len(e.v))]"
    )
    recon = (
        f"[(((e.v[j] - r.mnl[j]) * {SQ_LEVELS}) // r.rngl[j] * r.rngl[j]) "
        f"// {SQ_LEVELS} + r.mnl[j] for j in generate_series(1, len(e.v))]"
    )
    return f"""{_sql_emb()},
dims AS (
  SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM emb
),
dimstats AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY pos),
ranges AS (
  SELECT list(mn ORDER BY pos) AS mnl,
         list(CASE WHEN mx > mn THEN mx - mn ELSE 1 END ORDER BY pos) AS rngl
  FROM dimstats
),
encoded AS (
  SELECT e.vec_id, e.v, e.nrm, {code} AS codes, {recon} AS rv
  FROM emb_n e CROSS JOIN ranges r
)"""


SQL_EMBEDDING_SQ8 = f"""
WITH {_sql_enc()}
SELECT vec_id,
       CAST(list_sum([(v[j] - rv[j]) * (v[j] - rv[j]) for j in generate_series(1, len(v))]) AS BIGINT) AS recon_err_sq,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(list_min(codes) AS BIGINT) AS code_min,
       CAST(list_max(codes) AS BIGINT) AS code_max
FROM encoded ORDER BY vec_id
"""

_SQL_RV_NRM = "sqrt(CAST(list_sum(list_transform(list_zip(rv, rv), s -> s[1] * s[2])) AS DOUBLE) / 1e16)"

SQL_SQ8_RECALL_AUDIT = f"""
WITH {_sql_enc()},
queries AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM emb_n {_sql_query_pick()}),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             (floor(({_SQL_DOT.format(a='q.qv', b='c.v')} / (q.qn * c.nrm)) * 1000000.0 + 0.5) / 1000000.0) DESC,
             c.vec_id) AS rank
    FROM queries q JOIN emb_n c ON q.query_id <> c.vec_id
  ) WHERE rank <= {TOP_K}
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             (floor(({_SQL_DOT.format(a='q.qv', b='c.rv')} / (q.qn * {_SQL_RV_NRM})) * 1000000.0 + 0.5) / 1000000.0) DESC,
             c.vec_id) AS rank
    FROM queries q JOIN encoded c ON q.query_id <> c.vec_id
  ) WHERE rank <= {TOP_K}
),
e AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id),
h AS (
  SELECT x.query_id, COUNT(*) AS n_hits
  FROM exact x JOIN approx p ON x.query_id = p.query_id AND x.neighbor_id = p.neighbor_id
  GROUP BY x.query_id
)
SELECT e.query_id, e.n_exact, COALESCE(h.n_hits, 0) AS n_hits,
       {H.sql_round6("COALESCE(h.n_hits, 0) / CAST(e.n_exact AS DOUBLE)")} AS recall
FROM e LEFT JOIN h ON e.query_id = h.query_id
ORDER BY e.query_id
"""

QUERIES = {
    "embedding_sq8": embedding_sq8,
    "sq8_recall_audit": sq8_recall_audit,
}

ORACLES = {
    "embedding_sq8": SQL_EMBEDDING_SQ8,
    "sq8_recall_audit": SQL_SQ8_RECALL_AUDIT,
}


# ---------------------------------------------------------------------------
# ann_topk_ivf_sq8 (round 7)
# ---------------------------------------------------------------------------

def ann_topk_ivf_sq8(
    spark: SparkSession, sf_dir: str, k: int | None = None,
    codebook=None, assigned=None,
) -> DataFrame:
    """IVF cells + SQ8 asymmetric scoring: the memory-bounded serving path
    that combines the two compression levers this family already audits
    separately — candidate pruning by inverted-file cell (pipeline.py IVF)
    and 4x-smaller candidate payloads scored as raw-query x SQ8-
    reconstruction (this module). FAISS's IndexIVFScalarQuantizer shape.

    Plan: cell assignment rides the memoized Lloyd codebook exactly like
    ann_topk_ivf (assignment scan is the only corpus-sized stage, then a
    broadcast join of the bounded query set keyed on cell); candidates
    carry rv (the int64 SQ8 reconstruction, a pure JVM zip_with
    projection), so scoring stays in the exact integer-dot domain and
    every rank decision is oracle-checkable. WindowGroupLimit prunes the
    per-query rank to k before the shuffle.
    """
    from .pipeline import IVF_TOP_K, _assigned, _train_codebook

    k = IVF_TOP_K if k is None else k
    # r10: train ONCE per invocation — the old body ran the identical Lloyd
    # chain twice (the empty-corpus gate here and again inside _assigned);
    # a composite caller (ann_method_matrix) can share both via the params.
    cb = codebook if codebook is not None else _train_codebook(spark, sf_dir)
    c_ids, _ = cb
    if len(c_ids) == 0:  # empty corpus: no cells, no candidates
        return spark.createDataFrame(
            [],
            "query_id bigint, cell bigint, neighbor_id bigint, "
            "cosine_sq8 double, rank int",
        )
    asg = (
        assigned
        if assigned is not None
        else _assigned(spark, sf_dir, codebook=cb).localCheckpoint()
    )
    enc = _encoded(spark, sf_dir).select("vec_id", "rv")
    cands = (
        asg.select("vec_id", "cell")
        .join(enc, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "rv",
            _rv_norm("rv").alias("rn"),
        )
    )
    queries = _query_pick(asg).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        cands.join(F.broadcast(queries), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sq8",
            F.floor(
                (_int_dot("qv", "rv") / (F.col("qn") * F.col("rn"))) * 1000000.0
                + F.lit(0.5)
            )
            / 1000000.0,
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sq8"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id", "cosine_sq8", "rank")
        .orderBy("query_id", "rank")
    )


def _int_dot(a: str, b: str):
    return (
        F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, e) -> acc + e)"
        ).cast("double")
        / 1e16
    )


def _rv_norm(col: str):
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({col}, {col}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, e) -> acc + e)"
        ).cast("double")
        / 1e16
    )


def _sql_ann_topk_ivf_sq8() -> str:
    from .pipeline import _FINAL_CENTS, IVF_TOP_K, _sql_assign, _sql_train_chain

    return f"""
WITH {_sql_enc()},
{_sql_train_chain()},
{_sql_assign(_FINAL_CENTS, 'assigned')},
av AS (
  SELECT *, {_SQL_RV_NRM} AS rn FROM (
    SELECT a.vec_id, a.cell, e.v, e.nrm, e.rv
    FROM assigned a JOIN encoded e ON a.vec_id = e.vec_id
  )
),
qsel AS (SELECT vec_id FROM emb_n {_sql_query_pick()}),
scored AS (
  SELECT q.vec_id AS query_id, q.cell AS cell, c.vec_id AS neighbor_id,
         (floor(({_SQL_DOT.format(a='q.v', b='c.rv')} / (q.nrm * c.rn)) * 1000000.0 + 0.5) / 1000000.0) AS cosine_sq8
  FROM av q JOIN qsel s ON q.vec_id = s.vec_id
  JOIN av c ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sq8 DESC, neighbor_id)
       AS INT) AS rank
  FROM scored
)
SELECT query_id, cell, neighbor_id, cosine_sq8, rank FROM ranked
WHERE rank <= {IVF_TOP_K} ORDER BY query_id, rank
"""


QUERIES["ann_topk_ivf_sq8"] = ann_topk_ivf_sq8
ORACLES["ann_topk_ivf_sq8"] = _sql_ann_topk_ivf_sq8()
