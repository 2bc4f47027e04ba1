"""Product quantization (PQ) over the embeddings table.

The compression path for 100 TB-scale vector search (Jégou et al., "Product
Quantization for Nearest Neighbor Search"): split each vector into PQ_M
subspaces, quantize each subvector to its nearest codebook centroid, and
answer top-k queries from the codes alone via asymmetric distance
computation (ADC) — a per-query lookup table of query-to-centroid
distances, so scoring a candidate is PQ_M table lookups instead of a
64-dim dot product, and the candidate set is PQ_M bytes per vector
instead of 256.

Determinism contract (same as similarity.py): components quantize to
scaled int64 (round(x * 1e8)); every distance is an EXACT integer
Σ(a-b)² — no float enters until presentation — so argmin/rank decisions
are bit-identical between numpy int64 (Spark side) and DuckDB hugeint
sums, with ties broken by smallest centroid/neighbor id.

Codebook: the SAME fixed-K Lloyd-trained codebook as the IVF path
(pipeline._train_codebook — K salted-hash seeds + deterministic Lloyd
steps), subdivided into PQ_M subspaces. Cardinality is K regardless of
corpus size, so the codebook is tiny BY CONSTRUCTION and rides in the task
closure; the corpus streams through one narrow Arrow stage with zero
shuffle for encode.

Scale shape:
- encode: one mapInPandas pass, centroid matrices in closure — no join,
  no shuffle, output is PQ_M small ints + one error column per vector.
- ADC top-k: queries' LUTs in closure; candidates stream once; per-batch
  top-k then one tiny global window over |queries| x k x partitions rows.

No reference analog (the connector does no vector math) — part of the
beyond-reference LLM-pipeline surface (SURVEY §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_table, ship_package
from .pipeline import _FINAL_CENTS, _sql_train_chain, _train_codebook
from .similarity import SCALE, _dec_vec, _query_pick, _sql_query_pick

PQ_M = 8  # subspaces
PQ_SUBDIM = 8  # dims per subspace (64-dim embeddings)
PQ_TOP_K = 10
PQ_K = 64  # PQ codebook cardinality (finer than the IVF cells: each
# subspace effectively gets up to PQ_K subcentroids, which lifted ADC
# recall@10 from 0.22 at K=16 — measured by pq_recall_audit)
PQ_SALT = "pqc:"


def _codebook(spark: SparkSession, sf_dir: str):
    """The PQ codebook: same fixed-K Lloyd training machinery as the IVF
    cells (pipeline._train_codebook) but a dedicated, finer K and seed
    salt. (ids, K x 64 int64 matrix), rows sorted by centroid id so numpy
    argmin's first-hit tiebreak equals smallest-centroid-id. Driver state
    is O(K), never a corpus fraction."""
    return _train_codebook(spark, sf_dir, k=PQ_K, salt=PQ_SALT)


def _sub(mat, m):
    return mat[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]


def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode every vector: per subspace the id of its nearest centroid
    (exact int64 L2², ties to smallest id) plus the exact total squared
    reconstruction error in scaled units."""
    import numpy as np
    import pandas as pd

    ship_package(spark)
    c_ids, c_mat = _codebook(spark, sf_dir)
    c2 = [np.einsum("ij,ij->i", _sub(c_mat, m), _sub(c_mat, m)) for m in range(PQ_M)]

    def encode(batches):
        for pdf in batches:
            v_mat = np.stack(pdf["v"].to_numpy()).astype(np.int64)  # n x 64
            out = {"vec_id": pdf["vec_id"]}
            err = np.zeros(len(pdf), dtype=np.int64)
            for m in range(PQ_M):
                vm = _sub(v_mat, m)
                # exact int64: ||v||² + ||c||² - 2 v·c  (all terms < 2^63)
                d2 = (
                    np.einsum("ij,ij->i", vm, vm)[:, None]
                    + c2[m][None, :]
                    - 2 * (vm @ _sub(c_mat, m).T)
                )
                best = np.argmin(d2, axis=1)  # first hit = smallest cid
                out[f"code_{m}"] = c_ids[best]
                err += d2[np.arange(len(pdf)), best]
            out["recon_err_sq"] = err
            yield pd.DataFrame(out)

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _dec_vec("embedding").alias("v"))
    schema = "vec_id long, " + ", ".join(f"code_{m} long" for m in range(PQ_M)) + ", recon_err_sq long"
    return emb.mapInPandas(encode, schema)


def _sql_emb() -> str:
    return (
        "SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * "
        f"{SCALE}, 0) AS BIGINT) for x in embedding] AS v FROM embeddings"
    )


def _sql_subd2(av: str, bv: str, m: int) -> str:
    """Exact integer Σ(a-b)² over subspace m (1-based list indexing)."""
    return (
        f"CAST(list_sum([({av}[{m * PQ_SUBDIM} + j] - {bv}[{m * PQ_SUBDIM} + j])"
        f" * ({av}[{m * PQ_SUBDIM} + j] - {bv}[{m * PQ_SUBDIM} + j])"
        f" for j in generate_series(1, {PQ_SUBDIM})]) AS BIGINT)"
    )


def _sql_codes() -> str:
    """CTE body producing (vec_id, m, cid, d2): each vector's chosen
    centroid per subspace."""
    sub_union = "\n  UNION ALL ".join(
        f"SELECT e.vec_id, {m} AS m, c.cid, {_sql_subd2('e.v', 'c.cv', m)} AS d2"
        " FROM emb e CROSS JOIN cents c"
        for m in range(PQ_M)
    )
    return f"""
sub AS (
  {sub_union}
),
codes AS (
  SELECT vec_id, m, cid, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn FROM sub
  ) WHERE rn = 1
)"""


_SQL_DOTD = (
    "(CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "s -> s[1] * s[2])) AS DOUBLE) / 1e16)"
)

_SQL_PREFIX = """
WITH emb AS ({emb}),
emb_n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nrm FROM emb),
{chain},
cents AS (SELECT cell AS cid, cv FROM {final}),
{codes}"""


def _sql_prefix() -> str:
    return _SQL_PREFIX.format(
        emb=_sql_emb(),
        dot_vv=_SQL_DOTD.format(a="v", b="v"),
        chain=_sql_train_chain(k=PQ_K, salt=PQ_SALT),
        final=_FINAL_CENTS,
        codes=_sql_codes().lstrip(),
    )


SQL_EMBEDDING_PQ = (
    _sql_prefix()
    + "\nSELECT vec_id,\n  "
    + ",\n  ".join(f"MAX(CASE WHEN m = {m} THEN cid END) AS code_{m}" for m in range(PQ_M))
    + ",\n  CAST(SUM(d2) AS BIGINT) AS recon_err_sq\nFROM codes GROUP BY vec_id"
)


def pq_adc_topk(spark: SparkSession, sf_dir: str, k: int = PQ_TOP_K) -> DataFrame:
    """Approximate top-k by asymmetric distance: candidates are represented
    ONLY by their PQ codes; each query precomputes a (PQ_M x C) distance
    LUT to the codebook, and a candidate's distance is the sum of PQ_M
    lookups. Ranking: (adc_d2 asc, neighbor_id asc), self-pairs excluded."""
    import numpy as np
    import pandas as pd

    ship_package(spark)
    c_ids, c_mat = _codebook(spark, sf_dir)
    cid_to_idx = {int(c): i for i, c in enumerate(c_ids)}

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _dec_vec("embedding").alias("v"))
    qrows = _query_pick(emb).collect()  # bounded: N_QUERIES rows
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)  # Q x 64
    # LUT[q, m, c] = exact ||q_m - C_c,m||²
    lut = np.stack(
        [
            np.einsum("ij,ij->i", _sub(q_mat, m), _sub(q_mat, m))[:, None]
            + np.einsum("ij,ij->i", _sub(c_mat, m), _sub(c_mat, m))[None, :]
            - 2 * (_sub(q_mat, m) @ _sub(c_mat, m).T)
            for m in range(PQ_M)
        ],
        axis=1,
    )  # Q x M x C

    def score(batches):
        for pdf in batches:
            n_ids = pdf["vec_id"].to_numpy()
            code_idx = np.stack(
                [np.vectorize(cid_to_idx.__getitem__)(pdf[f"code_{m}"].to_numpy()) for m in range(PQ_M)],
                axis=1,
            )  # n x M
            # d2[n, q] = Σ_m LUT[q, m, code_idx[n, m]]
            d2 = np.zeros((len(pdf), len(q_ids)), dtype=np.int64)
            for m in range(PQ_M):
                d2 += lut[:, m, code_idx[:, m]].T
            parts = []
            for qi, qid in enumerate(q_ids):
                mask = n_ids != qid
                ids_q, d_q = n_ids[mask], d2[mask, qi]
                order = np.lexsort((ids_q, d_q))[:k]  # per-batch top-k
                parts.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids_q[order], "adc_d2": d_q[order]}
                    )
                )
            yield pd.concat(parts) if parts else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "adc_d2": []}
            )

    codes = embedding_pq(spark, sf_dir).drop("recon_err_sq")
    scored = codes.mapInPandas(score, "query_id long, neighbor_id long, adc_d2 long")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


def _sql_adc_topk() -> str:
    adc_union = "\n  UNION ALL ".join(
        f"SELECT q.query_id, cd.vec_id AS neighbor_id, {_sql_subd2('q.qv', 'c.cv', m)} AS d2"
        f" FROM queries q CROSS JOIN (SELECT vec_id, cid FROM codes WHERE m = {m}) cd"
        " JOIN cents c ON cd.cid = c.cid"
        for m in range(PQ_M)
    )
    return f"""{_sql_prefix()},
queries AS (
  SELECT vec_id AS query_id, v AS qv FROM emb {_sql_query_pick()}
),
adc_sub AS (
  {adc_union}
),
adc AS (
  SELECT query_id, neighbor_id, CAST(SUM(d2) AS BIGINT) AS adc_d2
  FROM adc_sub WHERE query_id <> neighbor_id
  GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_d2, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rank
  FROM adc
) WHERE rank <= {PQ_TOP_K}
"""


def pq_recall_audit(spark: SparkSession, sf_dir: str, k: int = PQ_TOP_K) -> DataFrame:
    """Recall@k of the PQ/ADC path against the EXACT L2 top-k over full
    vectors — isolates pure quantization loss (the embeddings are unit
    vectors, so L2 ordering equals cosine ordering up to quantization).
    Same audit shape as ann_recall_audit / minhash_jaccard_est: the gate
    you check before switching a corpus to the compressed path."""
    import numpy as np
    import pandas as pd

    ship_package(spark)
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _dec_vec("embedding").alias("v"))
    qrows = _query_pick(emb).collect()  # bounded: N_QUERIES rows
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)
    q2 = np.einsum("ij,ij->i", q_mat, q_mat)

    def exact_score(batches):
        for pdf in batches:
            n_ids = pdf["vec_id"].to_numpy()
            v_mat = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            d2 = (
                np.einsum("ij,ij->i", v_mat, v_mat)[:, None]
                + q2[None, :]
                - 2 * (v_mat @ q_mat.T)
            )  # n x Q exact
            parts = []
            for qi, qid in enumerate(q_ids):
                mask = n_ids != qid
                ids_q, d_q = n_ids[mask], d2[mask, qi]
                order = np.lexsort((ids_q, d_q))[:k]
                parts.append(pd.DataFrame({"query_id": qid, "neighbor_id": ids_q[order], "d2": d_q[order]}))
            yield pd.concat(parts) if parts else pd.DataFrame({"query_id": [], "neighbor_id": [], "d2": []})

    scored = emb.mapInPandas(exact_score, "query_id long, neighbor_id long, d2 long")
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    approx = pq_adc_topk(spark, sf_dir, k).select("query_id", "neighbor_id")
    n_exact = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    recall = F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact").cast("double")
    return n_exact.join(n_hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.expr(
            "CAST(floor(COALESCE(n_hits, 0) / CAST(n_exact AS DOUBLE) * 1000000.0 + 0.5)"
            " / 1000000.0 AS DOUBLE)"
        ).alias("recall"),
    )


def _sql_recall_audit() -> str:
    dims = " + ".join(
        f"(q.qv[{j}] - e.v[{j}]) * (q.qv[{j}] - e.v[{j}])" for j in range(1, PQ_M * PQ_SUBDIM + 1)
    )
    return f"""{_sql_prefix()},
queries AS (
  SELECT vec_id AS query_id, v AS qv FROM emb {_sql_query_pick()}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY CAST({dims} AS BIGINT), e.vec_id
           ) AS rank
    FROM queries q CROSS JOIN emb e WHERE q.query_id <> e.vec_id
  ) WHERE rank <= {PQ_TOP_K}
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.query_id, a.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.query_id ORDER BY a.adc_d2, a.neighbor_id) AS rank
    FROM (
      SELECT s.query_id, s.neighbor_id, CAST(SUM(s.d2) AS BIGINT) AS adc_d2
      FROM ({{adc_sub}}) s WHERE s.query_id <> s.neighbor_id
      GROUP BY s.query_id, s.neighbor_id
    ) a
  ) WHERE rank <= {PQ_TOP_K}
),
e_cnt AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id),
h_cnt AS (
  SELECT x.query_id, COUNT(*) AS n_hits
  FROM exact x JOIN approx p ON x.query_id = p.query_id AND x.neighbor_id = p.neighbor_id
  GROUP BY x.query_id
)
SELECT e.query_id, e.n_exact, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(floor(COALESCE(h.n_hits, 0) / CAST(e.n_exact AS DOUBLE) * 1000000.0 + 0.5)
            / 1000000.0 AS DOUBLE) AS recall
FROM e_cnt e LEFT JOIN h_cnt h ON e.query_id = h.query_id
""".format(
        adc_sub="\n      UNION ALL ".join(
            f"SELECT q.query_id, cd.vec_id AS neighbor_id, {_sql_subd2('q.qv', 'c.cv', m)} AS d2"
            f" FROM queries q CROSS JOIN (SELECT vec_id, cid FROM codes WHERE m = {m}) cd"
            " JOIN cents c ON cd.cid = c.cid"
            for m in range(PQ_M)
        )
    )


IVFPQ_PROBES = 2


def ann_topk_ivf_pq(
    spark: SparkSession, sf_dir: str, k: int = PQ_TOP_K, probes: int = IVFPQ_PROBES
) -> DataFrame:
    """The production IVF-PQ serving shape (FAISS IndexIVFPQ): IVF cells
    bound the candidate set (each query probes its `probes` nearest cells),
    and PQ/ADC scores those candidates from their PQ_M-byte codes alone —
    the index the 100 TB corpus actually serves from, composed from the
    verified pieces (shared Lloyd codebook, cell assignment, ADC LUT).

    Scale shape: candidate set is probes x corpus/K per query (cell
    equi-join, codes only — no full vectors move); the LUT
    (|queries| x PQ_M x K) rides in the task closure; ranking windows run
    on candidate-sized rows. All distances are exact int64, ties to the
    smaller id — oracle-exact end to end."""
    import numpy as np
    import pandas as pd

    from .pipeline import _assign_cells

    ship_package(spark)
    c_ids, c_mat = _codebook(spark, sf_dir)
    cid_to_idx = {int(c): i for i, c in enumerate(c_ids)}

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dec_vec("embedding").alias("v")
    )
    qrows = _query_pick(emb).collect()  # bounded: N_QUERIES rows
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)
    qid_to_idx = {int(q): i for i, q in enumerate(q_ids)}
    lut = np.stack(
        [
            np.einsum("ij,ij->i", _sub(q_mat, m), _sub(q_mat, m))[:, None]
            + np.einsum("ij,ij->i", _sub(c_mat, m), _sub(c_mat, m))[None, :]
            - 2 * (_sub(q_mat, m) @ _sub(c_mat, m).T)
            for m in range(PQ_M)
        ],
        axis=1,
    )  # Q x M x K

    # probed cells per query: rounded-cosine argmax top-`probes`, ties to
    # the smaller centroid id (stable argsort over id-sorted columns) —
    # Q x K work on the driver, both sides O(fixed)
    c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat).astype(np.float64) / 1e16)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat).astype(np.float64) / 1e16)
    cos = ((q_mat @ c_mat.T).astype(np.float64) / 1e16) / (
        q_norm[:, None] * c_norm[None, :]
    )
    r6 = np.floor(cos * 1e6 + 0.5) / 1e6
    order = np.argsort(-r6, axis=1, kind="stable")[:, :probes]
    q_cells = spark.createDataFrame(
        [
            (int(q_ids[qi]), int(c_ids[j]))
            for qi in range(len(q_ids))
            for j in order[qi]
        ],
        "query_id long, cell long",
    )

    assigned = _assign_cells(emb, c_ids, c_mat).select("vec_id", "cell")
    codes = embedding_pq(spark, sf_dir).drop("recon_err_sq")
    cand = (
        codes.join(assigned, "vec_id")
        .join(F.broadcast(q_cells), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"query_id": [], "neighbor_id": [], "adc_d2": []})
                continue
            qidx = np.array([qid_to_idx[int(q)] for q in pdf["query_id"]], dtype=np.int64)
            d2 = np.zeros(len(pdf), dtype=np.int64)
            for m in range(PQ_M):
                cidx = np.array(
                    [cid_to_idx[int(c)] for c in pdf[f"code_{m}"]], dtype=np.int64
                )
                d2 += lut[qidx, m, cidx]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["vec_id"],
                    "adc_d2": d2,
                }
            )

    scored = cand.mapInPandas(score, "query_id long, neighbor_id long, adc_d2 long")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


def _sql_ivf_pq_topk() -> str:
    from .pipeline import _sql_assign

    dotd = _SQL_DOTD
    adc_union = "\n  UNION ALL ".join(
        f"SELECT qc.query_id, a.vec_id AS neighbor_id, {_sql_subd2('qc.qv', 'c.cv', m)} AS d2"
        " FROM q_cells qc"
        " JOIN assigned a ON a.cell = qc.cell"
        f" JOIN (SELECT vec_id, cid FROM codes WHERE m = {m}) cd ON cd.vec_id = a.vec_id"
        " JOIN cents c ON cd.cid = c.cid"
        for m in range(PQ_M)
    )
    return f"""{_sql_prefix()},
centsn AS (SELECT cid AS cell, cv, sqrt({dotd.format(a='cv', b='cv')}) AS cn FROM cents),
{_sql_assign('centsn', 'assigned')},
queries AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM emb_n {_sql_query_pick()}
),
q_cells AS (
  SELECT query_id, cell, qv FROM (
    SELECT q.query_id, c.cell, q.qv,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY (floor(({dotd.format(a='q.qv', b='c.cv')} / (q.qn * c.cn)) * 1000000.0 + 0.5) / 1000000.0) DESC,
                      c.cell) AS crank
    FROM queries q CROSS JOIN centsn c
  ) WHERE crank <= {IVFPQ_PROBES}
),
adc_sub AS (
  {adc_union}
),
adc AS (
  SELECT query_id, neighbor_id, CAST(SUM(d2) AS BIGINT) AS adc_d2
  FROM adc_sub WHERE query_id <> neighbor_id
  GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_d2, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rank
  FROM adc
) WHERE rank <= {PQ_TOP_K}
"""


QUERIES = {
    "embedding_pq": embedding_pq,
    "ann_topk_ivf_pq": ann_topk_ivf_pq,
    "pq_adc_topk": pq_adc_topk,
    "pq_recall_audit": pq_recall_audit,
}

ORACLES = {
    "embedding_pq": SQL_EMBEDDING_PQ,
    "ann_topk_ivf_pq": _sql_ivf_pq_topk(),
    "pq_adc_topk": _sql_adc_topk(),
    "pq_recall_audit": _sql_recall_audit(),
}
