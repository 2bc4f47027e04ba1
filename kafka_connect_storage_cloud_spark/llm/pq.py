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

Codebook: TRUE product quantization — PQ_M INDEPENDENT K=PQ_K codebooks,
each Lloyd-trained on the PQ_SUBDIM-dim SUBVECTORS of its own subspace
(per-subspace salted-hash seeds + deterministic Lloyd steps), giving
PQ_K^PQ_M effective reconstruction cells. (Round 2 shared one full-vector
codebook sliced per subspace — 64 effective cells — which capped ADC
recall@10 at 0.34; per-subspace training is the standard fix.)
Cardinality is PQ_M x PQ_K regardless of corpus size, so the codebooks are
tiny BY CONSTRUCTION and ride in the task closure; the corpus streams
through one narrow Arrow stage with zero shuffle for encode.

Scale shape:
- train: per Lloyd step, ONE corpus scan computes all PQ_M subspace
  assignments and emits per-batch partial (sum, count) aggregates —
  PQ_M x PQ_K x PQ_SUBDIM rows per batch, never member rows — so the
  shuffle is codebook-sized and the driver collects O(M*K*subdim).
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

from ..functions import hashing as H
from ..session import read_table, ship_package
from .pipeline import (
    _FINAL_CENTS,
    _sql_assign,
    _sql_train_chain,
    _train_codebook,
)
from .similarity import SCALE, _dec_vec, _query_pick, _sql_query_pick

PQ_M = 32  # subspaces (these embeddings are near-random unit vectors, the
# hardest PQ regime: measured recall@10 at sf0.01 was 0.40 at M=8/K=64 and
# 0.57 at M=16/K=64; M=32/K=64 reaches ~0.77 at 32 bytes/vector, still an
# 8x compression over the 256-byte float32 vector)
PQ_SUBDIM = 2  # dims per subspace (64-dim embeddings)
PQ_TOP_K = 10
PQ_K = 64  # per-subspace codebook cardinality
PQ_SALT = "pqc"  # per-subspace seed salt prefix: 'pqc{m}:'
PQ_LLOYD_STEPS = 2


def _sub(mat, m):
    return mat[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]


def _pq_lloyd_step(emb: DataFrame, books):
    """One Lloyd step over ALL subspaces in a single corpus scan: each Arrow
    batch assigns every subvector to its nearest centroid (exact int64 L2²,
    argmin first-hit = smallest centroid id over id-sorted rows) and emits
    per-(subspace, cell, pos) PARTIAL sums/counts — the shuffle carries
    codebook-sized partials, never member rows. New centroid component =
    round(SUM(x)::double / n), the same expression as the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    idss = [b[0] for b in books]
    mats = [b[1] for b in books]
    c2s = [np.einsum("ij,ij->i", m, m) for m in mats]

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            col_m, col_cell, col_pos, col_sx, col_n = [], [], [], [], []
            for m in range(PQ_M):
                vm = _sub(v, m)
                d2 = (
                    np.einsum("ij,ij->i", vm, vm)[:, None]
                    + c2s[m][None, :]
                    - 2 * (vm @ mats[m].T)
                )
                best = np.argmin(d2, axis=1)  # first hit = smallest cid
                for bi in np.unique(best):
                    members = vm[best == bi]
                    ssum = members.sum(axis=0)
                    cnt = int(members.shape[0])
                    cid = int(idss[m][bi])
                    for pos in range(PQ_SUBDIM):
                        col_m.append(m)
                        col_cell.append(cid)
                        col_pos.append(pos)
                        col_sx.append(int(ssum[pos]))
                        col_n.append(cnt)
            yield pd.DataFrame(
                {"m": col_m, "cell": col_cell, "pos": col_pos, "sx": col_sx, "n": col_n}
            )

    rows = (
        emb.mapInPandas(partials, "m int, cell long, pos int, sx long, n long")
        .groupBy("m", "cell", "pos")
        .agg(
            F.round(F.sum("sx").cast("double") / F.sum("n"), 0)
            .cast("bigint")
            .alias("q")
        )
        .collect()
    )
    by_m: dict[int, dict[int, list]] = {}
    for r in rows:
        by_m.setdefault(r["m"], {}).setdefault(r["cell"], [0] * PQ_SUBDIM)[r["pos"]] = r["q"]
    out = []
    for m in range(PQ_M):
        cells = sorted(by_m.get(m, {}))
        ids = np.array(cells, dtype=np.int64)
        mat = np.array([by_m[m][c] for c in cells], dtype=np.int64)
        out.append((ids, mat))
    return out


def _seed_subspaces(spark: SparkSession, sf_dir: str):
    """All PQ_M seed sets in ONE corpus scan: explode each vector into its
    PQ_M (m, salted-hash) pairs and take the per-m top-PQ_K by (hash,
    vec_id). Spark's WindowGroupLimit prunes rank<=K map-side, so the
    shuffle carries at most tasks x PQ_M x PQ_K rows and the driver
    collects O(PQ_M * PQ_K) — never a corpus fraction."""
    import numpy as np

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dec_vec("embedding").alias("v")
    )
    # r9: one compact sequence-explode instead of a 32-struct literal array
    # (the old form built a 32x-duplicated md5 subtree through ~300 py4j
    # Column calls — measured 0.75-1.1 s of DRIVER plan construction and
    # analysis per invocation at warm steady state; this form is ~0.2 s).
    # Values identical: concat('pqc', m, ':') == f'{PQ_SALT}{m}:'.
    h_m = (
        f"CAST(conv(substring(md5(concat('{PQ_SALT}', CAST(m AS STRING), ':', "
        f"CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    ex = (
        emb.select("vec_id", "v", F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("m"))
        .select("vec_id", "v", "m", F.expr(h_m).alias("h"))
    )
    w = Window.partitionBy("m").orderBy(F.asc("h"), F.asc("vec_id"))
    rows = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= PQ_K)
        .select("m", "vec_id", "v")
        .collect()
    )
    by_m: dict[int, list] = {}
    for r in rows:
        by_m.setdefault(r["m"], []).append((r["vec_id"], r["v"]))
    books = []
    for m in range(PQ_M):
        picks = sorted(by_m.get(m, []))  # ids ascending: argmin ties = smallest id
        ids = np.array([p[0] for p in picks], dtype=np.int64)
        # empty corpus: keep the (0, PQ_SUBDIM) shape so downstream guards
        # (len(books[0][0]) == 0) see a well-formed empty codebook
        full = np.array([p[1] for p in picks], dtype=np.int64).reshape(
            len(picks), -1 if picks else PQ_M * PQ_SUBDIM
        )
        books.append((ids, _sub(full, m).copy()))
    return books


def _train_pq_codebooks(spark: SparkSession, sf_dir: str):
    """PQ_M independent per-subspace codebooks: for subspace m, the PQ_K
    seed subvectors are the slices of the vectors whose salted hash
    ('pqc{m}:' || vec_id) sorts first, refined by PQ_LLOYD_STEPS Lloyd
    steps over subvectors only. Returns a list of (ids, K_m x PQ_SUBDIM
    int64 matrix), rows sorted by centroid id. Driver state is
    O(PQ_M * PQ_K), never a corpus fraction. (The per-corpus session memo
    was removed in r9 — see _train_codebook's note in pipeline.py; every
    invocation trains from the parquet input.)"""
    books = _seed_subspaces(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dec_vec("embedding").alias("v")
    )
    if len(books) == 0 or len(books[0][0]) == 0:  # empty corpus: no codebooks
        return books
    for _ in range(PQ_LLOYD_STEPS):
        books = _pq_lloyd_step(emb, books)
    return books


def embedding_pq(spark: SparkSession, sf_dir: str, books=None) -> DataFrame:
    """PQ-encode every vector: per subspace the id of its nearest
    per-subspace centroid (exact int64 L2², ties to smallest id) plus the
    exact total squared reconstruction error in scaled units. `books`
    lets a caller that already trained the deterministic per-subspace
    codebooks pass them in — pq_adc_topk and ann_topk_ivf_pq were running
    the identical PQ Lloyd chain TWICE per invocation (once for their
    LUTs, once inside this encoder)."""
    import numpy as np
    import pandas as pd

    ship_package(spark)
    if books is None:
        books = _train_pq_codebooks(spark, sf_dir)
    schema = (
        "vec_id long, "
        + ", ".join(f"code_{m} long" for m in range(PQ_M))
        + ", recon_err_sq long"
    )
    if len(books) == 0 or len(books[0][0]) == 0:  # empty corpus: no codes
        return spark.createDataFrame([], schema)
    c2s = [np.einsum("ij,ij->i", b[1], b[1]) for b in books]

    def encode(batches):
        for pdf in batches:
            v_mat = np.stack(pdf["v"].to_numpy()).astype(np.int64)  # n x 64
            out = {"vec_id": pdf["vec_id"]}
            err = np.zeros(len(pdf), dtype=np.int64)
            for m in range(PQ_M):
                vm = _sub(v_mat, m)
                ids, mat = books[m]
                # exact int64: ||v||² + ||c||² - 2 v·c  (all terms < 2^63)
                d2 = (
                    np.einsum("ij,ij->i", vm, vm)[:, None]
                    + c2s[m][None, :]
                    - 2 * (vm @ mat.T)
                )
                best = np.argmin(d2, axis=1)  # first hit = smallest cid
                out[f"code_{m}"] = ids[best]
                err += d2[np.arange(len(pdf)), best]
            out["recon_err_sq"] = err
            yield pd.DataFrame(out)

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _dec_vec("embedding").alias("v"))
    return emb.mapInPandas(encode, schema)


def _sql_emb() -> str:
    return (
        "SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * "
        f"{SCALE}, 0) AS BIGINT) for x in embedding] AS v FROM embeddings"
    )


def _sql_subd2(av: str, cvs: str, m: int) -> str:
    """Exact integer Σ(a_sub - c)² between subspace m of full vector `av`
    (1-based list) and an already-sliced PQ_SUBDIM-dim centroid `cvs`."""
    return (
        f"CAST(list_sum([({av}[{m * PQ_SUBDIM} + j] - {cvs}[j])"
        f" * ({av}[{m * PQ_SUBDIM} + j] - {cvs}[j])"
        f" for j in generate_series(1, {PQ_SUBDIM})]) AS BIGINT)"
    )


def _sql_pq_chain() -> str:
    """CTE chain replicating _train_pq_codebooks: per subspace m,
    p{m}c0 seeds -> (assign, means, re-quantize)* -> p{m}c{S}, unioned
    into pqcents(m, cid, cv). Every intermediate is codebook-sized except
    the per-step assignment scan."""
    parts = []
    for m in range(PQ_M):
        qh = H.sql_h32(f"'{PQ_SALT}{m}:' || CAST(vec_id AS VARCHAR)")
        lo, hi = m * PQ_SUBDIM + 1, (m + 1) * PQ_SUBDIM
        parts.append(
            f"""p{m}c0 AS (
  SELECT vec_id AS cell, list_slice(v, {lo}, {hi}) AS cv FROM emb
  ORDER BY {qh}, vec_id LIMIT {PQ_K}
)"""
        )
        for s in range(1, PQ_LLOYD_STEPS + 1):
            d2 = _sql_subd2("e.v", "c.cv", m)
            parts.append(
                f"""p{m}a{s} AS (
  SELECT e.vec_id,
         (min(struct_pack(d2 := {d2}, cid := c.cell))).cid AS cell
  FROM emb e CROSS JOIN p{m}c{s - 1} c GROUP BY e.vec_id
)"""
            )
            parts.append(
                f"""p{m}m{s} AS (
  SELECT cell, pos, CAST(round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS q
  FROM (
    SELECT a.cell, unnest(generate_series(1, {PQ_SUBDIM})) AS pos,
           unnest(list_slice(e.v, {lo}, {hi})) AS x
    FROM p{m}a{s} a JOIN emb e ON a.vec_id = e.vec_id
  ) GROUP BY cell, pos
)"""
            )
            parts.append(
                f"p{m}c{s} AS (SELECT cell, list(q ORDER BY pos) AS cv FROM p{m}m{s} GROUP BY cell)"
            )
    final_union = "\n  UNION ALL ".join(
        f"SELECT {m} AS m, cell AS cid, cv FROM p{m}c{PQ_LLOYD_STEPS}" for m in range(PQ_M)
    )
    parts.append(f"pqcents AS MATERIALIZED (\n  {final_union}\n)")
    return ",\n".join(parts)


def _sql_codes() -> str:
    """CTE body producing (vec_id, m, cid, d2): each vector's chosen
    per-subspace centroid."""
    sub_union = "\n  UNION ALL ".join(
        f"SELECT e.vec_id, {m} AS m, c.cid, {_sql_subd2('e.v', 'c.cv', m)} AS d2"
        f" FROM emb e CROSS JOIN (SELECT cid, cv FROM pqcents WHERE m = {m}) c"
        for m in range(PQ_M)
    )
    return f"""
sub AS (
  {sub_union}
),
codes AS MATERIALIZED (
  SELECT vec_id, m, cid, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn FROM sub
  ) WHERE rn = 1
)"""


_SQL_DOTD = (
    "(CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "s -> s[1] * s[2])) AS DOUBLE) / 1e16)"
)

_SQL_PREFIX = """
WITH emb AS MATERIALIZED ({emb}),
emb_n AS MATERIALIZED (SELECT vec_id, v, sqrt({dot_vv}) AS nrm FROM emb),
{chain},
{codes}"""


def _sql_prefix() -> str:
    return _SQL_PREFIX.format(
        emb=_sql_emb(),
        dot_vv=_SQL_DOTD.format(a="v", b="v"),
        chain=_sql_pq_chain(),
        codes=_sql_codes().lstrip(),
    )


SQL_EMBEDDING_PQ = (
    _sql_prefix()
    + "\nSELECT vec_id,\n  "
    + ",\n  ".join(f"MAX(CASE WHEN m = {m} THEN cid END) AS code_{m}" for m in range(PQ_M))
    + ",\n  CAST(SUM(d2) AS BIGINT) AS recon_err_sq\nFROM codes GROUP BY vec_id"
)


def _adc_lut(q_mat, books):
    """Per-subspace ADC LUTs: lut[m][q, c] = exact ||q_m - C_m,c||² plus the
    per-subspace cid -> row-index maps."""
    import numpy as np

    luts, idx_maps = [], []
    for m in range(PQ_M):
        ids, mat = books[m]
        qm = _sub(q_mat, m)
        luts.append(
            np.einsum("ij,ij->i", qm, qm)[:, None]
            + np.einsum("ij,ij->i", mat, mat)[None, :]
            - 2 * (qm @ mat.T)
        )
        idx_maps.append({int(c): i for i, c in enumerate(ids)})
    return luts, idx_maps


def pq_adc_topk(spark: SparkSession, sf_dir: str, k: int = PQ_TOP_K) -> DataFrame:
    """Approximate top-k by asymmetric distance: candidates are represented
    ONLY by their PQ codes; each query precomputes a per-subspace distance
    LUT to that subspace's codebook, and a candidate's distance is the sum
    of PQ_M lookups. Ranking: (adc_d2 asc, neighbor_id asc), self-pairs
    excluded."""
    import numpy as np
    import pandas as pd

    ship_package(spark)
    books = _train_pq_codebooks(spark, sf_dir)

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _dec_vec("embedding").alias("v"))
    qrows = _query_pick(emb).collect()  # bounded: N_QUERIES rows
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)  # Q x 64
    luts, idx_maps = _adc_lut(q_mat, books)

    def score(batches):
        for pdf in batches:
            n_ids = pdf["vec_id"].to_numpy()
            d2 = np.zeros((len(pdf), len(q_ids)), dtype=np.int64)
            for m in range(PQ_M):
                cidx = np.array(
                    [idx_maps[m][int(c)] for c in pdf[f"code_{m}"]], dtype=np.int64
                )
                d2 += luts[m][:, cidx].T
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

    codes = embedding_pq(spark, sf_dir, books=books).drop("recon_err_sq")
    scored = codes.mapInPandas(score, "query_id long, neighbor_id long, adc_d2 long")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


def _sql_adc_sub() -> str:
    """UNION ALL body producing per-(query, candidate, subspace) exact d2
    from the codes alone (codes join their subspace's centroid)."""
    return "\n  UNION ALL ".join(
        f"SELECT q.query_id, cd.vec_id AS neighbor_id, {_sql_subd2('q.qv', 'c.cv', m)} AS d2"
        f" FROM queries q CROSS JOIN (SELECT vec_id, cid FROM codes WHERE m = {m}) cd"
        f" JOIN (SELECT cid, cv FROM pqcents WHERE m = {m}) c ON cd.cid = c.cid"
        for m in range(PQ_M)
    )


def _sql_adc_topk() -> str:
    return f"""{_sql_prefix()},
queries AS (
  SELECT vec_id AS query_id, v AS qv FROM emb {_sql_query_pick()}
),
adc_sub AS (
  {_sql_adc_sub()}
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
      FROM ({_sql_adc_sub()}) s WHERE s.query_id <> s.neighbor_id
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
"""


IVFPQ_PROBES = 2


def ann_topk_ivf_pq(
    spark: SparkSession, sf_dir: str, k: int = PQ_TOP_K, probes: int = IVFPQ_PROBES,
    codebook=None, assigned=None,
) -> DataFrame:
    """The production IVF-PQ serving shape (FAISS IndexIVFPQ): the IVF
    codebook (pipeline._train_codebook, K=16 coarse cells) bounds the
    candidate set — each query probes its `probes` nearest cells — and
    PQ/ADC scores those candidates from their PQ_M-byte codes alone using
    the per-subspace codebooks. The index the 100 TB corpus actually serves
    from, composed from the verified pieces.

    Scale shape: candidate set is probes x corpus/K per query (cell
    equi-join, codes only — no full vectors move); the per-subspace LUTs
    (|queries| x PQ_M x PQ_K) ride in the task closure; ranking windows run
    on candidate-sized rows. All distances are exact int64, ties to the
    smaller id — oracle-exact end to end."""
    import numpy as np
    import pandas as pd

    from .pipeline import _assign_cells

    ship_package(spark)
    # coarse IVF cells: shareable with a composite caller (ann_method_matrix)
    # because training is deterministic
    iv_ids, iv_mat = codebook if codebook is not None else _train_codebook(spark, sf_dir)
    books = _train_pq_codebooks(spark, sf_dir)

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dec_vec("embedding").alias("v")
    )
    qrows = _query_pick(emb).collect()  # bounded: N_QUERIES rows
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)
    qid_to_idx = {int(q): i for i, q in enumerate(q_ids)}
    luts, idx_maps = _adc_lut(q_mat, books)

    # probed cells per query: rounded-cosine argmax top-`probes`, ties to
    # the smaller centroid id (stable argsort over id-sorted columns) —
    # Q x K work on the driver, both sides O(fixed)
    c_norm = np.sqrt(np.einsum("ij,ij->i", iv_mat, iv_mat).astype(np.float64) / 1e16)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat).astype(np.float64) / 1e16)
    cos = ((q_mat @ iv_mat.T).astype(np.float64) / 1e16) / (
        q_norm[:, None] * c_norm[None, :]
    )
    r6 = np.floor(cos * 1e6 + 0.5) / 1e6
    order = np.argsort(-r6, axis=1, kind="stable")[:, :probes]
    q_cells = spark.createDataFrame(
        [
            (int(q_ids[qi]), int(iv_ids[j]))
            for qi in range(len(q_ids))
            for j in order[qi]
        ],
        "query_id long, cell long",
    )

    assigned = (
        assigned.select("vec_id", "cell")
        if assigned is not None
        else _assign_cells(emb, iv_ids, iv_mat).select("vec_id", "cell")
    )
    codes = embedding_pq(spark, sf_dir, books=books).drop("recon_err_sq")
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
                    [idx_maps[m][int(c)] for c in pdf[f"code_{m}"]], dtype=np.int64
                )
                d2 += luts[m][qidx, cidx]
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
    dotd = _SQL_DOTD
    adc_union = "\n  UNION ALL ".join(
        f"SELECT qc.query_id, a.vec_id AS neighbor_id, {_sql_subd2('qc.qv', 'c.cv', m)} AS d2"
        " FROM q_cells qc"
        " JOIN assigned a ON a.cell = qc.cell"
        f" JOIN (SELECT vec_id, cid FROM codes WHERE m = {m}) cd ON cd.vec_id = a.vec_id"
        f" JOIN (SELECT cid, cv FROM pqcents WHERE m = {m}) c ON cd.cid = c.cid"
        for m in range(PQ_M)
    )
    return f"""{_sql_prefix()},
{_sql_train_chain()},
centsn AS (SELECT cell, cv, cn FROM {_FINAL_CENTS}),
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


def pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ inverted-code balance: per (subspace m, code cid), how many
    vectors chose that code, its share of the subspace, and its load
    factor vs the uniform expectation n/PQ_K — the ivf_balance_audit
    analog for the PQ codebooks. Dead codes (never chosen) and hot codes
    (load ≫ 1) both waste quantization bits; this is the table that says
    when to retrain or re-seed a subspace.

    Scale: one PQ encode pass (the memoized codebooks ride the Arrow
    batch closure), then a groupBy onto at most PQ_M·PQ_K = 2048 keys —
    map-side combined, broadcast-sized output at any corpus size."""
    codes = embedding_pq(spark, sf_dir)
    stack = "stack(" + str(PQ_M) + ", " + ", ".join(
        f"{m}, code_{m}" for m in range(PQ_M)
    ) + ") AS (m, cid)"
    per = (
        codes.selectExpr(stack)
        .groupBy("m", "cid")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    total = F.sum("n_vecs").over(Window.partitionBy("m"))
    return per.select(
        "m",
        "cid",
        "n_vecs",
        H.round6(F.col("n_vecs").cast("double") / total.cast("double")).alias("share"),
        H.round6(
            F.col("n_vecs") * F.lit(PQ_K) / total.cast("double")
        ).alias("load_factor"),
    ).orderBy("m", "cid")


SQL_PQ_CODE_BALANCE = (
    _sql_prefix()
    + f""",
per AS (SELECT m, cid, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM codes GROUP BY m, cid)
SELECT m, cid, n_vecs,
       {H.sql_round6("CAST(n_vecs AS DOUBLE) / CAST(SUM(n_vecs) OVER (PARTITION BY m) AS DOUBLE)")} AS share,
       {H.sql_round6(f"n_vecs * {PQ_K} / CAST(SUM(n_vecs) OVER (PARTITION BY m) AS DOUBLE)")} AS load_factor
FROM per ORDER BY m, cid"""
)

QUERIES["pq_code_balance"] = pq_code_balance
ORACLES["pq_code_balance"] = SQL_PQ_CODE_BALANCE
