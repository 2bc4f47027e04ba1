"""Lexical retrieval over the document corpus: BM25 top-k and tf-idf
cosine top-k for a bounded query batch — the sparse complement to the
embedding ANN family (similarity.py / pipeline.py). A training-data
pipeline uses these for contamination lookup ("which corpus docs would a
benchmark query retrieve?"), hard-negative mining, and RAG-context
selection before any dense index exists.

Determinism: BM25's classic idf is ln((N-df+0.5)/(df+0.5)+1) — libm, not
portable (DETERMINISM.md rule 4). These operators use the EXP-IDF variant
(the exact argument of that log, the same transform that turned PMI into
bigram_lift's exp-PMI ratio): idf_lin = (N-df+0.5)/(df+0.5)+1. Rankings
put more weight on rare terms than log-idf BM25 would; column names say
bm25_expidf to be honest about it. Per-term scores are single fixed-order
IEEE expressions; cross-term sums are 1e-6-quantized int64 (rule 2).

Scale: the corpus-sized stages are one tokenize scan -> (doc_id, token, tf)
aggregate and one join against the bounded query-term table (broadcast:
|queries| x |terms per doc|). df/idf is vocab-sized, doc lengths ride the
tf aggregate. No all-pairs anything: cost is O(postings of query terms),
the classic term-at-a-time evaluation. At 100 TB the same plan serves a
query BATCH (explode the batch, one shuffle per stage); per-query serving
would sit behind an inverted-index store, which is exactly the landed
layout the connector's FieldPartitioner(token-prefix) would produce.
Reference tie-in: format/parquet landing + field partitioning
(io.confluent.connect.s3.format.parquet, partitioner.class docs) make the
postings scan partition-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_NQ = 4  # bounded query batch: salted-hash-picked docs
BM25_TOPK = 10

QUERIES: dict = {}
ORACLES: dict = {}


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10: spread_scan REVERTED here (VERDICT r9 next-round #4). The r9
    # round spread this scan like the other tokenize chokepoints, but the
    # driver measured bm25_topk 1.17 -> 1.63 s and an interleaved same-
    # session A/B this round reproduced the regression (spread-off won
    # all 8 warm rep-pairs: bm25 min 1.755 vs 2.018, hybrid_rrf 2.82 vs
    # 2.90). Unlike the shingle-md5 paths, bm25's downstream is a plain
    # split+explode feeding a groupBy whose aggregation shuffles anyway —
    # the round-robin exchange adds a pass without relieving any heavy
    # per-row work, so the tf build is faster single-task at bench SF and
    # partitions naturally at production row-group counts.
    return (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )


_SQL_DOC_TOKENS = (
    "SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token "
    "FROM documents"
)

_QPICK_HASH = "'bm25q:' || CAST(doc_id AS VARCHAR)"


def _query_docs(spark: SparkSession, sf_dir: str, nq: int) -> DataFrame:
    """The bounded query batch: nq docs picked by salted hash — stable
    across engines and scale factors (same idiom as similarity._query_pick)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    h = H.h60(F.concat(F.lit("bm25q:"), F.col("doc_id").cast("string")))
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("__qrn", F.row_number().over(w))
        .where(F.col("__qrn") <= nq)
        .select(F.col("doc_id").alias("qid"))
    )


def _sql_query_docs(nq: int) -> str:
    return f"""
  SELECT doc_id AS qid FROM (
    SELECT doc_id, ROW_NUMBER() OVER (
      ORDER BY {H.sql_h60(_QPICK_HASH)}, doc_id) AS qrn
    FROM documents
  ) WHERE qrn <= {nq}
"""


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    nq: int = BM25_NQ,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Top-k corpus documents per query document under exp-idf BM25.

    score(q, d) = sum over t in terms(q) ∩ d of
        idf_lin(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1-b) + k1*b*dl_d/avgdl)

    idf_lin = (N-df+0.5)/(df+0.5)+1 (see module docstring); dl/avgdl is
    the exact rational dl*N/total_tokens. Each per-term score is one
    fixed-order double expression quantized to 1e-6 int64; the per-(q,d)
    sum is integer; rank ties break on doc_id. The query doc itself is
    excluded. The _query_pick window is a full-corpus ORDER BY hash — fine
    because WindowGroupLimit prunes to nq rows per map task before the
    single-partition step ever sees data.
    """
    toks = _doc_tokens(spark, sf_dir)
    # the (doc, token, tf) postings index is read by dl, df, the query-term
    # pick, and the scoring join — materialize it once (10 raw scans otherwise)
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs = int(totals["n_docs"] or 0)
    total_tokens = int(totals["total_tokens"] or 0)
    qdocs = _query_docs(spark, sf_dir, nq)
    if n_docs == 0:
        return (
            tf.select(
                F.lit(0).alias("qid"),
                F.lit(0).alias("rk"),
                "doc_id",
                F.lit(0.0).alias("bm25_expidf"),
                F.lit(0).alias("n_terms_matched"),
            ).where(F.lit(False))
        )
    qterms = (
        qdocs.join(tf, qdocs["qid"] == tf["doc_id"])
        .select("qid", "token")
        .distinct()
    )
    idf = (
        (F.col("df") * F.lit(-1) + F.lit(n_docs)).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0)
    postings = (
        F.broadcast(qterms)
        .join(tf, "token")
        .join(F.broadcast(df_t.withColumn("idf", idf)), "token")
        .join(dl, "doc_id")
        .where(F.col("qid") != F.col("doc_id"))
    )
    dlr = (F.col("dl") * F.lit(n_docs)).cast("double") / F.lit(float(total_tokens))
    tf_d = F.col("tf").cast("double")
    score_t = (
        F.col("idf")
        * (tf_d * F.lit(BM25_K1 + 1.0))
        / (tf_d + F.lit(BM25_K1 * (1.0 - BM25_B)) + F.lit(BM25_K1 * BM25_B) * dlr)
    )
    scored = postings.withColumn(
        "term_q", F.floor(score_t * F.lit(1e6) + F.lit(0.5)).cast("long")
    )
    per_doc = scored.groupBy("qid", "doc_id").agg(
        F.sum("term_q").alias("score_q"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (
        per_doc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "qid",
            "rk",
            "doc_id",
            (F.col("score_q").cast("double") / F.lit(1e6)).alias("bm25_expidf"),
            "n_terms_matched",
        )
        .orderBy("qid", "rk")
    )


def _sql_bm25_topk() -> str:
    k1_plus1 = BM25_K1 + 1.0
    k1_1mb = BM25_K1 * (1.0 - BM25_B)
    k1_b = BM25_K1 * BM25_B
    return f"""
WITH toks AS ({_SQL_DOC_TOKENS}),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
df_t AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM dl
),
qdocs AS ({_sql_query_docs(BM25_NQ)}),
qterms AS (
  SELECT DISTINCT q.qid, t.token FROM qdocs q JOIN tf t ON t.doc_id = q.qid
),
scored AS (
  SELECT qt.qid, t.doc_id,
         CAST(FLOOR(
           ((CAST(d.df * -1 + x.n_docs AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(t.tf AS DOUBLE) * {k1_plus1})
           / (CAST(t.tf AS DOUBLE) + {k1_1mb}
              + {k1_b} * (CAST(l.dl * x.n_docs AS DOUBLE) / CAST(x.total_tokens AS DOUBLE)))
           * 1000000.0 + 0.5) AS BIGINT) AS term_q
  FROM qterms qt
  JOIN tf t ON t.token = qt.token
  JOIN df_t d ON d.token = qt.token
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN tot x
  WHERE qt.qid <> t.doc_id
),
per_doc AS (
  SELECT qid, doc_id, CAST(SUM(term_q) AS BIGINT) AS score_q,
         CAST(COUNT(*) AS BIGINT) AS n_terms_matched
  FROM scored GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score_q DESC, doc_id) AS rk
  FROM per_doc
)
SELECT qid, rk, doc_id,
       CAST(score_q AS DOUBLE) / 1000000.0 AS bm25_expidf,
       n_terms_matched
FROM ranked WHERE rk <= {BM25_TOPK}
ORDER BY qid, rk
"""


QUERIES["bm25_topk"] = bm25_topk
ORACLES["bm25_topk"] = _sql_bm25_topk()


# ---------------------------------------------------------------------------
# hybrid_retrieval_agreement (round 8) — lexical vs semantic top-k overlap
# ---------------------------------------------------------------------------

def _semantic_ranked(spark: SparkSession, sf_dir: str, lex: DataFrame,
                     checkpoint: bool = True):
    """(ranked_all, q_ids): the FULL exact-cosine ranking of the embedding
    corpus for every lex query doc that has an embedding, plus the sorted
    embedded-query id array. The semantic side shared by
    hybrid_retrieval_agreement and hybrid_rrf_fusion: the corpus streams
    once through an Arrow int64 matmul with the <= nq query vectors in
    the task closure (ann_topk_bruteforce's pattern — exact dots, 6-dp
    floor, doc_id tiebreak). Returns (None, []) when no query has an
    embedding (empty-corpus contract).

    `checkpoint=True` materializes the nq x n_emb ranking for callers that
    consume it TWICE (hybrid_retrieval_agreement: top-k set + the
    full-ranking rank-of-top-lex probe). A single-consumer caller
    (hybrid_rrf_fusion, which only keeps rnk <= k) passes False so the
    rank filter stays fused over the window — Spark's WindowGroupLimit
    then prunes each partition to k rows before the final exchange
    instead of materializing the full corpus ranking (r10, guide §2.4)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    from .similarity import _with_dec_and_norm

    emb = _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
    qids = lex.select("qid").distinct()
    qrows = (
        emb.join(qids, emb.vec_id == qids.qid)
        .select("vec_id", "v")
        .collect()  # bounded: <= nq rows
    )
    if not qrows:
        return None, []
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in qrows], dtype=np.int64)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat).astype(np.float64) / 1e16)

    def score(batches):
        for pdf in batches:
            c_mat = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat).astype(np.float64) / 1e16)
            dots = c_mat @ q_mat.T
            cos = (dots.astype(np.float64) / 1e16) / (c_norm[:, None] * q_norm[None, :])
            n, m = cos.shape
            yield pd.DataFrame(
                {
                    "qid": np.tile(q_ids, n),
                    "doc_id": np.repeat(pdf["vec_id"].to_numpy(), m),
                    "cosine_raw": cos.ravel(),
                }
            )

    scored = (
        emb.select("vec_id", "v")
        .mapInPandas(score, "qid long, doc_id long, cosine_raw double")
        .where(F.col("qid") != F.col("doc_id"))
        .withColumn("cosine", F.floor(F.col("cosine_raw") * 1000000.0 + F.lit(0.5)) / 1000000.0)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("doc_id"))
    ranked_all = scored.withColumn("rnk", F.row_number().over(w))
    if checkpoint:
        ranked_all = ranked_all.localCheckpoint()
    return ranked_all, q_ids


def hybrid_retrieval_agreement(
    spark: SparkSession, sf_dir: str, nq: int = BM25_NQ, k: int = BM25_TOPK
) -> DataFrame:
    """Do lexical and semantic retrieval agree? For every BM25 query doc
    that has an embedding, intersect its BM25 top-k with its exact-cosine
    top-k over the embedding corpus — the calibration table behind any
    hybrid-retrieval (RRF/weighted-fusion) decision: high overlap means
    one retriever is redundant; low overlap with a high ceiling means
    fusion adds recall. `agreement_ceiling` = n_lex_emb / n_lex, the
    fraction of this query's lexical hits that even HAVE embeddings (the
    upper bound `overlap` could reach on a partially-embedded corpus —
    documents outnumber embeddings in this testdata, as in most
    production stores; normalizing by n_lex rather than k keeps the
    fraction honest when BM25 returns fewer than k hits).

    Scale: the lexical side is bm25_topk (postings of a bounded query
    batch); the semantic side streams the embedding corpus once through
    the Arrow-matmul scorer with the <= nq query vectors in the task
    closure (ann_topk_bruteforce's pattern — exact int64 dots, 6-dp
    floor, doc_id tiebreak); everything after is nq x k metadata."""
    from .similarity import _with_dec_and_norm

    lex = (
        bm25_topk(spark, sf_dir, nq=nq, k=k)
        .select("qid", "rk", "doc_id")
        .localCheckpoint(eager=True)  # qid pick + overlap joins read it
    )
    out_schema = (
        "qid bigint, n_lex bigint, n_lex_emb bigint, n_common bigint, "
        "sem_rank_top_lex bigint, overlap double, agreement_ceiling double"
    )
    ranked_all, q_ids = _semantic_ranked(spark, sf_dir, lex)
    if ranked_all is None:
        return spark.createDataFrame([], out_schema)
    emb = _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
    sem = ranked_all.where(F.col("rnk") <= k).select("qid", "doc_id")
    # where does BM25's #1 hit sit in the FULL semantic ranking? (stays
    # informative even at overlap 0 — this corpus's embeddings are not
    # text-derived, so the two retrievers rank near-independently)
    top_lex = lex.where(F.col("rk") == 1).select("qid", "doc_id")
    top_rank = top_lex.join(ranked_all.select("qid", "doc_id", "rnk"), ["qid", "doc_id"]).select(
        "qid", F.col("rnk").alias("sem_rank_top_lex")
    )
    emb_ids = emb.select(F.col("vec_id").alias("doc_id")).withColumn("has_emb", F.lit(1))
    lex_q = lex.where(F.col("qid").isin([int(i) for i in q_ids]))
    per_lex = (
        lex_q.join(emb_ids, "doc_id", "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_lex"),
            F.coalesce(F.sum("has_emb"), F.lit(0)).cast("long").alias("n_lex_emb"),
        )
    )
    common = (
        lex_q.join(sem, ["qid", "doc_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        per_lex.join(common, "qid", "left")
        .join(top_rank, "qid", "left")
        .select(
            "qid",
            "n_lex",
            "n_lex_emb",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce("sem_rank_top_lex", F.lit(0)).cast("long").alias("sem_rank_top_lex"),
            H.round6(
                F.coalesce("n_common", F.lit(0)).cast("double") / F.lit(float(k))
            ).alias("overlap"),
            H.round6(
                F.col("n_lex_emb").cast("double") / F.col("n_lex").cast("double")
            ).alias("agreement_ceiling"),
        )
        .orderBy("qid")
    )


def _sql_hybrid_agreement(nq: int = BM25_NQ, k: int = BM25_TOPK) -> str:
    from .similarity import _SQL_DOT, _sql_emb

    cos = (
        f"(floor(({_SQL_DOT.format(a='eq.qv', b='c.v')} / (eq.qn * c.nrm))"
        f" * 1000000.0 + 0.5) / 1000000.0)"
    )
    return f"""
WITH lex AS MATERIALIZED (SELECT qid, rk, doc_id FROM ({_sql_bm25_topk()})),
{_sql_emb()},
eq AS (
  SELECT e.vec_id AS qid, e.v AS qv, e.nrm AS qn
  FROM emb_n e JOIN (SELECT DISTINCT qid FROM lex) q ON e.vec_id = q.qid
),
hscored AS (
  SELECT eq.qid, c.vec_id AS doc_id, {cos} AS cosine
  FROM eq JOIN emb_n c ON eq.qid <> c.vec_id
),
ranked_all AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rnk
  FROM hscored
),
sem AS (SELECT qid, doc_id FROM ranked_all WHERE rnk <= {k}),
top_rank AS (
  SELECT l.qid, r.rnk AS sem_rank_top_lex
  FROM lex l JOIN ranked_all r ON l.qid = r.qid AND l.doc_id = r.doc_id
  WHERE l.rk = 1
),
lex_q AS (SELECT l.* FROM lex l JOIN eq ON l.qid = eq.qid),
per_lex AS (
  SELECT lq.qid, CAST(COUNT(*) AS BIGINT) AS n_lex,
         CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lex_emb
  FROM lex_q lq LEFT JOIN emb_n e ON lq.doc_id = e.vec_id
  GROUP BY lq.qid
),
common AS (
  SELECT lq.qid, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM lex_q lq JOIN sem s ON lq.qid = s.qid AND lq.doc_id = s.doc_id
  GROUP BY lq.qid
)
SELECT p.qid, p.n_lex, p.n_lex_emb,
       COALESCE(c.n_common, 0) AS n_common,
       COALESCE(t.sem_rank_top_lex, 0) AS sem_rank_top_lex,
       {H.sql_round6(f"CAST(COALESCE(c.n_common, 0) AS DOUBLE) / {float(k)}")} AS overlap,
       {H.sql_round6("CAST(p.n_lex_emb AS DOUBLE) / CAST(p.n_lex AS DOUBLE)")} AS agreement_ceiling
FROM per_lex p LEFT JOIN common c ON p.qid = c.qid
LEFT JOIN top_rank t ON p.qid = t.qid
ORDER BY p.qid
"""


QUERIES["hybrid_retrieval_agreement"] = hybrid_retrieval_agreement
ORACLES["hybrid_retrieval_agreement"] = _sql_hybrid_agreement()


# ---------------------------------------------------------------------------
# hybrid_rrf_fusion (round 9) — reciprocal-rank fusion of the two retrievers
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al. SIGIR'09)


def hybrid_rrf_fusion(
    spark: SparkSession, sf_dir: str, nq: int = BM25_NQ, k: int = BM25_TOPK
) -> DataFrame:
    """Reciprocal-rank fusion of BM25 and exact-cosine retrieval — the
    fusion hybrid_retrieval_agreement calibrates: for every embedded
    query, union the lexical top-k with the semantic top-k and score each
    candidate Σ 1e6 div (RRF_K + rank) over the sources that returned it,
    keeping the fused top-k. RRF needs no score normalization across
    retrievers (rank-only), which is why it is the default fusion in
    production hybrid search; the 1e6-scaled INTEGER reciprocal keeps the
    score portable (no float reciprocal sums — engines would disagree in
    last ULPs when summing 1/(60+r) doubles).

    Scale: both inputs are bounded query batches (nq × k rows); fusion is
    nq × ≤2k metadata. The semantic side shares _semantic_ranked's single
    corpus-streaming matmul scan with the agreement op."""
    lex = (
        bm25_topk(spark, sf_dir, nq=nq, k=k)
        .select("qid", "rk", "doc_id")
        .localCheckpoint(eager=True)
    )
    out_schema = (
        "qid bigint, doc_id bigint, in_lex boolean, in_sem boolean, "
        "rrf_micro bigint, fused_rank bigint"
    )
    # single consumer of the ranking (rnk <= k): no checkpoint, so the
    # window-limit prunes to k rows per query instead of materializing
    # the full nq x n_emb ranking (r10)
    ranked_all, q_ids = _semantic_ranked(spark, sf_dir, lex, checkpoint=False)
    if ranked_all is None:
        return spark.createDataFrame([], out_schema)
    from pyspark.sql import Window

    lexr = lex.where(F.col("qid").isin([int(i) for i in q_ids])).select(
        "qid", "doc_id", F.col("rk").alias("lex_rank")
    )
    semr = ranked_all.where(F.col("rnk") <= k).select(
        "qid", "doc_id", F.col("rnk").alias("sem_rank")
    )
    cand = (
        lexr.join(semr, ["qid", "doc_id"], "full")
        .select(
            "qid",
            "doc_id",
            F.col("lex_rank").isNotNull().alias("in_lex"),
            F.col("sem_rank").isNotNull().alias("in_sem"),
            (
                F.coalesce(
                    F.expr(f"CAST(1000000 div ({RRF_K} + lex_rank) AS BIGINT)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"CAST(1000000 div ({RRF_K} + sem_rank) AS BIGINT)"),
                    F.lit(0),
                )
            ).alias("rrf_micro"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        cand.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= k)
        .select("qid", "doc_id", "in_lex", "in_sem", "rrf_micro", "fused_rank")
    )


def _sql_hybrid_rrf(nq: int = BM25_NQ, k: int = BM25_TOPK) -> str:
    from .similarity import _SQL_DOT, _sql_emb

    cos = (
        f"(floor(({_SQL_DOT.format(a='eq.qv', b='c.v')} / (eq.qn * c.nrm))"
        f" * 1000000.0 + 0.5) / 1000000.0)"
    )
    return f"""
WITH lex AS MATERIALIZED (SELECT qid, rk, doc_id FROM ({_sql_bm25_topk()})),
{_sql_emb()},
eq AS (
  SELECT e.vec_id AS qid, e.v AS qv, e.nrm AS qn
  FROM emb_n e JOIN (SELECT DISTINCT qid FROM lex) q ON e.vec_id = q.qid
),
hscored AS (
  SELECT eq.qid, c.vec_id AS doc_id, {cos} AS cosine
  FROM eq JOIN emb_n c ON eq.qid <> c.vec_id
),
ranked_all AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rnk
  FROM hscored
),
lexr AS (
  SELECT l.qid, l.doc_id, l.rk AS lex_rank
  FROM lex l JOIN eq ON l.qid = eq.qid
),
semr AS (SELECT qid, doc_id, rnk AS sem_rank FROM ranked_all WHERE rnk <= {k}),
cand AS (
  SELECT COALESCE(l.qid, s.qid) AS qid, COALESCE(l.doc_id, s.doc_id) AS doc_id,
         (l.lex_rank IS NOT NULL) AS in_lex,
         (s.sem_rank IS NOT NULL) AS in_sem,
         (COALESCE(1000000 // ({RRF_K} + l.lex_rank), 0)
          + COALESCE(1000000 // ({RRF_K} + s.sem_rank), 0)) AS rrf_micro
  FROM lexr l FULL OUTER JOIN semr s ON l.qid = s.qid AND l.doc_id = s.doc_id
)
SELECT qid, doc_id, in_lex, in_sem, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, doc_id) AS fused_rank
  FROM cand
) WHERE fused_rank <= {k}
ORDER BY qid, fused_rank
"""


QUERIES["hybrid_rrf_fusion"] = hybrid_rrf_fusion
ORACLES["hybrid_rrf_fusion"] = _sql_hybrid_rrf()
