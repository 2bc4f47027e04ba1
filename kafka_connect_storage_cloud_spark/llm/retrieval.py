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
