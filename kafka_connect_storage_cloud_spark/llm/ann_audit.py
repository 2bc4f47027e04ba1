"""Cross-method ANN audit: every approximate top-k path graded against the
one exact gold in a single table.

ann_recall_audit grades the LSH path alone and ivf_nprobe_recall_curve
sweeps the IVF probe knob; this module is the capstone view — per method
(lsh / ivf / ivf_multiprobe / ivf_pq / ivf_sq8), total hits against the
brute-force top-k over the shared deterministic query set, and the recall.
The table an
operator reads when choosing the serving path for a new corpus: LSH needs
no training but band storage, IVF needs the codebook but probes fewer
candidates, PQ adds memory compression at a recall cost.

Scale: each method's top-k is its already-verified operator (k rows per
query); grading is k-row joins + a |methods|-row aggregate. Counts are
exact integers; the one recall division runs once per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from .pipeline import SQL_ANN_TOPK_IVF, SQL_ANN_TOPK_IVF_MULTIPROBE, ann_topk_ivf, ann_topk_ivf_multiprobe
from .pq import _sql_ivf_pq_topk, ann_topk_ivf_pq
from .sq import _sql_ann_topk_ivf_sq8, ann_topk_ivf_sq8
from .similarity import (
    SQL_ANN_TOPK_BRUTEFORCE,
    SQL_ANN_TOPK_LSH,
    ann_topk_bruteforce,
    ann_topk_lsh,
)


def ann_method_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, n_queries, sum_exact, sum_hits, recall) for every
    approximate ANN path vs the exact brute-force top-k."""
    from .pipeline import _assign_cells, _train_codebook
    from .similarity import _with_dec_and_norm
    from ..session import read_table

    # r10 (VERDICT r9 next-round #6): the four IVF-family members each
    # trained the IDENTICAL deterministic coarse codebook and re-assigned
    # the corpus (4 Lloyd chains + 4 assignment scans per invocation).
    # Train ONCE, assign ONCE, localCheckpoint the per-invocation frame,
    # and share it — values are identical by construction (deterministic
    # seeds + the shared _best_cells kernel); this is an intra-query
    # shared intermediate, not a cross-query memo.
    cb = _train_codebook(spark, sf_dir)
    c_ids, c_mat = cb
    if len(c_ids) == 0:  # empty corpus: no methods to grade
        return spark.createDataFrame(
            [],
            "method string, n_queries bigint, n_returned bigint, "
            "sum_exact bigint, sum_hits bigint, recall double",
        )
    emb = _with_dec_and_norm(read_table(spark, sf_dir, "embeddings"))
    assigned = _assign_cells(emb, c_ids, c_mat).localCheckpoint()
    exact = (
        ann_topk_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint()  # four method joins + the totals read it
    )
    methods = [
        ("lsh", ann_topk_lsh(spark, sf_dir)),
        ("ivf", ann_topk_ivf(spark, sf_dir, assigned=assigned)),
        ("ivf_multiprobe", ann_topk_ivf_multiprobe(spark, sf_dir, codebook=cb, assigned=assigned)),
        ("ivf_pq", ann_topk_ivf_pq(spark, sf_dir, codebook=cb, assigned=assigned)),
        ("ivf_sq8", ann_topk_ivf_sq8(spark, sf_dir, codebook=cb, assigned=assigned)),
    ]
    tagged = None
    for name, df in methods:
        t = df.select(F.lit(name).alias("method"), "query_id", "neighbor_id")
        tagged = t if tagged is None else tagged.unionAll(t)
    hits = (
        tagged.join(exact, ["query_id", "neighbor_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("sum_hits"))
    )
    per = tagged.groupBy("method").agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_returned"),
    )
    totals = exact.agg(F.count(F.lit(1)).alias("sum_exact"))
    return (
        per.join(hits, "method", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "method",
            "n_queries",
            "n_returned",
            "sum_exact",
            F.coalesce(F.col("sum_hits"), F.lit(0)).alias("sum_hits"),
            H.round6(
                F.coalesce(F.col("sum_hits"), F.lit(0)).cast("double")
                / F.col("sum_exact").cast("double")
            ).alias("recall"),
        )
        .orderBy("method")
    )


def _sql_ann_method_matrix() -> str:
    return f"""
WITH exact AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM ({SQL_ANN_TOPK_BRUTEFORCE})
),
tagged AS MATERIALIZED (
  SELECT 'lsh' AS method, query_id, neighbor_id FROM ({SQL_ANN_TOPK_LSH})
  UNION ALL
  SELECT 'ivf' AS method, query_id, neighbor_id FROM ({SQL_ANN_TOPK_IVF})
  UNION ALL
  SELECT 'ivf_multiprobe' AS method, query_id, neighbor_id FROM ({SQL_ANN_TOPK_IVF_MULTIPROBE})
  UNION ALL
  SELECT 'ivf_pq' AS method, query_id, neighbor_id FROM ({_sql_ivf_pq_topk()})
  UNION ALL
  SELECT 'ivf_sq8' AS method, query_id, neighbor_id FROM ({_sql_ann_topk_ivf_sq8()})
),
per AS (
  SELECT method, CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         CAST(COUNT(*) AS BIGINT) AS n_returned
  FROM tagged GROUP BY method
),
hits AS (
  SELECT t.method, CAST(COUNT(*) AS BIGINT) AS sum_hits
  FROM tagged t JOIN exact e ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
  GROUP BY t.method
),
totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS sum_exact FROM exact)
SELECT p.method, p.n_queries, p.n_returned, totals.sum_exact,
       COALESCE(h.sum_hits, 0) AS sum_hits,
       {H.sql_round6("CAST(COALESCE(h.sum_hits, 0) AS DOUBLE) / CAST(totals.sum_exact AS DOUBLE)")} AS recall
FROM per p LEFT JOIN hits h ON p.method = h.method CROSS JOIN totals
ORDER BY p.method
"""


QUERIES = {"ann_method_matrix": ann_method_matrix}
ORACLES = {"ann_method_matrix": _sql_ann_method_matrix()}
