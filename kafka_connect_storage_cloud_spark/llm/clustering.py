"""Near-duplicate clustering: connected components over the MinHash-LSH
candidate graph, giving each document a canonical cluster id (the min doc_id
reachable through near-dup edges) — the step after pair generation in a
production dedup pipeline (keep one representative per cluster).

Spark-first: iterative min-label propagation over the edge list. Each
iteration is one shuffle join; the loop runs until fixpoint (bounded by graph
diameter, which for dedup graphs is tiny). This is the standard scalable
connected-components-on-DataFrames pattern — no driver-side graph, works at
any |V| because state lives in a DataFrame.

Oracle: DuckDB recursive CTE computes the transitive closure and takes the
min reachable id — different algorithm, same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table
from .dedup import dedup_minhash_lsh

MAX_ITERS = 20


def min_label_components(nodes: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Min-label propagation to fixpoint: (id_col, cluster_id, cluster_size)
    where cluster_id = min id reachable through the pair edges.

    `nodes` has column id_col; `pairs` has columns (src, dst) with one row
    per undirected pair (either orientation)."""
    # materialize pairs once — the undirected union references them twice
    pairs = pairs.localCheckpoint()
    edges = (
        pairs.select("src", "dst")
        .unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    # localCheckpoint truncates the per-iteration lineage (no replanning of
    # the whole history each round); labels only ever decrease, so the label
    # sum is a monotone fixpoint detector — one cheap agg per iteration
    # instead of a full old-vs-new join.
    labels = nodes.select(F.col(id_col), F.col(id_col).alias("lab")).localCheckpoint()
    cur_sum = labels.agg(F.sum("lab")).collect()[0][0]
    for _ in range(MAX_ITERS):
        neighbor_min = (
            edges.join(labels, edges.dst == labels[id_col])
            .groupBy("src")
            .agg(F.min("lab").alias("nlab"))
        )
        labels = (
            labels.join(neighbor_min, labels[id_col] == neighbor_min.src, "left")
            .select(
                id_col,
                F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias("lab"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("lab")).collect()[0][0]
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "lab")
        .select(id_col, F.col("lab").alias("cluster_id"), "cluster_size")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every document; cluster_id is
    the min doc_id in the near-dup component (singletons cluster alone)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return min_label_components(docs, pairs, "doc_id")


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup: connected components over the
    cosine>=τ near-dup graph, keep the min-vec_id representative per
    component. Same min-label propagation as the MinHash path — the edge
    generator is the only difference, so the CC machinery is shared and
    scale behavior (one shuffle join per iteration, diameter-bounded loop)
    is identical."""
    from .similarity import embedding_cosine_dups

    vecs = read_table(spark, sf_dir, "embeddings").select("vec_id")
    pairs = embedding_cosine_dups(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    comp = min_label_components(vecs, pairs, "vec_id")
    return comp.select(
        "vec_id", "cluster_id", "cluster_size", (F.col("vec_id") == F.col("cluster_id")).alias("keep")
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's shipping decision: within every near-dup cluster
    keep the highest-quality member (quality_score ranking, doc_id
    tiebreak), drop the rest. Composes clustering with quality scoring —
    clusters are tiny relative to the corpus, so the rank window's shuffle
    carries |docs| rows once."""
    from .quality import quality_score

    from pyspark.sql import Window

    clusters = dedup_clusters(spark, sf_dir)
    quality = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "quality",
            (F.col("rnk") == 1).alias("keep"),
        )
    )


def _sql_cluster_ctes() -> str:
    from .dedup import MAX_BUCKET, _sql_bands, _sql_signatures

    return f"""{_sql_signatures().strip()},
{_sql_bands()},
bucket_sizes AS (SELECT band, bval, COUNT(*) AS bn FROM bands GROUP BY 1, 2),
bands_ok AS (
  SELECT b.* FROM bands b JOIN bucket_sizes s USING (band, bval)
  WHERE s.bn <= {MAX_BUCKET}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_ok a JOIN bands_ok b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT e.src AS node, r.lab
  FROM reach r JOIN edges e ON e.dst = r.node
),
final AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM final GROUP BY cluster_id)"""


def _sql_clusters() -> str:
    return f"""
WITH RECURSIVE {_sql_cluster_ctes()}
SELECT f.doc_id, f.cluster_id, s.cluster_size
FROM final f JOIN sizes s USING (cluster_id)
ORDER BY f.doc_id
"""


def _sql_keep_best() -> str:
    from .quality import SQL_QUALITY_SCORE

    return f"""
WITH RECURSIVE {_sql_cluster_ctes()},
clusters AS (SELECT f.doc_id, f.cluster_id, s.cluster_size
             FROM final f JOIN sizes s USING (cluster_id)),
quality AS ({SQL_QUALITY_SCORE}),
ranked AS (
  SELECT c.doc_id, c.cluster_id, c.cluster_size, q.quality,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id) AS rnk
  FROM clusters c JOIN quality q ON c.doc_id = q.doc_id
)
SELECT doc_id, cluster_id, cluster_size, quality, rnk = 1 AS keep
FROM ranked ORDER BY doc_id
"""


def _sql_semantic() -> str:
    from .similarity import CB_THRESHOLD, _SQL_DOT, _sql_cb_cand_ctes, _sql_emb

    cos = (
        f"(floor(({_SQL_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm))"
        f" * 1000000.0 + 0.5) / 1000000.0)"
    )
    return f"""
WITH RECURSIVE {_sql_emb().strip()},
{_sql_cb_cand_ctes()},
cand AS (
  SELECT vec_a AS src, vec_b AS dst FROM cbcand
),
pairs AS (
  SELECT c.src, c.dst
  FROM cand c JOIN emb_n a ON c.src = a.vec_id JOIN emb_n b ON c.dst = b.vec_id
  WHERE {cos} >= {CB_THRESHOLD}
),
edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
reach AS (
  SELECT vec_id AS node, vec_id AS lab FROM embeddings
  UNION
  SELECT e.src AS node, r.lab FROM reach r JOIN edges e ON e.dst = r.node
),
final AS (SELECT node AS vec_id, MIN(lab) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM final GROUP BY cluster_id)
SELECT f.vec_id, f.cluster_id, s.cluster_size, f.vec_id = f.cluster_id AS keep
FROM final f JOIN sizes s USING (cluster_id) ORDER BY f.vec_id
"""


ORACLES = {
    "dedup_clusters": _sql_clusters(),
    "dedup_keep_best": _sql_keep_best(),
    "dedup_semantic": _sql_semantic(),
}


def dedup_rate_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup fairness audit: per (source, lang) slice, how many documents
    the keep-best dedup decision retains — the bias check run after any
    corpus-shrinking step, because a near-dup policy that silently drops
    80% of one language skews the training mix exactly like an intentional
    reweighting would. Composes dedup_keep_best with the document
    dimensions; one join + one slice-keyed aggregation."""
    from ..functions import hashing as H
    from ..session import read_table

    kb = dedup_keep_best(spark, sf_dir).select("doc_id", F.col("keep").cast("long").alias("k"))
    dims = read_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return (
        kb.join(dims, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("k").alias("n_kept"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_kept",
            H.round6(F.col("n_kept") / F.col("n_docs").cast("double")).alias("kept_ratio"),
        )
        .orderBy("source", "lang")
    )


def _sql_dedup_rate_by_slice() -> str:
    from ..functions import hashing as H

    return f"""
WITH kb AS ({_sql_keep_best()}),
j AS (
  SELECT d.source, d.lang, CASE WHEN kb.keep THEN 1 ELSE 0 END AS k
  FROM kb JOIN documents d ON kb.doc_id = d.doc_id
)
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(k) AS BIGINT) AS n_kept,
       {H.sql_round6("CAST(SUM(k) AS DOUBLE) / COUNT(*)")} AS kept_ratio
FROM j GROUP BY source, lang
ORDER BY source, lang
"""


ORACLES["dedup_rate_by_slice"] = _sql_dedup_rate_by_slice()


def quality_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family corpus audit: dedup drop rate by quality band — the
    "are low-quality documents also the duplicated ones?" check run before
    committing to a filter threshold, because if dedup already removes the
    low-quality mass, a quality filter on top double-counts the penalty
    (and vice versa: high drop rates in HIGH-quality bands flag boilerplate
    that the quality heuristic likes).

    Quality lands in fixed 0.1-wide bands (no ntile: fixed bins need no
    global sort shuffle, so the op stays one join + one 10-group aggregate
    at any corpus size). Mean quality per band aggregates the exact 1e-6
    integer grid of the round6 scores, so every output is
    engine-deterministic."""
    from ..functions import hashing as H
    from .quality import quality_score

    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    kb = dedup_keep_best(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("long").alias("k")
    )
    j = q.join(kb, "doc_id").select(
        F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9)).alias("q_bin"),
        F.floor(F.col("quality") * 1000000.0 + F.lit(0.5)).cast("bigint").alias("qi"),
        "k",
    )
    return (
        j.groupBy("q_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.lit(1) - F.col("k")).alias("n_dropped"),
            F.sum("qi").alias("qsum"),
        )
        .select(
            "q_bin",
            "n_docs",
            "n_dropped",
            H.round6(F.col("n_dropped") / F.col("n_docs").cast("double")).alias("drop_ratio"),
            H.round6(
                F.col("qsum").cast("double") / (F.col("n_docs").cast("double") * 1000000.0)
            ).alias("mean_quality"),
        )
        .orderBy("q_bin")
    )


def _sql_quality_dup_profile() -> str:
    from ..functions import hashing as H
    from .quality import SQL_QUALITY_SCORE

    return f"""
WITH kb AS ({_sql_keep_best()}),
qsc AS ({SQL_QUALITY_SCORE}),
qj AS (
  SELECT CAST(LEAST(CAST(floor(q.quality * 10) AS BIGINT), 9) AS INT) AS q_bin,
         CAST(floor(q.quality * 1000000.0 + 0.5) AS BIGINT) AS qi,
         CASE WHEN kb.keep THEN 1 ELSE 0 END AS k
  FROM qsc q JOIN kb ON q.doc_id = kb.doc_id
)
SELECT q_bin, COUNT(*) AS n_docs,
       CAST(SUM(1 - k) AS BIGINT) AS n_dropped,
       {H.sql_round6("CAST(SUM(1 - k) AS DOUBLE) / COUNT(*)")} AS drop_ratio,
       {H.sql_round6("CAST(SUM(qi) AS DOUBLE) / (COUNT(*) * 1000000.0)")} AS mean_quality
FROM qj GROUP BY q_bin ORDER BY q_bin
"""


ORACLES["quality_dup_profile"] = _sql_quality_dup_profile()


def dup_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: for each component size k, how many
    near-dup clusters exist, how many documents they hold, and how many a
    keep-one policy removes (k-1 per cluster) — the single table that says
    how much a dedup pass will shrink the corpus before running it
    (dedup_rate_by_slice answers WHO gets dropped; this answers HOW MUCH).
    Pure rollup of dedup_clusters: one extra tiny aggregation."""
    comp = dedup_clusters(spark, sf_dir)
    return (
        comp.groupBy("cluster_size")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - F.lit(1)) * F.col("n_clusters")).alias(
                "removable_docs"
            ),
        )
        .orderBy("cluster_size")
    )


def _sql_dup_cluster_size_profile() -> str:
    return f"""
WITH comp AS ({_sql_clusters()})
SELECT cluster_size,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(DISTINCT cluster_id) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * COUNT(DISTINCT cluster_id) AS BIGINT) AS removable_docs
FROM comp GROUP BY cluster_size ORDER BY cluster_size
"""


ORACLES["dup_cluster_size_profile"] = _sql_dup_cluster_size_profile()


TRANS_CLUSTER_CAP = 100  # all-pairs audit cap per cluster (Σ size² bound)


def dedup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaining audit for connected-component dedup: CC merges A~B~C into
    one cluster even when (A,C) never passed the near-dup bar, so a
    keep-one policy can silently drop documents that are NOT near-dups of
    the kept representative. Per cluster size: in-cluster pairs vs pairs
    that are DIRECT LSH matches; chained_share is the fraction inherited
    purely through transitivity — the number that says whether the
    threshold or the CC policy needs tightening. Clusters above
    TRANS_CLUSTER_CAP members are excluded from the all-pairs expansion
    (Σ size² bound) and reported via n_capped_clusters."""
    from .dedup import dedup_minhash_lsh

    comp = dedup_clusters(spark, sf_dir).where(
        (F.col("cluster_size") >= 2) & (F.col("cluster_size") <= TRANS_CLUSTER_CAP)
    )
    a = comp.select("cluster_id", "cluster_size", F.col("doc_id").alias("doc_a"))
    b = comp.select("cluster_id", F.col("doc_id").alias("doc_b"))
    pairs = a.join(b, "cluster_id").where(F.col("doc_a") < F.col("doc_b"))
    direct = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("is_direct")
    )
    j = pairs.join(direct, ["doc_a", "doc_b"], "left")
    return (
        j.groupBy("cluster_size")
        .agg(
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce(F.col("is_direct"), F.lit(0))).cast("long").alias("n_direct"),
        )
        .select(
            "cluster_size",
            "n_clusters",
            "n_pairs",
            "n_direct",
            H.round6(
                (F.col("n_pairs") - F.col("n_direct")) / F.col("n_pairs").cast("double")
            ).alias("chained_share"),
        )
        .orderBy("cluster_size")
    )


def _sql_transitivity_audit() -> str:
    from ..functions import hashing as H
    from .dedup import SQL_DEDUP_MINHASH_LSH

    return f"""
WITH comp AS ({_sql_clusters()}),
kept AS (
  SELECT * FROM comp WHERE cluster_size >= 2 AND cluster_size <= {TRANS_CLUSTER_CAP}
),
cpairs AS (
  SELECT a.cluster_id, a.cluster_size, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id
),
direct AS (SELECT doc_a, doc_b FROM ({SQL_DEDUP_MINHASH_LSH})),
agg AS (
  SELECT p.cluster_size,
         CAST(COUNT(DISTINCT p.cluster_id) AS BIGINT) AS n_clusters,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_direct
  FROM cpairs p LEFT JOIN direct d ON p.doc_a = d.doc_a AND p.doc_b = d.doc_b
  GROUP BY 1
)
SELECT cluster_size, n_clusters, n_pairs, n_direct,
       {H.sql_round6("(n_pairs - n_direct) / CAST(n_pairs AS DOUBLE)")} AS chained_share
FROM agg ORDER BY cluster_size
"""


ORACLES["dedup_transitivity_audit"] = _sql_transitivity_audit()


def knn_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the PRODUCTION mutual-kNN graph
    (knn_graph_lsh edges): each vector's community id (min reachable
    vec_id) and community size — the coarse cluster structure used for
    diversity sampling and SemDeDup-style pruning, computed on the same
    edge list the graph analytics ride (triangles / PageRank / label vote).

    Scale: identical min-label propagation as dedup_clusters — state is a
    (vec_id, label) DataFrame, one shuffle join per iteration, loop bounded
    by component diameter (tiny for near-dup/kNN graphs); the edge builder
    is the banded-LSH path whose candidate volume stays ~linear in n."""
    from .similarity import knn_graph_lsh

    vecs = read_table(spark, sf_dir, "embeddings").select("vec_id")
    pairs = knn_graph_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    return min_label_components(vecs, pairs, "vec_id")


def _sql_knn_components() -> str:
    from .similarity import SQL_KNN_GRAPH_LSH

    return f"""
WITH RECURSIVE gpairs AS (
  SELECT vec_a, vec_b FROM ({SQL_KNN_GRAPH_LSH})
),
gedges AS (
  SELECT vec_a AS src, vec_b AS dst FROM gpairs
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM gpairs
),
greach AS (
  SELECT vec_id AS node, vec_id AS lab FROM embeddings
  UNION
  SELECT e.src AS node, r.lab
  FROM greach r JOIN gedges e ON e.dst = r.node
),
gfinal AS (SELECT node AS vec_id, MIN(lab) AS cluster_id FROM greach GROUP BY node),
gsizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM gfinal GROUP BY cluster_id)
SELECT f.vec_id, f.cluster_id, s.cluster_size
FROM gfinal f JOIN gsizes s USING (cluster_id)
ORDER BY f.vec_id
"""


ORACLES["knn_graph_components"] = _sql_knn_components()
