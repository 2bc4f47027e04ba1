"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (q1 pricing summary) on sf0.001.
queries()    — every implemented operator from SURVEY.md §2.
oracle_sql() — DuckDB-dialect equivalents for the correctness gate.

Column names are aliased identically on both sides; money aggregates use
decimal-exact math (see kafka_connect_storage_cloud_spark/functions/money.py)
so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver loads this file by path; make the sibling package importable
# regardless of the caller's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from kafka_connect_storage_cloud_spark.functions import hashing as _H
from kafka_connect_storage_cloud_spark.llm import corpus as LCO
from kafka_connect_storage_cloud_spark.llm import dedup as LD
from kafka_connect_storage_cloud_spark.llm import multimodal as LM
from kafka_connect_storage_cloud_spark.llm import pii as LPI
from kafka_connect_storage_cloud_spark.llm import pq as LPQ
from kafka_connect_storage_cloud_spark.llm import sq as LSQ
from kafka_connect_storage_cloud_spark.llm import pipeline as LP
from kafka_connect_storage_cloud_spark.llm import quality as LQ
from kafka_connect_storage_cloud_spark.llm import substring as LSU
from kafka_connect_storage_cloud_spark.llm import similarity as LS
from kafka_connect_storage_cloud_spark.llm import sketches as SK
from kafka_connect_storage_cloud_spark.llm import sampling as SA
from kafka_connect_storage_cloud_spark.llm import text_stats as TS
from kafka_connect_storage_cloud_spark.llm import curriculum as CU
from kafka_connect_storage_cloud_spark.llm import ann_audit as AA
from kafka_connect_storage_cloud_spark.llm import retrieval as RT
from kafka_connect_storage_cloud_spark.operators import schema_evolution as SE
from kafka_connect_storage_cloud_spark.operators import layout as LAY
from kafka_connect_storage_cloud_spark.operators import smt as SMT
from kafka_connect_storage_cloud_spark.plans import cdc as CD
from kafka_connect_storage_cloud_spark.plans import connector as C
from kafka_connect_storage_cloud_spark.llm import clustering as LC
from kafka_connect_storage_cloud_spark.plans import events as E
from kafka_connect_storage_cloud_spark.plans import events_ext as EX
from kafka_connect_storage_cloud_spark.plans import tpch as T
from kafka_connect_storage_cloud_spark.plans import tpch_ext as TX
from kafka_connect_storage_cloud_spark.plans import temporal as TP
from kafka_connect_storage_cloud_spark.plans import tpch_ext2 as TX2
from kafka_connect_storage_cloud_spark.plans import warehouse as WH
from kafka_connect_storage_cloud_spark.plans import inference as INF


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return T.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# --- diff-aware re-verification window (rebuilt round 10, optimization
# phase 2) -- tools/stale_keys.py --window 50 on the final tree:
# fresh=11 (the keys VERDICT r9 next-round #2 lists -- every operator
# still awaiting its FIRST external oracle row heads the window) +
# stale=80 (this round rewrote shared helpers in llm/dedup.py,
# llm/similarity.py, llm/pipeline.py, llm/pq.py, llm/sq.py,
# llm/ann_audit.py, llm/retrieval.py, session.py; the content-signature
# tool marks every transitive consumer stale by construction; each
# rewritten path was driver-sim verified at sf0.01 in-round). _PRIORITY =
# the 11 fresh keys + the first 39 stale; the remaining 41 stale keys are
# in _RECHECK; everything else is signature-identical to its last green
# round.
_PRIORITY: tuple[str, ...] = (
    "events_stl_anomaly", "dedup_cascade_yield", "events_mann_kendall",
    "events_ljung_box", "token_lorenz_gini_edges", "events_hampel_filter",
    "erasure_blast_radius", "hybrid_rrf_fusion", "semdedup_cell_profile",
    "ann_topk_ivf_twolevel", "ivf_twolevel_recall_audit", "ann_recall_audit",
    "ann_topk_bruteforce", "knn_graph_mutual", "knn_pagerank_step",
    "knn_triangle_count", "knn_graph_lsh", "knn_graph_lsh_recall",
    "knn_graph_lsh_recall_sampled", "knn_label_vote_lsh", "knn_pagerank_step_lsh",
    "knn_triangle_count_lsh", "intrinsic_dim_twonn", "knn_degree_assortativity",
    "bm25_topk", "hybrid_retrieval_agreement", "dedup_containment",
    "dedup_incremental", "dedup_minhash_lsh", "dedup_simhash",
    "minhash_band_tuning", "minhash_jaccard_est", "minhash_precision_curve",
    "ngram_jaccard", "simhash_bit_balance", "dedup_method_matrix",
    "winnowing_fingerprints", "winnowing_window_tuning", "ivf_kmeans_refine",
    "ivf_balance_audit", "ivf_nprobe_recall_curve", "ann_topk_ivf",
    "ann_topk_ivf_multiprobe", "cluster_profile_kmeans", "semdedup_cells",
    "cluster_silhouette", "pq_code_balance", "ann_topk_ivf_pq",
    "embedding_pq", "pq_adc_topk",
)

_RECHECK: tuple[str, ...] = (
    "pq_recall_audit", "embedding_sq8", "ann_topk_ivf_sq8",
    "ann_method_matrix", "dedup_chunks", "doc_chunk_split",
    "bigram_lm_rarity", "shard_balance_audit", "bigram_lift",
    "ngram_novelty", "vocab_coverage", "zipf_profile",
    "boilerplate_shingles", "conformal_quality_coverage", "doc_readability",
    "quality_quantile_normalize", "term_burstiness", "token_ge2_inequality",
    "token_hapax_profile", "token_lorenz_gini", "cms_heavy_hitters",
    "kmv_distinct", "quantile_sketch_audit", "kmv_set_ops",
    "cms_error_curve", "dedup_substring", "dedup_bloom",
    "late_data_audit", "events_acf_profile", "broadcast_size_audit",
    "customer_interpurchase", "orders_priority_mix_drift", "gopher_rules_filter",
    "quality_ablation_matrix", "quality_reliability_bins", "dedup_keep_best",
    "dedup_rate_by_slice", "quality_dup_profile", "dedup_transitivity_audit",
    "dup_cluster_size_profile", "dedup_clusters",
)

_VERIFIED_CURRENT: tuple[str, ...] = (
    "ab_test_metrics", "ann_topk_lsh", "anomaly_ensemble_agreement",
    "benford_audit", "bootstrap_mean_ci", "bpe_compression_curve",
    "bpe_pair_stats", "bpe_train_rounds", "cdc_merge_apply",
    "compact_small_files", "consumer_lag_report", "contamination_check",
    "context_pack", "corpus_mixture", "corpus_prep_pipeline",
    "corpus_stats", "cosine_dup_band_recall", "cosine_dup_band_recall_sampled",
    "curriculum_stages", "curriculum_stages_edges", "daily_partitioner",
    "dedup_exact", "dedup_modality_agreement", "dedup_semantic",
    "default_partitioner", "doc_fingerprint", "doc_truncation_loss",
    "dp_sensitivity_audit", "drift_ensemble_matrix", "dsir_importance",
    "dsir_importance_edges", "dup_source_matrix", "duration_partitioner",
    "embedding_centroid_outliers", "embedding_cosine_dups", "embedding_covariance",
    "embedding_dim_stats", "embedding_pca_power", "embedding_pca_project",
    "erasure_rewrite_plan", "events_anomaly", "events_anomaly_mad",
    "events_asof_join", "events_autocorr_lag1", "events_burst_runs",
    "events_burstiness_index", "events_changepoint", "events_completeness_audit",
    "events_cox_stuart", "events_cube", "events_cusum_alarms",
    "events_dau_mau", "events_dod_growth", "events_dow_profile",
    "events_ewma16", "events_fano_dispersion", "events_funnel",
    "events_gapfill_locf", "events_haar_energy", "events_holt_linear",
    "events_hourly_rollup", "events_hurst_rs", "events_inter_arrival",
    "events_ks_drift", "events_levene_bf", "events_mann_whitney",
    "events_markov_diversity", "events_markov_transitions", "events_max_burst_window",
    "events_ordinal_patterns", "events_page_hinkley", "events_peak_hour_stability",
    "events_pettitt_change", "events_ph_episodes", "events_props_extract",
    "events_props_variant", "events_qq_drift", "events_range_join",
    "events_recurrence_quant", "events_retention", "events_rolling_window",
    "events_runs_test", "events_seasonal_median_decompose", "events_seasonality_anova",
    "events_seasonality_strength", "events_session_window_native", "events_sessionize",
    "events_sliding_window", "events_spectral_power", "events_theil_sen",
    "events_time_weighted_avg", "events_topk_users", "events_trend_slope",
    "events_turning_points", "events_type_affinity", "events_type_diversity",
    "events_type_pivot", "events_type_unpivot", "events_value_deciles",
    "events_value_deciles_edges", "events_value_histogram", "events_value_percentiles_exact",
    "events_variance_ratio", "events_von_neumann", "events_xcorr_lags",
    "exactly_once_manifest", "field_partitioner", "field_time_partitioner",
    "fuzzy_name_matches", "hll_distinct", "hll_merge_invariant",
    "hourly_partitioner", "idf_topterms", "k_anonymity_audit",
    "kfold_assignment", "knn_graph_components", "knn_label_vote_accuracy",
    "kv_header_views", "l_diversity_audit", "landed_files_diff",
    "lang_id", "lang_id_confusion", "lm_rarity_score",
    "locale_partitioner", "log_compaction", "market_concentration_hhi",
    "matryoshka_recall_audit", "mixture_temperature_weights", "mlm_masking_plan",
    "modality_coverage_audit", "multi_touch_attribution", "multimodal_audio_resample",
    "multimodal_frame_sample", "multimodal_payload_dedup", "multimodal_pipeline",
    "multimodal_resize", "multipart_upload_plan", "negative_sampling_table",
    "ngram_memorization_audit", "offset_continuity_audit", "order_lead_time",
    "order_priority_count", "orders_backlog_aging", "orders_cohort_ltv",
    "pack_efficiency_curve", "part_affinity", "part_type_margin",
    "partition_pruning_matrix", "path_format_partitioner", "pii_density_by_slice",
    "pii_scan", "q10_returned_items", "q11_important_stock",
    "q12_ship_priority_class", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_discounted_revenue", "q1_pricing_summary",
    "q1_rollup", "q20_dominant_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_revenue_change",
    "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "quality_filter", "quality_score", "quality_threshold_yield",
    "rarity_buckets", "rarity_buckets_edges", "repetition_score",
    "reservoir_sample", "revenue_pareto", "revenue_pareto_edges",
    "rfm_segmentation", "rfm_segmentation_edges", "rollup_incremental_merge",
    "rotation_custom_naming", "rotation_flush_size", "rotation_interval",
    "rotation_interval_partition_change", "rotation_max_open_files", "rotation_partition_change",
    "rotation_policy_matrix", "rotation_scheduled", "rotation_schema_change",
    "rotation_stats", "scd2_history", "scd2_snapshot_asof",
    "schema_compat_backward", "schema_compat_forward", "schema_compat_full",
    "schema_compat_none", "schema_evolution", "schema_partitioner",
    "schema_partitioner_suffix", "semantic_contamination", "shard_checksum_manifest",
    "shard_skew_audit", "skew_salt_plan", "smt_chain",
    "source_overlap_jaccard", "span_corruption_plan", "sq8_recall_audit",
    "stratified_sample", "supplier_scorecard", "t_closeness_audit",
    "time_based_partitioner", "timestamp_extractor_record_field", "token_count",
    "token_diversity", "token_shard_pack", "tokenizer_fertility",
    "tokens_per_source_budget", "tombstone_routing", "top_customers",
    "train_test_split", "tz_partitioner", "unblocked_band_recall",
    "vocab_drift_chi2", "vocab_drift_tvd", "vocab_growth_curve",
    "watermark_advisor", "zorder_file_skipping",
)


def _rotate(q: dict[str, Callable[[SparkSession, str], DataFrame]]) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    known = set(_PRIORITY) | set(_RECHECK) | set(_VERIFIED_CURRENT)
    fresh = [k for k in q if k not in known]  # ops newer than the window build
    seen = set(fresh)
    pri = [k for k in _PRIORITY if k in q and k not in seen]
    seen |= set(pri)
    recheck = [k for k in _RECHECK if k in q and k not in seen]
    seen |= set(recheck)
    tail = [k for k in q if k not in seen]
    return {k: q[k] for k in fresh + pri + recheck + tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotate({
        # --- connector parity (SURVEY §2A) ---
        "default_partitioner": C.default_partitioner_plan,
        "field_partitioner": C.field_partitioner_plan,
        "time_based_partitioner": C.time_based_partitioner_plan,
        "path_format_partitioner": C.path_format_partitioner_plan,
        "daily_partitioner": C.daily_partitioner_plan,
        "hourly_partitioner": C.hourly_partitioner_plan,
        "field_time_partitioner": C.field_time_partitioner_plan,
        "schema_partitioner": C.schema_partitioner_plan,
        "schema_partitioner_suffix": C.schema_suffix_partitioner_plan,
        "timestamp_extractor_record_field": C.record_field_extractor_plan,
        "tz_partitioner": C.tz_partitioner_plan,
        "duration_partitioner": C.duration_partitioner_plan,
        "rotation_stats": C.rotation_stats_plan,
        "rotation_flush_size": C.rotation_flush_size_plan,
        "multipart_upload_plan": C.multipart_upload_plan,
        "consumer_lag_report": C.consumer_lag_report,
        "rotation_policy_matrix": C.rotation_policy_matrix,
        "rotation_custom_naming": C.rotation_custom_naming_plan,
        "locale_partitioner": C.locale_partitioner_plan,
        "rotation_scheduled": C.rotation_scheduled_plan,
        "rotation_interval": C.rotation_interval_plan,  # oracle: recursive CTE
        "rotation_partition_change": C.rotation_partition_change_plan,
        # r6: the reference-default interval+partition-change combination
        "rotation_interval_partition_change": C.rotation_interval_partition_change_plan,
        "rotation_max_open_files": C.rotation_max_open_files_plan,
        "rotation_schema_change": C.rotation_schema_change_plan,
        "schema_compat_backward": lambda s, d: C.schema_compat_rotation_plan(s, d, "BACKWARD"),
        "schema_compat_forward": lambda s, d: C.schema_compat_rotation_plan(s, d, "FORWARD"),
        "schema_compat_full": lambda s, d: C.schema_compat_rotation_plan(s, d, "FULL"),
        "schema_compat_none": lambda s, d: C.schema_compat_rotation_plan(s, d, "NONE"),
        "erasure_rewrite_plan": C.erasure_rewrite_plan,
        "exactly_once_manifest": C.exactly_once_manifest_plan,
        "tombstone_routing": C.tombstone_routing_plan,
        "kv_header_views": C.kv_header_views_plan,
        "schema_evolution": SE.schema_evolution_plan,
        **SMT.QUERIES,
        **LAY.QUERIES,
        # --- analytics (SURVEY §2B) ---
        "q1_pricing_summary": T.q1_pricing_summary,
        "q3_shipping_priority": T.q3_shipping_priority,
        "q5_local_supplier_volume": T.q5_local_supplier_volume,
        "q6_revenue_change": T.q6_revenue_change,
        "q10_returned_items": T.q10_returned_items,
        "top_customers": T.top_customers,
        "order_priority_count": T.order_priority_count,
        "part_type_margin": T.part_type_margin,
        **TX.QUERIES,
        **TX2.QUERIES,
        "events_hourly_rollup": E.events_hourly_rollup,
        "events_sessionize": E.events_sessionize,
        "events_session_window_native": E.events_session_window_native,
        "events_sliding_window": E.events_sliding_window,
        "events_topk_users": E.events_topk_users,
        **EX.QUERIES,
        **TP.QUERIES,
        **CD.QUERIES,
        **WH.QUERIES,
        **INF.QUERIES,
        # --- LLM data pipeline (SURVEY §2C) ---
        "dedup_clusters": LC.dedup_clusters,
        "dup_cluster_size_profile": LC.dup_cluster_size_profile,
        "dedup_transitivity_audit": LC.dedup_transitivity_audit,
        "dedup_keep_best": LC.dedup_keep_best,
        "dedup_semantic": LC.dedup_semantic,
        "knn_graph_components": LC.knn_graph_components,
        "dedup_rate_by_slice": LC.dedup_rate_by_slice,
        "quality_dup_profile": LC.quality_dup_profile,
        "dedup_exact": LD.dedup_exact,
        "winnowing_fingerprints": LD.winnowing_fingerprints,
        "dup_source_matrix": LD.dup_source_matrix,
        "source_overlap_jaccard": LD.source_overlap_jaccard,
        "minhash_precision_curve": LD.minhash_precision_curve,
        "dedup_minhash_lsh": LD.dedup_minhash_lsh,
        "erasure_blast_radius": LD.erasure_blast_radius,
        "dedup_containment": LD.dedup_containment,
        "simhash_bit_balance": LD.simhash_bit_balance,
        "dedup_method_matrix": LD.dedup_method_matrix,
        "dedup_cascade_yield": LD.dedup_cascade_yield,
        "winnowing_window_tuning": LD.winnowing_window_tuning,
        "dedup_incremental": LD.dedup_incremental,
        "minhash_jaccard_est": LD.minhash_jaccard_est,
        "minhash_band_tuning": LD.minhash_band_tuning,
        "dedup_simhash": LD.dedup_simhash,
        "ngram_jaccard": LD.ngram_jaccard_gold,  # SF-adaptive exact gold
        "dedup_modality_agreement": LD.dedup_modality_agreement,
        **LSU.QUERIES,
        **CU.QUERIES,
        **AA.QUERIES,
        **RT.QUERIES,
        "embedding_cosine_dups": LS.embedding_cosine_dups,
        "matryoshka_recall_audit": LS.matryoshka_recall_audit,  # r6
        "cosine_dup_band_recall": LS.cosine_dup_band_recall,
        "cosine_dup_band_recall_sampled": LS.cosine_dup_band_recall_sampled,
        "knn_graph_lsh_recall_sampled": LS.knn_graph_lsh_recall_sampled,
        "ann_topk_bruteforce": LS.ann_topk_bruteforce,
        "ann_topk_lsh": LS.ann_topk_lsh,
        "ann_recall_audit": LS.ann_recall_audit,
        "knn_graph_mutual": LS.knn_graph_mutual_gold,  # SF-adaptive exact gold
        "knn_degree_assortativity": LS.knn_degree_assortativity,
        "intrinsic_dim_twonn": LS.intrinsic_dim_twonn,
        "knn_graph_lsh": LS.knn_graph_lsh,
        "knn_graph_lsh_recall": LS.knn_graph_lsh_recall,
        "knn_triangle_count": LS.knn_triangle_count,
        "knn_triangle_count_lsh": LS.knn_triangle_count_lsh,
        "knn_pagerank_step_lsh": LS.knn_pagerank_step_lsh,
        "knn_label_vote_accuracy": LS.knn_label_vote_accuracy,
        "knn_label_vote_lsh": LS.knn_label_vote_lsh,
        "embedding_centroid_outliers": LS.embedding_centroid_outliers,
        "embedding_dim_stats": LS.embedding_dim_stats,
        "embedding_covariance": LS.embedding_covariance,
        "embedding_pca_power": LS.embedding_pca_power,
        "embedding_pca_project": LS.embedding_pca_project,
        "unblocked_band_recall": LS.unblocked_band_recall,
        "knn_pagerank_step": LS.knn_pagerank_step,
        "lang_id": LQ.lang_id,
        "lang_id_confusion": LQ.lang_id_confusion,
        "quality_score": LQ.quality_score,
        "quality_filter": LQ.quality_filter,
        "quality_threshold_yield": LQ.quality_threshold_yield,
        "gopher_rules_filter": LQ.gopher_rules_filter,
        "quality_ablation_matrix": LQ.quality_ablation_matrix,
        "quality_reliability_bins": LQ.quality_reliability_bins,
        "repetition_score": LQ.repetition_score,
        "tokenizer_fertility": LQ.tokenizer_fertility,
        "token_diversity": LQ.token_diversity,
        "token_count": LQ.token_count,
        "doc_fingerprint": LQ.doc_fingerprint,
        "multimodal_pipeline": LM.multimodal_pipeline,
        "multimodal_resize": LM.multimodal_resize,
        "multimodal_frame_sample": LM.multimodal_frame_sample,
        "multimodal_audio_resample": LM.multimodal_audio_resample,
        "multimodal_payload_dedup": LM.multimodal_payload_dedup,
        **LP.QUERIES,
        **LCO.QUERIES,
        **LPI.QUERIES,
        **LPQ.QUERIES,
        **LSQ.QUERIES,
        **SK.QUERIES,
        **TS.QUERIES,
        **SA.QUERIES,
    })


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect). The events-as-topic adapter is mirrored as a
# CTE; money math mirrors functions/money.py decimal-exact expressions.
# ---------------------------------------------------------------------------

_RECORDS = """
WITH records AS (
  SELECT
    'events' AS topic,
    CAST(user_id % 8 AS INT) AS kafka_partition,
    event_id AS "offset",
    ts AS "timestamp",
    CAST(user_id AS VARCHAR) AS "key",
    props AS "value",
    event_type,
    user_id,
    ts
  FROM events
)
"""

_SUMMARIZE = """
SELECT encoded_partition,
       COUNT(*) AS record_count,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset,
       COUNT(DISTINCT kafka_partition) AS n_kafka_partitions
FROM enc GROUP BY encoded_partition ORDER BY encoded_partition
"""

_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(10,4)) * "
    "(CAST(1 AS DECIMAL(10,4)) - CAST(l_discount AS DECIMAL(10,4))) AS DECIMAL(18,8))"
)
_CHARGE = f"{_DISC_PRICE} * (CAST(1 AS DECIMAL(10,4)) + CAST(l_tax AS DECIMAL(10,4)))"


def _msum(inner: str, alias: str) -> str:
    return f"CAST(ROUND(SUM({inner}), 4) AS DOUBLE) AS {alias}"


def _mavg(inner: str, alias: str) -> str:
    # portable 4-dp rounding: see functions/money.py money_avg (tie-stable)
    return (
        f"(floor((CAST(SUM({inner}) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)"
        f" / 10000.0) AS {alias}"
    )


def _enc_summary(enc_expr: str) -> str:
    return f"{_RECORDS}, enc AS (SELECT *, {enc_expr} AS encoded_partition FROM records)\n{_SUMMARIZE}"


def _sql_locale_names(locale: str, key: str) -> str:
    """DuckDB list literal of the SAME name table the Spark partitioner
    renders from (operators/partitioners.LOCALES) — both engines index the
    identical strings, so locale rendering can never drift between them."""
    from kafka_connect_storage_cloud_spark.operators.partitioners import LOCALES

    names = ", ".join("'" + n.replace("'", "''") + "'" for n in LOCALES[locale][key])
    return f"[{names}]"


def _manifest(
    enc_expr: str,
    file_seq_expr: str,
    records_cte: str = _RECORDS,
    ext: str = "parquet",
    topics_prefix: str = "",
    file_delim: str = "+",
    pad: int = 10,
) -> str:
    # fileKeyToCommit parameterized by the naming keys (topics.dir,
    # file.delim, filename.offset.zero.pad.width) — mirrors
    # operators/rotation.FileNaming
    head = f"'{topics_prefix}/' || " if topics_prefix else ""
    return f"""{records_cte},
enc AS (SELECT *, {enc_expr} AS encoded_partition FROM records),
seq AS (SELECT *, {file_seq_expr} AS file_seq FROM enc),
files AS (SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, encoded_partition, file_seq)
                    AS file_start_offset FROM seq)
SELECT {head}topic || '/' || encoded_partition || '/' || topic || '{file_delim}' ||
       CAST(kafka_partition AS VARCHAR) || '{file_delim}' || printf('%0{pad}d', file_start_offset) || '.{ext}'
         AS file_path,
       COUNT(*) AS record_count,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset
FROM files GROUP BY 1 ORDER BY 1"""


_FLUSH_SEQ = (
    "CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition "
    'ORDER BY "offset") - 1) / 100.0) AS BIGINT)'
)
_SCHED_SEQ = f"CAST(FLOOR(epoch_ms(\"timestamp\") / {6 * 3600 * 1000}.0) AS BIGINT)"

def _schema_compat_sql(mode: str) -> str:
    """Oracle twin of operators/rotation.assign_files_schema_compat: the
    per-(kafka_partition, encoded_partition) current schema as a running
    extreme of the version stream (storage-common StorageSchemaCompatibility:
    BACKWARD/FULL adopt maxima, FORWARD minima, NONE every change), files as
    gaps-and-islands runs of the projected version."""
    eff = {
        "NONE": "schema_version",
        "BACKWARD": 'MAX(schema_version) OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset" ROWS UNBOUNDED PRECEDING)',
        "FULL": 'MAX(schema_version) OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset" ROWS UNBOUNDED PRECEDING)',
        "FORWARD": 'MIN(schema_version) OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset" ROWS UNBOUNDED PRECEDING)',
    }[mode]
    return f"""{_RECORDS},
enc AS (
  SELECT *, 'event_type=' || event_type AS encoded_partition,
         CAST(1 + ("offset" // 256) % 3 AS INT) AS schema_version
  FROM records
),
eff AS (SELECT *, CAST({eff} AS INT) AS projected_version FROM enc),
isl AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset")
         - ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition, projected_version
                              ORDER BY "offset") AS run_id
  FROM eff
),
files AS (
  SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, encoded_partition,
                                projected_version, run_id) AS file_start_offset
  FROM isl
)
SELECT topic || '/' || encoded_partition || '/' || topic || '+' ||
       CAST(kafka_partition AS VARCHAR) || '+' || printf('%010d', file_start_offset) || '.parquet'
         AS file_path,
       projected_version,
       COUNT(*) AS record_count,
       CAST(SUM(CASE WHEN schema_version != projected_version THEN 1 ELSE 0 END) AS BIGINT)
         AS n_projected,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset
FROM files GROUP BY 1, 2 ORDER BY 1"""


_REPLAYED_RECORDS = """
WITH raw AS (
  SELECT
    'events' AS topic,
    CAST(user_id % 8 AS INT) AS kafka_partition,
    event_id AS "offset",
    ts AS "timestamp",
    CAST(user_id AS VARCHAR) AS "key",
    props AS "value",
    event_type,
    user_id,
    ts
  FROM events
  UNION ALL
  SELECT
    'events' AS topic,
    CAST(user_id % 8 AS INT) AS kafka_partition,
    event_id AS "offset",
    ts AS "timestamp",
    CAST(user_id AS VARCHAR) AS "key",
    props AS "value",
    event_type,
    user_id,
    ts
  FROM events
),
records AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY kafka_partition, "offset") AS rn FROM raw
  ) WHERE rn = 1
)
"""


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    agg = _H.sql_round6("CAST(SUM(record_count) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")
    blocks = " UNION ALL ".join(
        f"""SELECT '{name}' AS policy, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(record_count) AS BIGINT) AS n_records,
       MIN(record_count) AS min_records_per_file,
       MAX(record_count) AS max_records_per_file,
       {agg} AS avg_records_per_file
FROM ({d[key]})"""
        for name, key in (
            ("flush_size", "rotation_flush_size"),
            ("scheduled", "rotation_scheduled"),
            ("interval", "rotation_interval"),
            ("partition_change", "rotation_partition_change"),
            ("max_open_files", "rotation_max_open_files"),
            ("schema_change", "rotation_schema_change"),
        )
    )
    d["rotation_policy_matrix"] = f"SELECT * FROM ({blocks}) ORDER BY policy"
    return d


def _oracle_sql_base() -> dict[str, str]:
    daily = "'year=' || strftime(\"timestamp\", '%Y') || '/month=' || strftime(\"timestamp\", '%m') || '/day=' || strftime(\"timestamp\", '%d')"
    hourly = daily + " || '/hour=' || strftime(\"timestamp\", '%H')"
    return {
        # --- connector parity ---
        "default_partitioner": _enc_summary("'partition=' || CAST(kafka_partition AS VARCHAR)"),
        "field_partitioner": _enc_summary("'event_type=' || event_type"),
        "time_based_partitioner": _enc_summary(hourly),
        "path_format_partitioner": _enc_summary(
            "strftime(\"timestamp\", 'dt=%Y-%m-%d/hr=%H')"
        ),
        "daily_partitioner": _enc_summary(daily),
        "hourly_partitioner": _enc_summary(hourly),
        "field_time_partitioner": _enc_summary(f"'event_type=' || event_type || '/' || {daily}"),
        "schema_partitioner": _enc_summary(f"'schema_name=' || event_type || '/' || {daily}"),
        "schema_partitioner_suffix": _enc_summary(f"{daily} || '/schema_name=' || event_type"),
        "timestamp_extractor_record_field": _enc_summary(
            "'year=' || strftime(ts, '%Y') || '/month=' || strftime(ts, '%m') || '/day=' || strftime(ts, '%d')"
        ),
        "duration_partitioner": _enc_summary(
            "'year=' || strftime(bts, '%Y') || '/month=' || strftime(bts, '%m')"
            " || '/day=' || strftime(bts, '%d') || '/hour=' || strftime(bts, '%H')"
            .replace("bts", "make_timestamp((epoch_ms(\"timestamp\") // 21600000) * 21600000 * 1000)")
        ),
        "tz_partitioner": _enc_summary(
            "'year=' || strftime(\"timestamp\" AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York', '%Y')"
            " || '/month=' || strftime(\"timestamp\" AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York', '%m')"
            " || '/day=' || strftime(\"timestamp\" AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York', '%d')"
        ),
        "rotation_stats": f"""{_RECORDS},
enc AS (SELECT *, 'event_type=' || event_type AS encoded_partition FROM records),
seq AS (SELECT *, {_FLUSH_SEQ} AS file_seq FROM enc),
per_file AS (
  SELECT kafka_partition, encoded_partition, file_seq, COUNT(*) AS records_in_file
  FROM seq GROUP BY 1, 2, 3
),
max_seq AS (
  SELECT kafka_partition, encoded_partition, MAX(file_seq) AS last_seq
  FROM per_file GROUP BY 1, 2
)
SELECT p.kafka_partition, p.encoded_partition,
       COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN p.file_seq < m.last_seq THEN 1 ELSE 0 END) AS BIGINT) AS rotations_by_capacity,
       MIN(p.records_in_file) AS min_file_records,
       MAX(p.records_in_file) AS max_file_records
FROM per_file p JOIN max_seq m
  ON p.kafka_partition = m.kafka_partition AND p.encoded_partition = m.encoded_partition
GROUP BY 1, 2 ORDER BY 1, 2""",
        "rotation_flush_size": _manifest(
            "'partition=' || CAST(kafka_partition AS VARCHAR)", _FLUSH_SEQ
        ),
        "multipart_upload_plan": f"""{_RECORDS},
enc AS (SELECT *, 'partition=' || CAST(kafka_partition AS VARCHAR) AS encoded_partition FROM records),
seq AS (SELECT *, {_FLUSH_SEQ} AS file_seq FROM enc),
files AS (SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, encoded_partition, file_seq)
                    AS file_start_offset FROM seq),
agg AS (
  SELECT topic || '/' || encoded_partition || '/' || topic || '+' ||
         CAST(kafka_partition AS VARCHAR) || '+' || printf('%010d', file_start_offset) || '.parquet' AS file_path,
         COUNT(*) AS record_count,
         CAST(SUM(COALESCE(length("key"), 0) + COALESCE(length("value"), 0)
                  + {C.MULTIPART_REC_OVERHEAD}) AS BIGINT) AS est_bytes
  FROM files GROUP BY 1
)
SELECT file_path, record_count, est_bytes,
       CAST((est_bytes + {C.MULTIPART_PART_SIZE_TEST - 1}) // {C.MULTIPART_PART_SIZE_TEST} AS BIGINT) AS n_parts,
       CAST(est_bytes - ((est_bytes + {C.MULTIPART_PART_SIZE_TEST - 1}) // {C.MULTIPART_PART_SIZE_TEST} - 1)
                        * {C.MULTIPART_PART_SIZE_TEST} AS BIGINT) AS last_part_bytes,
       CAST({C.MULTIPART_PART_SIZE_TEST} AS BIGINT) AS part_size
FROM agg ORDER BY file_path""",
        "consumer_lag_report": f"""{_RECORDS},
enc AS (SELECT *, 'partition=' || CAST(kafka_partition AS VARCHAR) AS encoded_partition FROM records),
seq AS (SELECT *, {_FLUSH_SEQ} AS file_seq FROM enc),
per_file AS (
  SELECT kafka_partition, file_seq, COUNT(*) AS n_in_file, MAX("offset") AS file_end_offset
  FROM seq GROUP BY 1, 2
),
committed AS (
  SELECT kafka_partition, MAX(file_end_offset) AS committed_offset
  FROM per_file WHERE n_in_file = 100 GROUP BY 1
),
per_part AS (
  SELECT kafka_partition, CAST(COUNT(*) AS BIGINT) AS n_records, MAX("offset") AS topic_end_offset
  FROM records GROUP BY 1
),
behind AS (
  SELECT s.kafka_partition, CAST(COUNT(*) AS BIGINT) AS uncommitted_records
  FROM seq s LEFT JOIN committed c ON s.kafka_partition = c.kafka_partition
  WHERE c.committed_offset IS NULL OR s."offset" > c.committed_offset
  GROUP BY 1
)
SELECT p.kafka_partition, p.n_records, p.topic_end_offset, c.committed_offset,
       COALESCE(b.uncommitted_records, 0) AS uncommitted_records,
       {{lag_share}}
FROM per_part p
LEFT JOIN committed c ON p.kafka_partition = c.kafka_partition
LEFT JOIN behind b ON p.kafka_partition = b.kafka_partition
ORDER BY p.kafka_partition""".replace(
            "{lag_share}",
            _H.sql_round6(
                "CAST(COALESCE(b.uncommitted_records, 0) AS DOUBLE) / CAST(p.n_records AS DOUBLE)"
            )
            + " AS lag_share",
        ),
        "rotation_custom_naming": _manifest(
            "'partition=' || CAST(kafka_partition AS VARCHAR)", _FLUSH_SEQ,
            topics_prefix="topics", file_delim="#", pad=6,
        ),
        "locale_partitioner": _enc_summary(
            "'dt=' || strftime(\"timestamp\", '%Y') || '/mois=' || "
            + _sql_locale_names("fr_FR", "months_short") + "[month(\"timestamp\")]"
            + " || '/jour=' || "
            + _sql_locale_names("fr_FR", "days_short") + "[dayofweek(\"timestamp\") + 1]"
        ),
        "rotation_scheduled": _manifest("'event_type=' || event_type", _SCHED_SEQ),
        # rotation_interval: the base-reset walk is inherently sequential per
        # group; the oracle replays it with a recursive CTE stepping one row
        # per group per iteration (exact mirror of rotateOnTime semantics)
        "rotation_interval": f"""
WITH RECURSIVE records AS (
  SELECT CAST(user_id % 8 AS INT) AS kafka_partition,
         event_id AS "offset", ts AS "timestamp"
  FROM events
),
enc AS (SELECT *, 'partition=' || CAST(kafka_partition AS VARCHAR) AS encoded_partition FROM records),
seq AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset") AS rn,
               epoch_ms("timestamp") AS ts_ms FROM enc),
walk AS (
  SELECT kafka_partition, encoded_partition, rn, "offset", ts_ms,
         ts_ms AS base_ts, "offset" AS file_start
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.kafka_partition, s.encoded_partition, s.rn, s."offset", s.ts_ms,
         CASE WHEN s.ts_ms - w.base_ts >= {12 * 3600 * 1000} THEN s.ts_ms ELSE w.base_ts END,
         CASE WHEN s.ts_ms - w.base_ts >= {12 * 3600 * 1000} THEN s."offset" ELSE w.file_start END
  FROM seq s JOIN walk w ON s.kafka_partition = w.kafka_partition
        AND s.encoded_partition = w.encoded_partition AND s.rn = w.rn + 1
)
SELECT 'events/' || encoded_partition || '/events+' || CAST(kafka_partition AS VARCHAR)
       || '+' || printf('%010d', file_start) || '.parquet' AS file_path,
       COUNT(*) AS record_count, MIN("offset") AS min_offset, MAX("offset") AS max_offset
FROM walk GROUP BY 1 ORDER BY 1""",
        # interval + partition-change (the reference default whenever a
        # rotation interval is set): same recursive replay as
        # rotation_interval but stepping per kafka partition with the
        # encoded-partition flip OR'd into the rotate condition; a commit
        # epoch may span several encoded partitions only when tombstone
        # suppression applies (not here), so files key on (epoch, ep)
        "rotation_interval_partition_change": f"""
WITH RECURSIVE records AS (
  SELECT CAST(user_id % 8 AS INT) AS kafka_partition,
         event_id AS "offset", ts AS "timestamp",
         'event_type=' || event_type AS ep
  FROM events
),
seq AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY kafka_partition ORDER BY "offset") AS rn,
               epoch_ms("timestamp") AS ts_ms FROM records),
walk AS (
  SELECT kafka_partition, rn, "offset", ts_ms, ep,
         ts_ms AS base_ts, 0 AS file_seq
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.kafka_partition, s.rn, s."offset", s.ts_ms, s.ep,
         CASE WHEN s.ep <> w.ep OR s.ts_ms - w.base_ts >= {12 * 3600 * 1000}
              THEN s.ts_ms ELSE w.base_ts END,
         CASE WHEN s.ep <> w.ep OR s.ts_ms - w.base_ts >= {12 * 3600 * 1000}
              THEN w.file_seq + 1 ELSE w.file_seq END
  FROM seq s JOIN walk w ON s.kafka_partition = w.kafka_partition AND s.rn = w.rn + 1
),
files AS (
  SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, file_seq, ep) AS file_start_offset
  FROM walk
)
SELECT 'events/' || ep || '/events+' || CAST(kafka_partition AS VARCHAR)
       || '+' || printf('%010d', file_start_offset) || '.parquet' AS file_path,
       COUNT(*) AS record_count, MIN("offset") AS min_offset, MAX("offset") AS max_offset
FROM files GROUP BY 1 ORDER BY 1""",
        # partitioner.max.open.files: the open-set walk is sequential per
        # kafka partition (same replay technique as rotation_interval) —
        # the recursive CTE carries the open encoded-partition LIST and the
        # commit epoch; rotation fires when a new partition arrives at a
        # full open set (list length == limit, the reference's == check)
        "rotation_max_open_files": f"""
WITH RECURSIVE records AS (
  SELECT 'events' AS topic, CAST(user_id % 8 AS INT) AS kafka_partition,
         event_id AS "offset", 'event_type=' || event_type AS ep
  FROM events
),
seq AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY kafka_partition ORDER BY "offset") AS rn FROM records),
walk AS (
  SELECT kafka_partition, rn, "offset", ep, [ep] AS open_list, 0 AS epoch
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.kafka_partition, s.rn, s."offset", s.ep,
         CASE WHEN list_contains(w.open_list, s.ep) THEN w.open_list
              WHEN len(w.open_list) = 3 THEN [s.ep]
              ELSE list_append(w.open_list, s.ep) END,
         CASE WHEN (NOT list_contains(w.open_list, s.ep)) AND len(w.open_list) = 3
              THEN w.epoch + 1 ELSE w.epoch END
  FROM seq s JOIN walk w ON s.kafka_partition = w.kafka_partition AND s.rn = w.rn + 1
),
files AS (
  SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, epoch, ep) AS file_start_offset
  FROM walk
)
SELECT 'events/' || ep || '/events+' || CAST(kafka_partition AS VARCHAR)
       || '+' || printf('%010d', file_start_offset) || '.parquet' AS file_path,
       COUNT(*) AS record_count, MIN("offset") AS min_offset, MAX("offset") AS max_offset
FROM files GROUP BY 1 ORDER BY 1""",
        # gaps-and-islands: the run id of consecutive same-encoded-partition
        # offsets is the difference of the two row_numbers
        "rotation_partition_change": _manifest(
            "'event_type=' || event_type",
            'ROW_NUMBER() OVER (PARTITION BY kafka_partition ORDER BY "offset") - '
            'ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition ORDER BY "offset")',
        ),
        "exactly_once_manifest": _manifest(
            "'partition=' || CAST(kafka_partition AS VARCHAR)", _FLUSH_SEQ, _REPLAYED_RECORDS
        ),
        "erasure_rewrite_plan": f"""{_RECORDS},
enc AS (SELECT *, 'event_type=' || event_type AS encoded_partition FROM records),
seq AS (SELECT *, {_FLUSH_SEQ} AS file_seq FROM enc),
files AS (SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, encoded_partition, file_seq)
                    AS file_start_offset FROM seq),
per_file AS (
  SELECT topic || '/' || encoded_partition || '/' || topic || '+' ||
         CAST(kafka_partition AS VARCHAR) || '+' || printf('%010d', file_start_offset) || '.parquet'
           AS file_path,
         COUNT(*) AS record_count,
         CAST(SUM(CASE WHEN CAST(('0x' || substr(md5('erase:' || "key"), 1, 8)) AS BIGINT) % 97 = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_erase
  FROM files GROUP BY 1
)
SELECT file_path, record_count, n_erase,
       n_erase > 0 AS needs_rewrite,
       (floor((CAST(n_erase AS DOUBLE) / CAST(record_count AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS erase_share
FROM per_file ORDER BY file_path""",
        # schema-change rotation: islands of constant (enc, version) per
        # kafka partition; grouping by (enc, version, island) makes each
        # island one file with a unique start offset
        "rotation_schema_change": f"""{_RECORDS},
enc AS (
  SELECT *, 'event_type=' || event_type AS encoded_partition,
         1 + ("offset" // 256) % 2 AS schema_version
  FROM records
),
seq AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY kafka_partition ORDER BY "offset")
         - ROW_NUMBER() OVER (PARTITION BY kafka_partition, encoded_partition, schema_version
                              ORDER BY "offset") AS isl
  FROM enc
),
files AS (
  SELECT *, MIN("offset") OVER (PARTITION BY kafka_partition, encoded_partition, schema_version, isl)
            AS file_start_offset
  FROM seq
)
SELECT topic || '/' || encoded_partition || '/' || topic || '+' ||
       CAST(kafka_partition AS VARCHAR) || '+' || printf('%010d', file_start_offset) || '.parquet'
         AS file_path,
       CAST(schema_version AS INT) AS schema_version,
       COUNT(*) AS record_count,
       MIN("offset") AS min_offset,
       MAX("offset") AS max_offset
FROM files GROUP BY 1, 2 ORDER BY 1""",
        "schema_compat_backward": _schema_compat_sql("BACKWARD"),
        "schema_compat_forward": _schema_compat_sql("FORWARD"),
        "schema_compat_full": _schema_compat_sql("FULL"),
        "schema_compat_none": _schema_compat_sql("NONE"),
        "tombstone_routing": f"""{_RECORDS},
with_tombstones AS (
  SELECT *, CASE WHEN "offset" % 50 = 0 THEN NULL ELSE "value" END AS value2 FROM records
),
enc AS (
  SELECT *, CASE WHEN value2 IS NULL THEN 'tombstone' ELSE 'event_type=' || event_type END
            AS encoded_partition
  FROM with_tombstones
)
{_SUMMARIZE}""",
        "kv_header_views": f"""{_RECORDS},
enc AS (SELECT *, {daily} AS encoded_partition FROM records),
views AS (
  SELECT 'value' AS view, encoded_partition, "value" AS payload FROM enc
  UNION ALL SELECT 'keys', encoded_partition, "key" FROM enc
  UNION ALL SELECT 'headers', encoded_partition, event_type FROM enc
)
SELECT view, encoded_partition, COUNT(*) AS record_count,
       COUNT(DISTINCT payload) AS distinct_payloads
FROM views GROUP BY view, encoded_partition ORDER BY view, encoded_partition""",
        # --- analytics ---
        "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
  {_msum('CAST(l_quantity AS DECIMAL(10,4))', 'sum_qty')},
  {_msum('CAST(l_extendedprice AS DECIMAL(10,4))', 'sum_base_price')},
  {_msum(_DISC_PRICE, 'sum_disc_price')},
  {_msum(_CHARGE, 'sum_charge')},
  {_mavg('CAST(l_quantity AS DECIMAL(10,4))', 'avg_qty')},
  {_mavg('CAST(l_extendedprice AS DECIMAL(10,4))', 'avg_price')},
  {_mavg('CAST(l_discount AS DECIMAL(10,4))', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
        "q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {_msum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10""",
        "q5_local_supplier_volume": f"""
SELECT n_name, {_msum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC""",
        "q6_revenue_change": f"""
SELECT {_msum('CAST(l_extendedprice AS DECIMAL(10,4)) * CAST(l_discount AS DECIMAL(10,4))', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        "q10_returned_items": f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  {_msum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
        "top_customers": f"""
SELECT c_custkey, c_name, n_name, r_name,
  {_msum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY c_custkey, c_name, n_name, r_name
ORDER BY revenue DESC, c_custkey
LIMIT 15""",
        "order_priority_count": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
        "part_type_margin": f"""
SELECT p_type, p_brand,
  {_msum(_DISC_PRICE, 'net_revenue')},
  {_msum('CAST(CAST(p_retailprice AS DECIMAL(10,4)) * CAST(l_quantity AS DECIMAL(10,4)) AS DECIMAL(18,8))', 'retail_value')},
  COUNT(*) AS line_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type, p_brand
ORDER BY p_type, p_brand""",
        "events_hourly_rollup": f"""
SELECT date_trunc('hour', ts) AS bucket, event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  {_msum('CAST("value" AS DECIMAL(10,4))', 'sum_value')},
  {_mavg('CAST("value" AS DECIMAL(10,4))', 'avg_value')},
  ROUND(MAX("value"), 4) AS max_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_sessionize": f"""
WITH with_gap AS (
  SELECT user_id, ts, "value",
    CASE WHEN COALESCE(epoch_ms(ts) - epoch_ms(LAG(ts) OVER w), {30*60*1000 + 1}) > {30*60*1000}
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
with_id AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM with_gap
)
SELECT user_id, session_seq,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  {_msum('CAST("value" AS DECIMAL(10,4))', 'session_value')}
FROM with_id GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
        "events_topk_users": f"""
WITH per_user AS (
  SELECT event_type, user_id,
    {_msum('CAST("value" AS DECIMAL(10,4))', 'total_value')},
    COUNT(*) AS n_events
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY total_value DESC, user_id)
       AS INT) AS rank
  FROM per_user
)
SELECT * FROM ranked WHERE rank <= 5 ORDER BY event_type, rank""",
        # --- extended TPC-H + LLM (oracles live next to the implementations) ---
        "events_session_window_native": E.SQL_EVENTS_SESSION_WINDOW_NATIVE,
        "events_sliding_window": E.SQL_EVENTS_SLIDING_WINDOW,
        # lexical vs semantic near-dup agreement: composes the two module
        # oracles as subqueries over the aligned doc_id/vec_id key space
        "dedup_modality_agreement": f"""
SELECT n_text_pairs, n_emb_pairs, n_both,
       n_text_pairs - n_both AS n_text_only,
       n_emb_pairs - n_both AS n_emb_only,
       (floor((CAST(n_both AS DOUBLE) / (n_text_pairs + n_emb_pairs - n_both)) * 1000000.0 + 0.5) / 1000000.0)
         AS pair_set_jaccard
FROM (
  SELECT CAST(SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_text_pairs,
         CAST(SUM(CASE WHEN e.vec_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_pairs,
         CAST(SUM(CASE WHEN t.doc_a IS NOT NULL AND e.vec_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM ({{ngram}}) t FULL JOIN ({{cos}}) e
    ON t.doc_a = e.vec_a AND t.doc_b = e.vec_b
)
""".format(ngram=LD.SQL_NGRAM_JACCARD, cos=LS.SQL_EMBEDDING_COSINE_DUPS),
        **TX.ORACLES,
        **TX2.ORACLES,
        **SE.ORACLES,
        **SMT.ORACLES,
        **LAY.ORACLES,
        **EX.ORACLES,
        **TP.ORACLES,
        **CD.ORACLES,
        **WH.ORACLES,
        **INF.ORACLES,
        **LC.ORACLES,
        **LD.ORACLES,
        **LSU.ORACLES,
        **CU.ORACLES,
        **AA.ORACLES,
        **RT.ORACLES,
        **LS.ORACLES,
        **LQ.ORACLES,
        **LM.ORACLES,
        **LP.ORACLES,
        **LCO.ORACLES,
        **LPI.ORACLES,
        **LPQ.ORACLES,
        **LSQ.ORACLES,
        **SK.ORACLES,
        **TS.ORACLES,
        **SA.ORACLES,
    }
