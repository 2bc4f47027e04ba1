"""Cross-SF oracle spot checks: the rounding-tie class of bug (engine-native
round() half-tie divergence) only manifests when some ratio lands exactly on
a rounding boundary — which depends on the data, i.e., on the scale factor.
The main gate runs at sf0.01; these re-check the historically tie-prone ops
at sf0.1 so the portable-floor rounding can't silently regress.
"""

import importlib.util
import os
import sys

import pytest

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)
_spec = importlib.util.spec_from_file_location("spark_entry_xsf", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry_xsf"] = entry_mod
_spec.loader.exec_module(entry_mod)

from oracle_utils import compare  # noqa: E402

SF01 = "/root/testdata/sf0.1"

# the ops that failed (or share the failing expression class) before the
# floor-form conversion
TIE_PRONE = [
    "events_hourly_rollup",   # money_avg 4-dp tie (1512.12/32 = 47.25375)
    "quality_score",          # composite ULP + round6 tie (doc 3440)
    "q1_pricing_summary",     # same money_avg class
    "minhash_jaccard_est",    # jaccard ratio rounds
    # newer ratio-bearing ops — same floor-round6 expression class
    "vocab_coverage",         # coverage = in-vocab / total
    "train_test_split",       # (unratioed counts, but shares the hash split)
    "kmv_distinct",           # rel_err ratio + estimate division
    "hll_distinct",           # rel_err ratio + alpha division
    "knn_triangle_count",     # clustering coefficient 2T/(d(d-1))
    "events_dau_mau",         # stickiness = dau/mau
    "events_markov_transitions",  # row-normalized probability
    "events_inter_arrival",   # mean gap + interpolated quartiles
    "ab_test_metrics",        # Welch t (variance ratios)
    "embedding_centroid_outliers",  # cosine-to-sum division chain
    # round-3 additions in the same ratio/tie expression classes
    "rarity_buckets",         # ntile ties broken by (rarity, doc_id)
    "minhash_precision_curve",  # micro-int mean + ratio per band
    "tokenizer_fertility",    # bpe/ws ratio
    "dsir_importance",        # integer ratio sums + ntile pool boundary
    "dsir_importance_edges",  # r6 two-pass-rank twin (same boundary class)
    "cluster_profile_kmeans", # purity + mean-cosine divisions
    "unblocked_band_recall",  # recall ratio over exact pair classes
    "embedding_pca_power",    # Rayleigh double conversions
    # round-4 additions in the same ratio/tie expression classes
    "doc_truncation_loss",    # truncated/lost share ratios
    "quality_threshold_yield",  # quality >= threshold boundary + yield ratios
    "pii_density_by_slice",   # hits-per-10k-chars ratio
    "minhash_band_tuning",    # S-curve power chains + micro-int mean ratios
    "ivf_balance_audit",      # share / load-factor divisions over window total
    "cosine_dup_band_recall_sampled",  # per-label recall ratio on the sampled blocks
    "knn_graph_lsh_recall_sampled",    # single-row recall ratio
    "locale_partitioner",     # tz-sensitive month/dow name indexing
    "bpe_compression_curve",  # chars-per-token ratio per round
    "multimodal_payload_dedup",  # chunk-set jaccard ratio + band boundary
    "dedup_transitivity_audit",  # chained-share ratio
    "quantile_sketch_audit",  # rel-err ratio + rank boundary
    "negative_sampling_table",  # sqrt-composed power + normalized probs
    # round-5 additions in the same ratio/tie expression classes
    "dedup_containment",      # containment/jaccard ratios + integer-ceil prefix boundary
    "dedup_method_matrix",    # precision/recall ratios over three generators
    "ann_method_matrix",      # recall ratios over four ANN paths
    "ivf_nprobe_recall_curve",  # recall ratios per probe level
    "mixture_temperature_weights",  # sqrt + micro-int-normalized weights + epoch ratio
    "curriculum_stages",      # ntile boundary ties broken by (rarity, doc_id)
    "curriculum_stages_edges",  # r6 two-pass-rank twin (same tie class)
    "rfm_segmentation_edges",   # r6 twin: three histogram-edge quintiles
    "revenue_pareto_edges",     # r6 twin: decimal cum via value-offset + in-value count
    "events_ewma16",          # micro-int quantization of double values + trunc div
    "multipart_upload_plan",  # integer ceil part boundary
    "consumer_lag_report",    # lag-share ratio + flush boundary
    "rotation_policy_matrix", # avg-records ratio over four manifests
    "vocab_growth_curve",     # ntile decile boundary
    "pq_code_balance",        # share / load-factor divisions over window total
    "simhash_bit_balance",    # ones-share ratio
    "embedding_pca_project",  # double conversion chain / cnorm division
    "events_seasonality_anova",  # HUGEINT ANOVA + trunc-div mean comparator
]


# r10: sharded + intra-shard concurrency (the test_oracle_parity pattern —
# guide §2.6 overlap of independent jobs). Coverage unchanged: every
# TIE_PRONE key still verified at sf0.1 on every run, failures reported
# per key. KCSC_PARITY_THREADS=1 restores serial debugging.
_N_SHARDS = 6
_THREADS = int(os.environ.get("KCSC_PARITY_THREADS", "6"))
_QS, _OS = entry_mod.queries(), entry_mod.oracle_sql()


@pytest.mark.parametrize("shard", range(_N_SHARDS))
def test_tie_prone_ops_match_at_sf01(spark, shard):
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        try:
            return name, compare(_QS[name](spark, SF01), _OS[name], SF01)
        except Exception as e:
            return name, [f"EXCEPTION: {e!r}"]

    keys = sorted(TIE_PRONE)[shard::_N_SHARDS]
    with ThreadPoolExecutor(max_workers=_THREADS) as pool:
        results = list(pool.map(one, keys))
    bad = [(n, p) for n, p in results if p]
    assert not bad, "; ".join(f"{n}@sf0.1: {'; '.join(p)}" for n, p in bad)
