"""Dump .explain("formatted") for named queries() keys to plans/<round>/.

Round dir comes from $SPARK_GRAFT_PLANS_ROUND (default r10).

Usage:
    SPARK_GRAFT_SF_DIR=... python tools/explain_dump.py <suffix> [key ...]

With no keys, dumps every bench leg. Writes plans/$SPARK_GRAFT_PLANS_ROUND/<key>_<suffix>.txt.
Driver-side only (no action is executed except any bounded collects a
plan builder performs itself).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from kafka_connect_storage_cloud_spark.session import get_spark  # noqa: E402

BENCH_LEGS = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_revenue_change", "q10_returned_items", "events_hourly_rollup",
    "events_sessionize", "rotation_flush_size", "exactly_once_manifest",
    "dedup_minhash_lsh", "ann_topk_bruteforce", "ann_topk_ivf",
    "dedup_exact", "dedup_chunks", "quality_score", "quality_filter",
    "token_shard_pack", "hll_distinct", "scd2_history", "rfm_segmentation",
    "knn_graph_lsh", "embedding_pq", "dedup_containment",
    "dedup_method_matrix", "bm25_topk", "kmv_set_ops", "events_haar_energy",
    "semdedup_cells", "winnowing_fingerprints", "events_acf_profile",
    "events_theil_sen", "shard_checksum_manifest", "ann_topk_ivf_twolevel",
    "hybrid_rrf_fusion", "events_hampel_filter", "events_ks_drift",
    "events_max_burst_window", "events_stl_anomaly", "token_lorenz_gini",
    "events_mann_kendall", "events_ljung_box", "boilerplate_shingles",
    "quality_quantile_normalize", "events_hurst_rs", "events_pettitt_change",
    "cluster_silhouette", "term_burstiness", "winnowing_window_tuning",
    "events_recurrence_quant", "partition_pruning_matrix",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or BENCH_LEGS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(_REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("kcsc-explain")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for key in keys:
        if key not in qs:
            print(f"SKIP {key}: not in queries()")
            continue
        df = qs[key](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
