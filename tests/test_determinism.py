"""Partitioning-invariance gate for the float-hazard operator class: any
operator whose result depended on aggregation ORDER (double sums, unordered
first()) would change under a different shuffle-partition count. Re-run the
representative ops from each hazard class at 3 partitions and assert
byte-identical results vs the suite default — the run-to-run determinism
claim DETERMINISM.md makes, executed.
"""

import importlib.util
import os
import sys

import pytest

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)
_spec = importlib.util.spec_from_file_location("spark_entry_det", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry_det"] = entry_mod
_spec.loader.exec_module(entry_mod)

# one representative per hazard class
HAZARD_OPS = [
    "multi_touch_attribution",   # per-item credit summed (int micro-units)
    "bootstrap_mean_ci",         # scaled-int64 replica sums
    "ab_test_metrics",           # decimal moments -> Welch t
    "events_anomaly",            # decimal moments -> z
    "revenue_pareto",            # decimal cumulative sums
    "hll_distinct",              # integer harmonic denominator
    "embedding_centroid_outliers",  # integer dot chains
    "events_time_weighted_avg",  # decimal x ms trapezoids
    # round-2 additions: tile-join kNN, Lloyd-trained IVF, banded cosine
    # dups, SQ8 audit — each mixes Arrow-batch float presentation over
    # exact integer cores; invariance proves batch/tile boundaries never
    # leak into results
    "knn_graph_mutual",
    "ann_topk_ivf",
    "cosine_dup_band_recall",
    "sq8_recall_audit",
]


def _rows(spark, name, sf_dir):
    df = entry_mod.queries()[name](spark, sf_dir)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", HAZARD_OPS)
def test_result_invariant_to_partitioning(spark, sf_dir, name):
    base = _rows(spark, name, sf_dir)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt, f"{name} depends on physical partitioning"


def test_knn_edges_invariant_to_tile_width(spark, sf_dir, monkeypatch):
    """The tile self-join is pure mechanics: shrinking KNN_BLOCK from 1024
    to 64 multiplies the tile count ~256x yet must reproduce the exact
    edge list byte-for-byte — proving per-tile top-k pruning and the
    diagonal/off-diagonal handling never leak tile boundaries into
    results. Covers _knn_topk_edges AND the tiled exact label-pair gold
    standard."""
    from kafka_connect_storage_cloud_spark.llm import similarity as LS

    def edges():
        df = LS._knn_topk_edges(spark, sf_dir, LS.KNN_K)
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    def pairs():
        df = LS._exact_label_pairs(spark, sf_dir)
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    base_e, base_p = edges(), pairs()
    monkeypatch.setattr(LS, "KNN_BLOCK", 64)
    assert edges() == base_e
    assert pairs() == base_p
