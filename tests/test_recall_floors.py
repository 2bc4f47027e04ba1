"""Numeric recall floors for every approximate-path audit.

Oracle parity (tests/test_oracle_parity.py) compares Spark vs DuckDB on the
SAME computation, so a code change that silently degrades an approximate
path's recall (fewer bands, broken multiprobe, a bad codebook) stays green
on both engines — both report the same degraded number. These floors are
what makes the audit numbers load-bearing: each asserts the measured
sf0.01 recall against a constant chosen a safety margin below the current
measurement (SCALE.md / VERDICT r3) but far above any broken state.

The red-team tests prove the floors actually fire: they monkeypatch each
banded generator's band count to 1 and assert the same audit drops BELOW
its floor (VERDICT r3 "What's wrong #1" done-criterion). PQ/SQ floors have
no cheap call-time knob (the codebook memoizes per sf_dir), so their
red-team is the r2 history itself: the shared-codebook bug measured 0.34,
well under the 0.60 floor.
"""

import pytest

from kafka_connect_storage_cloud_spark.llm import pq as LPQ
from kafka_connect_storage_cloud_spark.llm import similarity as LS
from kafka_connect_storage_cloud_spark.llm import sq as LSQ
from kafka_connect_storage_cloud_spark.plans import warehouse as WH


def _mean_recall(df):
    """Pair-weighted mean over a per-query/per-label audit frame: total
    hits over total exact (robust to empty groups; matches how SCALE.md
    reports the numbers)."""
    import pyspark.sql.functions as F

    hit_col = "n_hits" if "n_hits" in df.columns else "n_band"
    row = df.agg(
        F.sum(hit_col).alias("h"), F.sum("n_exact").alias("e")
    ).collect()[0]
    assert row["e"] and row["e"] > 0, "audit gold side is empty"
    return row["h"] / row["e"]


# ---------------------------------------------------------------------------
# floors (measured sf0.01 values in parens — VERDICT r3 / SCALE.md)
# ---------------------------------------------------------------------------


def test_ann_lsh_recall_floor(spark, sf_dir):
    """ann_topk_lsh vs brute-force top-k (measured 0.91)."""
    assert _mean_recall(LS.ann_recall_audit(spark, sf_dir)) >= 0.85


def test_knn_graph_lsh_recall_floor(spark, sf_dir):
    """LSH mutual-kNN graph edge recall vs exact graph (measured 0.999)."""
    assert _mean_recall(LS.knn_graph_lsh_recall(spark, sf_dir)) >= 0.99


def test_cosine_dup_band_recall_floor(spark, sf_dir):
    """Label-blocked banded cosine-dup generator vs exact pairs
    (measured 1.0)."""
    assert _mean_recall(LS.cosine_dup_band_recall(spark, sf_dir)) >= 0.90


def test_unblocked_cross_label_recall_floor(spark, sf_dir):
    """Unblocked generator (semantic_contamination's candidate source):
    the cross-label class is the one the blocked family cannot see
    (measured 0.953 at sf0.1)."""
    rows = {
        r["pair_class"]: r
        for r in LS.unblocked_band_recall(spark, sf_dir).collect()
    }
    cross = rows["cross_label"]
    assert cross["n_exact"] > 0
    assert cross["n_band"] / cross["n_exact"] >= 0.90


def test_pq_recall_floor(spark, sf_dir):
    """PQ/ADC top-k vs exact L2 top-k (measured 0.74 after the r3
    per-subspace codebook fix; the r2 shared-codebook bug measured 0.34 —
    this floor would have caught it)."""
    assert _mean_recall(LPQ.pq_recall_audit(spark, sf_dir)) >= 0.60


def test_sq8_recall_floor(spark, sf_dir):
    """SQ8 asymmetric top-k vs exact (measured 0.985)."""
    assert _mean_recall(LSQ.sq8_recall_audit(spark, sf_dir)) >= 0.95


def test_fuzzy_blocking_recall_floor(spark, sf_dir):
    """fuzzy_name_matches' two-family blocking vs the exhaustive
    (nation, length) all-pairs gold at sf0.01 — completeness is
    hypothesis-proven per pair class; this asserts the end-to-end
    assembled operator finds the full gold pair count (measured 1.0)."""
    import pyspark.sql.functions as F

    from kafka_connect_storage_cloud_spark.plans.warehouse import FUZZY_MAX_DIST
    from kafka_connect_storage_cloud_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name", F.length("c_name").alias("nlen")
    )
    a = cust.select(
        F.col("c_nationkey").alias("nat"), "nlen",
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_nationkey").alias("nat"), "nlen",
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"),
    )
    gold = (
        a.join(b, ["nat", "nlen"])
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.expr(f"levenshtein(name_a, name_b, {FUZZY_MAX_DIST})"))
        .where((F.col("dist") >= 1) & (F.col("dist") <= FUZZY_MAX_DIST))
        .count()
    )
    found = (
        WH.fuzzy_name_matches(spark, sf_dir)
        .agg(F.sum("n_pairs").alias("n"))
        .collect()[0]["n"]
    )
    assert gold > 0, "gold pair set is empty — floor is vacuous at this SF"
    assert found / gold >= 0.99, (found, gold)


# ---------------------------------------------------------------------------
# red-team: each floor must FIRE when its generator degrades
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "knob, audit, floor",
    [
        ("LSH_BANDS", "ann_recall_audit", 0.85),
        ("GB_BANDS", "knn_graph_lsh_recall", 0.99),
        ("CB_BANDS", "cosine_dup_band_recall", 0.90),
        # the sampled (production-scale) audit form must fire identically
        ("GB_BANDS", "knn_graph_lsh_recall_sampled", 0.99),
    ],
)
def test_floor_fires_on_degraded_bands(spark, sf_dir, monkeypatch, knob, audit, floor):
    """Drop each banded candidate generator to a single band and assert the
    matching audit lands BELOW its floor — i.e. the floor is load-bearing,
    not decorative. (One OR-band at the adaptive width collides true
    neighbors far too rarely on this near-random corpus; r2 measured 0.003
    recall for the single-signature ANN form.)"""
    monkeypatch.setattr(LS, knob, 1)
    degraded = _mean_recall(getattr(LS, audit)(spark, sf_dir))
    assert degraded < floor, (
        f"{audit} still {degraded} with {knob}=1 — floor {floor} is not load-bearing"
    )


# ---------------------------------------------------------------------------
# sampled-slice audit variants (VERDICT r3 #4): the production-scale audit
# forms must agree with the full audits they stand in for
# ---------------------------------------------------------------------------


def test_sampled_knn_recall_tracks_full_audit(spark, sf_dir):
    """Directed-edge recall for hash-sampled sources (O(S·n) gold) must sit
    within ±0.05 of the full mutual-graph audit AND clear the same floor."""
    full = LS.knn_graph_lsh_recall(spark, sf_dir).collect()[0]["recall"]
    sampled_row = LS.knn_graph_lsh_recall_sampled(spark, sf_dir).collect()[0]
    assert sampled_row["n_exact"] > 0
    sampled = sampled_row["recall"]
    assert abs(sampled - full) <= 0.05, (sampled, full)
    assert sampled >= 0.99


def test_sampled_pair_audit_is_exact_per_retained_label(spark, sf_dir):
    """Label-block sampling is EXACT for every retained label (pairs never
    cross labels): each sampled row must equal the full audit's row for
    that label, and the sampled label set must be a nonempty strict subset."""
    full = {r["label"]: r for r in LS.cosine_dup_band_recall(spark, sf_dir).collect()}
    sampled = {
        r["label"]: r
        for r in LS.cosine_dup_band_recall_sampled(spark, sf_dir).collect()
    }
    assert sampled, "sampled audit retained no label blocks"
    assert set(sampled) < set(full) or set(sampled) == set(full)
    for lbl, row in sampled.items():
        assert (row["n_exact"], row["n_band"], row["recall"]) == (
            full[lbl]["n_exact"], full[lbl]["n_band"], full[lbl]["recall"],
        ), lbl


def test_ivf_nprobe_curve_is_monotone_and_informative(spark, sf_dir):
    """The nprobe curve must be a real tuning signal: recall non-decreasing
    in probes, strictly higher at the deepest setting than at nprobe=1
    (sf0.01 measured 0.195 -> 0.755), candidate volume growing with probes,
    and the deepest recall above a floor that a broken probe ranking
    (e.g. constant crank) would fall under."""
    from kafka_connect_storage_cloud_spark.llm import pipeline as LP

    rows = sorted(
        LP.ivf_nprobe_recall_curve(spark, sf_dir).collect(),
        key=lambda r: r["probes"],
    )
    assert [r["probes"] for r in rows] == [1, 2, 4, 8]
    recalls = [r["recall"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:]))
    assert all(b > a for a, b in zip(cands, cands[1:]))
    assert recalls[-1] > recalls[0]
    assert recalls[-1] >= 0.6
