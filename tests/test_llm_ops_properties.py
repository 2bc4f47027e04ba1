"""Property / cross-library checks for the round-3 LLM-pipeline additions.

The oracle-parity gate proves Spark == DuckDB; these tests prove both
engines compute the RIGHT thing — covariance and PCA against numpy's
reference implementations, and the allocation / bucketing ops against
their defining invariants.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_embedding_covariance_matches_numpy(spark, sf_small):
    """Quantized exact covariance must agree with np.cov (ddof=0) within
    the CSCALE quantization error: each component is rounded to 1e-4, so
    |cov_quantized - cov_float| is bounded well below 1e-4."""
    from kafka_connect_storage_cloud_spark.llm.similarity import embedding_covariance

    got = {(r["dim_i"], r["dim_j"]): r["cov"] for r in embedding_covariance(spark, sf_small).collect()}
    mat = np.array(
        [r["embedding"] for r in spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    ref = np.cov(mat, rowvar=False, ddof=0)
    errs = [abs(got[(i, j)] - ref[i, j]) for (i, j) in got]
    assert max(errs) < 1e-4, f"max covariance error {max(errs)}"


def test_pca_power_matches_numpy_eig(spark, sf_small):
    """The fixed-point power iteration's Rayleigh quotient must land near
    numpy's true top eigenvalue of the same quantized covariance, and the
    component must align with the true eigenvector (|cos| near 1)."""
    from kafka_connect_storage_cloud_spark.llm.similarity import (
        embedding_covariance,
        embedding_pca_power,
    )

    rows = embedding_pca_power(spark, sf_small).collect()
    d = len(rows)
    v = np.array([r["component"] for r in sorted(rows, key=lambda r: r["dim"])])
    lam = rows[0]["eigenvalue"]
    var_exp = rows[0]["var_explained"]
    cov_rows = embedding_covariance(spark, sf_small).collect()
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["dim_i"], r["dim_j"]] = C[r["dim_j"], r["dim_i"]] = r["cov"]
    w, V = np.linalg.eigh(C)
    top = w[-1]
    # 48 iterations at the measured λ2/λ1≈0.93 gap: Rayleigh error is
    # ~5e-5 absolute; 0.5% of trace leaves headroom for other corpora
    assert abs(lam - top) < 0.005 * np.trace(C), f"lam={lam} vs top={top}"
    cos = abs(v @ V[:, -1]) / (np.linalg.norm(v) * np.linalg.norm(V[:, -1]))
    assert cos > 0.9, f"component alignment {cos}"
    assert 0.0 < var_exp <= 1.0
    assert lam <= np.trace(C) + 1e-9


def test_tokens_per_source_budget_invariants(spark, sf_small):
    """Defining properties of the allocation: plans never exceed the epoch
    cap or the equal share, deficits are exactly the unmet share, and the
    total plan never exceeds the budget."""
    from kafka_connect_storage_cloud_spark.llm.corpus import (
        BUDGET_EPOCH_MULT_DEN,
        BUDGET_EPOCH_MULT_NUM,
        BUDGET_MAX_EPOCHS,
        tokens_per_source_budget,
    )

    rows = tokens_per_source_budget(spark, sf_small).collect()
    total = sum(r["tokens_available"] for r in rows)
    budget = total * BUDGET_EPOCH_MULT_NUM // BUDGET_EPOCH_MULT_DEN
    for r in rows:
        assert r["planned_tokens"] <= r["tokens_available"] * BUDGET_MAX_EPOCHS
        assert r["planned_tokens"] <= r["target_share"]
        assert r["epochs_micro"] <= BUDGET_MAX_EPOCHS * 1_000_000
        assert r["deficit_tokens"] == r["target_share"] - r["planned_tokens"]
        assert r["capped"] == (
            r["tokens_available"] * BUDGET_MAX_EPOCHS < r["target_share"]
        )
    assert sum(r["planned_tokens"] for r in rows) <= budget


def test_dsir_selection_consistency(spark, sf_small):
    """The resampling pool is exactly the top quartile of the importance
    ranking, means are consistent with the sums, and — the point of DSIR —
    the pool is measurably enriched in the target language vs the corpus
    (measured: en share 0.386 → 0.512 at sf0.001)."""
    from kafka_connect_storage_cloud_spark.llm.corpus import (
        DSIR_KEEP_NTILE,
        dsir_importance,
    )

    rows = dsir_importance(spark, sf_small).collect()
    for r in rows:
        assert r["n_tokens"] > 0
        q = abs(r["dsir_sum_micro"]) // r["n_tokens"]
        mean = q if r["dsir_sum_micro"] >= 0 else -q
        assert r["mean_ratio_micro"] == mean
    sel = [r for r in rows if r["selected"]]
    unsel = [r for r in rows if not r["selected"]]
    assert abs(len(sel) - len(rows) // DSIR_KEEP_NTILE) <= 1
    assert min(r["mean_ratio_micro"] for r in sel) >= max(
        r["mean_ratio_micro"] for r in unsel
    )
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "lang").collect()
    }
    corpus_share = sum(langs[r["doc_id"]] == "en" for r in rows) / len(rows)
    pool_share = sum(langs[r["doc_id"]] == "en" for r in sel) / len(sel)
    assert pool_share > corpus_share, (pool_share, corpus_share)


def test_source_overlap_jaccard_bounds(spark):
    """Jaccard can never exceed either containment, and all three live in
    (0, 1]. sf0.1 is the only SF whose synthetic corpus carries
    cross-source exact-dup texts (8 pairs), so the bounds are exercised
    there."""
    from kafka_connect_storage_cloud_spark.llm.dedup import source_overlap_jaccard

    rows = source_overlap_jaccard(spark, "/root/testdata/sf0.1").collect()
    assert rows, "no overlapping source pairs at sf0.1"
    for r in rows:
        assert 0 < r["jaccard"] <= 1
        assert r["jaccard"] <= r["containment_a"] + 1e-9
        assert r["jaccard"] <= r["containment_b"] + 1e-9
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])


def test_rarity_buckets_are_balanced_thirds(spark, sf_small):
    """ntile's defining property: within every language the three bucket
    sizes differ by at most one, and bucket order tracks rarity order."""
    from kafka_connect_storage_cloud_spark.llm.corpus import rarity_buckets

    rows = rarity_buckets(spark, sf_small).collect()
    by_lang: dict[str, dict[int, list]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["mean_rarity_micro"]
        )
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert max(buckets[1]) <= min(buckets[3]), lang  # head most fluent


def test_minhash_precision_curve_totals(spark, sf_small):
    """The curve's pair volume must equal the underlying candidate-pair
    table's row count, and the curve must be monotone in spirit: the top
    band's mean exact Jaccard exceeds the bottom band's."""
    from kafka_connect_storage_cloud_spark.llm.dedup import (
        minhash_jaccard_est,
        minhash_precision_curve,
    )

    curve = minhash_precision_curve(spark, sf_small).collect()
    assert sum(r["n_pairs"] for r in curve) == minhash_jaccard_est(spark, sf_small).count()
    if len(curve) >= 2:
        assert curve[-1]["mean_exact"] >= curve[0]["mean_exact"]


def test_new_ops_survive_empty_corpus(spark, sf_small, tmp_path):
    """An empty partition/table is a normal production input: every
    round-3 operator must return an empty, correctly-schema'd frame
    instead of crashing the driver."""
    import importlib.util
    import sys

    src = sf_small
    dst = str(tmp_path / "sf_empty")
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    spec = importlib.util.spec_from_file_location(
        "spark_entry_empty", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_empty"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    for op in (
        "dsir_importance", "cluster_profile_kmeans", "tokens_per_source_budget",
        "embedding_covariance", "embedding_pca_power", "tokenizer_fertility",
        "quality_filter", "source_overlap_jaccard", "minhash_precision_curve",
        "rarity_buckets", "context_pack",
        # round-5 additions
        "dedup_containment", "embedding_pca_project", "ivf_nprobe_recall_curve",
        "mixture_temperature_weights", "curriculum_stages", "span_corruption_plan",
        "knn_graph_components", "vocab_growth_curve", "pq_code_balance", "mlm_masking_plan",
        "simhash_bit_balance", "dedup_method_matrix", "ann_method_matrix",
        "shard_skew_audit",
        # round-6 additions (scale-safe two-pass-rank twins + new audits)
        "curriculum_stages_edges", "dsir_importance_edges",
        "pack_efficiency_curve", "ngram_memorization_audit",
        "matryoshka_recall_audit",
        # round-7 additions (document-corpus ops; events ops excluded — the
        # fixture only stages documents+embeddings)
        "vocab_drift_chi2", "kmv_set_ops", "bm25_topk",
        "rarity_buckets_edges", "ann_topk_ivf_sq8",
        "bigram_lm_rarity", "kfold_assignment", "semdedup_cells",
        "quality_ablation_matrix", "l_diversity_audit",
        # round-8 additions
        "winnowing_fingerprints", "shard_checksum_manifest", "t_closeness_audit",
        "hybrid_retrieval_agreement",
        # round-9 additions
        "semdedup_cell_profile", "hybrid_rrf_fusion", "ann_topk_ivf_twolevel",
        "ivf_twolevel_recall_audit", "erasure_blast_radius",
        "token_lorenz_gini", "dedup_cascade_yield", "token_lorenz_gini_edges",
    ):
        assert qs[op](spark, dst).count() == 0, op


def test_banded_pandas_matches_expression_form(spark, sf_small):
    """The vectorized band-signature builder (_banded_pandas, r4) must stay
    bit-identical to the _lsh_signature expression tree it replaced — the
    invariant that makes the numpy matmul a pure perf change. Pins all
    three prefix families at their production widths."""
    import pyspark.sql.functions as F

    from kafka_connect_storage_cloud_spark.llm import similarity as LS

    emb = LS._with_dec_and_norm(LS.read_table(spark, sf_small, "embeddings"))
    n = emb.count()
    cases = [
        ("g{b}:", LS.GB_BANDS, LS._graph_band_bits(n), None),
        ("q{b}:", LS.LSH_BANDS, LS.LSH_BAND_BITS, None),
        ("cb{b}:", LS.CB_BANDS, LS._cb_bits(n), (("label", "int"),)),
    ]
    for fmt, n_bands, bits, extra in cases:
        sigs = F.array(
            *[
                LS._lsh_signature(prefix=fmt.format(b=b), bits=bits)
                for b in range(n_bands)
            ]
        )
        cols = ["vec_id"] + [c for c, _t in (extra or ())]
        expr_rows = set(
            map(
                tuple,
                emb.select(*cols, F.posexplode(sigs).alias("band", "bucket")).collect(),
            )
        )
        pd_rows = set(
            map(
                tuple,
                LS._banded_pandas(emb, fmt, n_bands, bits, extra=extra or ()).collect(),
            )
        )
        assert expr_rows == pd_rows, (fmt, n_bands, bits)


def test_r4_ops_survive_empty_corpus(spark, sf_small, tmp_path):
    """Same empty-input contract for every round-4 operator (the vectorized
    banded builder, sampled audits, planning tables, byte dedup, BPE)."""
    import importlib.util
    import sys

    dst = str(tmp_path / "sf_empty_r4")
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_small}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    spec = importlib.util.spec_from_file_location(
        "spark_entry_empty_r4", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_empty_r4"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    for op in (
        "doc_truncation_loss", "quality_threshold_yield",
        "dup_cluster_size_profile", "dedup_transitivity_audit",
        "pii_density_by_slice", "minhash_band_tuning",
        "multimodal_payload_dedup", "bpe_train_rounds",
        "bpe_compression_curve", "quantile_sketch_audit",
        "negative_sampling_table", "knn_graph_lsh_recall_sampled",
        "cosine_dup_band_recall_sampled",
    ):
        df = qs[op](spark, dst)
        n = df.count()
        # planning tables may legitimately emit header-like rows only when
        # the corpus is nonempty; on an EMPTY corpus everything must be
        # empty except single-row audits whose sums are simply zero
        if op == "knn_graph_lsh_recall_sampled":
            assert n <= 1, op  # single-row aggregate; zero counts allowed
        elif op == "bpe_compression_curve":
            assert n <= 1, op  # round-0 row with zero totals allowed
        elif op == "minhash_band_tuning":
            # one row per (bands,rows) config with all-zero capture counts
            rows = df.collect()
            assert len(rows) == 5 and all(
                r["n_true"] == 0 and r["n_false"] == 0 for r in rows
            ), op
        else:
            assert n == 0, op


def test_pca_projection_variance_equals_eigenvalue(spark, sf_small):
    """u'Σu = λ for the fitted component u: the population variance of the
    1-D projection must equal embedding_pca_power's Rayleigh eigenvalue
    (measured agreement ~5e-5 at sf0.001; centering cancels inside the
    variance, so the uncentered projection satisfies the identity too).
    Also pins the plan: the projection is a pure scan+project — the
    component rides the plan as a literal, never a join."""
    from kafka_connect_storage_cloud_spark.llm.similarity import (
        embedding_pca_power,
        embedding_pca_project,
    )

    proj_df = embedding_pca_project(spark, sf_small)
    vals = np.array([r["proj_pc1"] for r in proj_df.collect()])
    lam = embedding_pca_power(spark, sf_small).collect()[0]["eigenvalue"]
    assert abs(vals.var() - lam) < 5e-4, f"var={vals.var()} vs lam={lam}"
    plan = proj_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_containment_prefix_filter_is_lossless(spark, sf_small):
    """The AllPairs prefix filter must have recall 1.0 by construction:
    the operator's pair set equals a brute-force gold that intersects ALL
    doc pairs sharing any shingle (no prefix restriction), at the same
    threshold. Also pins that every dup_class actually occurs on the
    corpus (the asymmetric_subset class is the operator's reason to
    exist — Jaccard LSH cannot see those pairs)."""
    import duckdb

    from kafka_connect_storage_cloud_spark.functions import hashing as H
    from kafka_connect_storage_cloud_spark.functions import text as T
    from kafka_connect_storage_cloud_spark.llm import dedup as LD

    got = {
        (r["doc_a"], r["doc_b"]): r["dup_class"]
        for r in LD.dedup_containment(spark, sf_small).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    gold = con.sql(f"""
WITH shing AS (
  SELECT d.doc_id, s.shingle
  FROM documents d JOIN ({T.sql_shingles(LD.SHINGLE_N)}) s ON d.doc_id = s.doc_id
),
hs AS (SELECT DISTINCT doc_id, {H.sql_h32("shingle")} AS h FROM shing),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM hs GROUP BY doc_id),
inter AS (
  SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) n_inter
  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b FROM inter
JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {LD.CONT_TAU}
""").fetchall()
    assert set(got) == {(a, b) for a, b in gold}
    classes = set(got.values())
    assert "near_exact" in classes and "asymmetric_subset" in classes


def test_mixture_temperature_invariants(spark, sf_small):
    """Defining properties of the alpha=1/2 mixture: weights are a
    distribution (sum 1 within quantization), temperature LIFTS
    low-resource sources (the smallest source must get at least the
    effective epochs of the largest), and p_share reproduces the exact
    token shares."""
    from kafka_connect_storage_cloud_spark.llm.curriculum import (
        mixture_temperature_weights,
    )

    rows = mixture_temperature_weights(spark, sf_small).collect()
    assert rows
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert abs(r["p_share"] - r["n_tokens"] / total) < 1e-5
    lo = min(rows, key=lambda r: r["n_tokens"])
    hi = max(rows, key=lambda r: r["n_tokens"])
    if lo["n_tokens"] < hi["n_tokens"]:
        assert lo["effective_epochs"] > hi["effective_epochs"]
        # sqrt-temperature: the weight ratio must sit between the raw
        # share ratio and 1 (a pure flattening, never an inversion)
        assert lo["weight"] / hi["weight"] > lo["n_tokens"] / hi["n_tokens"]


def test_curriculum_stage_invariants(spark, sf_small):
    """Stages are balanced ntiles in difficulty order; cumulative token
    offsets are exact: sorted by (difficulty, doc_id), each row's
    tokens_before equals the sum of all earlier docs' n_tokens."""
    from kafka_connect_storage_cloud_spark.llm.curriculum import (
        CURR_STAGES,
        curriculum_stages,
    )

    rows = sorted(
        curriculum_stages(spark, sf_small).collect(),
        key=lambda r: (r["mean_rarity_micro"], r["doc_id"]),
    )
    sizes = {}
    run = 0
    for r in rows:
        assert r["tokens_before"] == run, r
        run += r["n_tokens"]
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    assert set(sizes) == set(range(1, CURR_STAGES + 1))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # difficulty must be non-decreasing across stage boundaries
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["mean_rarity_micro"])
    for s in range(1, CURR_STAGES):
        assert max(by_stage[s]) <= min(by_stage[s + 1])


def test_span_corruption_plan_invariants(spark, sf_small):
    """The noise plan must realize ~15% masking in aggregate (overlap
    pulls individual docs below 15%; the mean stays in [0.10, 0.20]),
    never mask more than n_spans * SPAN_LEN or n_tokens positions, and be
    replay-identical (two runs produce the same plan)."""
    from kafka_connect_storage_cloud_spark.llm.curriculum import (
        SPAN_LEN,
        span_corruption_plan,
    )

    rows = span_corruption_plan(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 1 <= r["masked_positions"] <= min(r["n_spans"] * SPAN_LEN, r["n_tokens"])
    mean_ratio = sum(r["mask_ratio_micro"] for r in rows) / len(rows) / 1e6
    assert 0.10 <= mean_ratio <= 0.20, mean_ratio
    again = span_corruption_plan(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_vocab_growth_curve_is_heaps_shaped(spark, sf_small):
    """The growth curve's defining invariants: exactly 10 deciles, exact
    cumulative sums, and sublinear type growth — the marginal shingle-type
    yield of the last decile must be below the first decile's (measured
    sf0.01: 2536 -> 1002/decile), which is the Heaps-law signal the
    band-store capacity planner reads."""
    from kafka_connect_storage_cloud_spark.llm.text_stats import vocab_growth_curve

    rows = sorted(vocab_growth_curve(spark, sf_small).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    ct = cs = 0
    for r in rows:
        ct += r["n_tokens"]; cs += r["new_shingles"]
        assert r["cum_tokens"] == ct
        assert r["cum_shingles"] == cs
    assert rows[-1]["new_shingles"] < rows[0]["new_shingles"]
    assert all(r["new_shingles"] > 0 for r in rows)


def test_mlm_masking_plan_invariants(spark, sf_small):
    """The action split partitions the selection exactly; aggregate rates
    sit near the design point (15% selected; 80/10/10 split), and the plan
    is replay-identical."""
    from kafka_connect_storage_cloud_spark.llm.curriculum import mlm_masking_plan

    rows = mlm_masking_plan(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["n_masked"] + r["n_random"] + r["n_kept"] == r["n_selected"]
        assert r["n_selected"] <= r["n_tokens"]
    tot = sum(r["n_tokens"] for r in rows)
    sel = sum(r["n_selected"] for r in rows)
    msk = sum(r["n_masked"] for r in rows)
    assert 0.10 <= sel / tot <= 0.20
    assert 0.7 <= msk / sel <= 0.9
    again = mlm_masking_plan(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_seasonality_anova_matches_numpy(spark, sf_small):
    """The integer ANOVA must agree with a float numpy decomposition of
    the same series within quantization error, stay in [0, 1], and name a
    peak hour whose float mean is (near-)maximal."""
    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        events_seasonality_anova,
    )
    from kafka_connect_storage_cloud_spark.session import read_events

    got = {r["event_type"]: r for r in events_seasonality_anova(spark, sf_small).collect()}
    assert got
    ev = read_events(spark, sf_small).selectExpr(
        "event_type", "hour(ts) AS hour", "CAST(value AS DOUBLE) AS v"
    ).collect()
    by_type: dict[str, dict[int, list]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], {}).setdefault(r["hour"], []).append(r["v"])
    for et, hours in by_type.items():
        vals = np.array([v for vs in hours.values() for v in vs])
        sst = ((vals - vals.mean()) ** 2).sum()
        ssb = sum(len(vs) * (np.mean(vs) - vals.mean()) ** 2 for vs in hours.values())
        share = got[et]["seasonal_share"]
        assert 0.0 <= share <= 1.0
        assert abs(share - ssb / sst) < 1e-3, (et, share, ssb / sst)
        means = {h: float(np.mean(vs)) for h, vs in hours.items()}
        assert means[got[et]["peak_hour"]] >= max(means.values()) - 1e-6
