"""Property pins for the round-7 operators beyond the oracle gate:
sketch-exactness invariants, retrieval sanity, burst-run shape, and the
plan-shape guarantees that make them 100-TB-safe."""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(spark, df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------------------
# kmv_set_ops
# ---------------------------------------------------------------------------

def test_kmv_set_ops_exact_when_small(spark, sf_small):
    """KMV invariant: when a pair's true union has fewer than k elements,
    BOTH sketch estimates collapse to the exact answer (every hash is
    kept, the jaccard numerator is the true intersection). Pairs above k
    must still satisfy the ordering inter_est <= union_est and the exact
    legs' set algebra."""
    from kafka_connect_storage_cloud_spark.llm.sketches import KMVSET_K, kmv_set_ops

    rows = kmv_set_ops(spark, sf_small).collect()
    assert rows, "no source pairs at sf_small"
    for r in rows:
        assert r["inter_exact"] <= r["union_exact"]
        assert r["inter_est"] <= r["union_est"]
        assert 0.0 <= r["jacc_est"] <= 1.0
        if r["union_exact"] < KMVSET_K:
            assert r["union_est"] == r["union_exact"], r
            assert r["inter_est"] == r["inter_exact"], r


def test_kmv_set_ops_sketch_stage_is_bounded(spark, sf_dir):
    """The k-min window must be rank-limited (WindowGroupLimit) so each
    map task keeps k rows per source before the shuffle — the property
    that makes the sketch corpus-size-independent."""
    from kafka_connect_storage_cloud_spark.llm.sketches import kmv_set_ops

    assert "WindowGroupLimit" in _plan(spark, kmv_set_ops(spark, sf_dir))


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------

def test_bm25_topk_shape(spark, sf_small):
    from kafka_connect_storage_cloud_spark.llm.retrieval import (
        BM25_NQ,
        BM25_TOPK,
        bm25_topk,
    )

    rows = bm25_topk(spark, sf_small).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["qid"] != r["doc_id"], "query doc must be excluded"
        assert r["rk"] <= BM25_TOPK
        assert r["bm25_expidf"] > 0.0
        assert r["n_terms_matched"] >= 1
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) <= BM25_NQ
    for q, rs in by_q.items():
        scores = [r["bm25_expidf"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert scores == sorted(scores, reverse=True), f"rank order broken for {q}"


def test_bm25_query_terms_are_broadcast(spark, sf_dir):
    """The bounded query-term table must reach the postings join as a
    broadcast — a shuffled postings join on token would put the whole
    corpus through an exchange keyed on a 31-value vocabulary."""
    from kafka_connect_storage_cloud_spark.llm.retrieval import bm25_topk

    assert "BroadcastHashJoin" in _plan(spark, bm25_topk(spark, sf_dir))


# ---------------------------------------------------------------------------
# events_burst_runs
# ---------------------------------------------------------------------------

def test_events_burst_runs_are_consecutive_and_hot(spark, sf_dir):
    from kafka_connect_storage_cloud_spark.plans.events_ext import (
        BURST_MIN_RUN,
        events_burst_runs,
    )

    rows = events_burst_runs(spark, sf_dir).collect()
    assert rows, "burst threshold vacuous at sf_dir"
    for r in rows:
        assert r["run_len"] >= BURST_MIN_RUN
        assert r["hr_end"] - r["hr_start"] + 1 == r["run_len"], (
            "runs must be maximal consecutive hour spans"
        )
        assert r["peak_c"] <= r["total_c"]
        assert 0.0 < r["share_of_type"] <= 1.0


# ---------------------------------------------------------------------------
# events_value_percentiles_exact
# ---------------------------------------------------------------------------

def test_percentiles_match_duckdb_rank_definition(spark, sf_small):
    """The two-pass-rank percentile must equal the naive single-window
    definition computed independently (not via the shared oracle string):
    value at rank ceil(p*n/100) in (value, event_id) order per type."""
    import duckdb

    from kafka_connect_storage_cloud_spark.plans.events_ext import (
        events_value_percentiles_exact,
    )

    got = {
        (r["event_type"], r["p"]): (r["rank_at"], r["n"], r["value"])
        for r in events_value_percentiles_exact(spark, sf_small).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    want = {}
    for et, p, rk, n, v in con.sql(
        """
        WITH r AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) rk,
                 COUNT(*) OVER (PARTITION BY event_type) n
          FROM events
        ), f AS (SELECT *, unnest([50, 90, 99]) p FROM r)
        SELECT event_type, p, rk, n, value FROM f WHERE rk = (p * n + 99) // 100
        """
    ).fetchall():
        want[(et, p)] = (rk, n, v)
    assert got == want


def test_percentiles_plan_has_no_unpartitioned_row_window(spark, sf_dir):
    """The rank must come from the two-pass histogram form: no
    row_number window whose partition is the bare corpus (the histogram
    window runs over distinct (event_type, value) metadata instead)."""
    from kafka_connect_storage_cloud_spark.plans.events_ext import (
        events_value_percentiles_exact,
    )

    plan = _plan(spark, events_value_percentiles_exact(spark, sf_dir))
    import re

    for m in re.finditer(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "event_type" in spec and "value" in spec, (
            "row_number must partition by (event_type, value) tie classes, "
            f"got: {spec}"
        )


# ---------------------------------------------------------------------------
# vocab_drift_chi2
# ---------------------------------------------------------------------------

def test_chi2_agrees_with_scipy_free_reference(spark, sf_small):
    """Recompute the two-sample chi-square in pure Python from raw counts
    and check the operator's statistic to 1e-5 — guards the algebraic
    reduction (c1*N2 - c2*N1)^2 / (N1*N2*(c1+c2))."""
    from kafka_connect_storage_cloud_spark.llm.text_stats import vocab_drift_chi2
    from kafka_connect_storage_cloud_spark.session import read_table
    import kafka_connect_storage_cloud_spark.functions.hashing as H

    rows = vocab_drift_chi2(spark, sf_small).collect()
    assert rows
    docs = read_table(spark, sf_small, "documents")
    toks = (
        docs.select(
            (H.h32(F.concat(F.lit("drift:"), F.col("doc_id").cast("string"))) % 2).alias("half"),
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
        )
        .collect()
    )
    n1 = sum(r["c1"] for r in toks)
    n2 = sum(r["c2"] for r in toks)
    chi2 = 0.0
    for r in toks:
        d = r["c1"] * n2 - r["c2"] * n1
        e1 = (r["c1"] + r["c2"]) * n1 / (n1 + n2)
        e2 = (r["c1"] + r["c2"]) * n2 / (n1 + n2)
        chi2 += (r["c1"] - e1) ** 2 / e1 + (r["c2"] - e2) ** 2 / e2
    assert abs(rows[0]["corpus_chi2"] - chi2) < 1e-4 * max(1.0, chi2)
    assert rows[0]["dof"] == len(toks) - 1


# ---------------------------------------------------------------------------
# batch 3: semdedup_cells / events_haar_energy / bigram_lm_rarity / kfold
# ---------------------------------------------------------------------------

def test_semdedup_greedy_keep_invariants(spark, sf_dir):
    """Greedy first-keeper rule: (1) keep=false iff at least one dominating
    lower-id neighbor; (2) the min vec_id of every cell is always kept;
    (3) a dominated vector's closest dominator is >= tau."""
    from kafka_connect_storage_cloud_spark.llm.pipeline import (
        SEMDEDUP_TAU,
        semdedup_cells,
    )

    rows = semdedup_cells(spark, sf_dir).collect()
    assert rows
    by_cell: dict = {}
    dropped = 0
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
        assert r["keep"] == (r["n_close_lower"] == 0)
        if not r["keep"]:
            dropped += 1
            assert r["max_cos_lower"] >= SEMDEDUP_TAU
    assert dropped > 0, "semdedup vacuous at sf_dir (no within-cell dups)"
    for cell, rs in by_cell.items():
        first = min(rs, key=lambda r: r["vec_id"])
        assert first["keep"], f"min vec_id of cell {cell} must be kept"


def test_haar_energy_shape(spark, sf_dir):
    """Nine levels per type; shares sum to ~1 per type; energies are
    non-negative integers."""
    from kafka_connect_storage_cloud_spark.plans.events_ext import (
        HAAR_LEVELS,
        events_haar_energy,
    )

    rows = events_haar_energy(spark, sf_dir).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert 1 <= r["level"] <= HAAR_LEVELS
        assert r["energy"] >= 0
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        assert len(rs) == HAAR_LEVELS, et
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-4, et


def test_haar_level1_energy_equals_numpy(spark, sf_small):
    """Level-1 detail energy recomputed with numpy from the raw hourly
    series — guards the island of integer transform plumbing."""
    import numpy as np

    from kafka_connect_storage_cloud_spark.plans.events_ext import (
        HAAR_WINDOW,
        events_haar_energy,
    )
    from kafka_connect_storage_cloud_spark.session import read_events

    got = {
        r["event_type"]: r["energy"]
        for r in events_haar_energy(spark, sf_small).collect()
        if r["level"] == 1
    }
    ev = read_events(spark, sf_small).select("event_type", "ts").collect()
    hrs = [(r["event_type"], int(r["ts"].timestamp() * 1000) // 3600000) for r in ev]
    h0 = min(h for _, h in hrs)
    series: dict = {}
    for et, h in hrs:
        pos = h - h0
        if pos < HAAR_WINDOW:
            series.setdefault(et, np.zeros(HAAR_WINDOW, dtype=np.int64))[pos] += 1
    for et, x in series.items():
        d = x[0::2] - x[1::2]
        assert got[et] == int((d * d).sum()), et


def test_bigram_rarity_bounds(spark, sf_small):
    """rarity >= SCALE always (conditional prob <= 1), and a doc's mean is
    within [min, max] of the per-bigram range by construction."""
    from kafka_connect_storage_cloud_spark.llm.corpus import (
        RARITY_SCALE,
        bigram_lm_rarity,
    )

    rows = bigram_lm_rarity(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["mean_bigram_rarity_micro"] >= RARITY_SCALE


def test_kfold_partition_is_exhaustive(spark, sf_small):
    """Per-stratum fold counts sum to the stratum size; folds in [0, k)."""
    from kafka_connect_storage_cloud_spark.llm.sampling import (
        KFOLD_K,
        kfold_assignment,
    )
    from kafka_connect_storage_cloud_spark.session import read_table

    rows = kfold_assignment(spark, sf_small).collect()
    assert rows
    per_lang: dict = {}
    for r in rows:
        assert 0 <= r["fold"] < KFOLD_K
        per_lang.setdefault(r["lang"], [0, r["n_stratum"]])
        per_lang[r["lang"]][0] += r["n_docs"]
    truth = {
        r["lang"]: r["n"]
        for r in read_table(spark, sf_small, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, (tot, stratum) in per_lang.items():
        assert tot == stratum == truth[lang], lang


def test_quality_ablation_consistency(spark, sf_dir):
    """The union row dominates every individual filter; unique drops never
    exceed total drops; the three verdict filters reconcile with
    quality_filter's keep count."""
    from kafka_connect_storage_cloud_spark.llm.quality import (
        quality_ablation_matrix,
        quality_filter,
    )

    rows = {r["filter"]: r for r in quality_ablation_matrix(spark, sf_dir).collect()}
    assert set(rows) == {
        "any_filter", "gopher", "lang_mismatch", "low_diversity",
        "low_quality", "repetitive",
    }
    any_row = rows["any_filter"]
    for name, r in rows.items():
        assert r["n_unique_dropped"] <= r["n_dropped"]
        assert r["n_dropped"] <= any_row["n_dropped"]
        assert r["n_docs"] == any_row["n_docs"]
    verdict_dropped = quality_filter(spark, sf_dir).where(~F.col("keep")).count()
    three = ("low_quality", "repetitive", "lang_mismatch")
    lo = max(rows[n]["n_dropped"] for n in three)
    hi = sum(rows[n]["n_dropped"] for n in three)
    assert lo <= verdict_dropped <= hi


def test_r7_ops_bound_their_corpus_scans(spark, sf_dir):
    """The shared-frame materializations must hold: each op's plan reads
    the raw parquet at most twice (the checkpointed index/cell frames
    absorb every other consumer). A regression here means a derived frame
    silently re-derives from the corpus scan per consumer — 20 scans were
    observed in kmv_set_ops before the fix."""
    import importlib.util
    import os
    import sys

    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("spark_entry_scans", entry_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_scans"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    for name in (
        "kmv_set_ops", "bm25_topk", "bigram_lm_rarity",
        "events_burst_runs", "kfold_assignment", "events_haar_energy",
        "quality_ablation_matrix",
    ):
        plan = _plan(spark, qs[name](spark, sf_dir))
        n = plan.count("Scan parquet")
        assert n <= 2, f"{name}: {n} raw corpus scans (shared frame regressed)"


def test_holt_tracks_trend_better_than_ewma(spark, sf_small):
    """On a linearly trending synthetic series Holt's one-step forecast
    must beat the trend-blind EWMA's lag — checked by construction on the
    kernels: sum(hl) ~ 1 and the trend kernel has positive first moment
    (these two facts make level+trend track a ramp)."""
    from kafka_connect_storage_cloud_spark.plans.warehouse import _holt_kernels

    hl, hb = _holt_kernels()
    assert abs(sum(hl) - 1.0) < 0.01
    # trend kernel must respond positively to a rising ramp:
    # Σ_j hb[j] * (-j) > 0  <=>  recent points weigh more than old ones
    ramp_response = sum(hb[j] * (-j) for j in range(len(hb)))
    assert ramp_response > 0
    # every coefficient must be an exact dyadic double (round-trips via
    # Fraction with a power-of-two denominator)
    from fractions import Fraction

    for c in hl + hb:
        f = Fraction(c)
        assert f.denominator & (f.denominator - 1) == 0


def test_holt_output_shape(spark, sf_small):
    from kafka_connect_storage_cloud_spark.plans.warehouse import events_holt_linear

    rows = events_holt_linear(spark, sf_small).collect()
    assert rows
    for r in rows[:50]:
        assert abs(r["holt_forecast"] - (r["holt_level"] + r["holt_trend"])) < 2e-6


# ---------------------------------------------------------------------------
# round 9: semdedup_cell_profile / hybrid_rrf_fusion
# ---------------------------------------------------------------------------

def test_semdedup_cell_profile_invariants(spark, sf_dir):
    """The per-cell audit must reconcile exactly with the per-vector
    verdicts: memberships sum to the corpus, kept+dropped partitions each
    cell, the greedy rule keeps at least the min-id of every cell, and
    keep_rate is the stated ratio."""
    from kafka_connect_storage_cloud_spark.llm.pipeline import (
        semdedup_cell_profile,
        semdedup_cells,
    )
    from kafka_connect_storage_cloud_spark.session import table_count

    rows = semdedup_cell_profile(spark, sf_dir).collect()
    assert rows
    n = table_count(spark, sf_dir, "embeddings")
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"]
        assert r["n_kept"] >= 1, "greedy rule must keep each cell's min id"
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_members"]) < 2e-6
    verd = semdedup_cells(spark, sf_dir).collect()
    kept = sum(1 for v in verd if v["keep"])
    assert kept == sum(r["n_kept"] for r in rows)


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """Fusion sanity: every fused row came from at least one retriever;
    per-query fused ranks are dense from 1; rrf_micro is non-increasing
    in fused_rank; a doc returned by BOTH retrievers outscores one
    returned by a single retriever at equal-or-worse ranks."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.llm.retrieval import (
        BM25_TOPK,
        hybrid_rrf_fusion,
    )

    rows = hybrid_rrf_fusion(spark, sf_dir).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert r["in_lex"] or r["in_sem"], "fused row from neither retriever"
        by_q[r["qid"]].append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        micros = [r["rrf_micro"] for r in rs]
        assert micros == sorted(micros, reverse=True)
        both = [r["rrf_micro"] for r in rs if r["in_lex"] and r["in_sem"]]
        single_best = max(
            (r["rrf_micro"] for r in rs if not (r["in_lex"] and r["in_sem"])),
            default=0,
        )
        # a dual-source doc carries two reciprocal terms; its score beats
        # any single top-rank term (2e6/61ths vs 1e6/61)
        for m in both:
            assert m >= 1000000 // (60 + BM25_TOPK) * 2 or m > single_best - 1000000


def test_hampel_matches_python_recompute(spark, sf_dir):
    """Independent recompute: the rank-based ±3 neighborhood, the exact
    interpolated medians, and the integer decision rule must reproduce a
    plain statistics.median implementation on the collected hourly cells
    — and the robustness claim must hold (a window's single largest
    spike cannot unflag itself by inflating the scale estimate)."""
    import statistics
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        HAMPEL_HALF,
        HAMPEL_NSIG,
        events_hampel_filter,
    )

    rows = events_hampel_filter(spark, sf_dir).collect()
    assert rows
    by_t = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r)
    n_flagged = 0
    for _t, rs in by_t.items():
        rs.sort(key=lambda r: r["hr"])
        ys = [r["y"] for r in rs]
        for i, r in enumerate(rs):
            win = ys[max(0, i - HAMPEL_HALF): i + HAMPEL_HALF + 1]
            med = statistics.median(win)
            mad = statistics.median([abs(x - med) for x in win])
            assert r["n_win"] == len(win)
            assert r["med"] == med, (r, med)
            assert r["mad"] == mad, (r, mad)
            flag = abs(r["y"] - med) > HAMPEL_NSIG * mad
            assert r["is_outlier"] == flag
            n_flagged += flag
    assert n_flagged > 0, "hampel vacuous on this corpus"


def test_ivf_twolevel_invariants(spark, sf_dir):
    """Serving-path sanity: per query the ranks are dense from 1 with
    non-increasing cosine, self never appears, all neighbors come from
    ONE fine cell (the query's own), and the recall audit reconciles
    against the raw top-k tables."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.llm.pipeline import (
        IVF_TOP_K,
        ann_topk_ivf_twolevel,
        ivf_twolevel_recall_audit,
    )

    rows = ann_topk_ivf_twolevel(spark, sf_dir).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q[r["query_id"]].append(r)
    for _q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= IVF_TOP_K
        assert len({r["cell"] for r in rs}) == 1, "neighbors left the query's fine cell"
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    audit = ivf_twolevel_recall_audit(spark, sf_dir).collect()
    assert audit
    hits_total = 0
    for a in audit:
        assert 0.0 <= a["recall"] <= 1.0
        assert a["n_hits"] <= min(a["n_exact"], a["n_approx"])
        hits_total += a["n_hits"]
    assert hits_total > 0, "two-level path found zero exact neighbors"


def test_seasonal_decompose_matches_python_recompute(spark, sf_dir):
    """Independent recompute of the STL-lite decomposition: seasonal is
    the exact interpolated median of each (type, hour-of-day)'s counts,
    trend is the rank-based ±STL_TREND_HALF rolling median of the
    deseasonalized series, and y == seasonal + trend + resid EXACTLY
    (every term is dyadic: k/2 or k/4 for integer k)."""
    import statistics
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        STL_TREND_HALF,
        events_seasonal_median_decompose,
    )

    rows = events_seasonal_median_decompose(spark, sf_dir).collect()
    assert rows
    by_t = defaultdict(list)
    for r in rows:
        by_t[r["event_type"]].append(r)
    for _t, rs in by_t.items():
        rs.sort(key=lambda r: r["hr"])
        seas = defaultdict(list)
        for r in rs:
            seas[r["hr"] % 24].append(r["y"])
        for r in rs:
            assert r["seasonal"] == statistics.median(seas[r["hr"] % 24])
        d2s = [2 * r["y"] - int(2 * r["seasonal"]) for r in rs]
        for i, r in enumerate(rs):
            win = d2s[max(0, i - STL_TREND_HALF): i + STL_TREND_HALF + 1]
            assert r["trend"] == statistics.median(win) / 2.0, (r, win)
            # the identity is exact, not approximate: all terms dyadic
            assert r["seasonal"] + r["trend"] + r["resid"] == r["y"]
    # the decomposition must not be vacuous: some diurnal signal exists
    assert any(r["seasonal"] != rows[0]["seasonal"] for r in rows)


def test_ks_drift_matches_python_recompute(spark, sf_dir):
    """Independent recompute: per type, split values at the midpoint of
    the observed time range and take the exact ECDF sup-difference with
    cross-multiplied integer counts — numerator, halves, argmax value,
    and the single final division must all reproduce."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import events_ks_drift
    from kafka_connect_storage_cloud_spark.session import read_events

    rows = {r["event_type"]: r for r in events_ks_drift(spark, sf_dir).collect()}
    assert rows
    ev = defaultdict(list)
    from pyspark.sql import functions as F

    raw = (
        read_events(spark, sf_dir)
        .select("event_type", F.unix_millis("ts").alias("ms"), "value")
        .collect()
    )
    for r in raw:
        ev[r["event_type"]].append((r["ms"], r["value"]))
    for t, pts in ev.items():
        mss = [m for m, _ in pts]
        mid2 = min(mss) + max(mss)
        a = sorted(v for m, v in pts if 2 * m < mid2)
        b = sorted(v for m, v in pts if 2 * m >= mid2)
        if not a or not b:
            assert t not in rows
            continue
        na, nb = len(a), len(b)
        values = sorted(set(a) | set(b))
        import bisect

        best, best_at = -1, None
        for v in values:
            ca = bisect.bisect_right(a, v)
            cb = bisect.bisect_right(b, v)
            d = abs(ca * nb - cb * na)
            if d > best:
                best, best_at = d, v
        r = rows[t]
        assert (r["n_early"], r["n_late"]) == (na, nb)
        assert r["d_num"] == best
        assert r["ks_at"] == best_at
        assert r["ks_d"] == best / float(na * nb)


def test_max_burst_window_matches_bruteforce(spark, sf_dir):
    """Brute force over ALL O(n²) contiguous windows of the median-
    centered hourly deviations: the reported burst_excess must be the
    true maximum, the reported [start_hr, end_hr] window must attain it,
    and the tie-breaks (earliest end, then longest window) must hold."""
    import statistics
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        events_max_burst_window,
    )
    from kafka_connect_storage_cloud_spark.session import read_events
    from pyspark.sql import functions as F

    out = {r["event_type"]: r for r in events_max_burst_window(spark, sf_dir).collect()}
    assert out
    raw = (
        read_events(spark, sf_dir)
        .select(
            "event_type",
            (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .count()
        .collect()
    )
    cells = defaultdict(list)
    for r in raw:
        cells[r["event_type"]].append((r["hr"], r["count"]))
    for t, cs in cells.items():
        cs.sort()
        ys = [y for _, y in cs]
        hrs = [h for h, _ in cs]
        med2 = int(2 * statistics.median(ys))
        dev2 = [2 * y - med2 for y in ys]
        n = len(dev2)
        best = None  # (sum2, end_idx, -length) lexicographic preference
        for j in range(n):
            s = 0
            for i in range(j, -1, -1):
                s += dev2[i]
                # prefer: larger sum, then earlier end, then longer window
                key = (s, -j, j - i)
                if best is None or key > best[0]:
                    best = (key, i, j)
        (s2, _nj, _ln), bi, bj = best
        r = out[t]
        assert r["burst_excess"] == s2 / 2.0, (t, r, s2)
        assert r["start_hr"] == hrs[bi] and r["end_hr"] == hrs[bj], (t, r, bi, bj)
        assert r["n_hours"] == bj - bi + 1


def test_token_lorenz_gini_matches_python_recompute(spark, sf_dir):
    """Recompute per source from raw token counts: NTILE decile cuts,
    cumulative shares (monotone, ending exactly at 1.0), and the exact
    rank-identity Gini."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.llm.text_stats import (
        LORENZ_TILES,
        token_lorenz_gini,
    )
    from kafka_connect_storage_cloud_spark.session import read_table
    from pyspark.sql import functions as F

    rows = token_lorenz_gini(spark, sf_dir).collect()
    assert rows
    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
            ).alias("n_tok"),
        )
        .collect()
    )
    per_src = defaultdict(list)
    for d in docs:
        per_src[d["source"]].append((d["n_tok"], d["doc_id"]))
    by_key = {(r["source"], r["decile"]): r for r in rows}
    for src, ds in per_src.items():
        ds.sort()
        n = len(ds)
        tot = sum(x for x, _ in ds)
        if tot == 0:
            assert not any(s == src for s, _ in by_key)
            continue
        srx = sum(rn * x for rn, (x, _) in enumerate(ds, start=1))
        gini = (2 * srx - (n + 1) * tot) / float(n * tot)
        q, rm = divmod(n, LORENZ_TILES)
        cum_docs = cum_tok = 0
        prev_share = 0.0
        for tile in range(1, LORENZ_TILES + 1):
            sz = q + 1 if tile <= rm else q
            if sz == 0:
                assert (src, tile) not in by_key
                continue
            chunk = ds[cum_docs: cum_docs + sz]
            cum_docs += sz
            cum_tok += sum(x for x, _ in chunk)
            r = by_key[(src, tile)]
            assert r["n_docs"] == sz
            assert r["tok_decile"] == sum(x for x, _ in chunk)
            assert r["cum_tok_share"] == cum_tok / float(tot)
            assert r["cum_tok_share"] >= prev_share
            prev_share = r["cum_tok_share"]
            assert abs(r["gini"] - gini) < 1e-12
        assert prev_share == 1.0
        assert 0.0 <= gini < 1.0


def test_stl_anomaly_consistent_with_decompose(spark, sf_dir):
    """The anomaly view must score exactly the decomposition's residuals:
    med/mad are the interpolated medians of each type's resid, the flag
    is the integer hampel rule on them, and the flag must SPLIT on this
    corpus (non-vacuity)."""
    import statistics
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        STL_ANOM_NSIG,
        events_seasonal_median_decompose,
        events_stl_anomaly,
    )

    dec = events_seasonal_median_decompose(spark, sf_dir).collect()
    anom = events_stl_anomaly(spark, sf_dir).collect()
    resid = defaultdict(list)
    for r in dec:
        resid[r["event_type"]].append(r["resid"])
    dec_key = {(r["event_type"], r["hr"]): r for r in dec}
    n_true = 0
    for r in anom:
        rs = resid[r["event_type"]]
        med = statistics.median(rs)
        mad = statistics.median([abs(x - med) for x in rs])
        assert r["resid"] == dec_key[(r["event_type"], r["hr"])]["resid"]
        assert r["med_resid"] == med
        assert r["mad_resid"] == mad
        assert r["is_anomaly"] == (abs(r["resid"] - med) > STL_ANOM_NSIG * mad)
        n_true += r["is_anomaly"]
    assert 0 < n_true < len(anom), "anomaly flag vacuous on this corpus"


def test_dedup_cascade_yield_invariants(spark, sf_dir):
    """Cascade bookkeeping must reconcile: five ordered stages, n_new ≤
    n_flagged, cumulative removals monotone and equal to Σ n_new,
    survivors complementary to the corpus count, stage-1 (exact) n_new ==
    n_flagged (nothing precedes it), and n_flagged for exact equals the
    independent non-minimum count over identical-normalized-text groups."""
    from kafka_connect_storage_cloud_spark.llm.dedup import (
        CASCADE_STAGES,
        _normalized,
        dedup_cascade_yield,
    )
    from kafka_connect_storage_cloud_spark.session import read_table, table_count
    from pyspark.sql import functions as F

    rows = sorted(dedup_cascade_yield(spark, sf_dir).collect(), key=lambda r: r["stage"])
    assert [r["method"] for r in rows] == list(CASCADE_STAGES)
    n_docs = table_count(spark, sf_dir, "documents")
    cum = 0
    for r in rows:
        assert 0 <= r["n_new"] <= r["n_flagged"]
        cum += r["n_new"]
        assert r["n_removed_cum"] == cum
        assert r["n_survivors"] == n_docs - cum
        assert abs(r["yield_rate"] - round(r["n_new"] / n_docs, 6)) <= 1e-9
    assert rows[0]["n_new"] == rows[0]["n_flagged"]
    exact_groups = (
        read_table(spark, sf_dir, "documents")
        .groupBy(F.md5(_normalized()).alias("h"))
        .count()
        .collect()
    )
    assert rows[0]["n_flagged"] == sum(c["count"] - 1 for c in exact_groups)


def test_mann_kendall_matches_python_recompute(spark, sf_dir):
    """Brute-force S over all daily pairs, the tie-corrected variance
    formula, the all-int64 α=0.05 rule, and the single exact z² division
    must all reproduce; the verdict must agree with theil_sen's sign
    whenever significant."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        MK_Z2_NUM,
        events_mann_kendall,
    )
    from kafka_connect_storage_cloud_spark.session import read_events
    from pyspark.sql import functions as F

    out = {r["event_type"]: r for r in events_mann_kendall(spark, sf_dir).collect()}
    assert out
    raw = (
        read_events(spark, sf_dir)
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("x"),
        )
        .groupBy("event_type", "x")
        .count()
        .collect()
    )
    daily = defaultdict(list)
    for r in raw:
        daily[r["event_type"]].append((r["x"], r["count"]))
    for t, cs in daily.items():
        cs.sort()
        ys = [y for _, y in cs]
        n = len(ys)
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_counts = defaultdict(int)
        for y in ys:
            tie_counts[y] += 1
        varnum18 = n * (n - 1) * (2 * n + 5) - sum(
            c * (c - 1) * (2 * c + 5) for c in tie_counts.values()
        )
        r = out[t]
        assert (r["n_days"], r["s_stat"], r["varnum18"]) == (n, s, varnum18)
        if varnum18 > 0:
            assert r["z2_stat"] == float(18 * s * s) / float(varnum18)
        else:
            assert r["z2_stat"] is None
        sig = 180000 * s * s > MK_Z2_NUM * varnum18
        want = "increasing" if sig and s > 0 else "decreasing" if sig and s < 0 else "none"
        assert r["trend"] == want


def test_ljung_box_matches_recompute_from_acf(spark, sf_dir):
    """Q must reproduce from the profile view's own quantized ACF values
    plus the per-type present-hour count, term-for-term with the same
    1e-12 int quantization; the rejection flag requires a full 24-lag
    spectrum."""
    import math
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans.warehouse import (
        ACF_LAGS,
        LB_CHI2_CRIT,
        events_acf_profile,
        events_ljung_box,
    )
    from kafka_connect_storage_cloud_spark.session import read_events
    from pyspark.sql import functions as F

    acf = events_acf_profile(spark, sf_dir).collect()
    out = {r["event_type"]: r for r in events_ljung_box(spark, sf_dir).collect()}
    assert out
    n0s = {
        r["event_type"]: r["cnt"]
        for r in (
            read_events(spark, sf_dir)
            .select(
                "event_type",
                (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr"),
            )
            .distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    terms = defaultdict(list)
    for r in acf:
        n0 = n0s[r["event_type"]]
        if n0 > r["lag"]:
            terms[r["event_type"]].append(
                int(math.floor((r["acf"] * r["acf"]) / float(n0 - r["lag"]) * 1e12 + 0.5))
            )
    for t, tq in terms.items():
        n0 = n0s[t]
        q = float(n0 * (n0 + 2)) * (float(sum(tq)) / 1e12)
        r = out[t]
        assert r["n_hours"] == n0
        assert r["k_lags"] == len(tq)
        assert r["q_stat"] == q
        assert r["white_noise_rejected"] == (len(tq) == ACF_LAGS and q > LB_CHI2_CRIT)


def test_lorenz_edges_twin_bit_identical(spark, sf_dir):
    """The two-pass-rank edges twin must equal the window form row-for-row
    and BIT-for-bit (same total order, same tie-break, one shared tail)."""
    from kafka_connect_storage_cloud_spark.llm.text_stats import (
        token_lorenz_gini,
        token_lorenz_gini_edges,
    )

    a = sorted(
        token_lorenz_gini(spark, sf_dir).collect(),
        key=lambda r: (r["source"], r["decile"]),
    )
    b = sorted(
        token_lorenz_gini_edges(spark, sf_dir).collect(),
        key=lambda r: (r["source"], r["decile"]),
    )
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra.asDict() == rb.asDict()


def test_r9_late_ops_plan_shape(spark, sf_dir):
    """Frozen plan-shape bounds for the round-9 late operators (the
    formatted plan prints each scan node twice, so the pin is
    2·physical): the checkpoint-fed time-series ops must re-read ZERO
    parquet (their corpus rollup happened at checkpoint build), ks_drift
    is allowed exactly its documented bounds+main pair, the lorenz window
    form exactly one scan, and nothing here may nest-loop except
    dedup_cascade_yield's allowlisted 1-row total combine."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS
    from kafka_connect_storage_cloud_spark.plans import warehouse as WH

    bounds = {
        WH.events_seasonal_median_decompose: 0,
        WH.events_stl_anomaly: 0,
        WH.events_max_burst_window: 0,
        WH.events_mann_kendall: 0,
        WH.events_ljung_box: 0,
        WH.events_acf_profile: 0,
        WH.events_ks_drift: 4,   # bounds agg + main join, column-pruned
        TS.token_lorenz_gini: 2,  # one scan feeds the chained windows
        TS.token_lorenz_gini_edges: 6,  # histogram + pass-2 + totals reads
    }
    for fn, max_scans in bounds.items():
        plan = _plan(spark, fn(spark, sf_dir))
        assert plan.count("Scan parquet") <= max_scans, (fn.__name__, max_scans)
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
