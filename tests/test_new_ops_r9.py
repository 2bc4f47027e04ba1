"""Round-9 inference-batch tests: plan-shape pins + statistical invariants
for plans/inference.py (Mann-Whitney, Pettitt, runs test, Page-Hinkley,
Hurst R/S). Value-level correctness is covered by the oracle-parity sweep;
these pin the physical plan class and the estimator invariants that an
oracle match alone would not catch (both engines could drift together)."""

from kafka_connect_storage_cloud_spark.plans import inference as INF


def _plan(spark, df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_inference_ops_plan_shape(spark, sf_dir):
    """The inference ops consume the localCheckpointed daily/hourly cell
    frame: ZERO parquet re-reads downstream, and none may nest-loop (the
    pair fan-outs are equi-joins on event_type). markov_diversity is the
    one member with its own raw lag scan (pinned in batch6's test)."""
    for name, fn in INF.QUERIES.items():
        if name in ("events_markov_diversity", "drift_ensemble_matrix",
                    "events_qq_drift"):
            continue  # own pinned budgets (lag scan / ks pair / rank pass)
        plan = _plan(spark, fn(spark, sf_dir))
        assert plan.count("Scan parquet") == 0, fn
        assert "BroadcastNestedLoopJoin" not in plan, fn
        assert "CartesianProduct" not in plan, fn


def test_mann_whitney_bounds(spark, sf_dir):
    """2U1 in [0, 2 n1 n2]; z2 >= 0; shift label consistent with z2."""
    rows = INF.events_mann_whitney(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.u2_stat <= 2 * r.n_early * r.n_late
        if r.z2_stat is not None:
            assert r.z2_stat >= 0
            if r.shift != "none":
                assert r.z2_stat > 3.8416


def test_pettitt_k_vs_mann_kendall_s(spark, sf_dir):
    """K <= n(n-1)/2 (it is a max over partial pair sums), the change day
    lies inside the observed range, and u_at_change attains +-K."""
    rows = INF.events_pettitt_change(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_stat <= r.n_days * (r.n_days - 1) // 2
        assert abs(r.u_at_change) == r.k_stat


def test_runs_count_range(spark, sf_dir):
    """1 <= R <= n_above + n_below, and R >= 2 whenever both sides are
    non-empty (at least one transition must exist)."""
    rows = INF.events_runs_test(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 2 <= r.runs <= r.n_above + r.n_below


def test_page_hinkley_alarm_consistency(spark, sf_dir):
    """max_ph is the sup of the alarm statistic: alarms exist iff
    max_ph_micro exceeds lambda; first_alarm_hr null iff no alarms."""
    rows = INF.events_page_hinkley(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_ph_micro >= 0
        if r.n_alarms > 0:
            assert r.max_ph_micro > r.lambda_micro
            assert r.first_alarm_hr is not None
        else:
            assert r.max_ph_micro <= r.lambda_micro
            assert r.first_alarm_hr is None


def test_hurst_rs_scale_monotone(spark, sf_dir):
    """R/S grows with block size for any series (R is a max-minus-min over
    a superset of excursions while S is stable): rs64 > rs8 whenever both
    scales have blocks. The persistence verdict must match the emitted
    integer rule recomputed from the micro averages."""
    rows = INF.events_hurst_rs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.rs8 is not None and r.rs64 is not None:
            assert r.rs64 > r.rs8
            a8, a64 = int(r.rs8 + 0.5), int(r.rs64 + 0.5)
            assert r.persistent == (a64 * a64 > 8 * a8 * a8)


def test_text_batch_plan_shape(spark, sf_small):
    """Batch-2 text ops: readability is a pure projection (one scan);
    boilerplate and GE2 bound their scans (shingle pass / count pass +
    the n_docs or window side); none may nest-loop. (explain('formatted')
    prints each scan node twice, so the pin is 2x physical.)"""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    bounds = {
        TS.doc_readability: 2,
        TS.token_ge2_inequality: 2,
        TS.boilerplate_shingles: 4,   # shingle cells + the n_docs side
        TS.conformal_quality_coverage: 0,  # checkpointed scored frame
    }
    for fn, max_scans in bounds.items():
        plan = _plan(spark, fn(spark, sf_small))
        assert plan.count("Scan parquet") <= max_scans, (fn.__name__, max_scans)
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_readability_bands_split(spark, sf_small):
    """The band label must actually split the corpus (vacuous-flag rule)
    and agree with the emitted fre value at the 90/60/30 cuts."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    rows = TS.doc_readability(spark, sf_small).collect()
    assert len({r.band for r in rows}) >= 2
    for r in rows:
        expect = (
            "easy" if r.fre >= 90 else
            "standard" if r.fre >= 60 else
            "difficult" if r.fre >= 30 else "very_difficult"
        )
        assert r.band == expect, (r.doc_id, r.fre, r.band)


def test_ge2_decomposition_adds_up(spark, sf_small):
    """within + between == total exactly (same integer pieces), all three
    non-negative, and between <= total."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    rows = TS.token_ge2_inequality(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.ge2_total >= 0 and r.ge2_between >= -1e-12 and r.ge2_within >= 0
        assert abs((r.ge2_between + r.ge2_within) - r.ge2_total) < 1e-12
        assert r.ge2_source >= 0


def test_conformal_bound_holds_in_distribution(spark, sf_small):
    """alpha_hat <= 0.1 by construction; flags exist somewhere (the
    threshold is not vacuous) and every flag sits below the threshold."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    rows = TS.conformal_quality_coverage(spark, sf_small).collect()
    assert rows
    assert all(r.alpha_hat <= 0.1 + 1e-12 for r in rows)
    assert any(r.n_flagged > 0 for r in rows) or all(r.k_rank == 0 for r in rows)


def test_ordinal_patterns_bounds(spark, sf_small):
    """Gini-Simpson of a 9-class distribution lies in [0, 8/9]; modal
    share >= 1/n_patterns; window count == present-hours - 2 per type."""
    rows = INF.events_ordinal_patterns(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.gini_simpson <= 8.0 / 9.0 + 1e-12
        assert r.modal_share * r.n_patterns >= 1.0 - 1e-9
        assert 0 <= r.modal_pattern <= 8


def test_batch3_plan_shape(spark, sf_small):
    """xcorr/levene consume the checkpointed cell frames (0 scans);
    skew_salt_plan is one scan + a global metadata window (2x printed).
    No nested loops anywhere."""
    from kafka_connect_storage_cloud_spark.operators import layout as L

    bounds = {
        INF.events_xcorr_lags: 0,
        INF.events_levene_bf: 0,
        L.skew_salt_plan: 2,
    }
    for fn, max_scans in bounds.items():
        plan = _plan(spark, fn(spark, sf_small))
        assert plan.count("Scan parquet") <= max_scans, (fn.__name__, max_scans)
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_xcorr_symmetry_and_best(spark, sf_small):
    """|r| <= 1 (+ rounding headroom); exactly one is_best row per pair;
    lag-0 rows exist for every pair (both series share the hour grid)."""
    rows = INF.events_xcorr_lags(spark, sf_small).collect()
    assert rows
    pairs = {}
    for r in rows:
        assert abs(r.r) <= 1.0 + 1e-9
        pairs.setdefault((r.ta, r.tb), []).append(r)
    for (ta, tb), rs in pairs.items():
        assert sum(1 for r in rs if r.is_best) == 1, (ta, tb)
        assert any(r.lag == 0 for r in rs)


def test_levene_components_nonnegative(spark, sf_small):
    rows = INF.events_levene_bf(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.ssw_scaled > 0
        assert r.k_groups >= 2
        assert r.heteroscedastic == (r.f_stat >= 2.0) or abs(r.f_stat - 2.0) < 1e-9


def test_skew_salt_plan_caps_tasks(spark, sf_small):
    """Every emitted key is genuinely hot (cnt > cap), the salted task
    bound holds (est_task_rows <= cap), and the plan is non-vacuous on
    this corpus."""
    from kafka_connect_storage_cloud_spark.operators import layout as L

    rows = L.skew_salt_plan(spark, sf_small).collect()
    assert rows  # non-vacuous at sf0.001
    for r in rows:
        assert r.cnt > r.cap
        assert r.salt_factor >= 2
        assert r.est_task_rows <= r.cap


def test_batch4_plan_shape(spark, sf_small):
    """Quantile-normalize consumes its checkpointed scored frame (0
    scans); hapax/fano bound one scan (2x printed); no nested loops."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    bounds = {
        TS.quality_quantile_normalize: 0,
        TS.token_hapax_profile: 2,
        INF.events_fano_dispersion: 0,
    }
    for fn, max_scans in bounds.items():
        plan = _plan(spark, fn(spark, sf_small))
        assert plan.count("Scan parquet") <= max_scans, (fn.__name__, max_scans)
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_qqnorm_is_monotone_within_source(spark, sf_small):
    """Quantile mapping must be monotone in the source rank, cover every
    doc exactly once, and the top-ranked doc of each source maps to the
    global maximum (r = n -> k = N)."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    rows = TS.quality_quantile_normalize(spark, sf_small).collect()
    n_docs = sum(1 for _ in rows)
    assert n_docs == len({r.doc_id for r in rows})
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    gmax = max(r.norm_micro for r in rows)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.src_rank)
        for a, b in zip(rs, rs[1:]):
            assert a.norm_micro <= b.norm_micro, src
        assert rs[-1].norm_micro == gmax, src


def test_hapax_and_fano_sanity(spark, sf_small):
    from kafka_connect_storage_cloud_spark.llm import text_stats as TS

    for r in TS.token_hapax_profile(spark, sf_small).collect():
        assert 0 <= r.hapax <= r.vocab and r.vocab <= r.tokens
    verds = {r.verdict for r in INF.events_fano_dispersion(spark, sf_small).collect()}
    assert verds <= {"overdispersed", "underdispersed", "poisson"} and verds


def test_batch5_plan_shape(spark, sf_small):
    """Spectral projection consumes the checkpointed hourly frame (0
    scans); the CMS curve bounds its scans (token stream feeds sketch +
    true counts + probes: the fan-out frames re-read the split, pinned)."""
    from kafka_connect_storage_cloud_spark.llm import sketches as SK

    plan = _plan(spark, INF.events_spectral_power(spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "BroadcastNestedLoopJoin" not in plan
    plan = _plan(spark, SK.cms_error_curve(spark, sf_small))
    assert plan.count("Scan parquet") <= 6
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_curve_monotone_in_width(spark, sf_small):
    """Collision inflation must not increase when the width doubles
    (same rows, strictly coarser buckets merged): total_inflation is
    non-increasing in width, and inflation is never negative."""
    from kafka_connect_storage_cloud_spark.llm import sketches as SK

    rows = {r.width: r for r in SK.cms_error_curve(spark, sf_small).collect()}
    assert set(rows) == set(SK.CMS_CURVE_WIDTHS)
    widths = sorted(rows)
    for w in widths:
        assert rows[w].total_inflation >= 0
        assert rows[w].max_inflation >= 0
    for a, b in zip(widths, widths[1:]):
        assert rows[b].total_inflation <= rows[a].total_inflation, (a, b)


def test_spectral_power_tables_and_bounds(spark, sf_small):
    """Trig tables: cos^2+sin^2 == 1e12 within quantization; amplitude
    is non-negative and bounded by twice the max hourly count."""
    for p in INF.SPECTRAL_PERIODS:
        for c, s in zip(INF._COS_T[p], INF._SIN_T[p]):
            assert abs(c * c + s * s - 10**12) < 3e6, p
    rows = INF.events_spectral_power(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.power24 >= 0 and r.power168 >= 0
        assert r.amp24 >= 0 and r.amp168 >= 0


def test_batch6_plan_shape(spark, sf_small):
    """Ensemble reuses member plans (checkpoint-fed: 0 scans); markov
    diversity pays its one lag scan; shard balance reads the manifest
    pack's one scan. No nested loops."""
    from kafka_connect_storage_cloud_spark.llm import corpus as CO

    bounds = {
        INF.anomaly_ensemble_agreement: 0,
        INF.events_markov_diversity: 2,
        CO.shard_balance_audit: 2,
    }
    for fn, max_scans in bounds.items():
        plan = _plan(spark, fn(spark, sf_small))
        assert plan.count("Scan parquet") <= max_scans, (fn.__name__, max_scans)
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_ensemble_agreement_invariants(spark, sf_small):
    """Set algebra must hold: all3 <= each pairwise <= each single <=
    any <= n_hours; every Jaccard in [0, 1]."""
    rows = INF.anomaly_ensemble_agreement(spark, sf_small).collect()
    assert rows
    for r in rows:
        singles = (r.n_gmad, r.n_hampel, r.n_stl)
        assert r.n_all3 <= min(singles) if min(singles) >= 0 else True
        assert max(singles) <= r.n_any <= r.n_hours
        for j in (r.j_gmad_hampel, r.j_gmad_stl, r.j_hampel_stl, r.consensus_share):
            if j is not None:
                assert 0 <= j <= 1


def test_markov_diversity_and_shard_balance(spark, sf_small):
    from kafka_connect_storage_cloud_spark.llm import corpus as CO

    for r in INF.events_markov_diversity(spark, sf_small).collect():
        assert 0 <= r.gini_simpson < 1
        assert 0 <= r.self_loop_p <= 1
        assert r.modal_share * r.n_next_states >= 1.0 - 1e-9
    for r in CO.shard_balance_audit(spark, sf_small).collect():
        assert r.min_shard_tokens <= r.mean_shard_tokens <= r.max_shard_tokens
        assert r.imbalance >= 1.0 - 1e-9
        assert r.cv2 >= 0


def test_drift_matrix_votes_consistent(spark, sf_small):
    """n_votes recomputes from the five verdict booleans; the matrix
    inherits only ks_drift's documented bounds+main pair (4 printed),
    everything else checkpoint-fed; no nested loops; one row per type."""
    df = INF.drift_ensemble_matrix(spark, sf_small)
    plan = _plan(spark, df)
    assert plan.count("Scan parquet") <= 4
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows and len(rows) == len({r.event_type for r in rows})
    for r in rows:
        assert r.n_votes == sum(
            int(v) for v in (r.v_ks, r.v_mw, r.v_pettitt, r.v_ph, r.v_mk)
        )
        assert 0 <= r.n_votes <= 5


def test_ph_episodes_and_qq_drift(spark, sf_small):
    """Episodes partition the alarm hours (sum of lengths == alarm_hours,
    longest <= alarm_hours); episode counts reconcile with the parent
    op's n_alarms. QQ deciles are monotone within each half and exactly
    one is_max_gap per type. Both checkpoint-fed (<= 1 physical scan for
    the rank pass)."""
    ph = {r.event_type: r for r in INF.events_page_hinkley(spark, sf_small).collect()}
    for r in INF.events_ph_episodes(spark, sf_small).collect():
        assert r.longest_episode <= r.alarm_hours
        assert r.n_episodes >= 1
        assert ph[r.event_type].n_alarms == r.alarm_hours
    rows = INF.events_qq_drift(spark, sf_small).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.decile)
        for a, b in zip(rs, rs[1:]):
            assert a.v_early <= b.v_early and a.v_late <= b.v_late, t
        assert sum(1 for r in rs if r.is_max_gap) == 1, t
    plan = _plan(spark, INF.events_ph_episodes(spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "BroadcastNestedLoopJoin" not in plan
    plan = _plan(spark, INF.events_qq_drift(spark, sf_small))
    assert plan.count("Scan parquet") <= 4
    assert "BroadcastNestedLoopJoin" not in plan


# --- session-3 batch A: randomness triptych completions -------------------


def _daily_series(spark, sf_dir):
    rows = INF._daily(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.x, r.y))
    return {t: [y for _, y in sorted(v)] for t, v in by_type.items()}


def test_von_neumann_recompute(spark, sf_dir):
    """Exact integer recompute of VN per type from the collected daily
    series — the ratio is ONE division of two int64s, so the Python
    float(num)/float(den) must match bit-for-bit."""
    series = _daily_series(spark, sf_dir)
    rows = {r.event_type: r for r in INF.events_von_neumann(spark, sf_dir).collect()}
    assert rows
    for t, ys in series.items():
        n, s, q = len(ys), sum(ys), sum(y * y for y in ys)
        sd2 = sum((b - a) ** 2 for a, b in zip(ys, ys[1:]))
        if n < 3 or n * q <= s * s:
            assert t not in rows
            continue
        a, b = n * n * sd2, (n - 1) * (n * q - s * s)
        assert rows[t].sum_d2 == sd2
        assert rows[t].vn_ratio == float(a) / float(b)
        assert rows[t].z2_stat >= 0


def test_turning_points_recompute(spark, sf_dir):
    """Brute-force strict local-extrema count matches, and T <= n-2."""
    series = _daily_series(spark, sf_dir)
    rows = {r.event_type: r for r in INF.events_turning_points(spark, sf_dir).collect()}
    assert rows
    for t, ys in series.items():
        if len(ys) < 3:
            continue
        tp = sum(
            1
            for i in range(1, len(ys) - 1)
            if (ys[i] > ys[i - 1] and ys[i] > ys[i + 1])
            or (ys[i] < ys[i - 1] and ys[i] < ys[i + 1])
        )
        assert rows[t].n_turning == tp
        assert tp <= len(ys) - 2


def test_cox_stuart_recompute(spark, sf_dir):
    """Brute-force paired-half sign counts match; m <= n div 2."""
    series = _daily_series(spark, sf_dir)
    rows = {r.event_type: r for r in INF.events_cox_stuart(spark, sf_dir).collect()}
    assert rows
    for t, ys in series.items():
        n = len(ys)
        h = (n + 1) // 2
        sp = sum(1 for i in range(n // 2) if ys[i + h] > ys[i])
        sm = sum(1 for i in range(n // 2) if ys[i + h] < ys[i])
        assert (rows[t].s_plus, rows[t].s_minus) == (sp, sm)
        assert sp + sm <= n // 2


# --- session-3 batch B: VR(q), windowed RQA, seasonality strength ---------


def test_variance_ratio_recompute(spark, sf_dir):
    """Brute-force float recompute of VR(q) from the collected series via
    the SAME integer forms (one division), plus domain bounds."""
    series = _daily_series(spark, sf_dir)
    rows = INF.events_variance_ratio(spark, sf_dir).collect()
    assert rows
    got = {(r.event_type, r.q): r for r in rows}
    for t, ys in series.items():
        n = len(ys)
        m = n - 1
        tt = ys[-1] - ys[0]
        sd2 = sum((b - a) ** 2 for a, b in zip(ys, ys[1:]))
        v1 = m * sd2 - tt * tt
        for q in INF.VR_QS:
            if m < q + 1 or v1 <= 0:
                assert (t, q) not in got
                continue
            dqs = [ys[i] - ys[i - q] for i in range(q, n)]
            mq = len(dqs)
            vq = (
                m * m * sum(d * d for d in dqs)
                - 2 * q * tt * m * sum(dqs)
                + mq * q * q * tt * tt
            )
            r = got[(t, q)]
            assert r.n_diffs == mq
            assert r.vr == float(vq) / float(mq * q * v1)
            assert r.z2_stat >= 0


def test_recurrence_quant_invariants(spark, sf_dir):
    """Pair-set size is the exact windowed count, det <= 1, lmax
    consistent with n_rec, and a brute-force recount of the recurrent
    pairs from the collected series."""
    series = _daily_series(spark, sf_dir)
    rows = {r.event_type: r for r in INF.events_recurrence_quant(spark, sf_dir).collect()}
    assert rows
    import statistics

    for t, ys in series.items():
        n = len(ys)
        w = INF.RQA_WINDOW
        expect_pairs = sum(min(w, n - 1 - i) for i in range(n))
        r = rows[t]
        assert r.n_pairs == expect_pairs
        med2 = int(statistics.median(ys) * 2)
        mad4 = int(statistics.median([abs(2 * y - med2) for y in ys]) * 2)
        nrec = sum(
            1
            for i in range(n)
            for j in range(i + 1, min(n, i + w + 1))
            if 4 * abs(ys[i] - ys[j]) <= mad4
        )
        assert r.n_rec == nrec
        if r.det is not None:
            assert 0.0 <= r.det <= 1.0
        assert (r.lmax == 0) == (r.n_rec == 0)


def test_seasonality_strength_bounds(spark, sf_dir):
    """Strengths live in [0, 1]; the character label is consistent with
    the 0.64 cut on the emitted doubles (cross-check of the int64 rule)."""
    from kafka_connect_storage_cloud_spark.plans import warehouse as WH

    rows = WH.events_seasonality_strength(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.seasonal_strength <= 1.0
        assert 0.0 <= r.trend_strength <= 1.0
        want_s = r.seasonal_strength > 0.64
        want_t = r.trend_strength > 0.64
        label = {
            (True, True): "seasonal+trend",
            (True, False): "seasonal",
            (False, True): "trend",
            (False, False): "neither",
        }[(want_s, want_t)]
        assert r.character == label


# --- session-3 batch C: term burstiness + reliability bins ----------------


def test_term_burstiness_invariants(spark, sf_dir):
    """b >= 1 for every term (tf >= dfs), shares in [0,1], mass share >=
    vocab share only when bursty terms are heavier than average — checked
    against a direct recompute of one source."""
    from kafka_connect_storage_cloud_spark.llm import text_stats as TSX

    rows = TSX.term_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.vocab_share_bursty <= 1.0
        assert 0.0 <= r.mass_share_bursty <= 1.0
        assert r.n_bursty <= r.n_terms
        if r.top_burstiness is not None:
            assert r.top_burstiness >= 1.0


def test_term_burstiness_single_source_recount(spark, sf_dir):
    """Exact recount of tf/dfs/bursty for the lexicographically first
    source via a driver-side pass over its docs."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.llm import text_stats as TSX
    from kafka_connect_storage_cloud_spark.session import read_table

    src = (
        read_table(spark, sf_dir, "documents")
        .selectExpr("min(source) AS s")
        .collect()[0]
        .s
    )
    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("source") == src)
        .select("doc_id", "text")
        .collect()
    )
    tf, docsets = Counter(), defaultdict(set)
    import re

    for d in docs:
        for w in re.split(r"\s+", d.text.lower()):
            if w:
                tf[w] += 1
                docsets[w].add(d.doc_id)
    n_bursty = sum(1 for w in tf if tf[w] > 2 * len(docsets[w]))
    mass_bursty = sum(tf[w] for w in tf if tf[w] > 2 * len(docsets[w]))
    row = [
        r for r in TSX.term_burstiness(spark, sf_dir).collect() if r.source == src
    ][0]
    assert row.n_terms == len(tf)
    assert row.n_bursty == n_bursty
    assert row.mass_share_bursty == float(mass_bursty) / float(sum(tf.values()))


def test_reliability_bins_identities(spark, sf_dir):
    """Bin totals add to the corpus, pass counts bound by bin size, ece
    equals the hand-rolled weighted micro-gap mean, and mean_quality sits
    inside its bin's value range."""
    from kafka_connect_storage_cloud_spark.llm import quality as LQ
    from kafka_connect_storage_cloud_spark.session import read_table

    rows = LQ.quality_reliability_bins(spark, sf_dir).collect()
    assert rows
    n_total = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_total
    ece_num = 0
    for r in rows:
        assert 0 <= r.n_pass <= r.n_docs
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 + (0.1 if r.bin == 9 else 0)
        assert lo <= r.mean_quality <= hi + 1e-9
        conf_mic = None  # recompute gap from emitted doubles is lossy; use bounds
        assert abs(r.gap - (r.pass_rate - r.mean_quality)) < 2e-6
        ece_num += r.n_docs * abs(r.gap)
    # micro-quantized ECE within one micro-unit per bin of the float form
    assert abs(rows[0].ece - ece_num / n_total) < len(rows) * 1e-6
    assert len({r.ece for r in rows}) == 1


def test_batch_c_plan_scan_budget(spark, sf_dir):
    """term_burstiness is ONE physical corpus scan; reliability bins is
    TWO (the quality_score and gopher projections it composes) — each
    'Scan parquet' appears twice in formatted plans (tree + detail)."""
    from kafka_connect_storage_cloud_spark.llm import quality as LQ
    from kafka_connect_storage_cloud_spark.llm import text_stats as TSX

    p1 = _plan(spark, TSX.term_burstiness(spark, sf_dir))
    assert p1.count("Scan parquet") == 2 and "BroadcastNestedLoopJoin" not in p1
    p2 = _plan(spark, LQ.quality_reliability_bins(spark, sf_dir))
    assert p2.count("Scan parquet") == 4 and "BroadcastNestedLoopJoin" not in p2


# --- session-3 batch D: assortativity, DP sensitivity, pruning matrix -----


def test_assortativity_recompute(spark, sf_dir):
    """Recompute Newman r from the collected mutual edge list via the
    same incidence-sum identity; degrees bounded by k."""
    from collections import Counter

    from kafka_connect_storage_cloud_spark.llm import similarity as LS

    edges = [
        (r.vec_a, r.vec_b)
        for r in LS.knn_graph_mutual_gold(spark, sf_dir).collect()
    ]
    row = LS.knn_degree_assortativity(spark, sf_dir).collect()
    if not edges:
        assert row == []
        return
    row = row[0]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= LS.KNN_K
    n_inc = 2 * len(edges)
    s = sum(d * d for d in deg.values())
    sq = sum(d * d * d for d in deg.values())
    sxy = 2 * sum(deg[a] * deg[b] for a, b in edges)
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(edges)
    den = n_inc * sq - s * s
    if den > 0:
        assert row.assortativity == float(n_inc * sxy - s * s) / float(den)
        assert -1.0 - 1e-12 <= row.assortativity <= 1.0 + 1e-12


def test_dp_sensitivity_bounds(spark, sf_dir):
    """L-infinity <= L1, breadth x cell-cap >= L1, share in (0, 1],
    p95 <= max."""
    from kafka_connect_storage_cloud_spark.plans import events_ext as EXX

    rows = EXX.dp_sensitivity_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_user_day_rows <= r.max_user_rows
        assert r.max_user_rows <= r.max_user_days * r.max_user_day_rows
        assert 0 < r.top_user_share <= 1.0
        assert r.p95_user_rows <= r.max_user_rows


def test_partition_pruning_matrix_laws(spark, sf_dir):
    """Every layout/predicate cell obeys the pruning laws: matching <=
    scanned <= total rows, scanned partitions <= partitions, a layout
    without the predicate column scans EVERYTHING, and the combined
    predicate's type_daily cell is the minimum scan fraction."""
    from kafka_connect_storage_cloud_spark.plans import temporal as TPX

    rows = TPX.partition_pruning_matrix(spark, sf_dir).collect()
    assert len(rows) == len(TPX.PRUNE_LAYOUTS) * len(TPX.PRUNE_PREDS)
    cell = {(r.layout, r.predicate): r for r in rows}
    for r in rows:
        assert r.rows_matching <= r.rows_scanned <= r.rows_total
        assert r.n_scanned <= r.n_partitions
    assert cell[("type", "day_range")].rows_scanned == cell[("type", "day_range")].rows_total
    assert cell[("daily", "one_type")].rows_scanned == cell[("daily", "one_type")].rows_total
    best = min(r.scan_fraction for r in rows if r.predicate == "type_and_range")
    assert cell[("type_daily", "type_and_range")].scan_fraction == best


# --- session-3 batch F: cluster silhouette ---------------------------------


def test_cluster_silhouette_reconciles_with_cell_profile(spark, sf_dir):
    """The silhouette score pass must reproduce the assignment exactly:
    (cell, n_members) == semdedup_cell_profile row-for-row, members add
    to the corpus, and every silhouette lives in [-1, 1]."""
    from kafka_connect_storage_cloud_spark.llm import pipeline as LP
    from kafka_connect_storage_cloud_spark.session import read_table

    sil = {r.cell: r for r in LP.cluster_silhouette(spark, sf_dir).collect()}
    prof = {r.cell: r for r in LP.semdedup_cell_profile(spark, sf_dir).collect()}
    assert set(sil) == set(prof)
    for c, r in sil.items():
        assert r.n_members == prof[c].n_members
        assert r.n_scored <= r.n_members
        if r.mean_sil is not None:
            assert -1.0 - 1e-9 <= r.min_sil <= r.mean_sil <= 1.0 + 1e-9
            assert 0.0 <= r.share_negative <= 1.0
    n = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in sil.values()) == n


def test_broadcast_size_audit_model(spark, sf_dir):
    """Byte model recomputed for region (tiny) driver-side; dimension
    tables are broadcastable; flags consistent with the emitted bytes."""
    from kafka_connect_storage_cloud_spark.plans import warehouse as WH
    from kafka_connect_storage_cloud_spark.session import read_table

    rows = {r.table_name: r for r in WH.broadcast_size_audit(spark, sf_dir).collect()}
    assert set(rows) == set(WH._BCAST_TABLES)
    reg = read_table(spark, sf_dir, "region").collect()
    exp = sum(4 + (len(r.r_name) if r.r_name else 0) + 4 for r in reg)
    assert rows["region"].data_bytes == exp
    for r in rows.values():
        assert r.broadcastable == (r.data_bytes <= WH.BCAST_THRESHOLD)
        assert r.join_strategy == ("broadcast" if r.broadcastable else "shuffle")
        assert r.scan_partitions >= 1
    assert rows["region"].broadcastable and rows["nation"].broadcastable


# --- session-3 batch I: peak-hour stability, burstiness plane, cadence ----


def test_peak_hour_stability_bounds(spark, sf_dir):
    """Stability in (0,1], circular distance in [0,12], modal hour in
    [0,23]; stability 1.0 forces zero mean distance."""
    from kafka_connect_storage_cloud_spark.plans import events_ext as EXX

    rows = EXX.events_peak_hour_stability(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.modal_peak_hour <= 23
        assert 0 < r.stability <= 1.0
        assert 0.0 <= r.mean_circ_dist <= 12.0
        if r.stability == 1.0:
            assert r.mean_circ_dist == 0.0


def test_burstiness_index_recompute(spark, sf_dir):
    """B and M recomputed from the collected minute gaps via the same
    moment forms; B in (-1, 1), M in [-1, 1]."""
    import math
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans import events_ext as EXX
    from kafka_connect_storage_cloud_spark.session import read_events

    ev = (
        read_events(spark, sf_dir)
        .selectExpr("user_id", "event_type", "unix_millis(ts) AS ms", "event_id")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[(r.user_id, r.event_type)].append((r.ms, r.event_id))
    gaps = defaultdict(list)
    for (u, t), evs in streams.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            gaps[t].append((b[0] - a[0]) // 60000)
    rows = {r.event_type: r for r in EXX.events_burstiness_index(spark, sf_dir).collect()}
    for t, gs in gaps.items():
        n, s, q = len(gs), sum(gs), sum(g * g for g in gs)
        if s <= 0:
            continue
        r = rows[t]
        assert r.n_gaps == n
        sq = math.sqrt(float(n * q - s * s))
        assert r.burstiness == (sq - float(s)) / (sq + float(s))
        assert -1.0 < r.burstiness < 1.0
        if r.memory_coef is not None:
            assert -1.0 - 1e-9 <= r.memory_coef <= 1.0 + 1e-9


def test_customer_interpurchase_sane(spark, sf_dir):
    """Gap stats are ordered (p50 <= p90 <= max), positive counts, and
    total gaps = orders - customers-with-orders."""
    from kafka_connect_storage_cloud_spark.plans import warehouse as WH
    from kafka_connect_storage_cloud_spark.session import read_table

    rows = WH.customer_interpurchase(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert r.p50_gap_days <= r.p90_gap_days <= r.max_gap_days
        assert 0 <= r.mean_gap_days
    orders = read_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust


# --- session-3 batch J: winnowing tuning + completeness audit -------------


def test_winnow_tuning_laws(spark, sf_dir):
    """Density falls with W, ratio >= 1 on a repeat-free random corpus is
    NOT guaranteed — but fps <= windows always, the W=WINNOW_W row's
    totals must reconcile with the production fingerprint table, and
    theory = 2/(W+1) exactly."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.llm import dedup as LDX

    rows = {r.w: r for r in LDX.winnowing_window_tuning(spark, sf_dir).collect()}
    assert set(rows) == set(LDX.WINNOW_TUNE_WS)
    ws = sorted(rows)
    for a, b in zip(ws, ws[1:]):
        assert rows[a].density > rows[b].density
    for r in rows.values():
        assert r.n_fps <= r.n_windows
        assert r.theory_density == 2.0 / (r.w + 1)
    prod = (
        LDX._winnow_fps_from_ws(
            LDX._docs_ws(spark, sf_dir)
        )
        .groupBy("doc_id")
        .count()
        .agg(F.sum("count").alias("fps"), F.count(F.lit(1)).alias("docs"))
        .collect()[0]
    )
    w = LDX.WINNOW_W
    assert rows[w].n_fps == prod.fps
    assert rows[w].n_docs == prod.docs


def test_completeness_audit_identities(spark, sf_dir):
    """present + missing == span, completeness in (0,1], longest gap <=
    missing, and a type with zero missing has zero longest gap."""
    from kafka_connect_storage_cloud_spark.plans import events_ext as EXX

    rows = EXX.events_completeness_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_present + r.n_missing == r.n_hours_span
        assert 0 < r.completeness <= 1.0
        assert r.longest_gap_hours <= max(r.n_missing, 0) or r.n_missing == 0
        if r.n_missing == 0:
            assert r.longest_gap_hours == 0
        else:
            assert r.longest_gap_hours >= 1


def test_type_affinity_identities(spark, sf_dir):
    """All C(|types|,2) pairs present on this corpus, jaccard <= both
    confidences, n_ab <= min(n_a, n_b), and a brute-force recount of one
    pair from the distinct cell sets."""
    from collections import defaultdict

    from kafka_connect_storage_cloud_spark.plans import events_ext as EXX
    from kafka_connect_storage_cloud_spark.session import read_events

    rows = EXX.events_type_affinity(spark, sf_dir).collect()
    types = set()
    for r in rows:
        types.add(r.type_a)
        types.add(r.type_b)
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.jaccard <= min(r.conf_a_to_b, r.conf_b_to_a) + 1e-12
    assert len(rows) == len(types) * (len(types) - 1) // 2
    ev = (
        read_events(spark, sf_dir)
        .selectExpr("user_id", "unix_millis(ts) div 3600000 AS hr", "event_type")
        .collect()
    )
    cells = defaultdict(set)
    for r in ev:
        cells[(r.user_id, r.hr)].add(r.event_type)
    a, b = rows[0].type_a, rows[0].type_b
    n_ab = sum(1 for s in cells.values() if a in s and b in s)
    assert rows[0].n_ab == n_ab


# --- session-3 batch L: TwoNN ratio profile + priority mix drift ----------


def test_twonn_ratio_profile(spark, sf_dir):
    """mu >= 1 by construction (c2 <= c1 in the top-2), quartiles
    ordered, share in [0,1], and a brute-force recompute of the median
    from the collected top-2 cosines."""
    import math

    from kafka_connect_storage_cloud_spark.llm import similarity as LS

    rows = LS.intrinsic_dim_twonn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 1.0 <= r.p25_ratio <= r.p50_ratio <= r.p75_ratio
    assert 0.0 <= r.share_ratio_gt_1_5 <= 1.0
    n = LS.table_count(spark, sf_dir, "embeddings")
    mod = None if n <= LS.KNN_GOLD_FULL_MAX else LS.AUDIT_SAMPLE_MOD
    edges = LS._knn_topk_edges(spark, sf_dir, 2, src_sample_mod=mod).collect()
    per = {}
    for e in edges:
        per.setdefault(e.src, {})[e.rank] = e.cosine
    mus = sorted(
        int(math.floor(math.sqrt((1 - d[2]) / (1 - d[1])) * 1e6 + 0.5))
        for d in per.values()
        if 2 in d and d[1] < 1
    )
    assert r.n_queries == len(mus)
    import statistics

    assert r.p50_ratio == statistics.median(mus) / 1e6


def test_priority_mix_drift_identities(spark, sf_dir):
    """Shares sum to 1 on each side, chi2_total equals the quantized term
    sum, the verdict matches the emitted total against 9.4877, and the
    synthetic order book (uniform priority mix) must NOT drift."""
    from kafka_connect_storage_cloud_spark.plans import warehouse as WH

    rows = WH.orders_priority_mix_drift(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share_early for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_late for r in rows) - 1.0) < 1e-9
    total = rows[0].chi2_total
    assert all(r.chi2_total == total for r in rows)
    q = sum(int(r.chi2_term * 1e9 + 0.5) for r in rows)
    assert abs(total - q / 1e9) < len(rows) * 1e-9
    for r in rows:
        assert r.drifted == (10000 * round(total * 1e9) > 94877 * 10**9)


def test_watermark_advisor_identities(spark, sf_dir):
    """Monotone: a longer delay never drops more; totals constant across
    delays; drop counts reconcile with a direct lateness recount at the
    smallest delay; shares consistent with counts."""
    from kafka_connect_storage_cloud_spark.plans import cdc as CDX

    rows = sorted(
        CDX.watermark_advisor(spark, sf_dir).collect(), key=lambda r: r.delay_ms
    )
    assert [r.delay_ms for r in rows] == sorted(CDX.WATERMARK_DELAYS_MS)
    assert len({r.n_records for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_dropped >= b.n_dropped
    lat = CDX._lateness(spark, sf_dir).collect()
    d0 = CDX.WATERMARK_DELAYS_MS[0]
    assert rows[0].n_dropped == sum(1 for r in lat if r.lateness_ms > d0)
    for r in rows:
        assert r.drop_share == r.n_dropped / r.n_records
        assert 0.0 <= r.worst_partition_drop_share <= 1.0
