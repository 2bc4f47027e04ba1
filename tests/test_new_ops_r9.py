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
    """All five inference ops consume the localCheckpointed daily/hourly
    cell frame: ZERO parquet re-reads downstream, and none may
    nest-loop (the pair fan-outs are equi-joins on event_type)."""
    for fn in INF.QUERIES.values():
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
