"""Property-based SCD2 invariants (hypothesis): for arbitrary keyed
attribute streams the Type-2 build must
  (a) number versions contiguously from 1 per key,
  (b) chain intervals exactly (valid_to == next valid_from; last open),
  (c) conserve records (sum of n_collapsed == records per key),
  (d) never emit two consecutive versions with the same attribute,
and the as-of snapshot must equal the version whose interval covers T.

Same structure as test_rotation_properties: hypothesis walks a pure-python
reference model's input space; the Spark implementation is cross-checked
against the model on drawn samples (Spark per-example is too slow for
hypothesis itself).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

_stream = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # key
        st.integers(min_value=0, max_value=10_000),     # ts step (s)
        st.sampled_from(["x", "y", "z"]),               # attribute value
    ),
    min_size=1,
    max_size=50,
)

_EPOCH = dt.datetime(2024, 1, 1)


def _materialize(steps):
    rows, ts = [], 0
    for i, (key, step, attr) in enumerate(steps):
        ts += step
        rows.append((key, _EPOCH + dt.timedelta(seconds=ts), i, attr))
    return rows


def _model_scd2(rows):
    """Reference model: per key ordered by (ts, id), collapse consecutive
    identical attrs into versions with [valid_from, valid_to)."""
    by_key = {}
    for key, ts, rid, attr in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        vs = by_key.setdefault(key, [])
        if vs and vs[-1]["attr"] == attr:
            vs[-1]["n"] += 1
        else:
            vs.append({"version": len(vs) + 1, "attr": attr, "from": ts, "n": 1})
    for vs in by_key.values():
        for i, v in enumerate(vs):
            v["to"] = vs[i + 1]["from"] if i + 1 < len(vs) else None
    return by_key


@given(_stream)
@settings(max_examples=200, deadline=None)
def test_model_invariants(steps):
    rows = _materialize(steps)
    hist = _model_scd2(rows)
    per_key_counts = {}
    for key, *_ in rows:
        per_key_counts[key] = per_key_counts.get(key, 0) + 1
    for key, vs in hist.items():
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v["n"] for v in vs) == per_key_counts[key]
        for a, b in zip(vs, vs[1:]):
            assert a["to"] == b["from"]
            assert a["attr"] != b["attr"]
            assert a["from"] <= b["from"]
        assert vs[-1]["to"] is None


@given(_stream, st.integers(min_value=0, max_value=500_000))
@settings(max_examples=200, deadline=None)
def test_model_snapshot_is_interval_lookup(steps, t_s):
    rows = _materialize(steps)
    hist = _model_scd2(rows)
    t = _EPOCH + dt.timedelta(seconds=t_s)
    for key, vs in hist.items():
        covering = [
            v for v in vs if v["from"] <= t and (v["to"] is None or t < v["to"])
        ]
        started = [v for v in vs if v["from"] <= t]
        if started:
            assert len(covering) == 1
            assert covering[0] is started[-1]
        else:
            assert not covering


def test_spark_scd2_matches_model_on_samples(spark):
    """Cross-check the Spark implementation against the model on drawn
    pseudo-random streams (deterministic seeds)."""
    import random

    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.plans.cdc import scd2_history

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        steps = [
            (rng.randint(1, 4), rng.randint(0, 9000), rng.choice("xyz"))
            for _ in range(rng.randint(5, 60))
        ]
        rows = _materialize(steps)
        df = spark.createDataFrame(
            [(k, ts, rid, a) for k, ts, rid, a in rows],
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        # drive the same plan through a temp parquet dir so scd2_history's
        # read path stays untouched: instead, inline its logic via the
        # module's internal change-detect on a substituted frame
        import kafka_connect_storage_cloud_spark.plans.cdc as cdc

        orig = cdc.read_events
        try:
            cdc.read_events = lambda _spark, _sf: df
            got = {
                (r["user_id"], r["version"]): (
                    r["attr"],
                    r["valid_from"],
                    r["valid_to"],
                    r["n_collapsed"],
                )
                for r in scd2_history(spark, "ignored").collect()
            }
        finally:
            cdc.read_events = orig
        model = _model_scd2(rows)
        want = {
            (key, v["version"]): (v["attr"], v["from"], v["to"], v["n"])
            for key, vs in model.items()
            for v in vs
        }
        assert got == want, f"seed {seed}"
