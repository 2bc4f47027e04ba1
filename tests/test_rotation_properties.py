"""Property-based rotation invariants (hypothesis): for arbitrary offset /
timestamp / encoded-partition streams, every policy must
  (a) assign each record to exactly one file,
  (b) name files by their true minimum offset,
  (c) respect the policy's boundary rule,
  (d) keep a file's offsets contiguous within its group ordering.
The reference asserts these per hand-built case (TopicPartitionWriterTest);
hypothesis walks the input space instead.

Spark round-trips per example are slow, so the generated streams run
through the same pure-pandas reference model used to cross-check the
Spark implementation on a handful of drawn samples.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_connect_storage_cloud_spark.operators import rotation as R

# one stream: list of (offset_gap, ts_step_ms, enc) — gaps/steps keep the
# generated offsets strictly increasing and timestamps non-decreasing
_stream = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=3_600_000),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=40,
)


def _materialize(steps):
    rows = []
    off, ts = 0, 0
    for gap, step, enc in steps:
        off += gap
        ts += step
        rows.append((off, ts, enc))
    return rows


def _model_flush(rows, flush_size):
    """Reference model for flush.size: chunk per (enc) in offset order."""
    files = {}
    counters = {}
    for off, _ts, enc in sorted(rows):
        n, start = counters.get(enc, (0, None))
        if n % flush_size == 0:
            start = off
        counters[enc] = (n + 1, start)
        files.setdefault((enc, start), []).append(off)
    return files


def _model_interval(rows, interval_ms):
    """Reference model for rotate.interval.ms base-reset semantics."""
    files = {}
    state = {}
    for off, ts, enc in sorted(rows):
        base, start = state.get(enc, (None, None))
        if base is None or ts - base >= interval_ms:
            base, start = ts, off
        state[enc] = (base, start)
        files.setdefault((enc, start), []).append(off)
    return files


@given(_stream, st.integers(min_value=1, max_value=7))
def test_flush_model_invariants(steps, flush_size):
    rows = _materialize(steps)
    files = _model_flush(rows, flush_size)
    all_offsets = sorted(o for offs in files.values() for o in offs)
    assert all_offsets == sorted(o for o, _, _ in rows)  # partition of input
    for (enc, start), offs in files.items():
        assert min(offs) == start  # named by true min offset
        assert len(offs) <= flush_size  # boundary rule
        # contiguity within the enc's offset order
        enc_offs = sorted(o for o, _, e in rows if e == enc)
        lo, hi = enc_offs.index(min(offs)), enc_offs.index(max(offs))
        assert enc_offs[lo : hi + 1] == sorted(offs)


@given(_stream, st.integers(min_value=1, max_value=7_200_000))
def test_interval_model_invariants(steps, interval_ms):
    rows = _materialize(steps)
    files = _model_interval(rows, interval_ms)
    all_offsets = sorted(o for offs in files.values() for o in offs)
    assert all_offsets == sorted(o for o, _, _ in rows)
    ts_of = {o: t for o, t, _ in rows}
    for (enc, start), offs in files.items():
        assert min(offs) == start
        base = ts_of[start]
        for o in offs:
            assert ts_of[o] - base < interval_ms  # span bound


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_stream, st.integers(min_value=1, max_value=5))
def test_spark_flush_matches_model(spark, steps, flush_size):
    rows = _materialize(steps)
    df = spark.createDataFrame(
        [("t", 0, o, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=t), e) for o, t, e in rows],
        "topic string, kafka_partition int, offset long, timestamp timestamp, encoded_partition string",
    )
    got = {}
    for r in R.assign_files_flush_size(df, flush_size).collect():
        got.setdefault((r["encoded_partition"], r["file_start_offset"]), []).append(r["offset"])
    model = _model_flush(rows, flush_size)
    assert {k: sorted(v) for k, v in got.items()} == {k: sorted(v) for k, v in model.items()}


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_stream, st.sampled_from([1, 60_000, 3_600_000]))
def test_spark_interval_matches_model(spark, steps, interval_ms):
    rows = _materialize(steps)
    df = spark.createDataFrame(
        [("t", 0, o, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=t), e) for o, t, e in rows],
        "topic string, kafka_partition int, offset long, timestamp timestamp, encoded_partition string",
    )
    got = {}
    for r in R.assign_files_rotate_interval(df, interval_ms).collect():
        got.setdefault((r["encoded_partition"], r["file_start_offset"]), []).append(r["offset"])
    model = _model_interval(rows, interval_ms)
    assert {k: sorted(v) for k, v in got.items()} == {k: sorted(v) for k, v in model.items()}
