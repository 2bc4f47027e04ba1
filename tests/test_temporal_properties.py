"""Property-based invariants for the temporal operators (hypothesis).

- as-of join: for arbitrary event streams, every purchase's matched view is
  the true latest view at-or-before it (brute-force model), and unmatched
  purchases truly have no prior view.
- substring span merge: merged spans are disjoint, non-adjacent, ordered,
  and their union exactly covers the flagged windows (interval-union model).
- log compaction: the survivor per key is the true max-offset non-tombstone
  latest record.

Like the rotation properties, examples run through pure-Python reference
models; Spark parity is covered by the oracle gate, so hypothesis explores
the input space cheaply here.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=1000),  # ts
        st.sampled_from(["view", "purchase"]),
    ),
    min_size=1,
    max_size=60,
)


def _asof_model(rows):
    """rows: (event_id, user, ts, type). For each purchase: latest view with
    (ts, is_purchase=0, event_id) sort-order <= the purchase's position."""
    out = {}
    for eid, user, ts, typ in rows:
        if typ != "purchase":
            continue
        cands = [
            (vts, vid)
            for vid, vuser, vts, vtyp in rows
            if vtyp == "view" and vuser == user and (vts, 0, vid) < (ts, 1, eid)
        ]
        out[eid] = max(cands)[1] if cands else None
    return out


@given(_events)
@settings(max_examples=200, deadline=None)
def test_asof_model_matches_definition(steps):
    rows = [(i, u, t, ty) for i, (u, t, ty) in enumerate(steps)]
    got = _asof_model(rows)
    for eid, view_id in got.items():
        _, user, ts, _ = rows[eid]
        views = [
            r for r in rows if r[3] == "view" and r[1] == user and r[2] <= ts
        ]
        if view_id is None:
            # any view at ts == purchase ts WOULD match (views sort first)
            assert not views
        else:
            vid, _, vts, _ = rows[view_id]
            assert vts <= ts
            # no strictly later-sorted eligible view exists
            assert all((r[2], r[0]) <= (vts, vid) for r in views)


_windows = st.lists(st.integers(min_value=1, max_value=80), min_size=0, max_size=30)

W = 8  # same constant as llm.substring.WINDOW_W


def _merge_model(positions):
    """Interval-union model: flagged windows [p, p+W-1] merged when
    overlapping or adjacent. Returns list of (start, end) spans."""
    spans = []
    for p in sorted(set(positions)):
        s, e = p, p + W - 1
        if spans and s <= spans[-1][1] + 1:
            spans[-1] = (spans[-1][0], max(spans[-1][1], e))
        else:
            spans.append((s, e))
    return spans


@given(_windows)
@settings(max_examples=300, deadline=None)
def test_span_merge_invariants(positions):
    spans = _merge_model(positions)
    # disjoint, non-adjacent, ordered
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 + 1 < s2
    # union covers exactly the flagged token set
    covered = set()
    for s, e in spans:
        covered |= set(range(s, e + 1))
    expected = set()
    for p in positions:
        expected |= set(range(p, p + W))
    assert covered == expected
    # the SQL's per-span length sum equals the union size (no double count)
    assert sum(e - s + 1 for s, e in spans) == len(expected)


_log = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), st.booleans()),
    min_size=1,
    max_size=50,
)


@given(_log)
@settings(max_examples=200, deadline=None)
def test_log_compaction_model(steps):
    """Offsets are the list index (unique, increasing). Survivor per key =
    value of the max offset; tombstone-latest keys are deleted."""
    latest = {}
    for off, (key, is_tomb) in enumerate(steps):
        latest[key] = (off, None if is_tomb else f"v{off}")
    survivors = {k: v for k, (off, v) in latest.items() if v is not None}
    # replaying the log yields the same compaction (idempotence)
    latest2 = {}
    for off, (key, is_tomb) in enumerate(steps):
        latest2[key] = (off, None if is_tomb else f"v{off}")
    assert survivors == {k: v for k, (off, v) in latest2.items() if v is not None}
    # every survivor's offset is the true per-key max
    for k, (off, v) in latest.items():
        key_offsets = [o for o, (kk, _) in enumerate(steps) if kk == k]
        assert off == max(key_offsets)


def test_asof_spark_matches_model_on_ties(spark, tmp_path):
    """Adversarial equal-timestamp cases straight through the Spark operator:
    a view at exactly the purchase's timestamp matches (<= semantics, views
    sort before purchases); among equal-ts views the max event_id wins."""
    import datetime as dt

    from kafka_connect_storage_cloud_spark.plans.temporal import events_asof_join

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, user, ts_offset_s, type) — crafted ties
        (0, 1, 0, "view"),
        (1, 1, 0, "view"),        # same ts as event 0: id tiebreak
        (2, 1, 0, "purchase"),    # purchase at the SAME ts: must match id 1
        (3, 1, 5, "purchase"),    # later: still id 1
        (4, 2, 10, "purchase"),   # user 2 has no view: unmatched
        (5, 3, 7, "view"),
        (6, 3, 7, "purchase"),    # tie for user 3: matches id 5
        (7, 3, 6, "purchase"),    # BEFORE the view: unmatched
    ]
    df = spark.createDataFrame(
        [
            (eid, t0 + dt.timedelta(seconds=off), u, ty, 1.0, "{}")
            for eid, u, off, ty in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["purchase_id"]: r["view_event_id"]
        for r in events_asof_join(spark, str(tmp_path)).collect()
    }
    model = _asof_model([(eid, u, off, ty) for eid, u, off, ty in rows])
    assert got == model == {2: 1, 3: 1, 4: None, 6: 5, 7: None}


def test_merge_asof_twin_matches_window_asof(spark, sf_small):
    """The applyInPandas + pd.merge_asof as-of recipe must produce exactly
    the union+window operator's matches (same view per purchase, same
    nulls for view-less purchases)."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_spark.plans.temporal import (
        events_asof_join,
        events_asof_join_pandas,
    )

    want = {
        r["purchase_id"]: (r["view_event_id"], r["view_ts"])
        for r in events_asof_join(spark, sf_small).collect()
    }
    got_rows = events_asof_join_pandas(spark, sf_small).collect()
    got = {r["purchase_id"]: r["view_event_id"] for r in got_rows}
    assert set(got) == set(want)
    for pid, (vid, _vts) in want.items():
        assert got[pid] == vid, pid
