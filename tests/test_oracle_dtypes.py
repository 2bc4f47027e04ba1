"""Dtype lint for the oracle SQL (VERDICT r1 fix #2).

The external driver's value hash is dtype-aware: DuckDB ``SUM(INTEGER)``
returns HUGEINT (int128) while Spark's ``sum(int)`` is BIGINT, so a bare
integer SUM in an oracle fails the driver's hash gate even when every value
is bit-identical.  This lint runs every ``oracle_sql()`` entry through DuckDB
at the smallest SF and asserts no HUGEINT/UHUGEINT column ever appears —
red the moment anyone reintroduces an uncast SUM.
"""

import importlib.util
import os
import sys

import duckdb
import pytest

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)
_spec = importlib.util.spec_from_file_location("spark_entry_dtypes", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry_dtypes"] = entry_mod
_spec.loader.exec_module(entry_mod)

from oracle_utils import TABLES  # noqa: E402

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{_SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_has_no_hugeint_columns(duck, name):
    rel = duck.sql(ORACLES[name])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not offenders, (
        f"{name}: oracle emits int128 column(s) {offenders}; "
        "wrap the integer SUM as CAST(SUM(...) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Frozen schema-class contract (VERDICT r2 next-round #8): the snapshot in
# oracle_schema_snapshot.json records every query's (column, coarse dtype
# class) pairs. The DuckDB side is asserted here (fast, no Spark); the
# Spark side is asserted by tests/test_schema_canary.py against the SAME
# snapshot — so dtype drift on EITHER engine (a DuckDB upgrade changing an
# aggregate's return type, a pyspark decimal widening) reds locally before
# the driver's dtype-aware hash sees it. Regenerate deliberately when a
# query's schema changes on both sides (see the snapshot test's docstring).
# ---------------------------------------------------------------------------

import json

from oracle_utils import _duck_class

with open(os.path.join(os.path.dirname(__file__), "oracle_schema_snapshot.json")) as _fh:
    _SNAPSHOT = json.load(_fh)


def test_snapshot_covers_every_oracle():
    assert set(_SNAPSHOT) == set(ORACLES), (
        "snapshot out of date: regenerate oracle_schema_snapshot.json "
        "(see file header) after adding/removing queries"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_matches_snapshot(duck, name):
    rel = duck.sql(ORACLES[name])
    got = [[c, _duck_class(str(t).upper())] for c, t in zip(rel.columns, rel.types)]
    assert got == _SNAPSHOT[name], (
        f"{name}: DuckDB schema drifted from the frozen contract; if the "
        "change is intentional, update BOTH engines and regenerate the snapshot"
    )


# ---------------------------------------------------------------------------
# Vacuous-flag lint (round 3): a boolean output column that is single-valued
# on the demonstration corpus is a dead feature — either its threshold is
# mis-sited (repetition_score's flagged never fired at REP_FLAG=0.2) or the
# signal doesn't exist in the data (two round-3 flags were redesigned/dropped
# for this). Invariant-proof columns whose single value IS the assertion are
# allowlisted explicitly.
# ---------------------------------------------------------------------------

_INVARIANT_BOOLEANS = {
    ("hll_merge_invariant", "merge_ok"),  # all-True is the proof
}


def test_boolean_flags_split_on_the_corpus(duck):
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        rel = duck.sql(sql)
        bool_cols = [
            c for c, t in zip(rel.columns, rel.types) if str(t).upper() == "BOOLEAN"
        ]
        if not bool_cols:
            continue
        df = rel.df()
        if len(df) < 50:  # tiny outputs can't be expected to split
            continue
        for c in bool_cols:
            if (name, c) in _INVARIANT_BOOLEANS:
                continue
            if df[c].dropna().nunique() <= 1:
                offenders.append((name, c))
    assert not offenders, f"single-valued boolean flags at sf0.01: {offenders}"
