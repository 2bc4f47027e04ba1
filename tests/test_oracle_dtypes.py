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
