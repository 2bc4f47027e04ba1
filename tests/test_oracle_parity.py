"""Driver-gate replica: every queries() entry with an oracle must match
DuckDB exactly at sf0.01 (row count + order-insensitive values)."""

import importlib.util
import os
import sys

import pytest

_ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry"] = entry_mod
_spec.loader.exec_module(entry_mod)

from oracle_utils import compare  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
