"""Driver-gate replica: every queries() entry with an oracle must match
DuckDB exactly at sf0.01 (row count + order-insensitive values).

r10 restructure (VERDICT r9 next-round #1): the old file parametrized one
pytest test per key — 324 serial Spark+DuckDB compares, the bulk of a
~67-minute suite the external gate could not finish. Coverage is
unchanged (every oracle key is still verified on every run); the sweep is
now sharded, and each shard verifies its keys CONCURRENTLY from a small
thread pool (guide §2.6 "overlap independent jobs": actions are only
sequential because the driver calls them sequentially — Spark's scheduler
happily runs several jobs at once, DuckDB runs per-thread connections,
and the box is otherwise idle while one key's single-threaded tail runs).
Failures stay per-key: a shard lists every failing key with its compare
problems. Set KCSC_PARITY_THREADS=1 to debug serially.
"""

import importlib.util
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest

_ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry"] = entry_mod
_spec.loader.exec_module(entry_mod)

from oracle_utils import compare  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

N_SHARDS = 12
_THREADS = int(os.environ.get("KCSC_PARITY_THREADS", "6"))
_KEYS = sorted(ORACLES)


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def _check_keys(spark, sf_dir, keys):
    def one(name):
        try:
            return name, compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
        except Exception as e:  # surfaced per key, never swallowed
            return name, [f"EXCEPTION: {e!r}"]

    with ThreadPoolExecutor(max_workers=_THREADS) as pool:
        results = list(pool.map(one, keys))
    bad = [(n, p) for n, p in results if p]
    assert not bad, "; ".join(f"{n}: {'; '.join(p)}" for n, p in bad)


@pytest.mark.parametrize("shard", range(N_SHARDS))
def test_oracle_parity(spark, sf_dir, shard):
    _check_keys(spark, sf_dir, _KEYS[shard::N_SHARDS])


_ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
