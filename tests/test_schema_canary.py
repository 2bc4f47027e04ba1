"""Spark-side half of the frozen schema-class contract (VERDICT r2
next-round #8; the DuckDB half lives in test_oracle_dtypes.py): every
queries() entry's DataFrame schema must map to exactly the (column, coarse
dtype class) pairs recorded in oracle_schema_snapshot.json. Catches
engine-side dtype drift (e.g. a decimal widening in a new pyspark) without
running the full value-comparison sweep.

Regenerate the snapshot (only when a schema change is intentional on BOTH
engines):
    cd tests && python - <<'PY'
    ... see git history of oracle_schema_snapshot.json ...
    PY
"""

import importlib.util
import json
import os
import sys

import pytest

from oracle_utils import _spark_class

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"
)
_spec = importlib.util.spec_from_file_location("spark_entry_canary", _ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules["spark_entry_canary"] = entry_mod
_spec.loader.exec_module(entry_mod)

with open(os.path.join(os.path.dirname(__file__), "oracle_schema_snapshot.json")) as _fh:
    _SNAPSHOT = json.load(_fh)

QUERIES = entry_mod.queries()


# r10: sharded + intra-shard thread pool (the test_oracle_parity pattern).
# Plan building is driver-side, but the heavy builders (codebook training
# collects, bounded query picks) run real jobs, and py4j calls release the
# GIL — concurrency overlaps them. Coverage unchanged: every snapshot key
# checked on every run. KCSC_PARITY_THREADS=1 restores serial debugging.
_N_SHARDS = 8
_THREADS = int(os.environ.get("KCSC_PARITY_THREADS", "6"))
_KEYS = sorted(_SNAPSHOT)


@pytest.mark.parametrize("shard", range(_N_SHARDS))
def test_spark_schema_matches_snapshot(spark, sf_small, shard):
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        try:
            df = QUERIES[name](spark, sf_small)
            got = [[f.name, _spark_class(f.dataType.simpleString())] for f in df.schema.fields]
        except Exception as e:
            return name, f"EXCEPTION: {e!r}"
        return name, None if got == _SNAPSHOT[name] else f"schema drifted: {got}"

    with ThreadPoolExecutor(max_workers=_THREADS) as pool:
        results = list(pool.map(one, _KEYS[shard::_N_SHARDS]))
    bad = [(n, p) for n, p in results if p]
    assert not bad, (
        "Spark schema drifted from the frozen contract (update BOTH engines "
        "and regenerate the snapshot if intentional): "
        + "; ".join(f"{n}: {p}" for n, p in bad)
    )
