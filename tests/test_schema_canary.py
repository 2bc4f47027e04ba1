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


@pytest.mark.parametrize("name", sorted(_SNAPSHOT))
def test_spark_schema_matches_snapshot(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    got = [[f.name, _spark_class(f.dataType.simpleString())] for f in df.schema.fields]
    assert got == _SNAPSHOT[name], (
        f"{name}: Spark schema drifted from the frozen contract; if the "
        "change is intentional, update BOTH engines and regenerate the snapshot"
    )
