"""Local replica of the driver's correctness gate: run a queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count + values order-insensitively with columns sorted by name.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t).upper() for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


# Coarse dtype classes: the external driver's hash is dtype-aware (it hashes
# Arrow buffers), so DuckDB HUGEINT vs Spark BIGINT fails even when every
# value is identical.  Mirror that here so the local gate can't pass what
# the driver fails (VERDICT r1 "What's wrong" #1).
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "int128", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "DATE": "date", "BLOB": "bytes",
}


def _duck_class(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        return "nested"
    return _DUCK_CLASS.get(t, t.lower())


def _spark_class(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t == "date":
        return "date"
    if t == "binary":
        return "bytes"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return t


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows, d_types = duck_run(sql, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    s_class = {c: _spark_class(t) for c, t in spark_df.dtypes}
    for c, t in zip(d_cols, d_types):
        dc = _duck_class(t)
        if dc != s_class.get(c):
            problems.append(
                f"dtype mismatch on {c!r}: duck {t} ({dc}) vs spark {s_class.get(c)}"
            )
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_set = sorted(tuple(_norm(r[i]) for i in s_order) for r in s_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in d_order) for r in d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b]
        only_s = [r for r in s_set if r not in set(d_set)][:3]
        only_d = [r for r in d_set if r not in set(s_set)][:3]
        problems.append(
            f"values differ ({len(diffs)} aligned diffs); spark-only={only_s} duck-only={only_d}"
        )
    return problems
