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
    out = con.execute(sql)
    cols = [d[0] for d in out.description]
    rows = out.fetchall()
    con.close()
    return cols, rows


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
    d_cols, d_rows = duck_run(sql, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
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
