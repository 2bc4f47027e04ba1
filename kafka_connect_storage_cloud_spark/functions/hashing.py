"""Portable deterministic hashing: identical values from Spark expressions
and DuckDB SQL, so LSH/minhash/simhash operators can be oracle-verified.

Both engines share md5; we take a hex prefix and parse it as an integer:
  h32: first 8 hex chars  -> [0, 2^32)  (fits bigint products with 31-bit coeffs)
  h60: first 15 hex chars -> [0, 2^60)  (fits signed bigint)

Spark's xxhash64/hash are NOT portable to DuckDB — never use them in an
oracle-checked operator (they're fine for internal partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2147483647  # Mersenne prime 2^31 - 1


def h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def sql_h32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def spark_sql_h32(expr: str) -> str:
    """h32 as a Spark-SQL string, for use inside higher-order-function
    lambdas (transform/filter) where Column-API composition can't reach."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def spark_sql_h60(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_h60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def round6(col: Column) -> Column:
    """Portable 6-dp rounding for NON-NEGATIVE doubles: floor(x*1e6+0.5)/1e6
    evaluated in pure IEEE double ops, so both engines round the identical
    binary value identically. Spark's round() (BigDecimal over the shortest
    decimal repr) and DuckDB's round() (C round on the binary value) disagree
    when a rational lands exactly on a .5 tie at the 7th digit — e.g.
    0.3*0.75 + 0.3*0.234375 + 0.2 + 0.2*0.832 = 0.6617125, observed at
    sf0.1. Ratios of small integers hit such ties; use this for every
    rounded rational ratio. (Half-up = half-away only for x >= 0.)"""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def sql_round6(expr: str) -> str:
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def minhash_perm(i: int) -> tuple[int, int]:
    """Deterministic permutation coefficients for minhash: h -> (a*h + b) % P31.
    a is odd and nonzero; constants from Knuth's multiplicative hashing."""
    a = (2654435761 * (i + 1) + 1) % P31
    b = (40503 * (i + 1) + 7) % P31
    return a, b


def minhash_col(h: Column, i: int) -> Column:
    a, b = minhash_perm(i)
    return (F.lit(a) * h + F.lit(b)) % F.lit(P31)


def sql_minhash(h_expr: str, i: int) -> str:
    a, b = minhash_perm(i)
    return f"(({a} * {h_expr} + {b}) % {P31})"
