"""Decimal-exact aggregate helpers.

Float sums depend on accumulation order, so a Spark aggregate and a DuckDB
oracle aggregate over the same doubles can differ in the last ULPs. Casting
inputs to fixed-scale decimals makes the arithmetic exact and engine- and
order-independent; the final cast back to double is then deterministic too.
The SQL oracle mirrors the same expressions (see __spark_entry__.oracle_sql).

Precisions are chosen so every intermediate fits decimal(38,_) with no
precision-loss rescaling in either engine:
  unit values  -> decimal(10,4)   (prices < 1e6, rates < 1)
  product      -> decimal(18,8)
  2nd product  -> (18,8)x(11,4) = well under 38 digits
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNIT = "decimal(10,4)"
PROD = "decimal(18,8)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(UNIT)


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """price * (1 - discount), exact."""
    one = F.lit(1).cast(UNIT)
    return (dec(price) * (one - dec(discount))).cast(PROD)


def charge(price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax") -> Column:
    """price * (1 - discount) * (1 + tax), exact."""
    one = F.lit(1).cast(UNIT)
    return disc_price(price, discount) * (one + dec(tax))


def money_sum(expr: Column, alias: str) -> Column:
    """Exact decimal sum, rounded to 4 dp, emitted as double."""
    return F.round(F.sum(expr), 4).cast("double").alias(alias)


def money_avg(expr: Column, alias: str) -> Column:
    """sum(decimal)/count as double, rounded to 4 dp with the PORTABLE
    floor(x*1e4+0.5)/1e4 form (non-negative x): both engines divide the same
    exact decimal by the same count (bit-identical quotient), but their
    native round() half-tie rules differ — Spark rounds the shortest decimal
    repr half-up, DuckDB rounds the binary value — and quotients like
    1512.12/32 = 47.25375 land exactly on the 4-dp tie (observed at sf0.1).
    The pure-IEEE floor form is tie-stable because it only touches the
    identical binary value."""
    x = F.sum(expr).cast("double") / F.count(F.lit(1))
    return (F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(alias)


# --- SQL-side mirrors (DuckDB dialect) --------------------------------------

SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(10,4)) * "
    "(CAST(1 AS DECIMAL(10,4)) - CAST(l_discount AS DECIMAL(10,4))) AS DECIMAL(18,8))"
)
SQL_CHARGE = (
    f"{SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(10,4)) + CAST(l_tax AS DECIMAL(10,4)))"
)


def sql_money_sum(inner: str, alias: str) -> str:
    return f"CAST(ROUND(SUM({inner}), 4) AS DOUBLE) AS {alias}"


def sql_money_avg(inner: str, alias: str) -> str:
    return (
        f"(floor((CAST(SUM({inner}) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)"
        f" / 10000.0) AS {alias}"
    )


def sql_dec(col: str) -> str:
    return f"CAST({col} AS DECIMAL(10,4))"
