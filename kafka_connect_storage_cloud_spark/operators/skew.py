"""Skew mitigation for hot keys: salted joins and salted distinct
aggregation.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most skew at
runtime by splitting oversized partitions, and it is ON in session.get_spark.
These helpers cover the cases AQE cannot fix:

- a hot key whose matching rows must still meet in ONE task under a plain
  shuffle join -> salted_join spreads each key over n_salts tasks and
  replicates the (small) right side once per salt;
- a COUNT(DISTINCT v) whose per-key state is too large for one task ->
  salting by hash(v) makes the per-salt value sets disjoint, so the
  per-salt distinct counts sum exactly (no approximation).

Both transforms are deterministic (content-hash salts, no rand()), so
results are replay-stable — the same guarantee the connector's
exactly-once file naming provides on the write path.

Sizing at scale: n_salts bounds the fan-out of the replicated side
(n_salts × |small|) against the per-task state reduction (hot-key state /
n_salts). 16-64 covers hot keys up to ~100× the median without making the
replicated build side material.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed join keys: each big-side row gets a
    deterministic salt from its full row content, and `small` is replicated
    once per salt value, so a hot key's rows land in n_salts tasks instead
    of one."""
    salt_src: Column = F.xxhash64(*[F.col(c) for c in big.columns])
    salted_big = big.withColumn(_SALT, F.pmod(salt_src, F.lit(n_salts)))
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [*on, _SALT], how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 32
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key group with bounded per-task
    state: salting by hash(value) partitions each key's value set into
    disjoint slices, so the per-slice distinct counts sum exactly."""
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.countDistinct(value).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"distinct_{value}"))
