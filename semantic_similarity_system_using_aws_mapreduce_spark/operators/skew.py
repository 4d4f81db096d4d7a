"""Skew-mitigation utilities for the 100 TB design point.

The corpus head-word distribution is Zipfian (SURVEY.md §7.3).  For
AGGREGATIONS skew is already handled: partial (map-side) aggregation
collapses hot keys before the shuffle.  For JOINS the engine's first
line of defense is AQE skew-join splitting (on in session.py); this
module provides explicit salting for the cases AQE can't fix — e.g. a
single key so hot that even a split partition's build side won't fit,
or a non-broadcastable medium dimension joined on a skewed fact key.

``salted_join`` spreads each hot fact key over ``n_salts`` synthetic
sub-keys and replicates the dimension side per salt; correctness is
unchanged (tested against the plain join), cost is n_salts x the
dimension size — use for dimensions too big to broadcast but far
smaller than the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (skewed on ``on``) with ``dim`` by salting the
    fact side and replicating the dim side ``n_salts`` times, so one
    hot key lands on n_salts reducers instead of one."""
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(f"{SALT_COL} column name collides")
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias(SALT_COL)
    )
    replicated_dim = dim.crossJoin(F.broadcast(salts))
    return salted_fact.join(replicated_dim, on + [SALT_COL], how).drop(SALT_COL)


def top_keys(df: DataFrame, key_cols: list[str], k: int = 20) -> DataFrame:
    """Diagnostic: the k heaviest keys and their frequencies — what you
    look at before deciding to salt."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(k)
    )
