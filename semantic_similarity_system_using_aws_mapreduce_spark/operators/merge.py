"""MERGE / upsert emulation (CDC pattern) without a lakehouse format.

Delta/Iceberg's MERGE INTO needs their jars; the relational emulation
is anti-join + union (matched rows replaced, unmatched kept, new rows
appended) — the standard pattern when the table format can't do an
in-place merge.  Semantics match `MERGE ... WHEN MATCHED THEN UPDATE
SET * WHEN NOT MATCHED THEN INSERT *`.

Scale note: this rewrites the target (as any copy-on-write merge
does); with bucketed/partitioned targets you restrict the rewrite to
affected partitions via dynamic partition overwrite.  An SCD2 variant
(`scd2_apply`) keeps history with validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert: source rows win on key collision, target rows without a
    source match survive, brand-new source keys append."""
    if set(target.columns) != set(source.columns):
        raise ValueError("target and source must share a schema")
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    effective_col: str,
    current_flag: str = "is_current",
    end_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    key re-appears in the source (set valid_to / clear the flag) and
    append the new versions as current."""
    data_cols = [c for c in target.columns if c not in (current_flag, end_col)]
    if set(data_cols) - set(source.columns) - set([effective_col]):
        missing = set(data_cols) - set(source.columns)
        raise ValueError(f"source missing columns: {missing}")
    src_keys = source.select(*keys, F.col(effective_col).alias("_new_eff"))
    closed = (
        target.join(src_keys, keys, "left")
        .withColumn(
            current_flag,
            F.when(F.col("_new_eff").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .withColumn(
            end_col,
            F.when(
                F.col("_new_eff").isNotNull() & F.col(end_col).isNull(),
                F.col("_new_eff"),
            ).otherwise(F.col(end_col)),
        )
        .drop("_new_eff")
    )
    additions = source.select(
        *[F.col(c) for c in data_cols],
        F.lit(True).alias(current_flag),
        F.lit(None).cast(dict(target.dtypes)[end_col]).alias(end_col),
    )
    return closed.unionByName(additions.select(*target.columns))
