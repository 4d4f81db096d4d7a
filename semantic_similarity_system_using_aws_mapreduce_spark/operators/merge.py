"""MERGE / upsert emulation (CDC pattern) without a lakehouse format.

Delta/Iceberg's MERGE INTO needs their jars; the relational emulation
is anti-join + union (matched rows replaced, unmatched kept, new rows
appended) — the standard pattern when the table format can't do an
in-place merge.  Semantics match `MERGE ... WHEN MATCHED THEN UPDATE
SET * WHEN NOT MATCHED THEN INSERT *`, including the multiple-matches
rule: a target row matched by more than one source row fails the merge
(Delta raises DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE;
we raise ValueError), because "which update wins" would otherwise be
nondeterministic.

Scale note: this rewrites the target (as any copy-on-write merge
does); with bucketed/partitioned targets you restrict the rewrite to
affected partitions via dynamic partition overwrite.  An SCD2 variant
(`scd2_apply`) keeps history with validity ranges and accepts
multi-version-per-key source batches by chaining ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _duplicate_source_keys(source: DataFrame, keys: list[str]) -> list:
    return (
        source.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(5)
        .collect()
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: list[str], validate: bool = True
) -> DataFrame:
    """Upsert: source rows win on key collision, target rows without a
    source match survive, brand-new source keys append.

    ``validate=True`` (default) runs one aggregation job over the
    source to reject batches carrying multiple rows per key — the
    MERGE multiple-matches error.  Pass ``validate=False`` only when
    the source is already key-unique by construction (e.g. the output
    of a compaction) and the extra job matters at scale.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError("target and source must share a schema")
    if validate:
        dups = _duplicate_source_keys(source, keys)
        if dups:
            raise ValueError(
                "merge_upsert: multiple source rows match a target key "
                f"(MERGE multiple-matches rule); first offenders: {dups}"
            )
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
    append the incoming versions with chained validity ranges.

    Multi-version-per-key batches are first-class: the source versions
    of a key are ordered by ``effective_col`` and each version's
    ``valid_to`` is the next version's effective date (``lead``
    window); only the last version per key arrives flagged current.
    The target's current row is closed with the EARLIEST incoming
    effective date, so history stays contiguous.  Exactly one join per
    target row — no fan-out however many versions a batch carries.

    Rows carrying the same (key, effective) value are a contract
    violation (their order is undefined); they produce zero-length
    versions deterministically ordered by the remaining columns rather
    than failing the batch.
    """
    data_cols = [c for c in target.columns if c not in (current_flag, end_col)]
    if set(data_cols) - set(source.columns) - set([effective_col]):
        missing = set(data_cols) - set(source.columns)
        raise ValueError(f"source missing columns: {missing}")
    end_type = dict(target.dtypes)[end_col]

    # one row per key: the earliest incoming version closes the target's
    # current row
    src_first = source.groupBy(*keys).agg(F.min(effective_col).alias("_new_eff"))
    closed = (
        target.join(src_first, keys, "left")
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

    # chain validity ranges inside the batch: version k closes at
    # version k+1's effective date; the last version stays open/current
    order_cols = [F.col(effective_col)] + [
        F.col(c) for c in source.columns if c != effective_col
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    additions = (
        source.withColumn(end_col, F.lead(effective_col).over(w).cast(end_type))
        .withColumn(current_flag, F.col(end_col).isNull())
        .select(
            *[F.col(c) for c in data_cols],
            F.col(current_flag),
            F.col(end_col),
        )
    )
    return closed.unionByName(additions.select(*target.columns))
