"""Bucketed-table layout: pre-shuffled storage for exchange-free joins
and aggregations.

At 100 TB the dominant cost of a fact-to-fact join is the shuffle of
both sides.  Writing a table bucketed by its join key spends that
shuffle ONCE at write time; every later equi-join or groupBy on the
key then reads co-located buckets and skips the Exchange entirely
(`test_bucketing.py` asserts the plan has no Exchange under the join).
This is the Spark-native equivalent of the reference pipeline's
"keep data partitioned by token between jobs" discipline — but durable
across jobs and queries, not per-job.

Sizing guidance: pick ``n_buckets`` so one bucket of the LARGER table
is a few hundred MB (e.g. 100 TB / 262144 buckets ≈ 400 MB); both
join sides must use the same bucket count and key for the exchange to
be elided.  Bucket-pruning on point lookups is a bonus: an equality
filter on the bucket key scans 1/n_buckets of the data.

Spark's bucketed format requires the table catalog (``saveAsTable``,
not ``save``) — bucket metadata lives in the metastore.  The local
in-memory catalog works; production would back this with
Hive/Glue/Unity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table.  Sorting within buckets additionally elides the Sort under
    a sort-merge join."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)
