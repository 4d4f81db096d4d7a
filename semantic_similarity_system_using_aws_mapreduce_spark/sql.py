"""Plain-SQL surface: make the engine usable from ``spark.sql`` alone.

Everything the DataFrame API exposes is also reachable as SQL — the
tables as temp views and the engine's scalar functions as session
functions — so an analyst can drive the corpus with nothing but query
strings:

    register_sql_surface(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT porter_stem(word) ... FROM documents ...")

Function registration strategy:
  * ``porter_stem`` — the Arrow pandas UDF (functions/stemming.py),
    registered as-is: vectorized, memoized per batch.
  * ``md5_int60``, ``hash_bucket_permille`` — pure SQL scalar UDFs
    (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``, Spark 4's SQL
    UDFs): they inline into the plan as ordinary expressions, keep
    whole-stage codegen, and cost nothing over writing the expression
    by hand — registration just names the engine's portable hash
    arithmetic so SQL users hash identically to the operators
    (operators/dedup.md5_int, operators/sampling.hash_bucket).

Temp views are session-scoped metadata over the parquet paths —
registering them costs no scan, and every query through them gets the
same pushdown/pruning as the DataFrame readers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

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


def register_sql_surface(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register the engine's SQL functions, plus the standard tables
    as temp views when ``sf_dir`` is given.  Idempotent."""
    from semantic_similarity_system_using_aws_mapreduce_spark.functions.stemming import stem_udf

    spark.udf.register("porter_stem", stem_udf)
    # SQL scalar UDFs: inlined by the analyzer, stay inside codegen
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION md5_int60(x STRING) "
        "RETURNS BIGINT RETURN CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION hash_bucket_permille(x STRING, salt STRING) "
        "RETURNS INT RETURN CAST(md5_int60(concat(salt, ':', x)) % 1000 AS INT)"
    )
    if sf_dir is not None:
        for t in TABLES:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
