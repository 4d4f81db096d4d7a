"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   - flagship query smoke check at sf0.001.
queries()      - every implemented query/operator from SURVEY.md §2,
                 (spark, sf_dir) -> DataFrame.
oracle_sql()   - per query, equivalent SQL DuckDB runs on the same
                 parquet tables; identical column names and identical
                 rounding so value hashes match.

Implementations live in
semantic_similarity_system_using_aws_mapreduce_spark.workload; the reference-pipeline operators
themselves (biarcs ingest, Porter stemming, pair vectors, MLlib CV) are
exercised by tests/ against reference-shaped fixtures — the fixture
tables here don't carry a syntactic-ngram corpus, so the workload
transplants the same operator semantics onto documents/embeddings/
events (e.g. q_token_source_assoc IS Step2+3, q_source_similarity IS
Step4's align-and-measure).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from semantic_similarity_system_using_aws_mapreduce_spark.workload import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: D1-D6 source-pair similarity over aligned token
    distributions (the reference Step4 shape) at sf0.001."""
    return QUERIES["q_source_similarity"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
