"""Fixture-table loader for the driver's synthetic parquet tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from semantic_similarity_system_using_aws_mapreduce_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in FIXTURE_TABLES}
