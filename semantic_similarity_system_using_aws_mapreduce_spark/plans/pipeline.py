"""The reference's full 5-stage EMR job flow (App.java:50-137) as one
lazy Spark plan.

Where the reference materializes every stage to S3 text and chains five
separate clusters-worth of jobs, here each stage is a pure
DataFrame -> DataFrame function and the whole thing is a single Catalyst
plan; ``checkpoint_dir`` optionally persists stage outputs as Parquet
for resumability (the reference's per-step resume path, App.java:133).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from semantic_similarity_system_using_aws_mapreduce_spark.operators.assoc import association_measures
from semantic_similarity_system_using_aws_mapreduce_spark.operators.counts import CorpusCounts, corpus_counts
from semantic_similarity_system_using_aws_mapreduce_spark.operators.pair_vectors import pair_vectors
from semantic_similarity_system_using_aws_mapreduce_spark.sources.biarcs import read_biarcs, token_emissions
from semantic_similarity_system_using_aws_mapreduce_spark.sources.gold import read_gold_standard


@dataclass
class PipelineResult:
    corpus: DataFrame
    counts: CorpusCounts
    assoc: DataFrame
    vectors: DataFrame


def semantic_similarity_pipeline(
    spark: SparkSession,
    corpus_path: str,
    gold_path: str,
    mode: str = "standard",
    checkpoint_dir: str | None = None,
) -> PipelineResult:
    """corpus text + gold pairs -> labelled 24-dim pair vectors.

    The stemmer UDF is an optimization barrier, so when
    ``checkpoint_dir`` is given the post-stem emission relation is
    persisted as Parquet and re-read — every downstream stage then
    plans against a fully native columnar scan (SURVEY.md §4).
    """
    corpus = read_biarcs(spark, corpus_path)
    emissions = token_emissions(corpus)
    if checkpoint_dir:
        path = f"{checkpoint_dir}/emissions.parquet"
        emissions.write.mode("overwrite").parquet(path)
        emissions = spark.read.parquet(path)
    counts = corpus_counts(emissions)
    assoc = association_measures(counts, mode=mode)
    if checkpoint_dir:
        path = f"{checkpoint_dir}/assoc.parquet"
        assoc.write.mode("overwrite").parquet(path)
        assoc = spark.read.parquet(path)
    gold = read_gold_standard(spark, gold_path)
    vectors = pair_vectors(assoc, gold, mode=mode)
    return PipelineResult(corpus, counts, assoc, vectors)
