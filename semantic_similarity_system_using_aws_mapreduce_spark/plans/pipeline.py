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
    totals = None
    if checkpoint_dir:
        # The parquet write is an action anyway, so ride the L/F totals
        # on it with the Observation API — the exact analog of the
        # reference's Hadoop counters accumulating during the map phase
        # (Step1.java:73-74): zero extra passes over the corpus.  Built
        # against a throwaway child session because a used Observation
        # leaves a listener that can break later cache materialization
        # in its session (Spark 4.1; see operators/counts.py).
        from semantic_similarity_system_using_aws_mapreduce_spark.operators.counts import observed_emissions

        obs_spark = spark.newSession()
        raw = read_biarcs(obs_spark, corpus_path)
        # file-split heuristics often yield fewer input partitions than
        # cores; the stemmer UDF dominates this stage, so spread it over
        # every core (the text shuffle is trivial next to stemming)
        par = obs_spark.sparkContext.defaultParallelism
        if raw.rdd.getNumPartitions() < par:
            raw = raw.repartition(par)
        observed, obs = observed_emissions(token_emissions(raw))
        path = f"{checkpoint_dir}/emissions.parquet"
        observed.write.mode("overwrite").parquet(path)
        got = obs.get
        emissions = spark.read.parquet(path)
        totals = spark.createDataFrame(
            [(got["L"], got["F"])], "L long, F long"
        )
    counts = corpus_counts(emissions, totals=totals)
    # All downstream branches (marginals, totals, the assoc join) read
    # pair_counts; persisting it caps the plan at ONE aggregation of the
    # emissions relation per action — the cache substitution happens on
    # the logical plan, where the subtrees are literally identical, so
    # it is immune to the per-branch isnotnull pushdown that defeats
    # physical ReusedExchange here.  This matters in BOTH modes: without
    # it the non-checkpointed plan scans+stems the corpus once per
    # branch, and the checkpointed plan re-runs the pair aggregation
    # under each marginal.
    from pyspark import StorageLevel

    counts.pair_counts.persist(StorageLevel.MEMORY_AND_DISK)
    assoc = association_measures(counts, mode=mode)
    if checkpoint_dir:
        path = f"{checkpoint_dir}/assoc.parquet"
        assoc.write.mode("overwrite").parquet(path)
        assoc = spark.read.parquet(path)
    gold = read_gold_standard(spark, gold_path)
    vectors = pair_vectors(assoc, gold, mode=mode)
    return PipelineResult(corpus, counts, assoc, vectors)
