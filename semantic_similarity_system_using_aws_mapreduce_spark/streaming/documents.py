"""Structured Streaming over the documents table: continuous-ingest
curation — the streaming face of the batch curation funnel
(workload/curation.py) composed with the incremental dedup index
(operators/dedup.incremental_dedup).

The reference is batch-only (SURVEY.md §2.9); this is net-new engine
surface, extending the streaming story from events analytics to the
training-data pipeline itself: a crawl that lands files continuously,
each micro-batch quality-gated and deduped against everything ingested
BEFORE it, survivors appended to the corpus and to the signature index.

Design for scale:

* The quality gate is stateless (per-row token statistics) — it rides
  the stream as a map, no watermark, no state store.
* Dedup state lives OUTSIDE the streaming state store, as a persisted
  parquet signature index (8 int64 per document).  Structured
  Streaming's own dedup (`dropDuplicatesWithinWatermark`) bounds state
  by TIME, which is right for replayed events but wrong for corpus
  dedup — a duplicate document may arrive months after the original.
  The index form keeps state O(corpus docs x 8 ints) with no
  watermark eviction, survives restarts (it is just a table), and the
  probe cost is the banded bucket join, not a state-store lookup scan.
* `foreachBatch` makes the index read-modify-append transactional per
  micro-batch (Structured Streaming serializes foreachBatch calls);
  at 100 TB the appends would target a bucketed (band, k0, k1) table
  so the probe join is shuffle-free on the index side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import (
    incremental_dedup,
    minhash_signatures,
    shingle_hashes,
    tokens,
)

SIG_SCHEMA = "doc_id long, " + ", ".join(f"h{k} long" for k in range(8))


def read_document_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files
    (the local test harness; swap for Kafka/auto-loader in
    production).  One file per micro-batch, in file order, so ingest
    is deterministic and replayable."""
    schema = spark.read.parquet(source_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def quality_gate(stream: DataFrame, min_tokens: int, min_ttr: float) -> DataFrame:
    """Stateless streaming quality gate — the batch curation funnel's
    flag stage applied as a pure map on the stream (same thresholds,
    same statistics: token count and type-token ratio)."""
    toks = tokens(F.col("text"))
    flagged = stream.withColumn("_toks", toks).withColumn(
        "_ttr", F.size(F.array_distinct("_toks")) / F.size("_toks")
    )
    return (
        flagged.filter(
            (F.size("_toks") >= min_tokens) & (F.col("_ttr") >= min_ttr)
        )
        .drop("_toks", "_ttr")
    )


def run_streaming_curation(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    index_path: str,
    min_tokens: int = 24,
    min_ttr: float = 0.35,
    min_agree: int = 6,
) -> None:
    """Drive the (bounded) document stream through the full curation
    funnel: quality gate -> minhash signatures -> incremental dedup
    against the persisted index -> append survivors to the corpus
    table and their signatures to the index.

    Runs with availableNow (drains everything currently in
    ``source_dir``, one file per micro-batch, then stops) — the test
    and backfill mode; a production deployment runs the same query
    continuously.  Restart-safe by construction: re-ingesting content
    that already reached the index drops as a duplicate, so an
    at-least-once source yields an exactly-once corpus."""

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        gated = quality_gate(batch, min_tokens, min_ttr)
        # cache: signatures + corpus append both consume the gate
        gated = gated.cache()
        try:
            sigs = minhash_signatures(shingle_hashes(gated))
            if os.path.isdir(index_path):
                index = spark.read.parquet(index_path)
            else:
                index = spark.createDataFrame([], SIG_SCHEMA)
            kept, _dropped = incremental_dedup(sigs, index, min_agree=min_agree)
            # Materialize survivors BEFORE appending to the index their
            # own dedup read from (copy-on-write discipline, same as
            # the CDC upsert sink).
            kept = kept.cache()
            kept_ids = kept.select("doc_id")
            (
                gated.join(kept_ids, "doc_id")
                .write.mode("append")
                .parquet(corpus_path)
            )
            kept.write.mode("append").parquet(index_path)
            kept.unpersist()
        finally:
            gated.unpersist()

    (
        read_document_stream(spark, source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", corpus_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_token_sketch(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    d: int = 3,
    w: int = 512,
) -> None:
    """Continuous heavy-hitter tracking: each micro-batch's token
    count-min sketch merges CELL-WISE into a persisted sketch table —
    the streaming face of workload/text.q_cms_heavy_hitters.

    CMS merge is exact addition, so after draining any prefix of the
    stream the persisted sketch is BIT-IDENTICAL to the batch sketch
    over the documents ingested so far (the test asserts it) — unlike
    windowed streaming aggregations there is no watermark and nothing
    is ever evicted, because the state is d*w cells however much text
    flows through.

    Replay safety: unlike a pure-addition merge, each write stamps the
    applied batch id onto every row, and a micro-batch whose id is
    already <= the stamp is SKIPPED — foreachBatch is at-least-once (a
    crash between the table overwrite and the checkpoint commit
    replays the batch), and without the stamp a replayed delta would
    double-count every cell it touches.  The merged relation is
    localCheckpoint-ed before overwriting the table it was read from
    (lineage must not reference the files being replaced); at d*w rows
    the rewrite is trivial, and a production deployment would MERGE
    into a transactional keyed table instead (which also removes the
    small torn-overwrite window a non-atomic parquet rewrite has)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import cms_sketch

    def _apply(batch: DataFrame, batch_id: int) -> None:
        prev = None
        if os.path.isdir(sketch_path):
            prev = spark.read.parquet(sketch_path)
            applied = prev.agg(F.max("applied_batch_id")).first()[0]
            if applied is not None and batch_id <= applied:
                return  # at-least-once replay of an already-merged batch
        toks = batch.select(F.explode(tokens(F.col("text"))).alias("token"))
        delta = cms_sketch(toks, d, w)
        if prev is not None:
            merged = (
                delta.unionByName(prev.select("i", "cell", "c"))
                .groupBy("i", "cell")
                .agg(F.sum("c").alias("c"))
            )
        else:
            merged = delta
        (
            merged.withColumn("applied_batch_id", F.lit(batch_id))
            .localCheckpoint()
            .write.mode("overwrite")
            .parquet(sketch_path)
        )

    (
        read_document_stream(spark, source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", sketch_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def forget_documents(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    doc_ids: list[int],
) -> dict:
    """Right-to-be-forgotten deletion for the curated corpus: remove
    the given documents from BOTH the corpus table and the signature
    index in one copy-on-write rewrite each, and report what changed.

    Removing the index rows matters as much as the corpus rows: the
    index is what future ingests dedup against, so a forgotten
    document's content becomes ADMISSIBLE again if it is ever
    legitimately resubmitted (tested) — forgetting must not leave a
    ghost that silently rejects future data.  Bounded structures built
    from past data (Bloom bitmaps, CMS sketches) cannot forget
    individual items by construction; rebuild them from the rewritten
    corpus when bit-level erasure of those is required.

    Scale shape: each rewrite is one anti-join against a broadcast id
    set and an overwrite — at 100 TB you would partition the corpus
    so the rewrite touches only affected partitions (or use a
    deletion-vector table format); the operator's join shape is the
    same either way."""
    ids = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    out = {}
    for path in (corpus_path, index_path):
        before = spark.read.parquet(path)
        kept = before.join(F.broadcast(ids), "doc_id", "left_anti")
        n_before = before.count()
        # localCheckpoint: the overwrite must not depend on the files
        # it replaces (the run_streaming_token_sketch discipline)
        kept.localCheckpoint().write.mode("overwrite").parquet(path)
        out[path] = {"n_before": n_before, "n_after": spark.read.parquet(path).count()}
    return out
