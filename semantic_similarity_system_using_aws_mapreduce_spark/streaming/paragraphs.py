"""Incremental paragraph-level dedup for the streaming ingest loop:
the CCNet keep-first recipe (operators/dedup.paragraph_dedup) against
a PERSISTED segment-hash index, so a continuously-growing corpus cuts
quoted/boilerplate passages the moment they recur — across batches,
not just within one.

Tables (same idempotent per-batch partition discipline as the corpus):

    <corpus>_segindex  (seg_hash, doc_id, ingest_batch)
        one row per segment hash the corpus has KEPT, attributed to
        the document that kept it — attribution is what lets
        right-to-be-forgotten erase content-derived hashes (the
        forget rewrite anti-joins doc_id like every other table) and
        what lets a crash-replayed batch exclude its own rows.
    <corpus>_clean     (doc_id, n_segments, n_kept, n_dup, kept_text,
                        ingest_batch)
        the scrubbed face of each admitted document; the raw corpus
        table is untouched, so curation stays non-destructive and
        time-travel over the raw axis stays truthful.

Semantics vs the batch operator: keep-FIRST in ARRIVAL order (batch,
then (doc_id, seg_idx) within a batch) — identical to
paragraph_dedup's global (doc_id, seg_idx) order whenever doc ids
increase with arrival (tested).  The boilerplate verdict
(drop-even-the-first at >= K docs) is deliberately NOT applied
online: it would require retroactively rewriting documents admitted
before a segment became frequent.  Run the batch operator over the
clean table at compaction/release time for that pass.

Scale shape: segmentation is map-side; the batch's segments join the
index on seg_hash — ONE keyed shuffle whose index side at 100 TB
should be a bucketed-by-seg_hash table (the exchange-free probe
machinery build_bucketed_sig_index established generalizes verbatim;
the parquet path here is the correctness form).  The index fold at
compaction bounds file count like the signature index's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import segment_hashes

SEGINDEX_SUFFIX = "_segindex"
CLEAN_SUFFIX = "_clean"


def paragraph_delta(
    admitted: DataFrame,
    seg_index: DataFrame | None,
    seg_words: int = 5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One micro-batch of incremental keep-first paragraph dedup.

    ``admitted``: the batch's surviving (doc_id, text, ...) rows;
    ``seg_index``: the persisted (seg_hash, doc_id, ...) index with
    the caller's replay exclusion already applied (None for the first
    batch).  Returns ``(clean, delta, segs)``:

      * ``clean`` — (doc_id, n_segments, n_kept, n_dup, kept_text)
        with cross-batch dups cut exactly like within-batch ones;
      * ``delta`` — (seg_hash, doc_id) NEW index rows: this batch's
        winners for hashes the index has never seen;
      * ``segs`` — the persisted segment relation BOTH outputs read
        (caller materializes both writes, then unpersists — the
        streaming loop's cache discipline)."""
    from pyspark import StorageLevel

    segs = segment_hashes(admitted, seg_words).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # lexicographic (doc_id, seg_idx) struct min — the packed-int64
    # form wrapped for the WARC path's 60-bit doc_ids (see
    # operators/dedup.paragraph_dedup)
    key = F.struct(F.col("doc_id"), F.col("seg_idx"))
    winners = segs.groupBy("seg_hash").agg(F.min(key).alias("_winner"))
    seen = (
        seg_index.select("seg_hash").distinct().withColumn("_seen", F.lit(True))
        if seg_index is not None
        else None
    )
    decided = segs.join(winners, "seg_hash")
    if seen is not None:
        decided = decided.join(seen, "seg_hash", "left")
        fresh = F.col("_seen").isNull()
    else:
        fresh = F.lit(True)
    keep = (
        fresh
        & (F.col("doc_id") == F.col("_winner.doc_id"))
        & (F.col("seg_idx") == F.col("_winner.seg_idx"))
    )
    kept_struct = F.when(keep, F.struct("seg_idx", "seg_text"))
    clean = decided.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.count(F.when(~keep, 1)).alias("n_dup"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s.seg_text),
            " ",
        ).alias("kept_text"),
    )
    delta = decided.filter(keep).select("seg_hash", "doc_id")
    return clean, delta, segs
