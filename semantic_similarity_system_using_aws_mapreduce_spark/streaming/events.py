"""Structured Streaming operators over the events table.

The reference is batch-only (plain chained MapReduce jobs,
App.java:119-137 — SURVEY.md §2.9): streaming is net-new engine
surface.  Everything here is built-in Structured Streaming — tumbling /
sliding windows, session windows, watermarks — no custom state store.

Design for scale: these are the same aggregations as the batch
workload/events.py queries; in production the source is Kafka/files and
the sink is a Delta/parquet table via foreachBatch.  Watermarks bound
state: a `1 hour` watermark means window state older than
max(event time) - 1h is dropped, so state size is O(active windows x
keys), independent of stream length.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.merge import merge_upsert


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (the local test
    harness; swap for Kafka in production).  Handles the fixture's
    TIMESTAMP(NANOS) encoding like the batch reader.

    The file stream source requires a *directory*; the fixture is a
    single file, so expose it through a symlinked temp directory."""
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stream_dir = tempfile.mkdtemp(prefix="event_stream_")
    os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    from semantic_similarity_system_using_aws_mapreduce_spark.sources.tables import normalize_ts

    return normalize_ts(stream)


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-window, per-type counts.  With a watermark the query can run
    append-mode (finalized windows only); without, complete-mode."""
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    # integer-micros sum, matching the batch twin q_hourly_event_stats
    # (exact summation regardless of micro-batch arrival order)
    micros = F.round(F.col("value") * 1_000_000, 0).cast("long")
    return (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum(micros).alias("_sm"))
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            F.round(F.col("_sm") / 1_000_000.0, 4).alias("sum_value"),
        )
    )


def sliding_value_avg(
    stream: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window average value per event type."""
    return (
        stream.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "avg_value",
            "n",
        )
    )


def session_aggregates(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (session_window — the
    streaming twin of the batch lag+cumsum sessionization)."""
    return (
        stream.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    per-user (event count, value sum) maintained in the state store
    across micro-batches, emitting the updated totals each batch.

    This is the template for operators the built-in windows can't
    express (custom counters, fraud scores, sessionized features);
    state is per-key and bounded, timeouts would evict idle users in a
    real deployment."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, v double"

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 4)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, output_schema, state_schema, "update", "NoTimeout"
        )
    )


def stream_interval_join(
    stream: DataFrame,
    max_delay_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase event is joined to
    the same user's view events from the preceding ``max_delay_minutes``
    (the attribution join — which views led to this purchase).

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends, so Spark can evict view-side state once the
    purchase watermark passes ``view_ts + max_delay`` — state stays
    O(active window), independent of stream length.  This is the
    streaming twin of operators/range_join.interval_join with the
    user id as an equi-key."""
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_delay_minutes} MINUTES"))
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", "user_id", "p_ts", "view_id", "v_ts", "value"
    )


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins the
    static dimension relation on ``on`` — the lookup-table pattern
    (user profile, feature flags, model routing) of a production event
    pipeline.

    Stateless by construction: the static side is re-planned per
    micro-batch (a refreshed dim table is picked up on the next batch),
    no watermark or join state is kept, and the broadcast hint keeps
    the per-batch join map-side — at 100 TB of stream the dim table is
    the only thing that must fit in executor memory."""
    return stream.join(F.broadcast(dim), on, how)


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
    a key's dedup state once the watermark passes its event time — so
    state is O(keys active inside the watermark window), independent of
    stream length.  This is the streaming twin of the batch exact-dedup
    operator (a replayed Kafka partition or an at-least-once upstream
    produces duplicate event_ids; this removes them before they reach
    an aggregation).

    Plain ``dropDuplicates`` on a stream would keep every key seen
    FOREVER (unbounded state) — the WithinWatermark variant is the only
    scale-safe form.
    """
    keys = keys or ["event_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_foreach_batch_upsert(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
) -> None:
    """Streaming CDC sink: drive the (bounded) stream through
    ``foreachBatch``, MERGE-upserting each micro-batch into a parquet
    target table — the standard sink pattern when no lakehouse format
    is available (foreachBatch hands you a batch DataFrame, so the
    batch merge_upsert operator applies unchanged).

    Each micro-batch is first reduced to its latest version per key
    (greatest ``order_col``; later batches overwrite earlier ones by
    stream order), satisfying merge_upsert's one-source-row-per-key
    contract.  The merged result is cached and counted BEFORE the
    overwrite so the copy-on-write never reads the files it is
    deleting.  At scale the target would be partitioned and the
    rewrite restricted via dynamic partition overwrite
    (operators/merge.py docstring).
    """
    from pyspark.sql import Window

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c) for c in batch.columns]
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, latest, keys, validate=False)
        except Exception:  # first batch: no target yet
            merged = latest
        merged = merged.cache()
        merged.count()  # materialize before overwriting the input files
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()

    q = stream.writeStream.foreachBatch(_apply).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_memory(
    agg: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Drive a bounded streaming aggregation to completion through a
    memory sink and return the materialized result table."""
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.table(name)
