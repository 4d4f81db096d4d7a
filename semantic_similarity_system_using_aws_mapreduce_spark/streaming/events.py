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
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return stream


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-window, per-type counts.  With a watermark the query can run
    append-mode (finalized windows only); without, complete-mode."""
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "sum_value",
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
