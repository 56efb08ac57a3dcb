"""Structured Streaming view of the events table.

Capability extension (SURVEY.md §7 step 7): Tez's streaming edge types
are unimplemented placeholders (EdgeProperty.java:81-89), so the engine
exposes streams through Spark Structured Streaming instead: readStream →
windowed/stateful transforms → writeStream, with watermarks for late
data.

For local smoke the parquet fixture drives the stream (file source +
memory sink + processAllAvailable — the guide's pattern); in production
the same plans run off kafka/cloud-storage sources unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.session import apply_runtime_confs
from tez_spark.sources.catalog import normalize_event_ts


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source over the fixture dir).

    readStream requires an explicit schema; derive it from a batch footer
    read of the same file so the stream always sees the fixture's ACTUAL
    encoding (ts has shipped as int64 nanos, TIMESTAMP_NTZ micros, and
    plain TIMESTAMP across regenerations), then normalize ts to TIMESTAMP
    identically to the batch catalog — the streaming plans must window the
    same event-time values the batch twins aggregate."""
    apply_runtime_confs(spark)  # includes nanosAsLong for legacy fixtures
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema  # footer-only read
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir if sf_dir.endswith("/") else sf_dir + "/")
    )
    return normalize_event_ts(raw)


def tumbling_counts(stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with a watermark bounding state for late
    data — state size is O(active windows × event types), independent of
    stream length."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native streaming sessionization (session_window merges windows
    within the gap — the streaming twin of windows.sessionize)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("t_start"),
            F.col("w.end").alias("t_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, dropping
    replays that land within the watermark horizon.

    The training-pipeline use: at-least-once upstream delivery (kafka
    replays, retried file commits) re-emits events; dedup state must not
    grow without bound. dropDuplicatesWithinWatermark keeps per-key state
    only until the watermark passes the key's event time — state is
    O(keys per watermark window), independent of stream length, and the
    shuffle key is the dedup key itself (one hash exchange, same shape as
    the batch dropDuplicates)."""
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def purchase_click_join(
    stream: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding `lookback` window.

    Both sides carry watermarks and the join condition bounds event time
    on both ends — that pair is what lets Spark expire join state: a
    click is held only until the purchase-side watermark passes
    click_ts + lookback, so state is O(events per lookback window per
    user), not the whole stream. The shuffle key is user_id on both
    sides (one co-partitioned exchange each, same as the batch join)."""
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")),
    ).select("p_id", "c_id", "user_id", "p_ts", "c_ts")


def maintain_rollup(
    spark: SparkSession,
    sf_dir: str,
    upsert,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Incremental materialized-view maintenance — the continuous-
    aggregate pattern (the streaming twin of the time_gapfill hourly
    rollup): update-mode windowed aggregation + foreachBatch, so each
    micro-batch delivers ONLY the (window, event_type) rows whose
    aggregates changed, and `upsert(batch_df, batch_id)` merges them
    into the serving store.

    upsert receives a normal batch DataFrame — in production it runs
    MERGE INTO / key-value puts; state per micro-batch is bounded by
    active windows × event types (watermarked), never stream length.
    Drives the finite fixture stream to completion."""
    hourly = tumbling_counts(stream_events(spark, sf_dir), width, watermark)
    q = (
        hourly.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_completion(result: DataFrame, name: str, spark: SparkSession) -> DataFrame:
    """Drive a streaming plan over the (finite) fixture to completion via
    the memory sink; returns the final result as a batch DataFrame."""
    q = (
        result.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
