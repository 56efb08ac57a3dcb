"""Batch windowing twins of the streaming operators (oracle-verifiable).

Tez has no streaming — DataSourceType.EPHEMERAL / SchedulingType.CONCURRENT
are unimplemented placeholders (EdgeProperty.java:81-89,102-107) — so all
of this is extension capability. The true Structured Streaming versions
live in tez_spark.streaming.events; these batch twins compute identical
results on the static events table and carry exact DuckDB oracles.

Window alignment: F.window aligns to the epoch in the session timezone —
pinned UTC by the session factory — which matches the oracle's explicit
epoch_us arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from tez_spark.operators.core import bounded_sort

from tez_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min over events: each event lands in two
    windows. F.window(slide) is the exact batch analog of the streaming
    windowed agg."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("ws"), "event_type", "n", "sum_value"
        )
    )
    return bounded_sort(out, "ws", "event_type")


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MIN,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event (per key) exceeds `gap_minutes`. lag + running sum of
    session-start flags — one shuffle on the key, sort within partition
    (the classic secondary-sort pattern, SecondarySort.java:54-148,
    expressed as window functions)."""
    w_order = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    # Compare in MICROseconds (unix_micros), matching the oracle's epoch_us
    # arithmetic exactly — a seconds cast would misclassify sub-second
    # overshoots of the gap boundary.
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    is_new = F.when(ts_us - F.lag(ts_us).over(w_order) > gap_us, 1).otherwise(0)
    # first event per key: lag is null -> otherwise(0); cumulative sum
    # starts sessions at 0.
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: events per session, time span, value sum."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev)
    out = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.sum("value").alias("sum_value"),
    )
    return out.orderBy("user_id", "session_id")


ORACLE: dict[str, str] = {
    # Two candidate window-starts per event (epoch-aligned 30-min buckets);
    # both always contain the event for a 1h window with 30min slide.
    "window_sliding": """
        WITH e AS (
            SELECT *,
                   make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS b
            FROM events
        ), expanded AS (
            SELECT ws, event_type, value FROM (
                SELECT b AS ws, event_type, value FROM e
                UNION ALL
                SELECT b - INTERVAL 30 MINUTE AS ws, event_type, value FROM e
            )
        )
        SELECT ws, event_type, COUNT(*) AS n, SUM(value) AS sum_value
        FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS t_start, MAX(ts) AS t_end, SUM(value) AS sum_value
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
    """,
}

QUERIES = {
    "window_sliding": q_window_sliding,
    "sessionize": q_sessionize,
}
