"""Structured Streaming smoke: the streaming plans produce the same
answers as their batch twins on the finite fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_tumbling_stream_matches_batch(spark):
    from tez_spark.sources.catalog import load_table
    from tez_spark.streaming.events import (
        run_to_completion,
        stream_events,
        tumbling_counts,
    )

    stream = stream_events(spark, SF_DIR)
    got = run_to_completion(tumbling_counts(stream), "t_tumble", spark)

    ev = load_table(spark, SF_DIR, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_window_stream_runs(spark):
    from tez_spark.streaming.events import (
        run_to_completion,
        session_counts,
        stream_events,
    )

    stream = stream_events(spark, SF_DIR)
    got = run_to_completion(session_counts(stream), "t_sess", spark)
    rows = got.collect()
    assert len(rows) > 0
    # sessions are disjoint per user and each holds >=1 event
    assert all(r.n_events >= 1 for r in rows)
