"""Counter capture + analyzers (TaskCounter / tez-tools analyzers parity:
TaskCounter.java:26, SkewAnalyzer.java, CriticalPathAnalyzer.java)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_capture_q08_shuffle_counters_nonzero(spark):
    from tez_spark.observability import capture
    from tez_spark.plans.queries import QUERIES

    rows, counters = capture(
        spark, lambda: QUERIES["q08"](spark, SF_DIR).collect()
    )
    assert len(rows) > 0
    # q08 is the sort-merge join — it must shuffle both sides.
    assert counters["SHUFFLE_BYTES_WRITTEN"] > 0, counters
    assert counters["SHUFFLE_BYTES"] > 0, counters
    assert counters["SHUFFLE_RECORDS_WRITTEN"] > 0, counters
    assert counters["NUM_STAGES"] >= 2, counters
    assert counters["EXECUTOR_RUN_TIME_MS"] > 0, counters


def test_capture_isolates_stages(spark):
    """Counters cover only the captured query's stages: a no-shuffle scan
    captured after a shuffle-heavy query reports zero shuffle."""
    from tez_spark.observability import capture

    spark.range(0, 100000, 1, 4).selectExpr("id % 7 AS k").groupBy(
        "k"
    ).count().collect()  # shuffle outside the capture window
    _, counters = capture(
        spark, lambda: spark.range(0, 1000, 1, 2).selectExpr("id * 2 AS x").collect()
    )
    assert counters["SHUFFLE_BYTES_WRITTEN"] == 0
    assert counters["NUM_STAGES"] >= 1


def test_skew_report_has_multi_task_stages(spark):
    from tez_spark.observability import skew_report

    # force a multi-task stage so the report is nonempty
    spark.range(0, 200000, 1, 8).selectExpr("id % 13 AS k").groupBy(
        "k"
    ).count().collect()
    report = skew_report(spark)
    assert report, "no multi-task COMPLETE stages found"
    for row in report:
        assert row["skew_ratio"] >= 1.0
        assert row["num_tasks"] >= 2


def test_stage_report_ranked(spark):
    from tez_spark.observability import stage_report

    spark.range(0, 100000, 1, 4).selectExpr("id % 5 AS k").groupBy(
        "k"
    ).count().collect()
    report = stage_report(spark)
    assert report
    times = [r["run_time_ms"] for r in report]
    assert times == sorted(times, reverse=True)
    assert abs(sum(r["share"] for r in stage_report(spark, top=10**6)) - 1.0) < 1e-6


def test_observability_query_registered(spark):
    from tez_spark.plans.registry import all_queries

    df = all_queries()["observability_counters"](spark, SF_DIR)
    vals = {r.counter: r.value for r in df.collect()}
    assert vals["SHUFFLE_BYTES"] > 0


def test_capture_isolates_concurrent_work(spark):
    """Job-group attribution: a shuffle-heavy query running CONCURRENTLY
    (session mode, FAIR scheduler) must not leak into the captured
    counters of a no-shuffle scan."""
    import threading

    from tez_spark.observability import capture

    stop = threading.Event()

    def background():
        while not stop.is_set():
            spark.range(0, 200000, 1, 8).selectExpr("id % 13 AS k").groupBy(
                "k"
            ).count().collect()

    t = threading.Thread(target=background, daemon=True)
    t.start()
    try:
        _, counters = capture(
            spark,
            lambda: spark.range(0, 1000, 1, 2).selectExpr("id * 2 AS x").collect(),
        )
    finally:
        stop.set()
        t.join(timeout=30)
    assert counters["SHUFFLE_BYTES_WRITTEN"] == 0, counters
    assert counters["NUM_STAGES"] >= 1
