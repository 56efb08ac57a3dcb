"""Counters + offline analyzers — the reference's observability surface
re-expressed over Spark's AppStatusStore.

Parity targets:
- TaskCounter (tez-api/src/main/java/org/apache/tez/common/counters/
  TaskCounter.java:26 — SHUFFLE_BYTES :169, SPILLED_RECORDS :58,
  INPUT_RECORDS_PROCESSED, OUTPUT_RECORDS): `capture()` snapshots the
  per-stage metrics Spark already tracks and aggregates them into a
  Tez-flavored counter map for the stages a query executed.
- tez-tools analyzers (tez-tools/analyzers/job-analyzer/src/main/java/org/
  apache/tez/analyzer/plugins/SkewAnalyzer.java, SpillAnalyzerImpl.java,
  CriticalPathAnalyzer.java): `skew_report()` computes per-stage
  max/median task-duration ratios from task-level data; `stage_report()`
  ranks stages by executor run time (the single-DAG critical-path
  equivalent: with AQE, stage boundaries are the schedule).

Implementation note: reads AppStatusStore through the JVM gateway — the
same store that backs the Spark UI / REST API, so no extra listener is
installed and nothing is paid in the hot path. Counter VALUES are
engine-specific (Spark compresses shuffle blocks, Tez counts records at
different points), so these are observability, not oracle-checkable
semantics — the registered query is declared rows-only.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

# AppStatusStore stage metric -> Tez TaskCounter-flavored name.
_COUNTER_FIELDS: tuple[tuple[str, str], ...] = (
    ("inputBytes", "INPUT_BYTES"),
    ("inputRecords", "INPUT_RECORDS_PROCESSED"),
    ("outputBytes", "OUTPUT_BYTES"),
    ("outputRecords", "OUTPUT_RECORDS"),
    ("shuffleReadBytes", "SHUFFLE_BYTES"),
    ("shuffleReadRecords", "SHUFFLE_RECORDS_READ"),
    ("shuffleWriteBytes", "SHUFFLE_BYTES_WRITTEN"),
    ("shuffleWriteRecords", "SHUFFLE_RECORDS_WRITTEN"),
    ("memoryBytesSpilled", "SPILLED_BYTES_MEMORY"),
    ("diskBytesSpilled", "SPILLED_BYTES_DISK"),
    ("executorRunTime", "EXECUTOR_RUN_TIME_MS"),
    ("executorCpuTime", "EXECUTOR_CPU_TIME_NS"),
    ("jvmGcTime", "GC_TIME_MS"),
    ("numCompleteTasks", "NUM_COMPLETED_TASKS"),
)


def _status_store(spark: SparkSession):
    return spark.sparkContext._jsc.sc().statusStore()


def _iter_stages(spark: SparkSession):
    sc = spark.sparkContext
    jvm = sc._jvm
    store = _status_store(spark)
    quantiles = sc._gateway.new_array(jvm.double, 0)
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False, quantiles, jvm.java.util.ArrayList()
    )
    it = stages.iterator()
    while it.hasNext():
        yield it.next()


def _stage_row(sd, with_fields: bool = True) -> dict[str, Any]:
    row: dict[str, Any] = {
        "stage_id": sd.stageId(),
        "attempt_id": sd.attemptId(),
        "status": str(sd.status()),
        "name": sd.name(),
    }
    if with_fields:
        for field, counter in _COUNTER_FIELDS:
            row[counter] = int(getattr(sd, field)())
    return row


def _stage_list(spark: SparkSession) -> list[dict[str, Any]]:
    """All stages the application has run, as plain dicts."""
    return [_stage_row(sd) for sd in _iter_stages(spark)]


def capture(spark: SparkSession, fn: Callable[[], Any]) -> tuple[Any, dict[str, int]]:
    """Run fn() and return (result, counters) where counters aggregates
    the TaskCounter-flavored metrics over exactly the stages fn executed.

    Attribution is by JOB GROUP, not a before/after stage diff: fn runs
    under a unique group id and only stages belonging to that group's
    jobs are counted, so work submitted concurrently from other threads
    (the FAIR-scheduler session-mode pattern) never leaks into the
    captured totals. Py4J round-trips stay bounded: metric fields are
    extracted only for the group's stages."""
    import uuid

    sc = spark.sparkContext
    group = f"tezspark-capture-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "tez_spark observability capture")
    try:
        result = fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    tracker = sc.statusTracker()
    stage_ids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is not None:
            stage_ids.update(int(s) for s in info.stageIds)
    counters: dict[str, int] = {name: 0 for _, name in _COUNTER_FIELDS}
    n_seen = 0
    for sd in _iter_stages(spark):
        if sd.stageId() not in stage_ids:
            continue
        n_seen += 1
        for field, name in _COUNTER_FIELDS:
            counters[name] += int(getattr(sd, field)())
    counters["NUM_STAGES"] = n_seen
    return result, counters


def task_durations(spark: SparkSession, stage_id: int, attempt_id: int = 0,
                   max_tasks: int = 10_000) -> list[int]:
    """Completed-task durations (ms) for one stage."""
    tl = _status_store(spark).taskList(stage_id, attempt_id, max_tasks)
    out = []
    it = tl.iterator()
    while it.hasNext():
        t = it.next()
        d = t.duration()
        if d.isDefined():
            out.append(int(d.get()))
    return out


def skew_report(spark: SparkSession, min_tasks: int = 2) -> list[dict[str, Any]]:
    """SkewAnalyzer parity: per stage, max vs median task duration.
    Ratios ≫ 1 mean one task dominated — a hot shuffle key (salt it or
    let AQE skew-split) or an unsplittable input."""
    out = []
    for s in _stage_list(spark):
        if s["status"] != "COMPLETE" or s["NUM_COMPLETED_TASKS"] < min_tasks:
            continue
        durs = sorted(task_durations(spark, s["stage_id"], s["attempt_id"]))
        if len(durs) < min_tasks:
            continue
        median = durs[len(durs) // 2] or 1
        out.append(
            {
                "stage_id": s["stage_id"],
                "name": s["name"],
                "num_tasks": len(durs),
                "median_ms": median,
                "max_ms": durs[-1],
                "skew_ratio": durs[-1] / median,
            }
        )
    return sorted(out, key=lambda r: -r["skew_ratio"])


def stage_report(spark: SparkSession, top: int = 20) -> list[dict[str, Any]]:
    """CriticalPathAnalyzer (simplified, single-DAG): stages ranked by
    executor run time with their share of the app total — where the wall
    clock went, and the first place to look for a scale bottleneck."""
    stages = [s for s in _stage_list(spark) if s["status"] == "COMPLETE"]
    total = sum(s["EXECUTOR_RUN_TIME_MS"] for s in stages) or 1
    ranked = sorted(stages, key=lambda s: -s["EXECUTOR_RUN_TIME_MS"])[:top]
    return [
        {
            "stage_id": s["stage_id"],
            "name": s["name"],
            "run_time_ms": s["EXECUTOR_RUN_TIME_MS"],
            "share": s["EXECUTOR_RUN_TIME_MS"] / total,
            "SHUFFLE_BYTES": s["SHUFFLE_BYTES"],
            "SPILLED_BYTES_DISK": s["SPILLED_BYTES_DISK"],
        }
        for s in ranked
    ]


def q_observability_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter capture demonstrated on the sort-merge-join query (q08):
    returns (counter, value) rows for the stages it ran. Rows-only check —
    byte counts are engine-specific (compressed shuffle blocks etc.)."""
    from tez_spark.plans.queries import QUERIES

    _, counters = capture(spark, lambda: QUERIES["q08"](spark, sf_dir).collect())
    rows = sorted(counters.items())
    return spark.createDataFrame(rows, "counter string, value long").orderBy("counter")


QUERIES = {
    "observability_counters": q_observability_counters,
}

ORACLE: dict[str, str] = {}
