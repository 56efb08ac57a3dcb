"""Run every history analyzer over a persisted Spark event log — the
AnalyzerDriver analog (reference tez-tools/analyzers/job-analyzer/src/
main/java/org/apache/tez/analyzer/plugins/AnalyzerDriver.java runs the
plugin set over a DAG history file; here the history is Spark's JSON
event log and the plugins are the *_from_history analyzers).

Usage: python tools/analyze_log.py <event-log-file-or-dir> [top_n]

Pure Python — no SparkSession: a closed or remote application's log is
analyzable anywhere. Prints one JSON object with a section per analyzer;
empty sections mean "nothing to report" (no spill, no hung tasks, ...),
which is itself the finding on a healthy run.
"""
import json
import os
import sys

# repo root, not cwd: the CLI must work from any working directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tez_spark.observability import (  # noqa: E402
    container_reuse_report_from_history,
    critical_path_from_history,
    dag_overview_from_history,
    hung_task_report_from_history,
    input_read_error_report_from_history,
    load_history,
    locality_report_from_history,
    one_on_one_edge_report_from_history,
    shuffle_time_report_from_history,
    skew_report_from_history,
    slow_node_report_from_history,
    slow_task_report_from_history,
    slowest_vertex_report_from_history,
    spill_report_from_history,
    stage_report_from_history,
    task_assignment_from_history,
    task_attempt_stats_from_history,
    task_concurrency_from_history,
    vertex_critical_paths_from_history,
)


def analyze(path: str, top: int = 20) -> dict:
    h = load_history(path)
    return {
        "stages_parsed": len(h["stages"]),
        "task_attempts_parsed": len(h.get("tasks", [])),
        "dag_overview": dag_overview_from_history(h),
        "critical_path": critical_path_from_history(h),
        "stage_report": stage_report_from_history(h, top=top),
        "slowest_vertices": slowest_vertex_report_from_history(h, top=top),
        "slow_tasks": slow_task_report_from_history(h, top=top),
        "skew": skew_report_from_history(h),
        "spill": spill_report_from_history(h, top=top),
        "shuffle_time": shuffle_time_report_from_history(h, top=top),
        "task_concurrency": task_concurrency_from_history(h),
        "task_assignment": task_assignment_from_history(h),
        "slow_nodes": slow_node_report_from_history(h),
        "locality": locality_report_from_history(h),
        "attempt_stats": task_attempt_stats_from_history(h),
        "hung_tasks": hung_task_report_from_history(h),
        "input_read_errors": input_read_error_report_from_history(h),
        # r11 — the final three reference plugins (17/17).
        # one_on_one needs DECLARED edge pairs: the identity-width
        # inference cannot distinguish true 1:1 edges from ordinary
        # constant-partition shuffle boundaries, so an unattended CLI
        # run would flood healthy jobs with false "misses" — call
        # one_on_one_edge_report_from_history(h, edges=[(src, dst)...])
        # with the DAG's declared pairs for the real audit.
        "one_on_one_edges": {
            "note": "requires declared edge pairs; see "
            "one_on_one_edge_report_from_history(history, edges)"
        },
        "container_reuse": container_reuse_report_from_history(h),
        "vertex_critical_paths": vertex_critical_paths_from_history(h, top=top),
    }


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(json.dumps(analyze(sys.argv[1], top), indent=1, default=str))
