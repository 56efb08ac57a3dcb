"""Fault-tolerance verification — same answer despite task retry
(TestFaultTolerance.java:67 parity). Runs the harness in a subprocess
because the retrying master (local[4,2]) can't coexist with the shared
test session's JVM."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_speculation_marks_straggler(tmp_path):
    """LegacySpeculator parity (see tests/speculation_harness.py): a
    straggler_map job on local-cluster with spark.speculation on must
    (a) produce the correct answer and (b) have the scheduler flag the
    straggler as speculatable from the finished-task runtime estimate.
    The launch of the copy is host-diverse-cluster behavior and is
    documented, not asserted, on this single-host box."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tests", "speculation_harness.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["total"] == result["expect"], "wrong answer under speculation"
    assert "as speculatable" in proc.stderr, (
        "scheduler never marked the straggler speculatable:\n"
        + proc.stderr[-2000:]
    )


def test_same_answer_despite_task_retry(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    marker_dir = str(tmp_path / "markers")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tests", "ft_harness.py"), marker_dir],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["retried"], "injected fault never retried — harness broken"
    assert result["match"], "retry produced a different answer"
    assert result["rows"] > 0
