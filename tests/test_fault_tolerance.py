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


def test_write_crash_leaves_no_partial_commit(tmp_path):
    """TestAMRecovery parity for the batch write path: SIGKILL the whole
    driver process group (python + JVM) while `df.write.parquet` is
    in flight, then assert the commit protocol's all-or-nothing
    guarantee — no committed part files at the target root, no _SUCCESS
    — and that a rerun (the restart) produces the complete output with
    no leftover temporary state."""
    import glob
    import signal
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = str(tmp_path / "snapshot")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    harness = os.path.join(repo, "tests", "write_crash_harness.py")

    # phase 1: crash mid-write. 3s of sleep per task x 8 partitions on 4
    # cores = a >=6s in-flight window; kill as soon as task attempts
    # appear under _temporary (well before job commit).
    proc = subprocess.Popen(
        [sys.executable, harness, target, "3.0"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: the kill takes the JVM too
    )
    try:
        deadline = time.time() + 120
        tmp_marker = os.path.join(target, "_temporary")
        while time.time() < deadline and not os.path.exists(tmp_marker):
            if proc.poll() is not None:
                raise AssertionError("harness exited before writing started")
            time.sleep(0.1)
        assert os.path.exists(tmp_marker), "write never started"
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=30)

    committed = glob.glob(os.path.join(target, "*.parquet")) + glob.glob(
        os.path.join(target, "part-*")
    )
    assert committed == [], f"crashed write left committed files: {committed}"
    assert not os.path.exists(os.path.join(target, "_SUCCESS"))

    # phase 2: restart — rerun the identical write; it must commit the
    # complete output and leave no temporary state behind.
    proc2 = subprocess.run(
        [sys.executable, harness, target],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "DONE" in proc2.stdout
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    assert not os.path.exists(os.path.join(target, "_temporary"))

    import duckdb

    sf_dir = os.environ.get("TEZ_SPARK_TEST_SF", "/root/testdata/sf0.001")
    con = duckdb.connect()
    expect = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    got = con.execute(
        f"SELECT count(*) FROM '{target}/*.parquet'"
    ).fetchone()[0]
    con.close()
    assert got == expect, f"restart wrote {got} rows, expected {expect}"


def test_compaction_swap_survives_sigkill_between_renames(spark, tmp_path):
    """VERDICT r14 item 4: pin _recover_swap against a GENUINE kill, not
    an in-process simulation. A subprocess runs compact_exactsubstr_store
    with os.rename patched to hang after swap step 1 (live store renamed
    aside, compacted twin not yet promoted); the parent SIGKILLs the
    whole group there — python driver and JVM — then recovers and
    asserts the store is byte-for-row identical to an uninterrupted
    compaction of the same store."""
    import glob
    import shutil
    import signal
    import time

    from pyspark.sql import functions as F

    from tez_spark.sources.catalog import load_table
    from tez_spark.streaming.ingest import (
        _recover_swap,
        compact_exactsubstr_store,
        maintain_exactsubstr,
    )

    sf_dir = os.environ.get("TEZ_SPARK_TEST_SF", "/root/testdata/sf0.001")
    doc_a = " ".join(f"swapkill_a{i:03d}" for i in range(24))
    doc_b = " ".join(f"swapkill_b{i:03d}" for i in range(24))
    stream_dir = str(tmp_path / "arrivals")
    os.makedirs(stream_dir)
    for i, rows in enumerate([[(9_600_001, doc_a)], [(9_600_002, doc_b)]]):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(stream_dir, f"t{i}"))
        f = glob.glob(os.path.join(stream_dir, f"t{i}", "*.parquet"))[0]
        shutil.move(f, os.path.join(stream_dir, f"batch_{i}.parquet"))
        shutil.rmtree(os.path.join(stream_dir, f"t{i}"))
    store = str(tmp_path / "store")
    maintain_exactsubstr(spark, sf_dir, store, stream_dir, lambda s, b: s.collect())
    freq = os.path.join(store, "gramfreq")
    assert sorted(os.listdir(freq)) == ["batch_0", "batch_1", "seed"]

    # uninterrupted twin: the ground truth the recovery must match
    twin = str(tmp_path / "twin")
    os.makedirs(twin)
    shutil.copytree(freq, os.path.join(twin, "gramfreq"))
    assert compact_exactsubstr_store(spark, twin) == 2

    # crash run: SIGKILL the whole process group between the two renames
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "swap_crash_harness.py"), store],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: the kill takes the JVM too
    )
    try:
        deadline = time.time() + 240
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if line.strip() in ("SWAP1", "DONE") or proc.poll() is not None:
                break
        assert line.strip() == "SWAP1", f"harness never reached swap step 1: {line!r}"
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=30)

    # the on-disk state is the real interrupted-swap window
    assert not os.path.exists(freq), "kill landed after swap completed"
    assert os.path.isdir(freq + "_compact"), "compacted twin missing at kill"

    _recover_swap(freq)
    assert sorted(os.listdir(freq)) == ["batch_1", "seed"]

    # recovered store rows == uninterrupted compaction's rows, exactly
    import duckdb

    con = duckdb.connect()

    def rows(d):
        return con.execute(
            "SELECT g, cnt, doc_id, pos FROM read_parquet(?) ORDER BY ALL",
            [os.path.join(d, "*", "*.parquet")],
        ).fetchall()

    got, want = rows(freq), rows(os.path.join(twin, "gramfreq"))
    con.close()
    assert got == want and len(got) > 0

    # and the recovered store streams on: a restart call must not reseed
    # (seed subdir already present) nor re-report committed batches
    replay: list = []
    maintain_exactsubstr(
        spark, sf_dir, store, stream_dir, lambda s, b: replay.extend(s.collect())
    )
    assert replay == [], "restart after recovery re-processed committed batches"
