"""Stage-level profile of q_dedup_incremental's per-run floor (VERDICT
r6 task 1): run the query warm under a job group, then print every stage
the run executed — submission order, name/callsite, task count, executor
run time, shuffle bytes — so the repeated exchanges across the two
band-join branches are attributable.

Usage: python tools/profile_dedup_incremental.py [sf_dir] [n_runs]
Run on an IDLE box (check uptime first; the r6 attempt at steal <0.2%
but 2x ambient wall inflation produced meaningless attributions).
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(sf_dir: str, runs: int = 2) -> None:
    from tez_spark.observability import _status_store
    from tez_spark.operators.dedup import corpus_artifacts, q_dedup_incremental
    from tez_spark.operators.core import release_caches
    from tez_spark.session import get_spark

    spark = get_spark(cpus=32)
    sc = spark.sparkContext

    # prewarm: corpus artifacts (the persisted signature store — NOT part
    # of the per-batch floor) + one full warm run for JIT/codegen
    corpus_artifacts(spark, sf_dir)
    t0 = time.time()
    q_dedup_incremental(spark, sf_dir).collect()
    print(f"warmup run: {time.time() - t0:.2f}s", file=sys.stderr)

    jvm = sc._jvm
    store = _status_store(spark)
    quantiles = sc._gateway.new_array(jvm.double, 0)

    best = None
    for i in range(runs):
        release_caches()
        corpus_artifacts(spark, sf_dir)  # memoized — instant
        group = f"prof-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "dedup_incremental profile")
        t0 = time.time()
        q_dedup_incremental(spark, sf_dir).collect()
        wall = time.time() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)

        tracker = sc.statusTracker()
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        stage_ids: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                stage_ids.update(int(s) for s in info.stageIds)
        rows = []
        for sid in sorted(stage_ids):
            try:
                seq = store.stageData(
                    sid, False, jvm.java.util.ArrayList(), False, quantiles
                )
            except Exception:
                continue
            it = seq.iterator()
            while it.hasNext():
                sd = it.next()
                rows.append(
                    {
                        "stage": sid,
                        "status": str(sd.status()),
                        "tasks": int(sd.numCompleteTasks()),
                        "run_ms": int(sd.executorRunTime()),
                        "sh_read": int(sd.shuffleReadBytes()),
                        "sh_write": int(sd.shuffleWriteBytes()),
                        "in_bytes": int(sd.inputBytes()),
                        "name": str(sd.name())[:90],
                    }
                )
        print(f"\n=== run {i}: wall {wall:.2f}s, {len(job_ids)} jobs, "
              f"{len(rows)} stages ===")
        for r in rows:
            print(
                f"s{r['stage']:>4} {r['status']:<9} t{r['tasks']:>3} "
                f"{r['run_ms']:>6}ms shR {r['sh_read']:>9} shW {r['sh_write']:>9} "
                f"in {r['in_bytes']:>9}  {r['name']}"
            )
        agg_run = sum(r["run_ms"] for r in rows)
        print(f"total executor ms {agg_run}, stages {len(rows)}, "
              f"jobs {len(job_ids)}, wall {wall:.2f}s")
        if best is None or wall < best[0]:
            best = (wall, len(rows), len(job_ids))
    print(f"\nbest: wall {best[0]:.2f}s, {best[1]} stages, {best[2]} jobs")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    profile(sf, n)
