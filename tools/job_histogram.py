"""Fleet-wide per-query job/stage histogram (VERDICT r11 item 2a).

The bench ratio's composition is ~80 sub-second rows paying Spark's
per-plan driver floor; the r7/r11 profiles showed that floor is
SERIALIZED DRIVER JOBS (AQE stage materializations, broadcast builds,
range samplers), not bytes. This tool measures, for every registry
query at the bench SF, warm:

  wall_sec (min of N), n_jobs, n_stages, shuffle_bytes, executor_ms

so "queries paying >3 driver round-trips for <1 MB exchanges" are an
artifact, not a guess. Same warm-session protocol as bench.py (shared
corpus artifacts prewarmed, each plan executed once before timing).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  [TEZ_SPARK_ONLY=q01,q02] [TEZ_SPARK_HIST_RUNS=2] \
  [TEZ_SPARK_EXTRA_CONFS="spark.sql.codegen.cache.maxEntries=5000"] \
  python tools/job_histogram.py [out.json]

EXTRA_CONFS go to the session BUILDER (so static confs like the
codegen cache size apply), enabling conf A/Bs over the whole fleet.
"""

from __future__ import annotations

import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _digest(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    runs = int(os.environ.get("TEZ_SPARK_HIST_RUNS", "2"))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/job_histogram.json"

    extra: dict[str, str] = {}
    for kv in os.environ.get("TEZ_SPARK_EXTRA_CONFS", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()

    from tez_spark.observability import capture
    from tez_spark.plans.registry import all_queries
    from tez_spark.session import get_spark

    spark = get_spark(app_name="tez_spark_job_histogram", cpus=cpus,
                      shuffle_partitions=cpus, extra_confs=extra or None)

    queries = all_queries()
    only = os.environ.get("TEZ_SPARK_ONLY")
    if only:
        keep = {k.strip() for k in only.split(",")}
        queries = {k: v for k, v in queries.items() if k in keep}

    # same prewarm as bench.py — the SHARED helper, so the histogram's
    # floor attribution can never diverge from the bench protocol
    try:
        from tez_spark.operators.dedup import prewarm_corpus_artifacts

        print(f"artifact prewarm {prewarm_corpus_artifacts(spark, sf_dir)}s",
              file=sys.stderr)
    except Exception as e:
        print(f"artifact prewarm failed: {e}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name in sorted(queries):
        try:
            _digest(queries[name](spark, sf_dir))  # warm: codegen + AQE shapes
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        best = None
        for _ in range(max(1, runs)):
            # guarded like the warm run: one transient failure on query
            # 60/119 must record an error row, not abort the sweep and
            # discard every prior measurement (r12 review)
            try:
                t0 = time.monotonic()
                _, counters = capture(
                    spark, lambda: _digest(queries[name](spark, sf_dir))
                )
                wall = time.monotonic() - t0
            except Exception as e:
                best = best or {"error": str(e)[:200]}
                print(f"{name}: ERROR {e}", file=sys.stderr)
                continue
            row = {
                "wall_sec": round(wall, 3),
                "n_jobs": counters.get("NUM_JOBS", 0),
                "n_stages": counters.get("NUM_STAGES", 0),
                "shuffle_bytes": counters.get("SHUFFLE_BYTES_WRITTEN", 0),
                "executor_ms": counters.get("EXECUTOR_RUN_TIME_MS", 0),
            }
            if best is None or "error" in best or row["wall_sec"] < best["wall_sec"]:
                best = row
        results[name] = best
        print(f"{name}: {best}", file=sys.stderr, flush=True)

    ok = [(n, r) for n, r in results.items() if "error" not in r]
    total_wall = round(sum(r["wall_sec"] for _, r in ok), 2)
    total_jobs = sum(r["n_jobs"] for _, r in ok)
    summary = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "extra_confs": extra,
        "total_wall_sec": total_wall,
        "total_jobs": total_jobs,
        "n_queries": len(ok),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    # the floor fleet: many jobs, tiny exchanges
    print("\n== top driver-round-trip payers (jobs desc, <1MB shuffle) ==")
    floor = sorted(
        (r["n_jobs"], n, r) for n, r in ok if r["shuffle_bytes"] < 1 << 20
    )
    for n_jobs, n, r in reversed(floor[-25:]):
        print(f"{n:32s} jobs={n_jobs:3d} stages={r['n_stages']:3d} "
              f"wall={r['wall_sec']:6.2f}s shuf={r['shuffle_bytes']:>9d}B")
    print(f"\ntotal: {total_wall}s wall, {total_jobs} jobs, {len(ok)} queries "
          f"-> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
