"""A/B the maintain_* store-compaction benefit (r15, VERDICT r14 item 3
evidence): what does ONE more micro-batch cost against a store carrying
N per-batch delta subdirs vs the same store compacted to seed + last?

Protocol (the gram_posture_ab stamp discipline): build a
maintain_exactsubstr store by streaming N tiny single-doc batches, then
measure the wall of ONE additional trigger on (a)
pristine copies of the uncompacted store and (b) pristine copies of its
compacted twin, `--runs` times each (fresh copies per run — the trigger
commits state). The headline metric is the parquet-file count the
per-trigger prior_state read has to plan over (steal-immune, like
artifact bytes in gram_posture_ab) plus the wall medians. Job counters
are not reported: foreachBatch jobs run on the streaming thread, which
the capture listener's job-group scoping does not attribute.

Usage:
  PYTHONPATH=. python tools/compaction_ab.py [--batches 16] [--runs 3] \
      [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _write_batch(spark, stream_dir: str, rows) -> None:
    os.makedirs(stream_dir, exist_ok=True)
    i = len(glob.glob(os.path.join(stream_dir, "batch_*.parquet")))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(stream_dir, f"t{i}"))
    f = glob.glob(os.path.join(stream_dir, f"t{i}", "*.parquet"))[0]
    shutil.move(f, os.path.join(stream_dir, f"batch_{i}.parquet"))
    shutil.rmtree(os.path.join(stream_dir, f"t{i}"))


def _store_files(store: str) -> int:
    return len(
        glob.glob(os.path.join(store, "gramfreq", "*", "*.parquet"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from tez_spark.session import get_spark
    from tez_spark.streaming.ingest import (
        compact_exactsubstr_store,
        maintain_exactsubstr,
    )

    spark = get_spark(app_name="tez_spark_compaction_ab", cpus=8,
                      shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="compab_")
    base_store = os.path.join(work, "store")
    stream_dir = os.path.join(work, "arrivals")
    for i in range(args.batches):
        _write_batch(
            spark, stream_dir,
            [(9_700_000 + i, " ".join(f"cab{i:02d}_{j:03d}" for j in range(24)))],
        )
    maintain_exactsubstr(
        spark, args.sf, base_store, stream_dir, lambda s, b: s.collect()
    )

    compacted = os.path.join(work, "store_compacted")
    shutil.copytree(base_store, compacted)
    folded = compact_exactsubstr_store(spark, compacted)
    print(
        f"built store: {args.batches} deltas, "
        f"{_store_files(base_store)} files uncompacted / "
        f"{_store_files(compacted)} files compacted (folded {folded})",
        file=sys.stderr,
    )

    # ONE extra arrival file, added to the ORIGINAL stream dir after the
    # base store was built: the file-stream source tracks seen files by
    # absolute path in the checkpoint, so every run (a fresh copy of a
    # base-store checkpoint that has seen batches 0..N-1) processes
    # exactly this one new file — copying the stream dir instead would
    # make all N+1 files look unseen and replay the whole history.
    _write_batch(
        spark, stream_dir,
        [(9_800_000, " ".join(f"cabx_{j:03d}" for j in range(24)))],
    )
    results: dict[str, dict] = {}
    for label, src in (("uncompacted", base_store), ("compacted", compacted)):
        walls = []
        for r in range(args.runs):
            st = os.path.join(work, f"run_{label}_{r}")
            shutil.copytree(src, st)
            t0 = time.monotonic()
            maintain_exactsubstr(
                spark, args.sf, st, stream_dir, lambda s, b: s.collect()
            )
            walls.append(round(time.monotonic() - t0, 3))
            shutil.rmtree(st)
        results[label] = {
            "files_read_per_trigger": _store_files(src),
            "walls_sec": walls,
            "wall_median_sec": round(statistics.median(walls), 3),
        }
        print(f"{label}: {results[label]}", file=sys.stderr, flush=True)

    print(json.dumps({"batches": args.batches, "runs": args.runs, **results}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
