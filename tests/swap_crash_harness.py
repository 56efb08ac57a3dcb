"""Compaction swap-crash harness (run as its own process group by
test_fault_tolerance.py — the parent SIGKILLs the whole group, python
driver AND its JVM, to emulate a crash landing BETWEEN the two renames
of _compact_delta_store's store swap).

write_crash_harness.py precedent (TestAMRecovery parity,
tez-tests/.../TestAMRecovery.java: kill at chosen WAL events, assert
recovery): here the "WAL event" is swap step 1 — os.rename is patched
so that the rename that moves the LIVE store aside (dst endswith
"_old") completes, prints "SWAP1", and then hangs until the parent's
kill lands. The store on disk is then exactly the interrupted-swap
state _recover_swap exists for: live store missing, completed
compacted twin beside it.

Prints "SWAP1" after swap step 1 completes; prints "DONE" only if the
whole compaction commits (the crash run must never reach it).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    store_dir = sys.argv[1]

    real_rename = os.rename

    def patched(src, dst, *a, **kw):
        real_rename(src, dst, *a, **kw)
        if str(dst).endswith("_old"):
            print("SWAP1", flush=True)
            time.sleep(600)  # hold the crash window open for the kill

    os.rename = patched

    from tez_spark.session import get_spark
    from tez_spark.streaming.ingest import compact_exactsubstr_store

    spark = get_spark(
        app_name="tez_spark_swap_crash", cpus=4, shuffle_partitions=8
    )
    compact_exactsubstr_store(spark, store_dir)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
