"""Batch write-crash recovery harness (run as its own process group by
test_fault_tolerance.py — the parent SIGKILLs the whole group, python
driver AND its JVM, to emulate a preempted driver mid-`df.write`).

TestAMRecovery / TestDAGRecovery parity
(tez-tests/src/test/java/org/apache/tez/test/TestAMRecovery.java): the
reference kills the AM at chosen WAL events and asserts the DAG's
committed output is correct after restart. Spark's equivalent guarantee
is the Hadoop commit protocol (FileOutputCommitter v1): task attempts
write under `_temporary/`, the job commit promotes them and drops
`_SUCCESS` — so a driver killed mid-write must leave NO committed part
files visible at the target root, and a rerun (the restart) must produce
the complete output. The sleep_map widens the in-flight window so the
parent's kill lands mid-task, never post-commit.

Prints "WRITING" when the job is submitted; prints "DONE" only if the
write commits (the crash run must never reach it).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    target = sys.argv[1]
    sleep_s = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    sf_dir = os.environ.get("TEZ_SPARK_TEST_SF", "/root/testdata/sf0.001")

    from tez_spark.operators.core import sleep_map
    from tez_spark.session import get_spark
    from tez_spark.sources.catalog import load_table

    spark = get_spark(
        app_name="tez_spark_write_crash", cpus=4, shuffle_partitions=8
    )
    df = load_table(spark, sf_dir, "orders").repartition(8)
    if sleep_s > 0:
        df = sleep_map(df, sleep_s)
    print("WRITING", flush=True)
    df.write.mode("overwrite").parquet(target)
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
