"""Fault-tolerance harness (run as a subprocess by test_fault_tolerance.py
— it needs its own JVM: the retry count is baked into the master string
`local[4,2]`, which the shared test session doesn't use).

Translation of TestFaultTolerance.java:67: run a q08-shaped join+agg
pipeline with (a) an injected first-attempt task failure and (b) a
SleepProcessor-style synthetic delay, and verify the answer is identical
to the clean run. Spark's lineage recomputes the failed partition; the
assertion is that recomputation is deterministic (nothing in the operator
path depends on ids/rand that renumber across attempts).

Prints ONE JSON line: {"match": bool, "retried": bool, "rows": N}.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F


def pipeline(spark, sf_dir, marker_dir=None):
    from tez_spark.operators.core import flaky_once, sleep_map
    from tez_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    if marker_dir is not None:
        li = sleep_map(flaky_once(li, marker_dir), 0.05)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .orderBy("o_orderstatus")
    )


def main() -> None:
    marker_dir = sys.argv[1]
    sf_dir = os.environ.get("TEZ_SPARK_TEST_SF", "/root/testdata/sf0.001")
    from tez_spark.session import get_spark

    spark = get_spark(
        app_name="tez_spark_ft",
        cpus=4,
        shuffle_partitions=8,
        master="local[4,2]",  # 2 task attempts: survive the injected fault
    )
    clean = [tuple(r) for r in pipeline(spark, sf_dir).collect()]
    faulty = [tuple(r) for r in pipeline(spark, sf_dir, marker_dir).collect()]
    retried = any(
        name.endswith("_a1") for name in os.listdir(marker_dir)
    ) if os.path.isdir(marker_dir) else False
    print(
        json.dumps(
            {"match": clean == faulty, "retried": retried, "rows": len(faulty)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
