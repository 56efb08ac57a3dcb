"""Subprocess harness for the speculation test (LegacySpeculator parity).

Runs a straggler_map job on local-cluster[2,4,1024] (separate executor
JVMs — real task scheduling, unlike local[N]) with spark.speculation on,
and reports via one JSON line on stdout whether (a) the job's answer is
correct and (b) the scheduler MARKED the straggler speculatable.

The speculation DECISION is the LegacySpeculator-parity logic under test
(estimate per-task runtime from finished tasks, flag outliers past
quantile+multiplier — LegacySpeculator.java computes the same from its
runtime estimator). The decision is observable as TaskSetManager's
"Marking task N ... as speculatable" INFO line, which this harness
surfaces via a log4j2 override and the test greps from stderr.

The speculative LAUNCH is deliberately not asserted: Spark refuses to run
a speculative copy on a host that already has an attempt of that task
(TaskSetManager.dequeueTaskHelper -> hasAttemptOnHost), and every
local-cluster executor reports the same host — on one physical machine
the copy is unschedulable BY DESIGN (you don't speculate onto the machine
that is already slow). On a multi-host cluster the same decision launches
the copy; nothing engine-side differs.

spark.speculation.efficiency.enabled is turned off to exercise the
duration-outlier rule (the LegacySpeculator analog) in isolation — the
efficiency heuristic gates on records-processed rates, which a sleeping
synthetic task never accrues.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault(
    "SPARK_HOME", os.path.dirname(__import__("pyspark").__file__)
)

LOG4J = """\
rootLogger.level = warn
rootLogger.appenderRef.stderr.ref = console
appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %p %c{1}: %m%n
logger.tsm.name = org.apache.spark.scheduler.TaskSetManager
logger.tsm.level = info
"""


def main() -> None:
    from pyspark.sql import SparkSession

    with tempfile.NamedTemporaryFile(
        "w", suffix=".properties", delete=False
    ) as f:
        f.write(LOG4J)
        log4j_path = f.name

    spark = (
        SparkSession.builder.master("local-cluster[2,4,1024]")
        .appName("tez_spark_speculation")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.2")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.speculation.efficiency.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dlog4j.configurationFile={log4j_path}",
        )
        .getOrCreate()
    )
    try:
        from tez_spark.operators.core import straggler_map

        df = spark.range(0, 800, 1, 8)
        out = straggler_map(
            df, slow_partition=0, slow_seconds=12.0, fast_seconds=0.3
        )
        total = out.groupBy().sum("id").collect()[0][0]
        print(json.dumps({"total": int(total), "expect": 319600}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
