"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans_r17.py <suffix> <query> [<query> ...]
Writes plans/r17/<query>_<suffix>.txt at the bench SF (sf0.1 — the scale
the optimization round's claims are made at). Only plans are built; no
query is executed.
"""
import os
import sys

sys.path.insert(0, ".")

from tez_spark.plans.registry import all_queries
from tez_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="dump_plans_r17", cpus=8, shuffle_partitions=8)
    qs = all_queries()
    os.makedirs("plans/r17", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r17/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(formatted)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
