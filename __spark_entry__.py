"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``tez_spark`` (SURVEY.md §7 architecture).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the sort-merge-join +
    aggregation pipeline (Q08 — lineitem ⋈ orders, the reference's
    SortMergeJoinExample flagship)."""
    from tez_spark.plans.queries import q08

    return q08(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    from tez_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (omitted for genuinely
    non-SQL-expressible ops — driver records a rows-only check)."""
    from tez_spark.plans.registry import all_oracles

    return all_oracles()
