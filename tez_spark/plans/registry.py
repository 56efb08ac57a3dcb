"""Single registry of every declared query + its DuckDB oracle.

Core Q01–Q18 come from tez_spark.plans.queries; extension registries
(dedup, similarity, text, streaming, multimodal) are merged in as they
land. ``all_queries()`` and ``all_oracles()`` feed __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tez_spark.plans import queries as core_q

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = dict(core_q.QUERIES)
    out.update(_extension_queries())
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = dict(core_q.ORACLE)
    out.update(_extension_oracles())
    return out


def _extension_queries() -> dict[str, QueryFn]:
    exts: dict[str, QueryFn] = {}
    for mod in _extension_modules():
        exts.update(mod.QUERIES)
    return exts


def _extension_oracles() -> dict[str, str]:
    exts: dict[str, str] = {}
    for mod in _extension_modules():
        exts.update(getattr(mod, "ORACLE", {}))
    return exts


def _extension_modules():
    mods = []
    for name in (
        "tez_spark.plans.queries_ext",
        "tez_spark.operators.dedup",
        "tez_spark.operators.similarity",
        "tez_spark.functions.text_queries",
        "tez_spark.operators.multimodal",
        "tez_spark.streaming.windows",
        "tez_spark.observability",
        "tez_spark.plans.curation",
        "tez_spark.plans.tpch",
    ):
        try:
            mods.append(__import__(name, fromlist=["QUERIES"]))
        except ImportError:
            continue
    return mods
