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

# The driver's correctness gate checks the FIRST 50 registry entries in
# insertion order.  69 of 74 queries are oracled, so ordering decides which
# get a driver-verified row each round.  Policy: (1) core q01–q18, (2) the
# TPC-H suite, (3) curation / text / streaming / multimodal oracled queries,
# (4) the heavyweight dedup/similarity oracled operators — exactly 50; the
# remaining oracled entries (all driver-verified green in round 2, see
# CORRECTNESS_r02.json) follow, and rows-only entries go last.  Everything
# outside the window stays covered by tests/test_queries_oracle.py, which
# runs the identical DuckDB comparison over every registry entry.
_PRIORITY: tuple[str, ...] = (
    # 1. core relational patterns (driver-green r1+r2)
    *[f"q{i:02d}" for i in range(1, 19)],
    # 2. TPC-H suite (never driver-verified before round 3)
    "tpch01", "tpch03", "tpch04", "tpch05", "tpch06", "tpch07", "tpch08",
    "tpch10", "tpch13", "tpch14", "tpch15", "tpch17", "tpch18", "tpch19",
    "tpch21", "tpch22",
    # 3. curation / text / streaming / multimodal oracles
    "curation_pipeline", "train_split",
    "text_metrics", "text_langid", "text_fingerprint",
    "sessionize", "window_sliding", "multimodal_decode",
    # 4. dedup / similarity oracles (driver-green r2, kept in-window:
    #    they are the flagship scale operators)
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_embedding",
    "ann_topk", "interval_join",
)


def _ordered(entries: dict[str, QueryFn]) -> dict[str, QueryFn]:
    oracles = all_oracles()
    rest_oracled = sorted(k for k in entries if k not in _PRIORITY and k in oracles)
    rows_only = sorted(k for k in entries if k not in _PRIORITY and k not in oracles)
    order = [k for k in _PRIORITY if k in entries] + rest_oracled + rows_only
    return {k: entries[k] for k in order}


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = dict(core_q.QUERIES)
    out.update(_extension_queries())
    return _ordered(out)


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
