"""Shuffle-volume regression guards for the flagship scale operators.

The 100TB design claims (PERF.md) are that these plans move candidate/
result rows through the shuffle, never the corpus: minhash's band join
runs over co-partitioned persisted tables, ann_topk broadcasts the query
set and shuffles only (q_id, vec_id, sim) survivor rows, and the
curation LSH twin is candidate-bounded end to end. These tests pin that
with MEASURED executor counters (observability.capture) instead of plan
inspection: losing a broadcast hint or the co-partitioning re-shuffles
corpus-sized data and blows the byte budget by orders of magnitude.

Budgets are ~6x the measured sf0.001 values — loose enough for codec /
partition-count jitter, tight enough that any corpus-sized exchange
(even at this toy scale, tens of MB) fails immediately. Spill must be
exactly zero: these plans are sized to never exceed task memory.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR


def _run(spark, fn, sf=SF_DIR):
    if not os.path.exists(sf):
        pytest.skip(f"fixture dir {sf} not present on this host")
    if os.path.basename(os.path.normpath(sf)) != "sf0.001":
        pytest.skip("shuffle budgets are calibrated for the sf0.001 fixtures")
    from tez_spark.observability import capture
    from tez_spark.operators.core import release_caches, release_shared

    # budgets measure the FULL artifact build: drop any session-memoized
    # shingle/band tables a previous test warmed, or the measured shuffle
    # understates the plan's real cost.
    release_caches()
    release_shared(spark)
    _, counters = capture(
        spark,
        lambda: fn(spark, sf).write.format("noop").mode("overwrite").save(),
    )
    return counters


CASES = [
    # (name, max shuffle bytes at sf0.001)
    ("dedup_minhash_lsh", 5_000_000),
    ("ann_topk", 2_000_000),
    ("curation_pipeline_lsh", 5_000_000),
    ("dedup_winnow", 5_000_000),
    ("decontaminate", 5_000_000),
    # sequence-metric profile rides the shared shingle truth: candidate
    # pairs + the shingle build are the only exchanges (424 KB measured)
    ("dedup_editdistance", 2_000_000),
    # distinct exchange carries (column, value) vocabularies, never
    # rows x columns (51 KB measured vs a ~1 MB+ expand-strategy plan)
    ("column_profile", 300_000),
]


@pytest.mark.parametrize("name,budget", CASES)
def test_flagship_shuffle_budget(spark, name, budget):
    from tez_spark.plans.registry import all_queries

    counters = _run(spark, all_queries()[name])
    shuffled = counters.get("SHUFFLE_BYTES", 0)
    assert shuffled < budget, (
        f"{name} shuffled {shuffled} bytes (budget {budget}) — a corpus-"
        f"sized exchange has crept into a candidate-bounded plan"
    )
    assert counters.get("SPILLED_BYTES_DISK", 0) == 0
    assert counters.get("SPILLED_BYTES_MEMORY", 0) == 0
