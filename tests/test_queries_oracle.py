"""Every declared query hash-matches its DuckDB oracle at sf0.001
(the same check the driver runs at sf0.01). Queries with no oracle get a
runs-and-returns-rows smoke check."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_df_matches_sql


def _registry():
    from tez_spark.plans.registry import all_oracles, all_queries

    return all_queries(), all_oracles()


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_df_matches_sql(df, oracle, ORACLES[name])
    else:
        # non-SQL-expressible op: the driver's weaker rows-only check
        assert df.count() >= 0


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_driver_window_ordering():
    """The driver's correctness gate reads the first 50 registry entries.

    Guard the ROTATION policy (registry._PRIORITY): every entry in the
    window is oracled; queries that were red in the previous round's
    driver run sit in the window so the fix gets driver-verified; and the
    union of this window with the previous round's driver rows covers
    every oracled query — each gets a driver row at least every other
    round.
    """
    import json
    import os

    window = list(QUERIES)[:50]
    assert all(k in ORACLES for k in window), [k for k in window if k not in ORACLES]
    # round-4 driver run was all green (no red rows to re-verify); the
    # coverage check below is the whole invariant for round 5.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # latest recorded driver round: window ∪ its rows must cover every
    # oracled query (each gets a driver row at least every other round)
    import glob

    prev_files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if prev_files:
        with open(prev_files[-1]) as f:
            prev_rows = set(json.load(f))
        uncovered = set(ORACLES) - (set(window) | prev_rows)
        assert not uncovered, (
            f"oracled queries with no driver row in {os.path.basename(prev_files[-1])}"
            f" ∪ current window: {uncovered}"
        )
    # rows-only entries must sit at the very end
    tail = list(QUERIES)[len(ORACLES):]
    assert all(k not in ORACLES for k in tail), [k for k in tail if k in ORACLES]
