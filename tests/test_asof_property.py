"""Property test: asof_join matches pandas.merge_asof on random inputs
(the reference's JoinDataGen/JoinValidate self-validating-pair idea —
JoinDataGen.java / JoinValidate.java:58 — applied to the one operator we
composed by hand). Covers left-join semantics: unmatched left rows keep
null right columns, exactly as merge_asof keeps NaN."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=0, max_value=1000),   # ts
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(ROW, min_size=1, max_size=60, unique=True),
    right=st.lists(ROW, min_size=1, max_size=60, unique=True),
)
def test_asof_matches_pandas(spark, left, right):
    from tez_spark.operators.core import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], "rid long, k long, rts long"
    )
    got = {
        (r.lid, r.rts)
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }

    lpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "lts"]
    ).sort_values("lts", kind="mergesort")
    rpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], columns=["rid", "k", "rts"]
    ).sort_values("rts", kind="mergesort")
    m = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k", direction="backward"
    )
    want = {
        (int(r.lid), int(r.rts) if pd.notna(r.rts) else None)
        for r in m.itertuples()
    }
    # left semantics: every left row appears exactly once, unmatched with
    # null rts. (lid, rts) is invariant to tie-breaks among equal rts.
    assert got == want


def test_asof_inner_drops_unmatched(spark):
    from tez_spark.operators.core import asof_join

    ldf = spark.createDataFrame([(0, 1, 10), (1, 1, 5), (2, 2, 7)],
                                "lid long, k long, lts long")
    rdf = spark.createDataFrame([(100, 1, 8)], "rid long, k long, rts long")
    rows = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                     how="inner").collect()
    assert [(r.lid, r.rid) for r in rows] == [(0, 100)]


def test_asof_no_join_blowup_plan(spark):
    """The plan must contain no join node at all — union + single window.
    (Round 1 joined on the key alone, materializing per-key cross
    products before the window pruned them.)"""
    from tez_spark.operators.core import asof_join

    ldf = spark.range(10).selectExpr("id AS lid", "id % 3 AS k", "id AS lts")
    rdf = spark.range(10).selectExpr("id AS rid", "id % 3 AS k", "id * 2 AS rts")
    plan = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_join_null_right_ts_and_null_keys(spark):
    """Right rows with null right_ts or a null key are never matches: a
    null ts cannot satisfy rts <= lts and null keys never join. Inner
    must drop the unmatched left; left must null-fill it."""
    from tez_spark.operators.core import asof_join

    left = spark.createDataFrame(
        [(0, 1, 10), (1, None, 10)], "lid long, k long, lts long"
    )
    right = spark.createDataFrame(
        [(100, 1, None), (101, None, 5)], "rid long, k long, rts long"
    )
    l = left.withColumnRenamed("k", "k")
    out_left = asof_join(l, right, on="k", left_ts="lts", right_ts="rts", how="left")
    rows = {r.lid: (r.rts, r.rid) for r in out_left.collect()}
    assert rows == {0: (None, None), 1: (None, None)}
    out_inner = asof_join(l, right, on="k", left_ts="lts", right_ts="rts", how="inner")
    assert out_inner.count() == 0
