"""Property test: asof_join matches pandas.merge_asof on random inputs
(the reference's JoinDataGen/JoinValidate self-validating-pair idea —
JoinDataGen.java / JoinValidate.java:58 — applied to the one operator we
composed by hand)."""

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
    left=st.lists(ROW, min_size=1, max_size=25, unique=True),
    right=st.lists(ROW, min_size=1, max_size=25, unique=True),
)
def test_asof_matches_pandas(spark, left, right):
    from tez_spark.plans.queries_ext import asof_join

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
        (int(r.lid), int(r.rts)) for r in m.itertuples() if pd.notna(r.rts)
    }
    # ties on rts within a key: merge_asof takes the last row, our window
    # argmax takes row_number 1 by ts desc (arbitrary among equal ts) —
    # compare on (lid, rts) which is invariant to that choice.
    assert got == want
