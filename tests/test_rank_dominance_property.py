"""Property test: rank_dominance_bucketed matches a brute-force numpy
truth on random inputs — the JoinDataGen/JoinValidate self-validating
idea (JoinDataGen.java / JoinValidate.java:58) applied to the bucketed
theta-rank operator. Random shapes cover the edge cases a fixed fixture
can't: empty dominance sets, all-equal values (everything lands in one
bucket, the within-bucket strict `>` carries the whole answer), values
clustered at bucket boundaries, single-row sides, and supplied-vs-
computed bounds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VAL = st.integers(min_value=-50, max_value=50)
LEFT = st.tuples(st.integers(0, 3), VAL)    # (group, value)
RIGHT = st.tuples(st.integers(0, 9), VAL)   # (key, value)


def _truth(left, right):
    want = {}
    for g, lv in left:
        for k, rv in right:
            if lv > rv:
                want[(g, k)] = want.get((g, k), 0) + 1
    return want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(LEFT, min_size=1, max_size=40),
    right=st.lists(RIGHT, min_size=1, max_size=40),
    n_buckets=st.sampled_from([1, 2, 7, 64]),
    use_bounds=st.booleans(),
)
def test_rank_dominance_bucketed_matches_bruteforce(
    spark, left, right, n_buckets, use_bounds
):
    from tez_spark.operators.core import rank_dominance_bucketed

    ldf = spark.createDataFrame(
        [(g, float(v)) for g, v in left], "grp int, bal double"
    )
    rdf = spark.createDataFrame(
        [(k, float(v)) for k, v in right], "key int, bal double"
    )
    bounds = (-60.0, 60.0) if use_bounds else None
    got = {
        (r.grp, r.key): r.n_dominant
        for r in rank_dominance_bucketed(
            ldf, rdf, "grp", "key", "bal", "bal",
            n_buckets=n_buckets, bounds=bounds,
        ).collect()
    }
    assert got == _truth(left, right)
