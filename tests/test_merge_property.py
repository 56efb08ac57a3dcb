"""Property tests: merge_snapshot upsert semantics against a plain-dict
reference on random CDC batches (the JoinDataGen/JoinValidate
self-validating-pair idea applied to the sink-side merge), and
chunked_cross_join equality with the naive cross under random grids."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

UPD = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),  # key (null noise)
    st.integers(min_value=0, max_value=99),                       # value
    st.integers(min_value=0, max_value=50),                       # seq
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    current=st.dictionaries(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=99),
        max_size=5,
    ),
    updates=st.lists(UPD, max_size=20),
)
def test_merge_snapshot_matches_dict_reference(spark, current, updates):
    from tez_spark.sources.io import merge_snapshot

    cur_df = spark.createDataFrame(
        [(k, v, -1) for k, v in current.items()] or [(None, None, None)],
        "k long, v long, seq long",
    ).filter("k is not null")
    upd_df = spark.createDataFrame(updates or [(None, None, None)], "k long, v long, seq long")
    if not updates:
        upd_df = upd_df.filter("k is not null")

    # reference: winner is the whole row maximal by (seq DESC, then the
    # remaining columns DESC) — merge_snapshot's deterministic ordering
    seen = {}
    for k, v, s in updates:
        if k is None:
            continue
        if k not in seen or (s, v) > seen[k]:
            seen[k] = (s, v)
    expect_keys = set(current) | set(seen)

    got = {
        r.k: (r.v, r.seq)
        for r in merge_snapshot(cur_df, upd_df, ["k"], order_col="seq").collect()
    }
    assert set(got) == expect_keys
    for k, (v, s) in got.items():
        if k in seen:
            assert (s, v) == seen[k], (k, v, s, seen[k])
        else:
            assert v == current[k] and s == -1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    na=st.integers(min_value=0, max_value=40),
    nb=st.integers(min_value=0, max_value=40),
    target=st.integers(min_value=1, max_value=200),
)
def test_chunked_cross_join_equals_naive(spark, na, nb, target):
    import pyspark.sql.functions as F

    from tez_spark.operators.core import chunked_cross_join

    a = spark.range(na).select(F.col("id").alias("x"))
    b = spark.range(nb).select(F.col("id").alias("y"))
    got = {
        (r.x, r.y)
        for r in chunked_cross_join(
            a, b, theta=F.col("x") > F.col("y"), target_pairs_per_task=target
        ).collect()
    }
    want = {(x, y) for x in range(na) for y in range(nb) if x > y}
    assert got == want
