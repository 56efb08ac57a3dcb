"""Custom stateful streaming operator via applyInPandasWithState.

Tez parity note: this is the streaming twin of the Processor escape hatch
(AbstractLogicalIOProcessor.java:30) — arbitrary per-key logic with
persistent state, which Tez cannot express at all (its streaming edge
types are unimplemented placeholders, EdgeProperty.java:81-89).

Operator: running per-user event counter + value total, emitting one
updated row per user per micro-batch. State is a single (count, total)
pair per key — O(distinct users) cluster-wide, partitioned by the group
key like any keyed state store.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running totals with explicit keyed state."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- streaming funnel: stateful sequential-pattern matching ----------------

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.LongType()),
        T.StructField("t_view_us", T.LongType()),
        T.StructField("t_click_us", T.LongType()),
        T.StructField("t_purchase_us", T.LongType()),
    ]
)
# candidate event times per user, epoch micros. Views collapse to their
# min; clicks/purchases stay as candidate lists because a LATER-arriving
# earlier view can retroactively qualify an already-seen click (exactness
# under out-of-order arrival). State is O(candidate events per user) —
# the honest cost of an exact out-of-order funnel; production pipelines
# bound it with a watermark-driven retention window.
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("min_view", T.LongType()),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
    ]
)


def _funnel_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    min_view, clicks, purchases = (
        state.get if state.exists else (None, [], [])
    )
    clicks = list(clicks or [])
    purchases = list(purchases or [])
    for pdf in pdfs:
        for ts_us, etype in zip(
            (pdf["ts"].astype("int64") // 1000), pdf["event_type"]
        ):
            ts_us = int(ts_us)
            if etype == "view":
                min_view = ts_us if min_view is None else min(min_view, ts_us)
            elif etype == "click":
                clicks.append(ts_us)
            elif etype == "purchase":
                purchases.append(ts_us)
    state.update((min_view, clicks, purchases))
    # derive the funnel exactly as the batch query does: first view,
    # first click after it, first purchase after that click.
    t1 = min_view
    t2 = min((c for c in clicks if t1 is not None and c > t1), default=None)
    t3 = min((p for p in purchases if t2 is not None and p > t2), default=None)
    stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "t_view_us": [t1],
            "t_click_us": [t2],
            "t_purchase_us": [t3],
        }
    )


def funnel_stages(stream: DataFrame) -> DataFrame:
    """Streaming twin of plans.queries_ext.q_event_funnel: per-user
    view→click→purchase state machine, one updated (user, stage) row per
    micro-batch. Sequential-pattern matching is exactly the custom
    stateful logic Structured Streaming's applyInPandasWithState exists
    for — and exactly what the reference cannot express at all (its
    streaming edges are unimplemented placeholders)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        FUNNEL_OUTPUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
