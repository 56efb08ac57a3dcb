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
