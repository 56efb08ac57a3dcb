"""MapReduce-job-on-engine translator — entry point 3.2 parity.

The reference ships `YARNRunner` (tez-mapreduce/.../client/YARNRunner.java:128),
which implements Hadoop's ClientProtocol and translates an MR (or chained
MRR) job config into a linear DAG: MRInput → map vertex →
OrderedPartitionedKVEdge → reduce vertex [→ reduce vertex …] → MROutput
(`createDAG` :479, vertex naming :405-410, config translation
`MRHelpers.translateMRConfToTez` :563). This module is the same
legacy-compat surface for this engine: a user with mapper/reducer
callables written against the Hadoop contract runs them unchanged.

Execution is the honest Spark mapping of each MR phase:

- map: `rdd.flatMap` over (key, value) pairs — MR's schema-less KV
  contract has no DataFrame analog, and a legacy mapper is arbitrary
  Python; this IS the row-at-a-time slow path, by definition of the
  compatibility surface. New code should use the DataFrame operators.
- shuffle+sort+reduce: `operators.core.streamed_grouped_processor` —
  partition by key, sort within partitions, stream each key's values
  through the reducer as an iterator. That is exactly MR's reduce
  contract (grouped KeyValuesReader; values streamed, never
  materialized), with bounded memory on hot keys.
- combiner: optional, applied per map partition before the shuffle —
  the `TEZ_RUNTIME_COMBINER_CLASS` slot (TezRuntimeConfiguration.java:231).
- MRR chains: additional reducers run back-to-back, each with its own
  shuffle — vertex naming follows the reference's ivertex1..N
  (`YARNRunner.java:405-410`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from itertools import groupby

from pyspark.sql import DataFrame, SparkSession

Mapper = Callable[[object, object], Iterable[tuple]]
Reducer = Callable[[object, Iterable], Iterable[tuple]]


class MRJob:
    """A Hadoop-shaped map/reduce(+reduce…) job over (key, value) rows.

    mapper(key, value) -> iterable[(k2, v2)]
    reducer(key, values_iter) -> iterable[(k3, v3)]  (values arrive as a
        sorted ITERATOR — O(1) reducer state works on any key size)
    combiner: optional reducer-shaped local pre-aggregation per map task.
    `then(reducer)` appends another reduce stage (MRR chain).
    """

    def __init__(
        self,
        mapper: Mapper,
        reducer: Reducer,
        combiner: Reducer | None = None,
    ):
        self._mapper = mapper
        self._reducers: list[Reducer] = [reducer]
        self._combiner = combiner

    def then(self, reducer: Reducer) -> "MRJob":
        self._reducers.append(reducer)
        return self

    def run(
        self,
        spark: SparkSession,
        input_df: DataFrame,
        mid_schema: str = "key string, value long",
        out_schema: str = "key string, value long",
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Execute over a 2-column (key, value) DataFrame; returns the
        final reduce output as a DataFrame of `out_schema`. Every
        intermediate edge carries `mid_schema` (columns MUST be named
        key, value — the MR contract's typed KV edge, the
        TEZ_RUNTIME_KEY/VALUE_CLASS declaration); only the last stage's
        schema may differ."""
        from tez_spark.operators.core import streamed_grouped_processor

        mapper, combiner = self._mapper, self._combiner
        mapped = input_df.rdd.flatMap(lambda r: mapper(r[0], r[1]))
        if combiner is not None:
            def combine(part):
                # local sort+group per map task, exactly MR's combiner
                # window (spill-time pre-aggregation)
                for k, kvs in groupby(sorted(part), key=lambda kv: kv[0]):
                    yield from combiner(k, (v for _, v in kvs))

            mapped = mapped.mapPartitions(combine)

        n = num_partitions or input_df.rdd.getNumPartitions() or 8
        kv = spark.createDataFrame(mapped, mid_schema)
        for i, reducer in enumerate(self._reducers):
            last = i == len(self._reducers) - 1
            schema = out_schema if last else mid_schema

            def stage(key, values, _r=reducer):
                yield from _r(key[0], (row[1] for row in values))

            kv = streamed_grouped_processor(
                kv, ["key"], ["value"], stage, schema, num_partitions=n
            )
        return kv
