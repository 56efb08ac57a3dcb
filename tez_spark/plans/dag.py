"""DAG-builder facade mirroring Tez's Vertex/Edge vocabulary.

Capability parity with the public DAG API (tez-api/.../dag/api/DAG.java:90
— addVertex :138, addEdge :287, createVertexGroup :207;
Vertex.java:50 — create :131-181, addDataSource :334, addDataSink :365;
EdgeProperty.java:44-66 — ONE_TO_ONE / BROADCAST / SCATTER_GATHER)
WITHOUT copying its architecture: a vertex is a DataFrame transform, an
edge is a data-movement declaration, and ``build`` compiles the graph to
a plain DataFrame pipeline that Catalyst optimizes end-to-end. The
physical machinery Tez implements (sorters, shuffle, merges, vertex
managers) is Spark's — the facade never schedules anything itself.

CUSTOM edges (EdgeManagerPluginOnDemand.java:186-340) are supported as a
user-supplied row→partition router compiled to one RDD custom-Partitioner
hop (r6 — see DataMovement.CUSTOM for the tradeoff). CONCURRENT
scheduling (EdgeProperty.java:102-107) remains out of scope: it is an
@Unstable unimplemented placeholder in the reference itself (SURVEY.md §4).

Example (WordCount DAG, tez-examples/.../WordCount.java:130-160)::

    dag = DAGBuilder("wordcount")
    dag.add_vertex("tokenizer", source=lambda s: docs_df, processor=tokenize)
    dag.add_vertex("summation", processor=lambda dfs: count(dfs[0]))
    dag.add_edge("tokenizer", "summation", DataMovement.SCATTER_GATHER, keys=["word"])
    result = dag.build(spark)["summation"]
"""

from __future__ import annotations

import enum
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DataMovement(enum.Enum):
    """EdgeProperty.DataMovementType (EdgeProperty.java:44-66)."""

    ONE_TO_ONE = "one_to_one"          # narrow dependency: no exchange
    BROADCAST = "broadcast"            # ship whole dataset to every consumer
    SCATTER_GATHER = "scatter_gather"  # hash exchange on declared keys
    # CUSTOM: user-defined routing of rows to destination partitions —
    # the EdgeManagerPluginOnDemand extension point
    # (tez-api/.../dag/api/EdgeManagerPluginOnDemand.java:186-340:
    # routeInputSourceTaskIndexToDestination et al.). Spark's DF surface
    # has no arbitrary-routing exchange, so this edge drops to an RDD
    # custom Partitioner for exactly one hop and re-enters the DataFrame
    # world with the same schema — the honest mapping SURVEY §1.2 names.
    # Use only when hash/range/broadcast genuinely cannot express the
    # placement (e.g. locality-pinned routing); Catalyst cannot optimize
    # across the RDD boundary.
    CUSTOM = "custom"


class CommitScope(enum.Enum):
    """When a multi-output DAG's sinks become visible (DAG.java commit
    options — Vertex.addDataSink outputs commit either per-vertex or at
    DAG success; exercised by the reference's MultipleCommitsExample,
    tez-tests/.../examples/MultipleCommitsExample.java).

    VERTEX: each output commits the moment its vertex succeeds — a later
    vertex failure leaves earlier outputs visible (cheaper, fine when
    outputs are independently consumable).
    DAG: all-or-nothing — every output is staged and made visible only
    after the ENTIRE dag succeeds; any failure leaves no final path
    touched."""

    VERTEX = "vertex"
    DAG = "dag"


@dataclass
class _Vertex:
    name: str
    processor: Callable[[list[DataFrame]], DataFrame] | None
    source: Callable[[SparkSession], DataFrame] | None
    sink: Callable[[DataFrame], None] | None = None
    group: Sequence[str] | None = None  # member vertex names (VertexGroup)


@dataclass
class _Edge:
    src: str
    dst: str
    movement: DataMovement
    keys: Sequence[str] = field(default_factory=tuple)
    num_partitions: int | None = None
    router: Callable | None = None  # CUSTOM: Row -> destination partition


class DAGBuilder:
    """Tez DAG.create(...) analog; compiles to DataFrame lineage."""

    def __init__(self, name: str):
        self.name = name
        self._vertices: dict[str, _Vertex] = {}
        self._edges: list[_Edge] = []
        self._data_sinks: list[tuple[str, str, str]] = []  # (vertex, path, fmt)

    # -- graph construction (DAG.addVertex / addEdge / createVertexGroup) --

    def add_vertex(
        self,
        name: str,
        processor: Callable[[list[DataFrame]], DataFrame] | None = None,
        source: Callable[[SparkSession], DataFrame] | None = None,
        sink: Callable[[DataFrame], None] | None = None,
    ) -> "DAGBuilder":
        if name in self._vertices:
            raise ValueError(f"duplicate vertex {name!r}")
        if processor is None and source is None:
            raise ValueError("vertex needs a processor and/or source")
        self._vertices[name] = _Vertex(name, processor, source, sink)
        return self

    def add_vertex_group(self, name: str, members: Sequence[str]) -> "DAGBuilder":
        """VertexGroup: N producers unioned into one logical input
        (GroupInputEdge + ConcatenatedMergedKeyValuesInput = UNION ALL)."""
        self._vertices[name] = _Vertex(name, None, None, group=tuple(members))
        return self

    def add_edge(
        self,
        src: str,
        dst: str,
        movement: DataMovement = DataMovement.ONE_TO_ONE,
        keys: Sequence[str] = (),
        num_partitions: int | None = None,
        router: Callable | None = None,
    ) -> "DAGBuilder":
        if movement is DataMovement.SCATTER_GATHER and not keys:
            raise ValueError("SCATTER_GATHER edge requires partition keys")
        if movement is DataMovement.CUSTOM and (
            router is None or not num_partitions
        ):
            raise ValueError(
                "CUSTOM edge requires router (Row -> partition) and "
                "num_partitions — the EdgeManagerPlugin contract"
            )
        self._edges.append(
            _Edge(src, dst, movement, tuple(keys), num_partitions, router)
        )
        return self

    # -- compile (DAG.verify + createDag analog: topological check, then
    #    hand the whole declarative plan to Catalyst) --

    def _topo_order(self) -> list[str]:
        indeg = {v: 0 for v in self._vertices}
        deps: dict[str, list[str]] = {v: [] for v in self._vertices}
        for e in self._edges:
            indeg[e.dst] += 1
            deps[e.src].append(e.dst)
        for v in self._vertices.values():
            if v.group:
                for m in v.group:
                    indeg[v.name] += 1
                    deps[m].append(v.name)
        ready = sorted(n for n, d in indeg.items() if d == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for d in deps[n]:
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
            ready.sort()
        if len(order) != len(self._vertices):
            raise ValueError(f"DAG {self.name!r} has a cycle")  # DAG.verify()
        return order

    @staticmethod
    def _apply_movement(df: DataFrame, edge: _Edge) -> DataFrame:
        if edge.movement is DataMovement.BROADCAST:
            return F.broadcast(df)
        if edge.movement is DataMovement.SCATTER_GATHER:
            if edge.num_partitions:
                return df.repartition(edge.num_partitions, *edge.keys)
            return df.repartition(*edge.keys)
        if edge.movement is DataMovement.CUSTOM:
            # one RDD hop: router decides each row's destination partition
            # exactly (identity partitionFunc — the index IS the routing
            # decision), then the same schema re-enters the DF world
            n, router = edge.num_partitions, edge.router
            routed = (
                df.rdd.map(lambda r: (router(r) % n, r))
                .partitionBy(n, lambda idx: idx)
                .map(lambda kv: kv[1])
            )
            return df.sparkSession.createDataFrame(routed, df.schema)
        return df  # ONE_TO_ONE: narrow chaining

    def build(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Compile every vertex to its output DataFrame (lazily — nothing
        executes until an action). Returns {vertex_name: DataFrame}."""
        results: dict[str, DataFrame] = {}
        in_edges: dict[str, list[_Edge]] = {}
        for e in self._edges:
            in_edges.setdefault(e.dst, []).append(e)

        for name in self._topo_order():
            v = self._vertices[name]
            if v.group:
                dfs = [results[m] for m in v.group]
                out = dfs[0]
                for d in dfs[1:]:
                    out = out.unionByName(d)
                results[name] = out
                continue
            inputs: list[DataFrame] = []
            if v.source is not None:
                inputs.append(v.source(spark))
            for e in in_edges.get(name, []):
                inputs.append(self._apply_movement(results[e.src], e))
            out = v.processor(inputs) if v.processor is not None else inputs[0]
            if v.sink is not None:
                v.sink(out)
            results[name] = out
        return results

    # -- committed execution (DAG.java commit options / MROutputCommitter) --

    def add_data_sink(
        self, vertex: str, path: str, fmt: str = "parquet"
    ) -> "DAGBuilder":
        """Declare a committable file sink for a vertex
        (Vertex.addDataSink + MROutputCommitter analog). Unlike the raw
        ``sink`` callable (which runs inline during build), these sinks
        execute under ``run_committed``'s declared CommitScope."""
        if vertex not in self._vertices:
            raise ValueError(f"unknown vertex {vertex!r}")
        self._data_sinks.append((vertex, path, fmt))
        return self

    def run_committed(
        self, spark: SparkSession, scope: CommitScope = CommitScope.DAG
    ) -> dict[str, DataFrame]:
        """Execute every declared data sink under the commit scope.

        VERTEX scope writes each output directly as its vertex completes
        (commit-on-vertex-success: a later failure leaves earlier outputs
        committed). DAG scope stages every output in a sibling temp dir
        and promotes ALL of them with filesystem renames only after every
        write has succeeded — any failure cleans the staging dirs and
        leaves no final path in existence (commit-on-DAG-success,
        MultipleCommitsExample.java parity).

        The local implementation promotes via os.rename (atomic per
        output on a POSIX fs); on a real cluster the same two-phase shape
        is what Spark's committer protocol (or a table format's atomic
        metadata swap) provides per output — the scope logic here decides
        only WHEN each output's commit is allowed to happen."""
        import os
        import shutil
        import uuid

        results = self.build(spark)
        if scope is CommitScope.VERTEX:
            for vertex, path, fmt in self._data_sinks:
                results[vertex].write.format(fmt).mode("overwrite").save(path)
            return results

        staged: list[tuple[str, str]] = []  # (staging, final)
        try:
            for vertex, path, fmt in self._data_sinks:
                staging = f"{path.rstrip('/')}.__staging__{uuid.uuid4().hex[:8]}"
                # registered BEFORE the write so an aborted job's staging
                # debris (Spark creates the dir even on failure) is cleaned
                staged.append((staging, path))
                results[vertex].write.format(fmt).mode("overwrite").save(staging)
        except Exception:
            for staging, _ in staged:
                shutil.rmtree(staging, ignore_errors=True)
            raise
        for staging, path in staged:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(staging, path)
        return results
