"""tez_spark — a PySpark-native analytics engine with the capabilities of
Apache Tez (reference at /root/reference, apache/tez 1.0.0-SNAPSHOT).

Tez is a DAG execution framework: users compose vertices (processors)
connected by edges (data-movement declarations: SCATTER_GATHER, BROADCAST,
ONE_TO_ONE), and Tez supplies partitioned+sorted shuffle, merges, broadcast,
dynamic parallelism and fault tolerance (see SURVEY.md). This engine
re-expresses that capability surface Spark-first:

- ``tez_spark.session``   — SparkSession factory (Tez session mode /
  container reuse / ShuffleVertexManager auto-parallelism ≙ long-lived
  session + AQE).
- ``tez_spark.sources``   — scans and sinks (MRInput/MROutput/MultiMROutput
  ≙ spark.read / df.write / partitionBy).
- ``tez_spark.operators`` — the relational operator surface encoded by the
  reference's examples (joins, aggregation, sort, union, cartesian,
  secondary sort), plus training-data-pipeline extensions (dedup,
  similarity search, text analysis, multimodal plumbing).
- ``tez_spark.functions`` — column-level helpers (text metrics, vector
  math) built from pyspark.sql.functions (JVM-side, codegen'd).
- ``tez_spark.plans``     — a thin DAG-builder facade mirroring Tez's
  Vertex/Edge vocabulary, compiling to DataFrame pipelines, and the
  declared correctness queries (SURVEY.md §2.5 Q01–Q18).
- ``tez_spark.streaming`` — Structured Streaming view of the events table
  (capability extension; Tez's EPHEMERAL edges are unimplemented
  placeholders, EdgeProperty.java:81-89).

Everything here is DataFrame/SQL-first: the logical plan is declared,
Catalyst + AQE pick the physical strategy (partition counts, broadcast vs
sort-merge, skew splitting) — the same decisions Tez delegates to
VertexManagerPlugins at run time (SURVEY.md §4).
"""

__version__ = "0.1.0"

from tez_spark.session import get_spark  # noqa: F401
