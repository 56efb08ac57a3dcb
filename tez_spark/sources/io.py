"""Generic scans/sinks.

Tez reads any Hadoop InputFormat via MRInput
(tez-mapreduce/.../input/MRInput.java:87 — Text, SequenceFile, ...) and
writes via MROutput / MultiMROutput. Spark's DataSource API covers the
same formats declaratively; the partitioned sink
(MultiMROutput.getWriter basePath routing, MultiMROutput.java:90-108)
is df.write.partitionBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scan_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # inferSchema costs an extra pass; acceptable for tests, avoid at scale.
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def scan_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan (MRInput over TextInputFormat,
    WordCount.java:25 uses Text keys/values). One `value: string` column."""
    return spark.read.text(path)


def scan_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def scan_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — the other columnar format MRInput covers via
    OrcInputFormat; native DataSource in Spark (pushdown/pruning apply
    exactly as for parquet)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def scan_sequencefile(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """SequenceFile scan — the literal MRInput contract beyond the
    DataSource formats (MRInput.java:87 reads any InputFormat;
    SequenceFileInputFormat is the classic Hadoop container). Writables
    are converted to Python types by sc.sequenceFile, then promoted to a
    DataFrame. Split generation/packing is the Hadoop InputFormat's —
    the same machinery MRInputAMSplitGenerator drives.

    RDD-based by necessity (no DataSourceV2 for SequenceFile in OSS
    Spark); convert to DataFrame immediately so everything downstream is
    Catalyst-optimized."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, [key_col, value_col])


def scan_hadoop_file(
    spark: SparkSession,
    path: str,
    input_format_class: str,
    key_class: str,
    value_class: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Generic InputFormat bridge (newAPIHadoopFile) — arbitrary
    mapreduce InputFormats, the full MRInput.java:87 surface. Use for
    formats with no Spark DataSource; expect Writable->Python conversion
    cost, and prefer a columnar format at scale."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path, input_format_class, key_class, value_class
    )
    return spark.createDataFrame(rdd, [key_col, value_col])


def write_sequencefile(df: DataFrame, path: str) -> None:
    """SequenceFile sink: first two columns become (key, value)
    Writables (MROutput over SequenceFileOutputFormat)."""
    cols = df.columns[:2]
    df.select(*cols).rdd.map(tuple).saveAsSequenceFile(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table sink — the co-located-join strategy for 100TB:
    both sides of a recurring equijoin written with the same (bucket
    columns, bucket count) join WITHOUT a shuffle on either side (the
    exchange already happened once, at write time). sortBy additionally
    pre-orders within buckets so sort-merge join skips its sort.

    This is the persistent analog of Tez's scatter-gather edge: the
    partitioning lives in the table layout instead of being re-done per
    DAG. Spark requires saveAsTable for bucketing metadata (the catalog
    records bucket spec; plain parquet paths can't carry it)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)  # external table location
    writer.format("parquet").saveAsTable(table)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Leaf output + commit (MROutput; two-phase commit handled by the
    Hadoop committer inside df.write — MROutputCommitter.java:99)."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned sink: rows routed to subdirectories by key, the
    MultiMROutput.write(key, value, basePath) pattern
    (tez-mapreduce/.../output/MultiMROutput.java:51).

    Scale note: one file per (task, partition-value) — repartition by the
    partition columns first so each output partition is written by few
    tasks (avoids the small-files explosion at 100TB).
    """
    df.repartition(*partition_cols).write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Range-clustered sink: repartitionByRange + sortWithinPartitions
    before writing, so each parquet file (and row group) covers a narrow,
    non-overlapping min/max range of the cluster columns.

    This is the data-SKIPPING layout (Hive-on-Tez's SORTED BY; the
    single-dimension analog of Z-ordering): at 100TB a selective filter
    on the cluster column prunes whole files/row-groups from parquet
    footer statistics instead of scanning them — the same footer min/max
    machinery partition pruning uses, but within an unpartitioned path.
    Use write_partitioned for low-cardinality keys (directory pruning),
    write_sorted for high-cardinality/range predicates (footer pruning),
    write_bucketed for recurring equijoins (shuffle elimination).

    The range exchange samples the cluster columns (RangePartitioning —
    the same sampled global-sort machinery as operators.global_sort), so
    file ranges stay balanced under skew. n_files pins the output file
    count (an explicit count is exempt from AQE coalescing); default
    lets AQE size files from runtime statistics."""
    parted = (
        df.repartitionByRange(n_files, *cluster_cols)
        if n_files
        else df.repartitionByRange(*cluster_cols)
    )
    parted.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def write_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 10,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Z-order (Morton-curve) clustered sink: MULTI-column data skipping.

    write_sorted prunes files via footer min/max on ONE dimension; a
    workload filtering on either of several columns needs a space-filling
    curve so each file covers a small hyper-rectangle of the key space.
    Each cluster column is min/max-scaled to a `bits`-bit integer (one
    tiny global agg for the bounds), the bit-planes are interleaved into
    a Morton key (pure codegen shift/or chain), and the data is
    range-partitioned + sorted by that key before writing — the same
    sampled-range machinery as write_sorted, so files stay balanced.

    A selective predicate on ANY clustered column then overlaps only the
    files whose hyper-rectangle intersects it — parquet footer min/max
    stats prune the rest, with no partition directories and no index
    server. This is the classic multi-dimensional clustering layout
    (Z-ordering as in Delta/Iceberg OPTIMIZE ZORDER; the 1-D special
    case degenerates to write_sorted).

    Caveat: min/max scaling is value-linear — a heavily skewed column
    wastes curve resolution around its outliers. For skewed data compute
    rank-based bucket ids first (approxQuantile boundaries) and z-order
    those; bounds-based scaling is kept here because it is one agg and
    fully codegen."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    bounds = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cluster_cols],
        *[F.max(c).alias(f"max_{c}") for c in cluster_cols],
    ).first()
    if any(bounds[f"min_{c}"] is None for c in cluster_cols):
        # empty input or an all-null cluster column: no curve to build —
        # write as-is rather than crash (still a valid snapshot).
        df.write.mode(mode).parquet(path)
        return
    scaled = []
    top = (1 << bits) - 1
    for c in cluster_cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1
        # NULL cluster values scale to bucket 0. The coalesce must sit
        # INSIDE the least: Spark's least() SKIPS nulls, so
        # least(lit(top), null) returns `top` — an outer coalesce never
        # fires and nulls get binned with the maximum values, polluting
        # the top files' min/max ranges (ADVICE r5, verified by
        # test_zorder_null_cluster_values_bucket_low).
        scaled.append(
            F.least(
                F.lit(top),
                F.coalesce(
                    ((F.col(c) - F.lit(lo)) * F.lit(float(top)) / F.lit(float(span)))
                    .cast("long"),
                    F.lit(0),
                ),
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, s in enumerate(scaled):
            bit = F.shiftrightunsigned(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(scaled) + d))
    zdf = df.withColumn("_zkey", z)
    parted = (
        zdf.repartitionByRange(n_files, "_zkey")
        if n_files
        else zdf.repartitionByRange("_zkey")
    )
    parted.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(path)


def merge_snapshot(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Batch upsert (MERGE ... WHEN MATCHED UPDATE / NOT MATCHED INSERT
    over immutable files): updated rows win, unmatched current rows are
    kept. Write the result to a NEW snapshot path and swap — the
    atomic-rename pattern plain parquet supports (table formats add
    transactional metadata on top of this exact shape; the reference's
    MROutputCommitter two-phase commit is the same promote-on-success
    idea per SURVEY.md §2.1).

    Plan: one anti join keyed on the merge keys (broadcast when updates
    are small — the common CDC case: a day's changes vs years of
    snapshot) + a union. No shuffle of `current` beyond the join's own
    exchange; at 100TB pre-bucket both sides on the keys
    (write_bucketed) and the anti join is exchange-free.

    Upsert semantics require one row per key in `updates`: raw CDC feeds
    routinely carry several versions of a key per batch (and null-key
    noise rows), which a bare union would all land in the snapshot. The
    updates side is therefore deduped to ONE WHOLE ROW per key — never a
    column-wise blend, which could synthesize a record no CDC event ever
    contained. Winner: row_number over (order_col DESC, then every
    remaining column DESC as the tie-break) — the tie-break makes the
    result deterministic across partitionings even when several versions
    share the same change-sequence value; with no order_col the ordering
    is just the remaining columns DESC (lexicographic-max row). Columns
    must be orderable (documented contract; maps/opaque types need an
    explicit order_col). Null-key update rows are dropped (they can
    never match a snapshot row; merge keys are non-null by contract).
    The dedup is one window shuffle on the same keys the anti join
    uses."""
    from pyspark.sql import Window

    non_null = updates
    for k in keys:
        non_null = non_null.filter(F.col(k).isNotNull())
    others = [c for c in updates.columns if c not in keys]
    order_exprs = [F.col(c).desc() for c in ([order_col] if order_col else [])]
    order_exprs += [F.col(c).desc() for c in others if c != order_col]
    if not order_exprs:
        deduped = non_null.distinct()  # key-only schema: rows are identical
    else:
        w = Window.partitionBy(*keys).orderBy(*order_exprs)
        deduped = (
            non_null.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return deduped.unionByName(
        current.join(deduped.select(*keys).distinct(), keys, "left_anti")
    )
