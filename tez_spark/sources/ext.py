"""Optional table-format connectors (Delta / Iceberg / Hudi), gated behind
import-try: their jars/packages are not in this container. The engine's
scan/sink surface is format-agnostic — these helpers only translate to
`spark.read.format(...)` once the runtime provides the format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(ImportError):
    """Raised when a lakehouse format's runtime isn't on the classpath."""


def _format_available(spark: SparkSession, fmt: str, probe_class: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(probe_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def scan_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _format_available(spark, "delta", "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "delta-spark jars not on the classpath; add io.delta:delta-spark "
            "via spark.jars.packages on a real cluster"
        )
    return spark.read.format("delta").load(path)


def scan_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _format_available(
        spark, "iceberg", "org.apache.iceberg.spark.source.IcebergSource"
    ):
        raise ConnectorUnavailable(
            "iceberg-spark-runtime jars not on the classpath; add "
            "org.apache.iceberg:iceberg-spark-runtime via spark.jars.packages"
        )
    return spark.read.format("iceberg").load(table)


def scan_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — built into Spark but shipped as the external
    spark-avro module. A classpath probe is unreliable here (some avro
    classes ship in spark-sql without the DataSource being registered),
    so the gate converts the lookup failure itself."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        if "Failed to find data source" in str(exc):
            raise ConnectorUnavailable(
                "spark-avro module not deployed; add "
                "org.apache.spark:spark-avro via spark.jars.packages"
            ) from exc
        raise


def scan_jdbc(spark: SparkSession, url: str, table: str, **options: str) -> DataFrame:
    """JDBC scan (driver jar must be on the classpath). Partition options
    (partitionColumn/lowerBound/upperBound/numPartitions) are mandatory at
    scale — a single-connection scan doesn't parallelize."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
