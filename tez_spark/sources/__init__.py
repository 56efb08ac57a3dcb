"""Sources and sinks (Tez's MRInput/MROutput layer re-expressed).

Reference parity (SURVEY.md §2.1):
- MRInput (tez-mapreduce/.../input/MRInput.java:87)            → scan_*
- MultiMRInput (multiple splits per task)                      → built-in
  file packing (spark.sql.files.maxPartitionBytes)
- MROutput (tez-mapreduce/.../output/MROutput.java)            → write_*
- MultiMROutput partitioned sink
  (tez-mapreduce/.../output/MultiMROutput.java:51)             → write_partitioned
- MROutputCommitter two-phase commit
  (tez-mapreduce/.../committer/MROutputCommitter.java:99)      → Hadoop
  commit protocol inside df.write (built-in)
"""

from tez_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from tez_spark.sources.io import (  # noqa: F401
    scan_csv,
    scan_hadoop_file,
    scan_json,
    scan_orc,
    scan_parquet,
    scan_sequencefile,
    scan_text,
    write_bucketed,
    write_orc,
    write_parquet,
    write_partitioned,
    write_sequencefile,
    write_sorted,
    merge_snapshot,
)
