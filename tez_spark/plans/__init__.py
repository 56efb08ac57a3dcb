"""Plans: DAG facade + declared correctness queries."""

from tez_spark.plans.dag import CommitScope, DAGBuilder, DataMovement  # noqa: F401
from tez_spark.plans.queries import ORACLE, QUERIES  # noqa: F401
