"""brooklin-spark: a PySpark-native streaming-pipeline + analytics engine.

A from-scratch engine with the capabilities of linkedin/brooklin (reference at
/root/reference, studied in SURVEY.md), re-expressed idiomatically on Apache
Spark: Structured Streaming pipelines with a common change-event envelope,
checkpointed at-least-once delivery, pipeline lifecycle management, plus a
DataFrame-level analytics layer (relational operators, dedup, similarity,
text analysis) designed for 100 TB-scale inputs.

Not a port: Brooklin's ZooKeeper coordinator, assignment strategies and
Rest.li stack are replaced by Spark's driver/scheduler/checkpoint machinery
(see SURVEY.md §2.9, §7 non-goals).
"""

__version__ = "0.1.0"

from brooklin_spark.session import get_spark  # noqa: F401
from brooklin_spark.model import (  # noqa: F401
    ENVELOPE_SCHEMA,
    OpCode,
    PipelineSpec,
    PipelineStatus,
)
