"""Plan inspection and audit utilities."""

from brooklin_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    executed_plan,
    pushed_filters,
    read_schema_columns,
    self_join_candidate_generators,
    shuffle_count,
    single_partition_window_lines,
    wholestage_codegen_ids,
)
