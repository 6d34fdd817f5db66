from .inspect import (
    ensure_parallelism,
    executed_plan,
    global_windows,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    read_schema,
    shuffle_count,
)

__all__ = [
    "ensure_parallelism",
    "executed_plan",
    "global_windows",
    "pushed_filters",
    "partition_filters",
    "read_schema",
    "has_broadcast_join",
    "shuffle_count",
]
