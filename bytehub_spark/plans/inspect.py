"""Physical-plan inspection helpers.

Scale guarantees should be *asserted*, not hoped for: these helpers pull
the pushdown/pruning/join-strategy facts out of the executed plan so tests
(and users tuning a query) can check them programmatically. Used by
tests/test_plans.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _extract(plan: str, tag: str) -> list[str]:
    out = []
    for m in re.finditer(re.escape(tag) + r":\s*\[", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "[":
                depth += 1
            elif plan[i] == "]":
                depth -= 1
            i += 1
        out.append(plan[m.end(): i - 1])
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet reader (row-group stats)."""
    return [f for seg in _extract(executed_plan(df), "PushedFilters")
            for f in seg.split(", ") if f]


def partition_filters(df: DataFrame) -> list[str]:
    """Predicates applied to Hive partition directories (static pruning)."""
    return [f for seg in _extract(executed_plan(df), "PartitionFilters")
            for f in seg.split(", ") if f]


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the files (column pruning check)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", executed_plan(df))
    return [c.split(":")[0] for c in m.group(1).split(",") if c] if m else []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale cost that matters most."""
    return executed_plan(df).count("Exchange ")


def _bracket_groups(s: str) -> list[str]:
    """Top-level [...] groups of a plan-node argument list."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def global_windows(df: DataFrame) -> list[str]:
    """Expression lists of Window nodes with an EMPTY partition spec.

    A partition-less window collapses every row into ONE task — the
    classic straggler at scale. Plans are allowed to keep one over a
    frame already reduced to O(num_partitions) rows (e.g. per-shard
    prefix offsets); tests assert the returned expressions only touch
    such tiny aggregate frames.
    """
    out = []
    for line in executed_plan(df).splitlines():
        m = re.search(r"(?:^|\s)Window\s+(\[.*)$", line.strip())
        if not m:
            continue
        groups = _bracket_groups(m.group(1))
        # WindowExec prints [exprs], [partitionSpec], [orderSpec]; the
        # partition-less form has only [exprs], [orderSpec].
        if len(groups) == 2:
            out.append(groups[0])
    return out


def ensure_parallelism(df: DataFrame, factor: float = 1.0) -> DataFrame:
    """Fan a DataFrame out to the session's parallelism when its current
    partitioning would under-utilize the cluster.

    For CPU-bound stages (Arrow pandas UDFs, shingle explodes, decimal
    aggregation) a single-row-group parquet file serializes all compute
    into one task; one round-robin shuffle of the raw rows buys full
    parallelism for the expensive stage. No-op when the input already has
    enough partitions — which is always the case at production scale, so
    this never adds a shuffle to a 100 TB plan.
    """
    spark = df.sparkSession
    target = max(1, int(spark.sparkContext.defaultParallelism * factor))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
