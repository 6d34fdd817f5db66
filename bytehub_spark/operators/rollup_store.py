"""Incrementally-maintained continuous aggregate (materialized rollup).

rollup_pyramid (events_ops) computes the hour/day cascade per query; this
module MAINTAINS it: an hour-grain aggregate table stored Hive-partitioned
by day, refreshed incrementally as new events arrive. The refresh cost is
proportional to the INCREMENT, not the history:

1. aggregate the increment at hour grain (map-side combined);
2. read back ONLY the stored day-partitions the increment touches
   (partition pruning on the derived day column — a directory read, not
   a table scan);
3. merge by (day, hour, event_type) — counts and decimal sums are
   associative, so merged partials equal a from-scratch aggregate
   bit-for-bit;
4. write back with dynamic partition overwrite: untouched days' files
   are never rewritten.

This is the TimescaleDB continuous-aggregate / Spark-native MERGE
pattern expressed with plain parquet + Hive partitioning. Sums
accumulate as decimal(18,4) in storage (exact under any merge order and
engine-portable); the read view casts to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hour_agg(events: DataFrame) -> DataFrame:
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("day", "hour", "event_type")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_dec"))
    )


def build_rollup_store(events: DataFrame, path: str) -> None:
    """Materialize the hour-grain aggregate, partitioned by day."""
    (
        _hour_agg(events)
        .repartition(F.col("day"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def refresh_rollup_store(
    spark: SparkSession, path: str, increment: DataFrame
) -> list[str]:
    """Merge new events into the stored rollup; returns the refreshed
    day-partition values. Only those directories are read and rewritten.
    """
    inc = _hour_agg(increment)
    days = [r["day"] for r in inc.select("day").distinct().collect()]
    if not days:
        return []
    stored = spark.read.parquet(path).where(F.col("day").isin(days))
    merged = (
        stored.select("day", "hour", "event_type", "n", "sum_dec")
        .unionByName(inc)
        .groupBy("day", "hour", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))
    )
    # decimal re-sum widens the type; clamp back to the stored schema so
    # refreshed partitions stay readable alongside untouched ones
    merged = merged.select(
        "day",
        "hour",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_dec").cast("decimal(18,4)").alias("sum_dec"),
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(F.col("day"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return sorted(days)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The user-facing view of the store: double-valued sums, stable
    column order."""
    return (
        spark.read.parquet(path)
        .select(
            "hour",
            "event_type",
            "n",
            F.col("sum_dec").cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )
