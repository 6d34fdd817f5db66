"""Bucketed-table layout: the zero-shuffle path for key-aligned work.

Several operator docstrings claim "with tables bucketed on the key, the
shuffle disappears" (asof joins, per-key windows, big-key aggregations).
This module makes that concrete: `write_bucketed` persists a DataFrame
hash-bucketed (and sorted) by the join/grouping key via the session
catalog, and `read_bucketed` returns it with the bucketing metadata
attached so Catalyst plans joins/aggregations WITHOUT an Exchange on
that key. tests/test_bucketed.py pins the plan shapes.

At 100 TB this is the difference between re-shuffling the events table
on user_id for every as-of join / sessionization / per-user window and
paying that shuffle ONCE at ingest: all later key-aligned stages read
co-located buckets. Bucket count should be sized so one bucket's hot
columns fit an executor (e.g. 4096 buckets for a 10 TB table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed on
    ``key_cols`` (sorted within buckets by ``sort_cols`` — defaults to the
    key, which also accelerates merge joins and per-key windows)."""
    sort_cols = sort_cols if sort_cols is not None else key_cols
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, *key_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (spark.table keeps the
    metadata; reading the parquet path directly would lose it)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
