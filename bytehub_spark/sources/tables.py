"""Testdata table loaders with schema normalization.

The driver's synthetic tables (TESTDATA.md) are plain parquet; the only
wrinkle is `events.ts`, written as TIMESTAMP(NANOS) which Spark's vectorized
parquet reader rejects. We read it via the legacy nanos-as-long path and
convert with integer division (exact; matches DuckDB's ns→µs truncation —
verified against the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # runtime-settable; required for TIMESTAMP(NANOS) columns (events.ts)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle parity: timestamps must collect as UTC instants (duckdb is
    # UTC-naive), whatever session the caller hands us
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
