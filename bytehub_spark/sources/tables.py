"""Testdata table loaders with schema normalization.

The driver's synthetic tables (TESTDATA.md) are plain parquet; the only
wrinkle is `events.ts`, written as TIMESTAMP(NANOS) which Spark's vectorized
parquet reader rejects. We read it via the legacy nanos-as-long path and
convert with integer division (exact; matches DuckDB's ns→µs truncation —
verified against the oracle).

Two scale-aware loader policies (both size-gated so they are no-ops at
real cluster scale):

- **Hot-table caching.** Tables whose on-disk size is under
  ``CACHE_MAX_BYTES`` (64 MB) are ``.cache()``d and memoized per
  ``(sf_dir, name)`` — the standard hot-dimension pattern. Fact tables at
  production scale exceed the gate and are never cached.
- Under-parallel inputs (the testdata files have ONE parquet row group
  each, so scans can't split) are NOT blanket-repartitioned here: an extra
  round-robin shuffle costs more than it buys for multi-job timeseries
  plans (measured 2-3× slowdowns). Instead, CPU-bound operators (pandas
  UDFs, shingle explodes) call ``plans.ensure_parallelism`` themselves —
  fan-out belongs where the compute is.
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

CACHE_MAX_BYTES = 64 * 1024 * 1024
# fan out the scan before caching only for tables at least this big: the
# round-robin shuffle is a one-off cost paid at cache fill, and wide-agg
# queries on a single-row-group file otherwise run their partial aggregates
# in one task (measured: TPC-H Q1 1.9s -> 0.5s on 600k rows). For smaller
# tables the extra exchange in every uncached plan costs more than the
# parallelism buys (measured 2-3x slowdowns on the 100k-row events table).
FAN_OUT_MIN_ROWS = 250_000

_cache: dict[tuple[str, str], DataFrame] = {}


def _footer_rows(path: str) -> int:
    """Row count from the parquet footer — driver-side metadata read only."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def load_table(
    spark: SparkSession, sf_dir: str, name: str, cache_small: bool = True
) -> DataFrame:
    key = (str(sf_dir).rstrip("/"), name)
    if cache_small and key in _cache:
        return _cache[key]
    # runtime-settable; required for TIMESTAMP(NANOS) columns (events.ts)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle parity: timestamps must collect as UTC instants (duckdb is
    # UTC-naive), whatever session the caller hands us
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long via nanosAsLong → µs truncation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs-native files (driver testdata schema changed between
            # rounds) arrive as NTZ, which Spark won't cast to double /
            # compare with LTZ; session TZ is UTC so this cast is exact
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))

    if cache_small and os.path.getsize(path) <= CACHE_MAX_BYTES:
        cores = spark.sparkContext.defaultParallelism
        if (
            _footer_rows(path) >= FAN_OUT_MIN_ROWS
            and df.rdd.getNumPartitions() < cores
        ):
            df = df.repartition(cores)
        df = df.cache()
        _cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
