"""ORC source/sink — the second columnar interchange format (Hive/Trino
ecosystems emit it natively; a corpus pipeline ingesting warehouse
exports reads ORC without a conversion pass).

Spark's native ORC reader gives the same scan-level machinery parquet
gets — predicate pushdown into stripe/row-group statistics, column
pruning, partition pruning on Hive layouts — because both run through
the same DataSource V1/V2 scan planning; tests/test_orc.py pins
``PushedFilters`` and a pruned ``ReadSchema`` in the physical plan so
the claim stays checked, not assumed.

The wrappers pin corpus-scale settings, mirroring jsonl.py:

- **zstd compression** by default (ORC's zlib default is ~2x slower to
  decode; zstd is splittable per-stripe the same way).
- **Bounded output files** via maxRecordsPerFile, so a skewed upstream
  partition cannot emit a multi-GB file that serializes one task's read.
- **Column pruning on read** via an explicit ``columns`` projection —
  at 100 TB reading 2 of 40 columns is the difference between a scan
  and a non-starter.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession,
    path: str,
    columns: Iterable[str] | None = None,
) -> DataFrame:
    """Read ORC. Project ``columns`` immediately so pruning reaches the
    stripe reader (visible as ReadSchema in the plan)."""
    df = spark.read.orc(path)
    if columns:
        df = df.select(*columns)
    return df


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Iterable[str] | None = None,
    max_records_per_file: int = 1_000_000,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ORC with bounded file sizes and zstd compression; optional
    Hive partitioning (enables partition pruning on read)."""
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.orc(path)
