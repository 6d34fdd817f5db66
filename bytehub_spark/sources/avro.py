"""Avro source/sink — the row-oriented interchange format Kafka
pipelines and schema-registry shops emit natively; a corpus pipeline
fed from a CDC/event bus ingests Avro without a conversion pass.

Availability seam (same discipline as backends.py for Delta/Iceberg):
Spark ships Avro as an EXTERNAL module (`spark-avro`) since 2.4 — the
`avro-*.jar`s in pyspark/jars are Hadoop-internal serdes, NOT the SQL
data source. This container has no spark-avro jar (probed r09; the
probe is `avro_available()`), so the wrappers raise a loud, actionable
error rather than letting Spark's own "Failed to find data source"
surface mid-plan — and never silently fall back to another format.

When the jar IS present, the wrappers pin corpus-scale settings,
mirroring orc.py/jsonl.py:

- **Explicit read schema** (`avroSchema`) when given — schema-on-read
  over millions of files must not pay per-file schema resolution, and
  writer-schema drift surfaces as a loud resolution error instead of
  silent nulls.
- **Bounded output files** via maxRecordsPerFile.
- **Column pruning on read** via an immediate projection. Avro is
  row-oriented: pruning cannot skip bytes inside a block the way
  parquet/ORC column chunks do, so for repeated analytical scans the
  right move at 100 TB is one Avro→parquet rewrite, then parquet scans
  (`read_avro(...)` then `storage` writes) — documented here because
  the format choice, not the reader, is the scan bottleneck.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source module is usable.

    Probes Spark's OWN resolver (DataSource.lookupDataSource), not
    Class.forName: spark-catalyst ships `o.a.s.sql.avro.AvroFileFormat`
    stubs for the from_avro/to_avro expressions, so the class LOADS on
    this container while the data source registration is still absent —
    a forName probe reports a false positive (measured r09)."""
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception as exc:  # noqa: BLE001 — message-matched below
        # Only the resolver's own "no such data source" failure means
        # the jar is absent. Any OTHER exception (py4j transport error,
        # a future Spark moving DataSource/SQLConf internals) is a
        # BROKEN PROBE, not a missing module — warn loudly so it can't
        # masquerade as "install the jar" (ADVICE r10).
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg:
            return False
        import warnings

        warnings.warn(
            "avro_available() probe itself failed (NOT the missing-jar "
            f"path): {type(exc).__name__}: {msg[:300]} — treating Avro "
            "as unavailable, but the probe needs fixing for this Spark "
            "build.",
            RuntimeWarning,
            stacklevel=2,
        )
        return False


def _scala_binary_version(spark: SparkSession) -> str:
    """Scala binary version of the running JVM ("2.12"/"2.13"), so the
    remedy message names the right spark-avro artifact (ADVICE r10: a
    hardcoded _2.13 is wrong guidance on 2.12 builds)."""
    try:
        full = spark._jvm.scala.util.Properties.versionNumberString()
        return ".".join(str(full).split(".")[:2])
    except Exception:
        return "<scala-binary-version>"


def _require(spark: SparkSession) -> None:
    if not avro_available(spark):
        sbv = _scala_binary_version(spark)
        raise RuntimeError(
            "Avro support requires the external spark-avro module "
            f"(org.apache.spark:spark-avro_{sbv}). Start the session "
            f"with spark.jars.packages=org.apache.spark:spark-avro_{sbv}"
            f":{spark.version}, or convert the data to parquet/ORC "
            "upstream. Refusing to guess a fallback format."
        )


def read_avro(
    spark: SparkSession,
    path: str,
    columns: Iterable[str] | None = None,
    avro_schema: str | None = None,
) -> DataFrame:
    """Read Avro. Projects ``columns`` immediately (row format: this
    prunes the plan, not the block bytes — see module docstring) and
    pins ``avroSchema`` when provided so per-file writer schemas
    resolve against one contract."""
    _require(spark)
    reader = spark.read.format("avro")
    if avro_schema:
        reader = reader.option("avroSchema", avro_schema)
    df = reader.load(path)
    if columns:
        df = df.select(*columns)
    return df


def write_avro(
    df: DataFrame,
    path: str,
    partition_by: Iterable[str] | None = None,
    max_records_per_file: int = 1_000_000,
    compression: str = "zstandard",
    mode: str = "overwrite",
) -> None:
    """Write Avro with bounded file sizes and zstd block compression;
    optional Hive partitioning (enables partition pruning on read)."""
    _require(df.sparkSession)
    writer = (
        df.write.mode(mode)
        .format("avro")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.save(path)
