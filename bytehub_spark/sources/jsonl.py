"""JSONL (newline-delimited JSON) source/sink — the interchange format of
LLM corpus pipelines (one document object per line).

Spark's native json reader/writer already handles jsonl line-per-record
semantics, splitting, and all compression codecs; these wrappers pin the
settings that matter at corpus scale:

- **Explicit schema on read.** Schema inference runs a FULL extra pass
  over the data before the real scan — at 100 TB that is a second read of
  the corpus. ``read_jsonl`` takes a schema (or DDL string) and only
  falls back to inference when none is given (small/exploratory inputs).
- **Corrupt-line tolerance.** Web-scale jsonl always contains broken
  lines; PERMISSIVE mode routes them to ``_corrupt_record`` instead of
  failing the job, and ``read_jsonl(..., keep_corrupt=True)`` exposes the
  column for quarantine flows.
- **Bounded output files.** ``write_jsonl`` re-splits with
  maxRecordsPerFile so a skewed partition cannot produce a multi-GB line
  file, and optional zstd/gzip compression (zstd default: splittable-
  enough per-file units, ~3x smaller than raw on text).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    columns: Iterable[str] | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON. Pass ``schema`` (StructType or DDL
    string) in production — inference costs a full extra data pass.
    Column pruning pushes into the text scan (only named fields are
    parsed per line — Spark's Jackson parser skips the rest)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        if isinstance(schema, str):
            schema = f"{schema}, _corrupt_record string"
        elif isinstance(schema, T.StructType):
            schema = schema.add("_corrupt_record", T.StringType())
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if columns:
        df = df.select(*columns)
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = "zstd",
    max_records_per_file: int = 1_000_000,
    partition_by: Iterable[str] | None = None,
) -> None:
    """Write newline-delimited JSON. ``max_records_per_file`` caps file
    size under skew; ``partition_by`` lays out hive-style directories so
    downstream readers partition-prune (e.g. by lang or source)."""
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.json(path)
