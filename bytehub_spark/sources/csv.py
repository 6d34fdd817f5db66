"""CSV source/sink — the metadata-table interchange format (crawl
manifests, label tables, blocklists arrive as CSV far more often than
as parquet).

Spark's native csv reader handles splitting, quoting, and compression;
the wrappers pin the corpus-scale settings, mirroring jsonl.py:

- **Explicit schema on read.** Inference is a FULL extra pass (and
  types drift run-to-run on dirty data); ``read_csv`` takes a DDL
  string / StructType and only falls back to inference when none is
  given.
- **Malformed-row quarantine.** PERMISSIVE mode routes broken rows to
  ``_corrupt_record`` (exposed with ``keep_corrupt=True``) instead of
  failing a 10-hour job on line 9 billion.
- **Header + delimiter pinned explicitly** — never guessed.
- **Bounded output files** on write via maxRecordsPerFile.

CSV scans get column pruning but NO predicate pushdown into the file
(row-oriented text has no stripe statistics) — a reason to convert to
parquet/ORC after ingest; tests/test_csv.py pins the pruned ReadSchema.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    columns: Iterable[str] | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read CSV. Pass ``schema`` in production — inference costs a full
    extra data pass and type-drifts on dirty input; ``schema=None`` sets
    ``inferSchema`` so the fallback actually infers (without it Spark
    silently reads every column as string).

    ``keep_corrupt`` requires an explicit schema: Spark only populates
    ``_corrupt_record`` when the column exists in a user schema, so with
    ``schema=None`` the quarantine would silently not exist — raise
    rather than pretend.
    """
    if keep_corrupt and schema is None:
        raise ValueError(
            "keep_corrupt=True requires an explicit schema: Spark only "
            "populates _corrupt_record when it is present in a user-"
            "provided schema (with inference the flag would silently do "
            "nothing)"
        )
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("header", str(header).lower())
        .option("sep", delimiter)
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        if isinstance(schema, str):
            schema = f"{schema}, _corrupt_record string"
        elif isinstance(schema, T.StructType):
            schema = schema.add("_corrupt_record", T.StringType())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if columns:
        df = df.select(*columns)
    return df


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    compression: str = "gzip",
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write CSV with bounded file sizes; gzip by default (CSV is the
    interchange leg, not the analytical store — convert onward)."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .csv(path)
    )
