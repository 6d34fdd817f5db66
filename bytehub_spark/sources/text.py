"""Raw-text source/sink — the last ingest shape a corpus pipeline meets
that the container can actually run (parquet/ORC/CSV/JSONL are covered;
Avro/Delta lack jars). Two shapes:

- **line-per-record** (`read_text_lines`): Spark's text source splits
  files in parallel on the line separator; a custom ``line_sep`` turns
  it into a delimiter-separated document reader (e.g. "\\n\\n" for
  blank-line-separated docs in WET-style dumps). Splittable, scales.
- **file-per-document** (`read_text_docs`, wholetext=true): one row per
  FILE with its path — the "directory of .txt files" ingest. NOT
  splittable (each file is one task's row); fine for many small files,
  wrong for one 100 GB file — the docstring is the guard rail.

Both attach ``input_file_name()`` so provenance survives into the
documents table (source tagging is the first column every curation
operator groups on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(
    spark: SparkSession,
    path: str,
    line_sep: str | None = None,
    with_file: bool = False,
) -> DataFrame:
    """One row per line (or per ``line_sep``-separated record).

    The text source is splittable with the default newline separator
    and column-prunes trivially (single value column). Empty trailing
    records from a final separator are kept as empty strings — filter
    ``length(value) > 0`` if the corpus convention drops them.
    """
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    df = reader.text(path)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def read_text_docs(spark: SparkSession, path: str) -> DataFrame:
    """One row per FILE: (file, text). wholetext=true — each file is
    read by a single task, so this is for many-small-files corpora
    (the .txt-dump ingest), never for single huge files."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value").alias("text")
    )


def write_text(
    df: DataFrame,
    path: str,
    column: str = "value",
    compression: str = "gzip",
    line_sep: str | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write one column as raw text, bounded file sizes. The text sink
    takes exactly ONE string column — select/cast upstream."""
    w = (
        df.select(F.col(column).cast("string").alias("value"))
        .write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if line_sep is not None:
        w = w.option("lineSep", line_sep)
    w.text(path)
