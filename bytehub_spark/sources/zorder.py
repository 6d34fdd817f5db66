"""Z-order (Morton-curve) file layout for multi-column pruning.

A time-sorted layout prunes row groups on ``ts`` but a ``user_id``
predicate touches every file; a user-sorted layout has the mirror
problem. Interleaving the bits of both quantized keys and range-
partitioning on the interleaved value clusters files so that BOTH
columns carry tight per-file min/max stats — the standard lakehouse
trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``), reimplemented here on
plain parquet with JVM-side integer arithmetic.

The pipeline: per-column bounds (one tiny agg, broadcast back) →
integer quantization to ``bits`` levels via floor division (no
floats, no overflow: step-based, never ``(v-min)·2^bits``) → bit
interleave as a sum of disjoint power-of-two terms (``div``/``%``/
``*`` only — expressible verbatim in any SQL engine, no shift
operators needed) → ``repartitionByRange`` on the z-key +
``sortWithinPartitions`` → parquet. Writing is one range shuffle of
the data being laid out, exactly what the bucketed writer costs.

``overlap_fraction`` reads the parquet footers' column statistics and
reports which fraction of files a range predicate must touch — the
measurable claim behind the layout (asserted in tests/test_zorder.py
for both columns at once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantize_expr(col: str, mn: str, mx: str, bits: int) -> str:
    """Integer quantization of ``col`` onto the FULL [0, 2^bits) width:
    ``(v-min)·(2^bits-1) div range``. Filling the width matters — a
    narrow-range column quantized by step division would only populate
    its low bits, and the interleave would degenerate to a sort on the
    other column's high bits. Constraint (documented, not checked
    per-row): range · 2^bits < 2^63 — epoch-micros spans of ~4.5 years
    at bits=16, ~1100 years at bits=8."""
    n = 1 << bits
    rng = f"greatest({mx} - {mn}, 1L)"
    return f"least((({col} - {mn}) * {n - 1}L) div {rng}, {n - 1}L)"


def _interleave_expr(qa: str, qb: str, bits: int) -> str:
    """Morton interleave of two ``bits``-wide values as a sum of disjoint
    power-of-two terms (qa gets the odd bit positions)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({qa} div {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({qb} div {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_keys(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
) -> DataFrame:
    """Attach quantized per-column keys and the Morton z-key.

    ``col_a``/``col_b`` must be integer-valued expressions (cast
    timestamps to epoch micros first). Bounds come from one aggregate
    broadcast back to the scan — the only extra pass over the data.
    """
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    qa = _quantize_expr(col_a, "__amin", "__amax", bits)
    qb = _quantize_expr(col_b, "__bmin", "__bmax", bits)
    return (
        df.join(F.broadcast(bounds))
        .withColumn("q_a", F.expr(qa).cast("long"))
        .withColumn("q_b", F.expr(qb).cast("long"))
        .withColumn(
            "zkey", F.expr(_interleave_expr("q_a", "q_b", bits)).cast("long")
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` z-ordered parquet files: range
    partition on the z-key (so files own contiguous curve segments)
    and sort within each file (so row groups inherit tight stats)."""
    keyed = zorder_keys(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("q_a", "q_b", "zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def overlap_fraction(
    spark: SparkSession, path: str, column: str, lo, hi
) -> float:
    """Fraction of parquet files under ``path`` whose footer min/max for
    ``column`` overlaps [lo, hi] — i.e. the files a predicate pushdown
    actually reads. Driver-side footer reads only (no data scan)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    touched = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                s = col.statistics
                fmin = s.min if fmin is None else min(fmin, s.min)
                fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmin <= hi and fmax >= lo):
            touched += 1
    return touched / max(len(files), 1)
