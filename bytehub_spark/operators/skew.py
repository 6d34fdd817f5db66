"""Skew-mitigation operators.

AQE's skew-join splitting (on by default in session.py) handles skewed
JOINS at runtime; skewed AGGREGATIONS still funnel every row of a hot key
through one task's hash-map before the exchange does its partial-agg
magic — fine for algebraic aggregates (Spark's partial aggregation
already combines map-side), but a straggler for high-cardinality
composites like collect_list/count_distinct. ``salted_agg`` is the
classic remedy: scatter each hot key across ``salt`` sub-keys, aggregate
twice.

Two-stage shape (for decomposable aggregates):
    stage 1: groupBy(keys..., salt) -> partial aggregate  (parallel Σ salt)
    stage 2: groupBy(keys...)       -> merge partials     (tiny)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function for each supported decomposable aggregate
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation immune to key skew.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} (the decomposable set; avg = sum/count client-
    side). The salt column is derived from a hash of the whole row's
    monotonic id surrogate — uniform, deterministic per row position.

    Example::

        salted_agg(events, ["event_type"], {"n": ("value", "count"),
                                            "total": ("value", "sum")})
    """
    for out, (col, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{fn} is not decomposable; supported: {sorted(_MERGE)}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )
    return stage2
