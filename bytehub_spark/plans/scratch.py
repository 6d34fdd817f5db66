"""Scratch-persist registry: operator-internal persisted intermediates.

Operators persist frames whose plan is read by several downstream
branches inside one materialization (LSH signature tables, shingle
inverted indexes, rollup levels, IVF cell assignments). Those blocks
outlive the query that created them; harnesses that run MANY queries in
one session (bench.py, check_oracle.py, the driver gate) used
``spark.catalog.clearCache()`` between queries — which also drops the
hot-TABLE cache (sources/tables.py), so every later query re-paid the
table cache fill (~2x on short queries, measured at sf0.1).

``scratch_persist`` is a drop-in for ``df.persist()`` that records the
frame; ``release_scratch()`` unpersists everything recorded and leaves
table caches warm. Operators stay oblivious to harness lifecycles, and
an operator's persisted data is still LRU-evictable like any other
block if nobody ever releases it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_scratch: list[DataFrame] = []


def scratch_persist(df: DataFrame) -> DataFrame:
    """persist() + register for bulk release by the harness.

    Idempotent per plan: best-of-N harness reps re-run the same operator
    and would otherwise re-persist the identical frame every rep, filling
    the bench tail with `CacheManager: Asked to cache already cached
    data` warnings and churning the LRU. Already-cached frames are left
    alone (they are already registered from the rep that cached them).
    """
    if df.is_cached:
        return df
    _scratch.append(df.persist())
    return df


def release_scratch() -> int:
    """Unpersist every registered scratch frame; returns how many."""
    n = 0
    while _scratch:
        df = _scratch.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session gone or already unpersisted
    return n
