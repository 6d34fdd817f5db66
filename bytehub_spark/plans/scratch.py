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

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Module-global, NOT thread-local (VERDICT r14 note): every harness
# here (bench.py, check_oracle.py, the driver gate) runs queries
# sequentially on one thread. If a harness ever materializes queries
# CONCURRENTLY, release_scratch() on one thread would unpersist another
# thread's in-flight intermediates — make this threading.local (and
# release per-thread) before parallelizing a battery.
_scratch: list[DataFrame] = []


def scratch_persist(df: DataFrame, storage_level: StorageLevel | None = None) -> DataFrame:
    """persist() + register for bulk release by the harness.

    Idempotent per PLAN, not per Python object: best-of-N harness reps
    rebuild the DataFrame each rep (new object, ``is_cached`` False) but
    produce an identical analyzed plan, and re-persisting it fills the
    bench tail with `CacheManager: Asked to cache already cached data`
    warnings and churns the LRU. ``df.storageLevel`` routes through the
    JVM CacheManager's plan lookup (Dataset.storageLevel =
    cacheManager.lookupCachedData(this)...getOrElse(NONE)), so an equal
    plan cached by a PREVIOUS rep is detected and left alone (it is
    already registered from the rep that cached it).

    First cacher's level wins: if an equal plan is already cached at a
    different level than ``storage_level`` requests, the request is
    dropped (Spark itself refuses to re-cache an equal plan) — we log a
    warning so a MEMORY_AND_DISK request silently served MEMORY_ONLY is
    at least visible.
    """
    current = df.storageLevel
    if current != StorageLevel.NONE:
        if storage_level is not None and current != storage_level:
            import warnings

            warnings.warn(
                "scratch_persist: plan already cached at "
                f"{current}; requested {storage_level} ignored "
                "(first cacher's level wins)",
                stacklevel=2,
            )
        return df
    _scratch.append(df.persist(storage_level) if storage_level is not None else df.persist())
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
