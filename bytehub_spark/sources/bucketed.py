"""Bucketed tables: co-located joins with ZERO shuffle.

At 100 TB the dominant cost of fact-fact joins (orders ⋈ lineitem) is the
shuffle of both sides on the join key. Writing both tables bucketed on
that key with the same bucket count lets Spark prove co-partitioning at
plan time: SortMergeJoin with NO Exchange on either side. This module
materializes bucketed twins of the testdata fact tables and exposes the
no-shuffle join — the pattern a production deployment would apply to its
hot join keys (reference has no equivalent; its dask merge always
re-partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

BUCKETS = 8


def bucket_fact_tables(
    spark: SparkSession, sf_dir: str, buckets: int = BUCKETS
) -> None:
    """Write orders/lineitem as bucketed managed tables on o_/l_orderkey.

    One-off preparation cost (like any physical design choice); every
    subsequent join on orderkey is shuffle-free.
    """
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        table = f"bucketed_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a previous session may have left the managed location behind with
        # no metastore entry (in-memory catalog); clear it or save fails
        if warehouse:
            shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name, cache_small=False)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(table)
        )


def bucketed_order_lineitem_join(spark: SparkSession) -> DataFrame:
    """orders ⋈ lineitem on orderkey over the bucketed twins: per-order
    revenue. The plan must contain no Exchange for the join itself."""
    o = spark.table("bucketed_orders")
    l = spark.table("bucketed_lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Generic bucketed-layout helpers (beyond the fact-table twins above):
# persist ANY frame hash-bucketed on a key so later joins / groupBys /
# per-key windows on that key plan with NO Exchange (tests/test_bucketed.py
# pins all three shapes). At 100 TB this converts the per-query key shuffle
# into a one-off ingest cost; size buckets so one bucket's hot columns fit
# an executor (e.g. 4096 for a 10 TB table).
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed on
    ``key_cols`` (sorted within buckets by ``sort_cols`` — defaults to the
    key, which also accelerates merge joins and per-key windows)."""
    sort_cols = sort_cols if sort_cols is not None else key_cols
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, *key_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (spark.table keeps the
    metadata; reading the parquet path directly would lose it)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
