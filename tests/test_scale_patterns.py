"""Scale-pattern tests: salted aggregation correctness on skewed keys and
bucketed co-located joins eliminating the join shuffle."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark import plans
from bytehub_spark.operators.skew import salted_agg
from bytehub_spark.sources import bucketed

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain_agg_on_skew(spark):
    """90%-hot-key distribution: salted two-stage agg == plain agg."""
    rng = np.random.default_rng(7)
    n = 50_000
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    pdf = pd.DataFrame({"k": keys, "v": rng.normal(size=n)})
    df = spark.createDataFrame(pdf)
    got = (
        salted_agg(df, ["k"], {"n": ("v", "count"), "mx": ("v", "max")}, salt=8)
        .toPandas().set_index("k").sort_index()
    )
    exp = (
        df.groupBy("k").agg(F.count("v").alias("n"), F.max("v").alias("mx"))
        .toPandas().set_index("k").sort_index()
    )
    pd.testing.assert_frame_equal(got, exp)


def test_salted_agg_scatters_hot_key(spark):
    """Stage 1 must actually split the hot key across salt buckets."""
    pdf = pd.DataFrame({"k": ["hot"] * 10_000, "v": range(10_000)})
    df = spark.createDataFrame(pdf)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in ./spark-warehouse (warehouse dir is a static
    # conf); mode("overwrite") keeps reruns idempotent
    bucketed.bucket_fact_tables(spark, SF, buckets=4)
    # force the sort-merge path (at sf0.001 orders would auto-broadcast,
    # which hides the co-location proof this test is about)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_order_lineitem_join(spark)
        plan = plans.executed_plan(j)
        # co-located bucketed scans: a fact-fact SMJ with ZERO exchanges
        # anywhere (the groupBy on o_orderkey reuses the bucketing too)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # correctness: same result as the plain (shuffling) join
    from bytehub_spark.sources import load_table
    o = load_table(spark, SF, "orders")
    l = load_table(spark, SF, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    exp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).alias("revenue"))
    )
    got_pdf = j.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    exp_pdf = exp.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_pdf, exp_pdf)


def test_pack_sequences_no_global_data_window(spark):
    """pack_sequences must never run a partition-less window over the doc
    frame (single-task straggler); the only allowed one is the prefix scan
    over the tiny per-shard totals frame (<= shuffle-partitions rows)."""
    from bytehub_spark.operators import curation
    from bytehub_spark.sources import load_table

    out = curation.pack_sequences(load_table(spark, SF, "documents"), 512)
    gw = plans.global_windows(out)
    assert gw, "expected the per-shard offset prefix scan to be present"
    assert all("__tot" in g for g in gw), gw
