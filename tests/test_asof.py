"""Generic as-of join vs the pandas merge_asof oracle, and plan checks
via bytehub_spark.plans."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark import plans
from bytehub_spark.operators.asof import asof_join
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

rng = np.random.default_rng(3)


def test_asof_join_matches_merge_asof(spark):
    lt = pd.DataFrame({
        "key": np.repeat([1, 2, 3], 50),
        "time": pd.to_datetime("2021-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, 150), unit="m"),
        "lv": rng.normal(size=150),
    })
    rt = pd.DataFrame({
        "key": np.repeat([1, 2, 3], 40),
        "time": pd.to_datetime("2021-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, 120), unit="m"),
        "rv": rng.normal(size=120),
    })
    # unique times per key (merge_asof demands sorted; ties already inclusive)
    lt = lt.drop_duplicates(["key", "time"])
    rt = rt.drop_duplicates(["key", "time"])

    out = (
        asof_join(
            spark.createDataFrame(lt), spark.createDataFrame(rt),
            time_col="time", by=["key"],
        )
        .toPandas()
        .sort_values(["key", "time"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lt.sort_values("time"), rt.sort_values("time"), on="time", by="key"
    ).sort_values(["key", "time"]).reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_allclose(out["lv"], exp["lv"])
    a, b = out["rv_right"].to_numpy(), exp["rv"].to_numpy()
    mask = ~np.isnan(b)
    assert (np.isnan(a) == np.isnan(b)).all()
    np.testing.assert_allclose(a[mask], b[mask])


def test_asof_join_tolerance(spark):
    lt = pd.DataFrame({
        "key": [1, 1], "time": pd.to_datetime(["2021-01-01 10:00", "2021-01-01 12:00"]),
        "lv": [1.0, 2.0],
    })
    rt = pd.DataFrame({
        "key": [1], "time": pd.to_datetime(["2021-01-01 09:30"]), "rv": [7.0],
    })
    out = asof_join(
        spark.createDataFrame(lt), spark.createDataFrame(rt),
        time_col="time", by=["key"], tolerance="1h",
    ).toPandas().sort_values("time")
    assert out["rv_right"].tolist()[0] == 7.0        # 30min old: within 1h
    assert np.isnan(out["rv_right"].tolist()[1])      # 2.5h old: too stale


def test_asof_join_single_shuffle(spark):
    """The as-of plan must shuffle each side once on the key — no range
    join explosion, no extra exchanges."""
    events = load_table(spark, SF, "events")
    left = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("time"), "value")
    right = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("time"), F.col("value").alias("cv"))
    out = asof_join(left, right, time_col="time", by=["user_id"])
    assert plans.shuffle_count(out) <= 2  # one per input side (union reuses)
    out.collect()


def test_plan_helpers_on_scan(spark):
    from bytehub_spark.sources.tables import _cache
    spark.catalog.clearCache(); _cache.clear()
    li = load_table(spark, SF, "lineitem", cache_small=False).where(
        F.col("l_shipdate") >= "1996-01-01"
    ).select("l_orderkey", "l_quantity")
    assert any("l_shipdate" in f for f in plans.pushed_filters(li))
    assert set(plans.read_schema(li)) == {"l_orderkey", "l_quantity", "l_shipdate"}
