"""Bucketed-layout plan proofs: the "with bucketed tables the shuffle
disappears" claims made by operator docstrings, pinned as plan assertions."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bytehub_spark.sources import (
    drop_bucketed,
    load_table,
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_events(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    write_bucketed(
        ev, "ev_bkt", str(tmp_path / "ev_bkt"), 8, ["user_id"],
        sort_cols=["user_id", "ts"],
    )
    yield read_bucketed(spark, "ev_bkt")
    drop_bucketed(spark, "ev_bkt")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_selfjoin_no_exchange(spark, bucketed_events, no_broadcast):
    a = bucketed_events.where(F.col("event_type") == "purchase")
    b = bucketed_events.where(F.col("event_type") == "click").select(
        "user_id", F.col("value").alias("click_value")
    )
    plan = _plan(a.join(b, "user_id"))
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_no_exchange(spark, bucketed_events):
    plan = _plan(
        bucketed_events.groupBy("user_id").agg(F.sum("value").alias("s"))
    )
    assert "Exchange" not in plan, plan


def test_bucketed_window_no_exchange(spark, bucketed_events):
    w = Window.partitionBy("user_id").orderBy("ts")
    plan = _plan(
        bucketed_events.withColumn("rn", F.row_number().over(w))
    )
    assert "Exchange" not in plan, plan


def test_unbucketed_baseline_does_shuffle(spark):
    # sanity: the same aggregation on the plain parquet DOES exchange —
    # the bucketed plans above are the layout's doing, not a session conf
    ev = load_table(spark, SF, "events")
    plan = _plan(ev.groupBy("user_id").agg(F.sum("value").alias("s")))
    assert "Exchange" in plan


def test_bucketed_roundtrip_values(spark, bucketed_events):
    ev = load_table(spark, SF, "events")
    got = (
        bucketed_events.groupBy("user_id")
        .count()
        .orderBy("user_id")
        .toPandas()
    )
    exp = ev.groupBy("user_id").count().orderBy("user_id").toPandas()
    assert got.equals(exp)
