"""End-to-end integration at moderate scale: the driver's events table
flows through the full feature-store lifecycle (save as features → ranged
bitemporal loads → resample → transform) with a DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_events_through_feature_store(fs, spark):
    events = load_table(spark, SF, "events")

    # ingest two event-type series as features via the Spark write path
    for et in ("click", "purchase"):
        fs.create_feature(f"test/ev_{et}")
        series = (
            events.where(F.col("event_type") == et)
            .select(
                F.col("ts").alias("time"),
                F.col("ts").alias("created_time"),
                F.col("value").alias("value"),
            )
        )
        fs.save_dataframe(series, f"test/ev_{et}")

    # ranged load, no resample: matches a DuckDB recomputation
    out = fs.load_pandas(
        "test/ev_click", from_date="2024-01-10", to_date="2024-01-20"
    )
    oracle = duckdb.sql(
        f"""
        SELECT ts, max_by(value, event_id) AS v
        FROM '{SF}/events.parquet'
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-20'
        GROUP BY ts ORDER BY ts
        """
    ).df()
    assert len(out) == len(oracle)
    np.testing.assert_allclose(out["test/ev_click"].to_numpy(), oracle["v"].to_numpy())

    # multi-feature aligned daily resample: spot-check grid + LOCF vs duckdb
    daily = fs.load_pandas(
        ["test/ev_click", "test/ev_purchase"],
        from_date="2024-01-05", to_date="2024-01-25", freq="1d",
    )
    assert len(daily) == 21
    asof = duckdb.sql(
        f"""
        WITH grid AS (SELECT unnest(generate_series(
            TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-25', INTERVAL 1 DAY)) AS t),
        c AS (SELECT ts, max_by(value, event_id) AS v
              FROM '{SF}/events.parquet' WHERE event_type = 'click' GROUP BY ts)
        SELECT g.t, c.v FROM grid g ASOF LEFT JOIN c ON c.ts <= g.t
        """
    ).df()
    np.testing.assert_allclose(
        daily["test/ev_click"].to_numpy(), asof["v"].to_numpy()
    )

    # transform over both features
    @fs.transform("test/ev_ratio", from_features=["test/ev_click", "test/ev_purchase"])
    def ratio(df):
        return df["test/ev_click"] / (df["test/ev_purchase"] + 1.0)

    r = fs.load_pandas("test/ev_ratio", from_date="2024-01-05",
                       to_date="2024-01-25", freq="1d")
    exp = daily["test/ev_click"] / (daily["test/ev_purchase"] + 1.0)
    np.testing.assert_allclose(r["test/ev_ratio"].to_numpy(), exp.to_numpy())

    # last() agrees with duckdb
    last = fs.last("test/ev_purchase")
    lv = duckdb.sql(
        f"""SELECT value FROM '{SF}/events.parquet' WHERE event_type='purchase'
            ORDER BY ts DESC, event_id DESC LIMIT 1"""
    ).fetchone()[0]
    assert abs(last["test/ev_purchase"] - lv) < 1e-12


def test_rollup_pyramid_cascade_equals_direct(spark):
    """Cascaded hour/day levels equal direct aggregation from raw events
    (mergeable aggregates), and bucket counts telescope."""
    from pyspark.sql import functions as F

    from bytehub_spark.operators import events_ops
    from bytehub_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    pyr = events_ops.rollup_pyramid(ev).toPandas()
    day = pyr[pyr["resolution"] == "1d"]
    q = F.round(F.col("value") * F.lit(1e6)).cast("decimal(20,0)")
    direct = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("bucket_ts"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(q).cast("double") / F.lit(1e6)).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
    )
    cols = ["bucket_ts", "event_type"]
    merged = day.merge(direct, on=cols, suffixes=("_c", "_d"))
    assert len(merged) == len(direct) == len(day)
    for c in ("n_events", "sum_value", "min_value", "max_value"):
        assert (merged[f"{c}_c"] == merged[f"{c}_d"]).all(), c
    # telescoping: each level's event total is the same
    tot = pyr.groupby("resolution")["n_events"].sum()
    assert tot["1m"] == tot["1h"] == tot["1d"] == ev.count()


def test_ohlc_bars_tie_break_deterministic(spark):
    """Two ticks at the same timestamp: open/close resolve by event_id."""
    from pyspark.sql import functions as F

    from bytehub_spark.operators import events_ops

    rows = [
        (2, "2024-01-01 10:00:05", "trade", 7.0),
        (1, "2024-01-01 10:00:05", "trade", 3.0),
        (3, "2024-01-01 10:30:00", "trade", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "s", "event_type", "value"]
    ).select("event_id", F.col("s").cast("timestamp").alias("ts"), "event_type", "value")
    got = events_ops.ohlc_bars(ev).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["open"] == 3.0 and r["close"] == 5.0
    assert r["high"] == 7.0 and r["low"] == 3.0
    assert r["n_ticks"] == 3 and r["volume"] == 15.0


def test_gap_report_threshold_boundary(spark):
    """Gaps strictly greater than the threshold are reported; equal-to
    is not; values carry microsecond precision."""
    from pyspark.sql import functions as F

    from bytehub_spark.operators import events_ops

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 06:00:00"),          # exactly 21600s: no gap
        (3, 1, "2024-01-01 12:00:00.000001"),   # 21600.000001s: gap
        (4, 2, "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "s"]).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    got = events_ops.gap_report(ev).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["user_id"] == 1
    # epoch doubles near 1.7e9 resolve to ~4.8e-7 s; both engines round
    # identically (the oracle hash-matches) — assert the gap cleared the
    # threshold by about the planted microsecond
    g = got.iloc[0]["gap_seconds"]
    assert 21600.0 < g == pytest.approx(21600.000001, abs=1e-5)


def test_first_touch_vs_last_click(spark):
    """First-touch credits the earliest in-window click; clicks outside
    the lookback or after the purchase never attribute."""
    from pyspark.sql import functions as F

    from bytehub_spark.operators import events_ops

    rows = [
        (1, 1, "click", "2023-12-30 09:00:00", 1.0),   # outside lookback
        (2, 1, "click", "2024-01-01 09:00:00", 2.0),   # first in window
        (3, 1, "click", "2024-01-01 11:00:00", 3.0),   # later in window
        (4, 1, "purchase", "2024-01-01 12:00:00", 9.0),
        (5, 1, "click", "2024-01-01 13:00:00", 4.0),   # after purchase
        (6, 2, "purchase", "2024-01-01 12:00:00", 8.0),  # no clicks
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "s", "value"]
    ).select(
        "event_id", "user_id", "event_type",
        F.col("s").cast("timestamp").alias("ts"), "value",
    )
    got = events_ops.first_touch_attribution(ev).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["purchase_id"] == 4 and r["first_click_id"] == 2
    assert r["attribution_lag_s"] == 3 * 3600.0


def test_level_shifts_detects_planted_step(spark):
    """A flat-10 to flat-50 step is flagged exactly at the jump; a flat
    series produces nothing."""
    from bytehub_spark.operators import events_ops

    rows = [
        (i, 1, f"2024-01-01 00:{i:02d}:00", 10.0 if i < 10 else 50.0)
        for i in range(20)
    ] + [(100 + i, 2, f"2024-01-01 01:{i:02d}:00", 7.0) for i in range(20)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "s", "value"]
    ).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts"),
        F.lit("m").alias("event_type"), "value",
    )
    got = events_ops.level_shifts(ev, w=5, threshold=20.0).toPandas()
    assert set(got["user_id"]) == {1}
    # positions whose frames straddle the step all clear the threshold
    # (a contiguous band); the TRUE changepoint is the argmax shift
    assert list(got["event_id"]) == [8, 9, 10, 11, 12]
    peak = got.loc[got["shift"].abs().idxmax()]
    assert peak["event_id"] == 10 and peak["shift"] == 40.0
