"""End-to-end integration at moderate scale: the driver's events table
flows through the full feature-store lifecycle (save as features → ranged
bitemporal loads → resample → transform) with a DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
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
