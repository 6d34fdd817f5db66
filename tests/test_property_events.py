"""Property-based checks for the round-2 events operators: random
buckets/thresholds/windows vs a DuckDB oracle at sf0.001 — the driver
gate's fixed parameters generalized to the parameter space."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bytehub_spark.operators import events_ops
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def _match(sdf, ddf):
    s = sdf.toPandas()
    d = ddf.df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    if not len(s):
        return
    cols = sorted(s.columns)
    s = s[cols].sort_values(cols).reset_index(drop=True)
    d = d[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(s[c]):
            assert (abs(s[c] - d[c]) < 1e-12).all(), c
        else:
            assert s[c].tolist() == d[c].tolist(), c


@given(unit=st.sampled_from(["hour", "day", "minute"]))
@settings(**SETTINGS)
def test_ohlc_random_bucket_unit(spark, con, events, unit):
    sdf = events_ops.ohlc_bars(events, unit=unit)
    ddf = con.sql(f"""
        WITH ev AS (
            SELECT date_trunc('{unit}', ts) AS bucket_ts, event_type,
                   ts, event_id, value,
                   row_number() OVER (
                       PARTITION BY date_trunc('{unit}', ts), event_type
                       ORDER BY ts ASC, event_id ASC) AS ra,
                   row_number() OVER (
                       PARTITION BY date_trunc('{unit}', ts), event_type
                       ORDER BY ts DESC, event_id DESC) AS rd
            FROM events
        )
        SELECT bucket_ts, event_type,
               MAX(CASE WHEN ra = 1 THEN value END) AS open,
               MAX(value) AS high, MIN(value) AS low,
               MAX(CASE WHEN rd = 1 THEN value END) AS close,
               COUNT(*) AS n_ticks,
               CAST(SUM(CAST(round(value * 1e6) AS DECIMAL(20,0)))
                    AS DOUBLE) / 1e6 AS volume
        FROM ev GROUP BY bucket_ts, event_type
        ORDER BY bucket_ts, event_type
    """)
    _match(sdf, ddf)


@given(thr=st.floats(min_value=600.0, max_value=86400.0))
@settings(**SETTINGS)
def test_gap_report_random_threshold(spark, con, events, thr):
    sdf = events_ops.gap_report(events, threshold_s=thr)
    ddf = con.sql(f"""
        WITH o AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev
            FROM events
        )
        SELECT user_id, prev AS gap_start, ts AS gap_end,
               epoch(ts) - epoch(prev) AS gap_seconds
        FROM o
        WHERE prev IS NOT NULL AND epoch(ts) - epoch(prev) > {thr!r}
        ORDER BY user_id, gap_start
    """)
    _match(sdf, ddf)


@given(
    w=st.integers(min_value=2, max_value=10),
    thr=st.floats(min_value=5.0, max_value=60.0),
)
@settings(**SETTINGS)
def test_level_shifts_random_window(spark, con, events, w, thr):
    sdf = events_ops.level_shifts(events, w=w, threshold=thr)
    ddf = con.sql(f"""
        WITH d AS (
            SELECT user_id, event_id, ts,
                   COUNT(*) OVER wpre AS nb,
                   COUNT(*) OVER wpost AS na,
                   CAST(SUM(CAST(round(value * 1e6) AS DECIMAL(20,0)))
                        OVER wpre AS DOUBLE) / ({float(w)!r} * 1e6)
                       AS pre_mean,
                   CAST(SUM(CAST(round(value * 1e6) AS DECIMAL(20,0)))
                        OVER wpost AS DOUBLE) / ({float(w)!r} * 1e6)
                       AS post_mean
            FROM events
            WINDOW
                wpre AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING),
                wpost AS (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
        )
        SELECT user_id, event_id, ts, pre_mean, post_mean,
               post_mean - pre_mean AS shift
        FROM d
        WHERE nb = {w} AND na = {w}
          AND abs(post_mean - pre_mean) > {thr!r}
        ORDER BY user_id, event_id
    """)
    _match(sdf, ddf)
