"""Round-11 tests: ADVICE-r10 fixes + the round's new operators.

Reference parity anchors are cited per-test where they exist; most of
this round is LLM-pipeline extension surface (SURVEY.md §2 additions),
so the contracts pinned here are the operators' own documented ones.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.operators import dedup, events_ops


def _ev(spark, rows):
    """(event_id, user_id, ts, value) -> events-shaped frame."""
    return spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "event_id": eid,
                    "user_id": uid,
                    "ts": pd.Timestamp(t),
                    "value": float(v) if v is not None else None,
                }
                for eid, uid, t, v in rows
            ]
        )
    ).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )


# ------------------------------------------------- ADVICE r10 fixes


def test_intervals_merge_drops_negative_durations(spark):
    """A negative value would make end_us < start_us (degenerate
    interval, cross-engine div/floor divergence on span_s); the
    nonnegative-duration contract filters it like a NULL."""
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:00", 10.0),
            (2, 1, "2024-01-01 00:00:05", -3.0),  # malformed: dropped
            (3, 1, "2024-01-01 01:00:00", 5.0),
        ],
    )
    out = events_ops.intervals_merge(ev).toPandas()
    assert len(out) == 2  # two islands from the two valid rows
    assert out.n_intervals.tolist() == [1, 1]
    assert out.span_s.tolist() == [600, 300]  # value is minutes (x6e7 us)


def test_scd2_monitor_empty_first_batch_keeps_guard(spark):
    """An empty micro-batch is a no-op: the 'result() before any
    micro-batch' guard must still fire after one (ADVICE r10 — an
    empty first batch used to install empty state and silently
    return an empty dimension)."""
    from bytehub_spark.streaming import Scd2Monitor

    mon = Scd2Monitor()
    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    mon.process_batch(empty)
    with pytest.raises(RuntimeError, match="before any micro-batch"):
        mon.result()

    # and a mid-stream empty batch changes nothing
    import datetime

    real = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 7, "a")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    mon.process_batch(real)
    before = mon.result().toPandas()
    mon.process_batch(empty)
    after = mon.result().toPandas()
    pd.testing.assert_frame_equal(before, after)
