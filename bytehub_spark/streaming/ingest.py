"""Structured Streaming extension (SURVEY.md §2.9).

The reference has no streaming; its bitemporal model (append with
created_time, read latest-known) is the batch analogue of late-data
handling. Here we close the loop: a stream of events appends into the
feature store through foreachBatch, and the bitemporal read path absorbs
late/updated rows with no special casing — watermarks bound state, the
MVCC dedup resolves replays.

Ops:
- stream_events: parquet-directory source with the canonical events schema
- windowed_event_stats: watermark + tumbling-window aggregation
- stream_into_feature: foreachBatch append into a FeatureStore feature
  (exactly-once per epoch via idempotent created_time stamping)
- sessionize: custom stateful operator (gap-based sessions) via
  applyInPandasWithState — the pattern for operators Spark lacks natively
"""

from __future__ import annotations

import datetime as dt
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, src_dir: str, max_files: int = 16) -> DataFrame:
    """Streaming read of an events directory (one parquet file per micro-batch
    group; swap for kafka/kinesis source in production)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def windowed_event_stats(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregate per event_type.

    The watermark bounds shuffle state at scale: late rows beyond it are
    dropped from the streaming agg but still land in the feature store via
    stream_into_feature, where bitemporal reads pick them up.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_into_feature(
    events: DataFrame,
    store,
    feature: str,
    checkpoint_dir: str,
    value_col: str = "value",
    trigger_seconds: int | None = None,
):
    """Append a stream into a feature: each micro-batch becomes a bitemporal
    append (created_time = batch wall-clock), so replays/late data resolve
    through the MVCC dedup on read."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df.select(
            F.col("ts").alias("time"),
            F.current_timestamp().alias("created_time"),
            F.col(value_col).alias("value"),
        )
        store.save_dataframe(out, feature)

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
):
    """Custom stateful streaming operator: gap-based sessionization per user
    via applyInPandasWithState. Emits a session row when the user goes
    quiet for `gap_minutes` (or the state times out past the watermark).

    State per key is O(1) (four scalars) — bounded memory at any scale.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        vals = rows["value"].fillna(0.0)

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = None, None, 0, 0.0

        closed = []
        for t_us, v in zip(ts_us, vals):
            if start_us is None:
                start_us, last_us, n, sv = int(t_us), int(t_us), 1, float(v)
            elif t_us - last_us > gap_us:
                closed.append((start_us, last_us, n, sv))
                start_us, last_us, n, sv = int(t_us), int(t_us), 1, float(v)
            else:
                last_us, n, sv = int(t_us), n + 1, sv + float(v)

        state.update((start_us, last_us, n, sv))
        state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (same semantics, pure DataFrame ops): lag +
    cumulative sum of gap-breaks per user — the classic Spark pattern."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("session_id")
    )


def stream_dedup(
    events: DataFrame, watermark: str = "10 minutes", keys: Iterable[str] = ("event_id",)
) -> DataFrame:
    """Streaming exact dedup: drop replayed rows within the watermark
    horizon (at-least-once sources -> effectively-once sink).

    ``dropDuplicatesWithinWatermark`` keeps key state only until the
    watermark passes, so state is bounded at scale — the streaming twin of
    the batch ``operators.dedup.exact_dedup`` / bitemporal A1 dedup: the
    stream sheds duplicate *deliveries*; replays later than the watermark
    still land and are resolved by the bitemporal read path.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def _attribution_join_cond(click, purchase, within: str):
    return (
        (click["user_id"] == purchase["p_user_id"])
        & (purchase["p_ts"] >= click["ts"])
        & (purchase["p_ts"] <= click["ts"] + F.expr(f"INTERVAL {within}"))
    )


def stream_attribution_join(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to any click by
    the same user within ``within`` before the purchase.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire join state — the only way a
    stream-stream join survives unbounded input. Late rows beyond the
    watermark drop out of attribution but still reach storage via
    stream_into_feature (bitemporal reads see them).
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("value").alias("click_value"))
        .withWatermark("ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(purchases, _attribution_join_cond(clicks, purchases, within))
    return joined.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        "click_value",
        F.col("p_ts").alias("purchase_ts"),
        "p_event_id",
        F.col("p_value").alias("purchase_value"),
    )


def attribution_join_batch(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Batch twin of stream_attribution_join (oracle for tests)."""
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    joined = clicks.join(purchases, _attribution_join_cond(clicks, purchases, within))
    return joined.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        "click_value",
        F.col("p_ts").alias("purchase_ts"),
        "p_event_id",
        F.col("p_value").alias("purchase_value"),
    )
