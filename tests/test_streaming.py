"""Structured Streaming extension tests: windowed agg, foreachBatch ingest
into the feature store, stateful sessionization."""

import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark import streaming as st
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Copy sf0.001 events to a stream-source dir with µs timestamps."""
    src = load_table(spark, SF, "events")
    out = str(tmp_path / "events_stream")
    src.repartition(4).write.parquet(out)
    return out


def test_windowed_event_stats(spark, events_dir):
    stream = st.stream_events(spark, events_dir)
    agg = st.windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_stats")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM win_stats").toPandas()
    # batch oracle: tumbling hourly counts (append mode emits closed windows)
    batch = load_table(spark, SF, "events").toPandas()
    batch["w"] = batch["ts"].dt.floor("h")
    oracle = batch.groupby(["w", "event_type"]).size()
    merged = got.set_index(["window_start", "event_type"])["n"]
    # every emitted window matches the batch count exactly
    assert len(got) > 0
    for (w, et), n in merged.items():
        assert oracle.loc[(w, et)] == n


def test_stream_into_feature_bitemporal(fs, spark, events_dir, tmp_path):
    fs.create_feature("test/stream_value")
    stream = st.stream_events(spark, events_dir).where(F.col("user_id") == 1)
    q = st.stream_into_feature(
        stream, fs, "test/stream_value", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = fs.load_pandas("test/stream_value")
    batch = (
        load_table(spark, SF, "events")
        .where(F.col("user_id") == 1)
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    # one row per distinct event time, latest ingest wins
    exp = batch.groupby("ts")["value"].last()
    assert len(out) == len(exp)
    np.testing.assert_allclose(out["test/stream_value"].values, exp.values)


def test_sessionize_stream_vs_batch(spark, events_dir):
    events = load_table(spark, SF, "events").where(F.col("user_id") < 5)
    batch_sessions = st.sessionize_batch(events, gap_minutes=120).toPandas()

    stream = st.stream_events(spark, events_dir).where(F.col("user_id") < 5)
    q = (
        st.sessionize(stream, gap_minutes=120, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM sessions").toPandas()

    # the stream emits only sessions closed by the watermark; every emitted
    # session must exactly match a batch session
    assert len(got) > 0
    batch_keys = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions.itertuples()
    }
    for r in got.itertuples():
        assert (r.user_id, r.session_start, r.session_end, r.n_events) in batch_keys


def test_stream_dedup_drops_replays(spark, tmp_path):
    """Replayed event_ids within the watermark are delivered exactly once."""
    src = load_table(spark, SF, "events").limit(200).cache()
    out = str(tmp_path / "replayed")
    # write the same 200 events twice: an at-least-once source with replays
    src.write.parquet(out)
    src.write.mode("append").parquet(out)
    stream = st.stream_events(spark, out)
    deduped = st.stream_dedup(stream, watermark="365 days")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id FROM dedup_stream").toPandas()
    assert len(got) == 200
    assert got["event_id"].is_unique


def test_stream_attribution_join_vs_batch(spark, events_dir):
    """Stream-stream interval join emits exactly the batch join's rows
    (all data within watermark here, so no drops)."""
    stream = st.stream_events(spark, events_dir)
    joined = st.stream_attribution_join(stream, within="1 hour", watermark="365 days")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM attrib").toPandas()
    exp = st.attribution_join_batch(
        load_table(spark, SF, "events"), within="1 hour"
    ).toPandas()
    key = ["user_id", "click_ts", "p_event_id"]
    got_s = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    exp_s = exp.sort_values(key).reset_index(drop=True)[sorted(exp.columns)]
    assert len(got_s) == len(exp_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def _mk_docs(tmp_path, spark):
    """Three stream files in mtime order: originals, near-dups, flusher.

    Docs are 40 draws from a 500-word vocab (seeded); near-dups mutate two
    words of an original (3-gram jaccard ~0.85, well above the b=32/r=2
    LSH detection threshold). The flusher's late ts pushes the watermark
    past both content windows so append mode emits them.
    """
    import time as _time

    rng = np.random.RandomState(3)
    vocab = [f"w{i:03d}" for i in range(500)]

    def doc(i):
        return " ".join(rng.choice(vocab, size=40))

    originals = [(i, pd.Timestamp("2024-01-01 10:00:00") + pd.Timedelta(seconds=30 * i), doc(i))
                 for i in range(20)]
    dups = []
    for j in range(5):
        words = originals[j][2].split()
        words[10], words[25] = "zzz", "qqq"
        dups.append((100 + j,
                     pd.Timestamp("2024-01-01 10:20:00") + pd.Timedelta(seconds=30 * j),
                     " ".join(words)))
    flusher = [(999, pd.Timestamp("2024-01-01 12:00:00"), doc(999))]

    src = str(tmp_path / "docs_stream")
    for k, rows in enumerate((originals, dups, flusher)):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        sdf = spark.createDataFrame(pdf).select(
            F.col("doc_id").cast("long"), F.col("ts").cast("timestamp"), "text"
        )
        sdf.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    return src


def test_stream_dedup_lsh(spark, tmp_path):
    """Near-dups arriving after their originals are flagged non-novel;
    unique docs stay novel; surviving-band counts match the batch twin."""
    src = _mk_docs(tmp_path, spark)
    stream = st.stream_documents(spark, src, max_files=1)
    out = st.stream_dedup_lsh(stream, watermark="1 hour", window="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM lsh_dedup").toPandas()
    got = got[got["doc_id"] != 999].set_index("doc_id")
    assert len(got) == 25, got  # both content windows emitted

    # planted dups: at least one band bucket already claimed by the
    # original -> non-novel (J~0.73, r=2 -> roughly half the bands collide)
    for j in range(5):
        assert not got.loc[100 + j, "is_novel"]
        assert got.loc[100 + j, "n_novel_bands"] < 32
    # originals arrived first -> fully novel
    assert got.loc[range(20), "is_novel"].all()

    # exact agreement with the batch twin (distinct docs share no buckets,
    # so arrival order within a batch cannot flip any outcome here)
    batch_src = spark.read.parquet(src).where(F.col("doc_id") != 999)
    batch = st.dedup_lsh_batch(batch_src).toPandas().set_index("doc_id")
    for did in got.index:
        assert got.loc[did, "n_novel_bands"] == batch.loc[did, "n_novel_bands"], did


def test_stream_online_features_vs_batch(spark, events_dir):
    """The final online snapshot per (user, event_type) equals the batch
    bitemporal dedup's latest row for every key."""
    from bytehub_spark.operators import events_ops

    stream = st.stream_events(spark, events_dir, max_files=2)
    q = (
        st.stream_online_features(stream, watermark="365 days")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("online_store")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM online_store").toPandas()
    # update mode appends every snapshot change; the live value per key is
    # the one with the greatest (last_ts) — dedup keeping the final update
    got = (
        got.sort_values("last_ts")
        .groupby(["user_id", "event_type"], as_index=False)
        .last()
    )
    exp = events_ops.dedup_latest_per_key(load_table(spark, SF, "events")).toPandas()
    key = ["user_id", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) and len(got_s) > 0
    pd.testing.assert_frame_equal(
        got_s[key + ["last_ts", "last_value"]],
        exp_s[key + ["last_ts", "last_value"]],
        check_dtype=False,
    )


def test_stream_curation_stats_vs_batch(spark, tmp_path):
    """Windowed kept-docs/kept-tokens accounting on the stream equals the
    batch twin over the same files (all within watermark -> no drops)."""
    rng = np.random.RandomState(7)
    vocab = ["the", "a", "and", "of", "to"] + [f"w{i}" for i in range(50)]
    rows = [
        (
            i,
            pd.Timestamp("2024-01-01 09:00:00") + pd.Timedelta(minutes=int(i)),
            " ".join(rng.choice(vocab, size=rng.randint(3, 120))),
        )
        for i in range(120)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    src = str(tmp_path / "docs_curation")
    sdf = spark.createDataFrame(pdf).select(
        F.col("doc_id").cast("long"), F.col("ts").cast("timestamp"), "text"
    )
    sdf.repartition(3).write.parquet(src)

    stream = st.stream_documents(spark, src, max_files=1)
    q = (
        st.stream_curation_stats(stream, 0.5, "10 minutes", "365 days")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("curation_stats")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM curation_stats").toPandas()
    # update mode re-emits windows as they accumulate; keep the last emit
    got = (
        got.groupby("window_start", as_index=False).last().sort_values("window_start")
    )
    exp = (
        st.curation_stats_batch(spark.read.parquet(src), 0.5, "10 minutes")
        .toPandas()
        .sort_values("window_start")
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_stream_online_features_silent_on_all_late_batch(spark, tmp_path):
    """A micro-batch that is entirely older than a key's stored state must
    emit NO row (update-mode consumers treat each emission as a change)."""
    import os
    import time

    src = str(tmp_path / "late_stream")
    os.makedirs(src)

    def write_file(rows, name):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, st.ingest.EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_file([(2, "2024-01-01 12:00:00", 1, "click", 5.0, None)], "f1")
    time.sleep(1.1)  # file-source orders micro-batches by mtime
    write_file([(1, "2024-01-01 10:00:00", 1, "click", 3.0, None)], "f2")

    stream = st.stream_events(spark, src, max_files=1)
    q = (
        st.stream_online_features(stream, watermark="365 days")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("late_store")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM late_store").toPandas()
    # exactly one emission: the first batch; the all-late second batch is
    # swallowed (state unchanged)
    assert len(got) == 1, got
    assert got.iloc[0]["last_value"] == 5.0


def test_stream_decontaminate_vs_batch(spark, tmp_path):
    """Streaming decontamination flags exactly the docs the batch twin
    flags, with identical hit counts — and flags the planted leak."""
    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(80)]
    bench_text = " ".join(rng.choice(vocab, size=20))
    rows = []
    for i in range(60):
        t = " ".join(rng.choice(vocab, size=rng.randint(10, 40)))
        if i % 10 == 0:  # plant the leak: embed a benchmark span
            t = t + " " + bench_text
        rows.append(
            (i, pd.Timestamp("2024-01-01 09:00:00") + pd.Timedelta(minutes=int(i)), t)
        )
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    src = str(tmp_path / "docs_decon")
    spark.createDataFrame(pdf).select(
        F.col("doc_id").cast("long"), F.col("ts").cast("timestamp"), "text"
    ).repartition(3).write.parquet(src)

    bench = spark.createDataFrame([(0, bench_text)], ["doc_id", "text"])
    bench_set = st.benchmark_shingle_set(bench).cache()

    stream = st.stream_documents(spark, src, max_files=1)
    q = (
        st.stream_decontaminate(stream, bench_set)
        .select("doc_id", "n_hit_shingles", "is_contaminated")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("decon")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM decon").toPandas().sort_values("doc_id")
    exp = (
        st.decontaminate_flags_batch(spark.read.parquet(src), bench)
        .select("doc_id", "n_hit_shingles", "is_contaminated")
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(got) == 60
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    flagged = set(got[got["is_contaminated"]]["doc_id"])
    assert {0, 10, 20, 30, 40, 50} <= flagged


def test_stream_anomaly_filter_vs_batch(spark, tmp_path):
    """Streaming seasonal-anomaly alerts equal the batch operator's flags
    exactly when the baseline comes from the same history."""
    from bytehub_spark.operators import events_ops
    from bytehub_spark.sources import load_table

    src = str(tmp_path / "ev_anom")
    ev = load_table(spark, "/root/testdata/sf0.001", "events", cache_small=False)
    ev.repartition(3).write.parquet(src)
    hist = spark.read.parquet(src)
    baseline = events_ops.seasonal_baseline(hist).cache()

    stream = st.stream_events(spark, src, max_files=2)
    q = (
        st.stream_anomaly_filter(stream, baseline)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("anom")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM anom")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        events_ops.seasonal_anomaly(hist)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)
