"""Round-6 contracts: the ADVICE r05 fixes pinned by tests.

- ``_int_gemm_scored`` id types are derived from the candidate schema,
  so ``knn_graph`` works with STRING vector ids (same generalization
  ``connected_components`` got in round 5).
- ``connected_components`` drops null edge endpoints before the Arrow
  fast-path probe (a null previously raised in createDataFrame on the
  non-nullable component schema, or corrupted long ids to float64 in
  the non-Arrow fallback).
- ``scratch_persist`` warns (rather than silently ignoring) when an
  equal plan is already cached at a different storage level.
"""

import warnings

import pandas as pd
import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from bytehub_spark.operators import dedup, events_ops, similarity

SF = "/root/testdata/sf0.001"


def test_knn_graph_string_ids(spark):
    # 4 vectors, two near-identical pairs; string ids must survive the
    # mapInPandas GEMM boundary end-to-end
    rows = [
        ("alpha", [1.0, 0.0, 0.0, 0.0]),
        ("bravo", [0.99, 0.01, 0.0, 0.0]),
        ("charlie", [0.0, 1.0, 0.0, 0.0]),
        ("delta", [0.0, 0.99, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = similarity.knn_graph(df, k=2, n_planes=4, bands=4).toPandas()
    assert got["vec_id"].dtype == object  # strings, not floats
    assert set(got["vec_id"]) <= {"alpha", "bravo", "charlie", "delta"}
    # the twin must be each vector's top neighbor where both share buckets
    top = got[got["rank"] == 1].set_index("vec_id")["neighbor_id"].to_dict()
    if "alpha" in top:
        assert top["alpha"] == "bravo"
    if "charlie" in top:
        assert top["charlie"] == "delta"


def test_connected_components_null_endpoints(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, None], "doc_b": [2, None, 3]}),
        "doc_a long, doc_b long",
    )
    got = dedup.connected_components(pairs).toPandas()
    comp = got.set_index("doc_id")["component"].to_dict()
    # only the (1,2) edge survives; 3 never appears as a valid endpoint
    assert comp == {1: 1, 2: 1}
    # ids stayed integral (the old non-Arrow fallback coerced to float64)
    assert str(got["component"].dtype).startswith("int")


def test_lcg_sample_pred_deterministic_and_overflow_safe(spark):
    # huge ids (beyond 2^31) must not overflow the BIGINT LCG product,
    # and the selected set must be identical across evaluations
    big = spark.range(0, 2000).select(
        (F.col("id") * F.lit(4_611_686_018_000_000)).alias("uid")
    )
    pred = events_ops.lcg_sample_pred("uid", 10)
    sel = [F.count("*"), F.sum(F.col("uid") % 1000003)]
    a = big.where(F.expr(pred)).agg(*sel).collect()[0]
    b = big.where(F.expr(pred)).agg(*sel).collect()[0]
    assert a == b
    # ~1/10 of rows, loose bounds (it's a hash, not a stratified sample)
    assert 100 <= a[0] <= 350


def test_rfm_sampled_mode_scores_all_users(spark):
    from bytehub_spark.sources import load_table

    events = load_table(spark, SF, "events")
    n_users = events.select("user_id").distinct().count()
    exact = events_ops.rfm_segments(events, breakpoint_mode="exact").toPandas()
    # force the sampled path via a zero threshold on the auto mode
    sampled = events_ops.rfm_segments(
        events, breakpoint_mode="auto", sample_mod=2, sample_threshold=0
    ).toPandas()
    # estimated breakpoints move the cut points, never the population:
    # every user is scored in both modes
    assert exact["n_users"].sum() == n_users
    assert sampled["n_users"].sum() == n_users
    assert (1 <= sampled[["r_score", "f_score", "m_score"]].values).all()
    assert (sampled[["r_score", "f_score", "m_score"]].values <= 5).all()
    with pytest.raises(ValueError):
        events_ops.rfm_segments(events, breakpoint_mode="bogus")


def test_cadence_profile_hand_case(spark):
    # user 1: perfectly regular 60s cadence -> burstiness 0
    # user 2: gaps 1s, 1s, 98s -> right-skewed -> burstiness > 0
    # user 3: single event -> excluded
    rows = []
    for i in range(5):
        rows.append((i, f"2024-01-01 00:{i}:00", 1))
    rows += [
        (10, "2024-01-01 00:00:00", 2),
        (11, "2024-01-01 00:00:01", 2),
        (12, "2024-01-01 00:00:02", 2),
        (13, "2024-01-01 00:01:40", 2),
    ]
    rows.append((20, "2024-01-01 00:00:00", 3))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = events_ops.cadence_profile(df).toPandas().set_index("user_id")
    assert sorted(got.index) == [1, 2]
    u1 = got.loc[1]
    assert u1["n_gaps"] == 4
    assert u1["mean_gap_us"] == 60_000_000
    assert u1["p50_gap_us"] == 60_000_000.0
    assert u1["burstiness_ppm"] == 0
    u2 = got.loc[2]
    assert u2["n_gaps"] == 3
    # gaps 1s,1s,98s: p50=1s, p90=(0.8*98+0.2*1)=78.6s ->
    # (78.6-1)/(78.6+1) in ppm
    assert u2["p50_gap_us"] == 1_000_000.0
    assert u2["burstiness_ppm"] > 900_000


def test_retention_monitor_arrival_permutation_exact(spark):
    """Round-6 hardening: the retention monitor is now fully order-
    independent (min-cohort + mask shift), so feeding the SAME events in
    an arbitrary batch permutation — including users whose cohort-
    defining first event arrives LAST — must reproduce the batch op
    exactly. This is strictly stronger than the r05 commute test, which
    pinned order-independence only after batch 0 fixed every cohort."""
    from bytehub_spark.sources import load_table
    from bytehub_spark.streaming import RetentionMonitor

    ev = load_table(spark, SF, "events")
    expect = (
        events_ops.retention_cohorts(ev).toPandas().reset_index(drop=True)
    )
    pdf = ev.toPandas()
    # adversarial permutation: REVERSE event-time order, then chunk —
    # every user's first event is in the last batch that mentions them
    pdf = pdf.sort_values(["ts", "event_id"], ascending=False).reset_index(
        drop=True
    )
    k = 4
    mon = RetentionMonitor()
    for i in range(k):
        mon.process_batch(spark.createDataFrame(pdf.iloc[i::k]))
    got = mon.result().toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)


def test_retention_monitor_cohort_shift_hand_case(spark):
    """A late-arriving earlier first event must move the cohort back and
    shift the existing activity bits so week offsets stay correct."""
    from bytehub_spark.streaming import RetentionMonitor

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    mon = RetentionMonitor()
    # batch 1: activity in ISO weeks of Jan 20 and Jan 27
    mon.process_batch(batch([(1, "2025-01-20 10:00:00", 7),
                             (2, "2025-01-27 10:00:00", 7)]))
    st1 = mon.state.toPandas()
    assert st1.loc[0, "mask"] == 0b11  # offsets 0,1 vs Jan-20 cohort
    # batch 2 (late): the user's TRUE first event, two weeks earlier
    mon.process_batch(batch([(3, "2025-01-06 09:00:00", 7)]))
    st2 = mon.state.toPandas()
    assert st2.loc[0, "cohort"] == pd.Timestamp("2025-01-06")
    # old bits shifted by 2, new bit 0 set: weeks 0, 2, 3
    assert st2.loc[0, "mask"] == 0b1101


def test_funnel_monitor_disorder_error_is_bounded_and_known(spark):
    """FunnelMonitor keeps its documented ordered-arrival contract (a
    funnel is inherently sequential). This test MEASURES the failure
    mode under batch disorder instead of leaving it prose: a step-1
    event arriving after a later batch already set t1 is ignored
    (coalesce keeps the first-arrival t1), so an intermediate step-2
    event between the true and kept t1 is missed. The divergence is
    exactly one user at steps>=2 on this fixture — never an overcount,
    and step-1 reach is unaffected (every step-1 arrival still counts
    the user)."""
    from bytehub_spark.streaming import FunnelMonitor

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                        "event_type"])
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    steps = ("view", "click", "purchase")
    # ordered truth: view@1, click@2, purchase@3 -> user converts fully
    ordered = FunnelMonitor(steps)
    ordered.process_batch(batch([(1, "2025-01-01 00:00:01", 1, "view")]))
    ordered.process_batch(batch([(2, "2025-01-01 00:00:02", 1, "click")]))
    ordered.process_batch(batch([(3, "2025-01-01 00:00:03", 1, "purchase")]))
    exp = ordered.result().toPandas().set_index("step")["n_users"]
    assert list(exp) == [1, 1, 1]

    # disordered: the view@4 batch arrives FIRST (a later duplicate
    # view), then the true view@1 -> t1 pinned at 00:04; click@2 is
    # before the kept t1 and is lost; purchase@3 then never matches
    dis = FunnelMonitor(steps)
    dis.process_batch(batch([(4, "2025-01-01 00:00:04", 1, "view")]))
    dis.process_batch(batch([(1, "2025-01-01 00:00:01", 1, "view"),
                             (2, "2025-01-01 00:00:02", 1, "click")]))
    dis.process_batch(batch([(3, "2025-01-01 00:00:03", 1, "purchase")]))
    got = dis.result().toPandas().set_index("step")["n_users"]
    # measured tolerance: step-1 exact, later steps UNDER-count only
    assert got[1] == exp[1]
    assert list(got) == [1, 0, 0]


def test_scratch_persist_level_mismatch_warns(spark):
    from bytehub_spark.plans.scratch import release_scratch, scratch_persist

    df = spark.range(10).withColumn("x", F.col("id") * 2)
    scratch_persist(df, StorageLevel.MEMORY_ONLY)
    df.count()
    rebuilt = spark.range(10).withColumn("x", F.col("id") * 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scratch_persist(rebuilt, StorageLevel.MEMORY_AND_DISK)
    assert any("first cacher" in str(x.message) for x in w)
    release_scratch()


def test_minhash_band_balance_accounting(spark):
    """The decision table's cand_pairs is EXACTLY the raw pre-distinct
    pair volume the bucket self-join produces at that shape, and the
    total volume is (weakly) monotone in band sharpness on real data —
    the property that makes it a trustworthy prepass for
    minhash_lsh_pairs sizing."""
    from bytehub_spark.plans.scratch import release_scratch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bal = dedup.minhash_band_balance(docs).toPandas()
    assert sorted(bal["bands"].unique()) == [8, 16, 32]
    # per-shape row count == bands; per-band doc count is constant
    for b in (8, 16, 32):
        sub = bal[bal["bands"] == b]
        assert len(sub) == b
        assert sub["n_rows"].nunique() == 1
        assert (sub["max_bucket_rows"] <= sub["n_rows"]).all()
        assert (sub["n_buckets"] <= sub["n_rows"]).all()
    totals = bal.groupby("bands")["cand_pairs"].sum()
    assert totals[32] >= totals[16] >= totals[8]

    # exact accounting cross-check at bands=16: replay the raw bucket
    # self-join and count pairs directly
    sig = dedup.minhash_signatures(docs, 64, 3)
    buckets = dedup._band_buckets(sig, 64, 16, "doc_id")
    a, b2 = buckets.alias("a"), buckets.alias("b")
    raw = a.join(
        b2,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert raw == int(totals[16])
    release_scratch()


def test_bloom_filter_monitor_equals_batch_any_order(spark):
    """The streaming Bloom filter equals the batch build word-for-word
    under ANY batch partitioning and arrival order (bit_or commutes and
    is idempotent — re-delivered docs are no-ops), and the per-batch
    covered-doc telemetry flags a replayed batch completely."""
    from bytehub_spark.streaming import BloomFilterMonitor

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expect = (
        dedup.bloom_build_words(docs, 4, 1 << 18, 4)
        .orderBy("word_idx")
        .toPandas()
    )

    pdf = docs.toPandas()
    for order in (False, True):
        chunks = [pdf.iloc[i::3] for i in range(3)]
        if order:
            chunks = chunks[::-1]
        mon = BloomFilterMonitor()
        for i, c in enumerate(chunks):
            mon.process_batch(spark.createDataFrame(c), i)
        got = mon.result().toPandas()
        pd.testing.assert_frame_equal(got, expect)

    # replay: feeding the exact same batch twice leaves the filter
    # unchanged and flags every (>=4-word) doc as covered
    mon = BloomFilterMonitor()
    b0 = spark.createDataFrame(pdf.iloc[0:50])
    mon.process_batch(b0, 0)
    words_before = mon.result().toPandas()
    mon.process_batch(b0, 1)
    pd.testing.assert_frame_equal(mon.result().toPandas(), words_before)
    n_eligible = b0.where(F.size(F.split("text", " ")) >= 4).count()
    assert mon.batch_log[1]["n_covered_docs"] == n_eligible
    assert mon.batch_log[0]["n_covered_docs"] == 0
    # shingle-less docs are reported separately, never folded into
    # covered (ADVICE r06): n_short + n_eligible == n_docs
    for entry in mon.batch_log:
        assert entry["n_short_docs"] == entry["n_docs"] - n_eligible


def test_snapshot_drift_detects_injected_shift(spark):
    """A deterministic constant shift on snapshot B moves the per-label
    centroid by exactly that shift (µ-quantized) and shows up in
    centroid_dist2_u2; identical snapshots read zero drift."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    same = similarity.snapshot_drift(emb, emb).toPandas()
    assert (same["centroid_dist2_u2"] == 0).all()
    assert (same["norm2_delta_u2"] == 0).all()

    shifted = emb.withColumn(
        "embedding", F.expr("transform(embedding, x -> x + CAST(0.25 AS FLOAT))")
    )
    drift = similarity.snapshot_drift(emb, shifted).toPandas()
    # shift = 0.25 in every dim -> per-dim centroid delta ~250000 µ
    # (quantization truncation keeps it within a few units), squared and
    # summed over 64 dims ~= 4e12
    assert (drift["centroid_dist2_u2"] > 3.9e12).all()
    assert (drift["centroid_dist2_u2"] < 4.1e12).all()
    assert (drift["n_a"] == drift["n_b"]).all()


def test_embedding_drift_monitor_equals_batch_any_order(spark):
    """The streamed drift table equals snapshot_drift(reference, union)
    row-for-row under any batch partitioning and order — per-(label,
    dim) integer sums are additive and commute."""
    from bytehub_spark.streaming import EmbeddingDriftMonitor

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1).withColumn(
        "embedding", F.expr("transform(embedding, x -> x + CAST(0.125 AS FLOAT))")
    )
    expect = similarity.snapshot_drift(ref, new).toPandas()
    assert (expect["centroid_dist2_u2"] > 0).all()

    pdf = new.toPandas()
    for order in (False, True):
        chunks = [pdf.iloc[i::3] for i in range(3)]
        if order:
            chunks = chunks[::-1]
        mon = EmbeddingDriftMonitor(ref)
        for i, c in enumerate(chunks):
            mon.process_batch(spark.createDataFrame(c, schema=new.schema), i)
        got = mon.result().toPandas()
        pd.testing.assert_frame_equal(got, expect)


def test_holt_winters_constant_series_and_gap_fill(spark):
    """A constant-rate series is a Holt-Winters fixed point (level = the
    constant, trend = season = 0, zero error at every step), and hours
    with no events enter the recurrence as explicit zeros (the dense
    grid), not as skipped steps."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    for h in range(72):
        if h == 50:
            continue  # a silent hour -> grid zero, not a slid window
        rows.append((h, base + dt.timedelta(hours=h, minutes=5), 1, "a", 2.5, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = events_ops.holt_winters_backtest(ev).toPandas()
    # 72 grid hours, 24 warmup -> 48 scored rows
    assert len(out) == 48
    gap = out[out["hour"] == base + dt.timedelta(hours=50)]
    assert len(gap) == 1 and gap["v_u"].iloc[0] == 0
    # constant series before the gap: zero error, level = 2.5e6, no trend
    pre = out[out["hour"] < base + dt.timedelta(hours=50)]
    assert (pre["err_u"] == 0).all()
    assert (pre["level_u"] == 2_500_000).all()
    assert (pre["trend_u"] == 0).all()
    # the gap produces a one-step error of exactly the forecast level
    assert gap["err_u"].iloc[0] == -gap["f_u"].iloc[0]


def test_holt_winters_matches_pure_python_reference(spark):
    """The Arrow kernel's recurrence equals an independent pure-Python
    replay (truncating division, ppm constants) on real data."""
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("event_type") == "purchase"
    )
    out = (
        events_ops.holt_winters_backtest(ev)
        .toPandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.expr("CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)")).alias("v_u"))
        .toPandas()
        .set_index("hour")["v_u"]
    )
    full = pd.date_range(hourly.index.min(), hourly.index.max(), freq="h")
    y = [int(hourly.get(h, 0)) for h in full]

    def tdiv(x, d):
        q = abs(x) // d
        return q if x >= 0 else -q

    m, a, b, g = 24, 300_000, 100_000, 200_000
    lvl, trd = tdiv(sum(y[:m]), m), 0
    seas = [y[i] - lvl for i in range(m)]
    exp = []
    for t in range(m, len(y)):
        f = lvl + trd + seas[t % m]
        l_new = tdiv(a * y[t] + (1_000_000 - a) * (lvl + trd), 1_000_000)
        trd = tdiv(b * (l_new - lvl) + (1_000_000 - b) * trd, 1_000_000)
        seas[t % m] = tdiv(g * (y[t] - l_new) + (1_000_000 - g) * seas[t % m], 1_000_000)
        lvl = l_new
        exp.append((y[t], f, y[t] - f, lvl, trd))
    assert len(out) == len(exp)
    for col, i in (("v_u", 0), ("f_u", 1), ("err_u", 2), ("level_u", 3), ("trend_u", 4)):
        assert out[col].tolist() == [e[i] for e in exp], col
