"""Round-5 operator contracts: Markov transitions, RFM segmentation,
token-budget allocation, the LSH k-NN graph, and Bloom decontamination.

Each new registered query also has an exact DuckDB oracle (checked by
scripts/check_oracle.py / the driver gate); these tests pin the
SEMANTIC invariants the oracle can't express — no-false-negative Bloom
guarantees, kNN symmetry-vs-recall behavior, allocation arithmetic,
quintile balance — on small hand-made fixtures.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.operators import curation, dedup, events_ops, similarity

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------

def test_event_transitions_hand_case(spark):
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:0%d" % i for i in range(6)]
            ),
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": ["a", "b", "a", "a", "b", "a"],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    got = (
        events_ops.event_transitions(spark.createDataFrame(pdf))
        .toPandas()
        .set_index(["prev", "next"])
    )
    # user1: a->b, b->a; user2: a->b; user3: none
    assert got.loc[("a", "b"), "n"] == 2
    assert got.loc[("b", "a"), "n"] == 1
    # conditional: from 'a' all transitions go to b -> 1e6 ppm
    assert got.loc[("a", "b"), "p_ppm"] == 1_000_000
    assert got.loc[("b", "a"), "p_ppm"] == 1_000_000


def test_event_transitions_ppm_sums_per_prev(spark):
    """Conditional rows for one prev sum to <= 1e6 (floor-div loss < n_next)."""
    from bytehub_spark.sources import load_table

    got = events_ops.event_transitions(load_table(spark, SF, "events")).toPandas()
    sums = got.groupby("prev")["p_ppm"].sum()
    assert (sums <= 1_000_000).all()
    assert (sums > 1_000_000 - len(got)).all()


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------

def test_rfm_scores_in_range_and_user_conservation(spark):
    from bytehub_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    got = events_ops.rfm_segments(ev).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert got[c].between(1, 5).all()
    assert got["n_users"].sum() == ev.select("user_id").distinct().count()


def test_rfm_quintiles_balance_on_uniform_users(spark):
    """Distinct uniform metric values -> every quintile holds ~n/5 users."""
    n = 100
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            # user i's single event at minute i: recency strictly ordered
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(n), "min"),
            "user_id": range(n),
            "event_type": ["a"] * n,
            "value": [float(i) for i in range(n)],
            "props": ["{}"] * n,
        }
    )
    got = events_ops.rfm_segments(spark.createDataFrame(pdf)).toPandas()
    r_counts = got.groupby("r_score")["n_users"].sum()
    assert sorted(r_counts.index) == [1, 2, 3, 4, 5]
    assert (r_counts == 20).all()


# ---------------------------------------------------------------------------
# budget_allocation
# ---------------------------------------------------------------------------

def test_budget_allocation_arithmetic(spark):
    from bytehub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    got = curation.budget_allocation(docs, budget_tokens=1_000_000).toPandas()
    # target tokens = budget * weight_ppm / 1e6 exactly (floor)
    assert (got["target_tokens"] == got["weight_ppm"]).all()  # budget==1e6
    assert (
        got["rate_ppm"]
        == got["target_tokens"] * 1_000_000 // got["avail_tokens"]
    ).all()
    assert (got["upsampled"] == (got["rate_ppm"] > 1_000_000)).all()
    # epochs = ceil(target/avail)
    exp_epochs = -(-got["target_tokens"] // got["avail_tokens"])
    assert (got["epochs"] == exp_epochs).all()
    # targets spend at most the budget (floor-div loss only)
    assert got["target_tokens"].sum() <= 1_000_000


def test_budget_allocation_scales_with_budget(spark):
    from bytehub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    a = curation.budget_allocation(docs, budget_tokens=1_000_000).toPandas()
    b = curation.budget_allocation(docs, budget_tokens=10_000_000).toPandas()
    m = a.merge(b, on="source", suffixes=("_1", "_10"))
    assert (m["weight_ppm_1"] == m["weight_ppm_10"]).all()  # weights fixed
    assert (m["target_tokens_10"] == 10 * m["target_tokens_1"]).all()


# ---------------------------------------------------------------------------
# knn_graph
# ---------------------------------------------------------------------------

def test_knn_graph_hand_planted_neighbors(spark):
    """Exact duplicates must be each other's rank-1 neighbors (identical
    vectors share every bucket and cosine 1e4)."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 8)).astype("float32")
    vecs = np.vstack([base, base[:5]])  # ids 30..34 duplicate 0..4
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [v.tolist() for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    got = similarity.knn_graph(
        spark.createDataFrame(pdf), k=3, n_planes=4, bands=4
    ).toPandas()
    r1 = got[got["rank"] == 1].set_index("vec_id")
    for i in range(5):
        assert r1.loc[30 + i, "neighbor_id"] == i
        assert r1.loc[30 + i, "cos_u"] == 10_000
        assert r1.loc[i, "neighbor_id"] == 30 + i
    # per-vector neighbor lists are deduplicated and rank-contiguous
    per = got.groupby("vec_id")["rank"].apply(list)
    assert all(r == list(range(1, len(r) + 1)) for r in per)


def test_knn_graph_respects_k_and_excludes_self(spark):
    from bytehub_spark.sources import load_table

    got = similarity.knn_graph(
        load_table(spark, SF, "embeddings"), k=5, n_planes=8, bands=6
    ).toPandas()
    assert got.groupby("vec_id")["rank"].max().le(5).all()
    assert (got["vec_id"] != got["neighbor_id"]).all()
    dup = got.duplicated(subset=["vec_id", "neighbor_id"]).any()
    assert not dup


# ---------------------------------------------------------------------------
# bloom_decontaminate
# ---------------------------------------------------------------------------

def _doc_frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["src0"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        )
    )


def test_bloom_no_false_negatives_tiny_filter(spark):
    """Even an overloaded 256-bit filter NEVER misses a true hit."""
    bench = _doc_frame(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    train = _doc_frame(
        spark,
        [
            (1, "alpha beta gamma delta leaked from the benchmark here"),
            (2, "totally unrelated words nothing shared at all here ok"),
        ],
    )
    exact = dedup.decontaminate(train, bench, 4).toPandas()
    bloom = dedup.bloom_decontaminate(
        train, bench, 4, m_bits=256, k_hashes=4
    ).toPandas()
    bm = dict(zip(bloom.doc_id, bloom.n_maybe_shingles))
    for d, nh in zip(exact.doc_id, exact.n_hit_shingles):
        assert bm.get(d, 0) >= nh  # superset, per doc


def test_bloom_superset_of_exact_on_corpus(spark):
    from bytehub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    exact = dedup.decontaminate(train, bench, 4).toPandas()
    bloom = dedup.bloom_decontaminate(train, bench, 4).toPandas()
    bm = dict(zip(bloom.doc_id, bloom.n_maybe_shingles))
    assert all(
        bm.get(d, 0) >= nh
        for d, nh in zip(exact.doc_id, exact.n_hit_shingles)
    )


def test_bloom_overload_saturates_to_false_positives(spark):
    """m_bits=32 with k=4: the filter saturates and clean docs flag too —
    the documented fp-vs-size tradeoff moves the right direction."""
    bench = _doc_frame(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    train = _doc_frame(
        spark, [(2, "totally unrelated words nothing shared at all here ok")]
    )
    small = dedup.bloom_decontaminate(
        train, bench, 4, m_bits=32, k_hashes=4
    ).toPandas()
    big = dedup.bloom_decontaminate(
        train, bench, 4, m_bits=1 << 18, k_hashes=4
    ).toPandas()
    n_small = int(small.n_maybe_shingles.sum()) if len(small) else 0
    n_big = int(big.n_maybe_shingles.sum()) if len(big) else 0
    assert n_small >= n_big
    assert n_big == 0  # well-sized filter: no FPs on a disjoint doc


# ---------------------------------------------------------------------------
# RetentionMonitor (streaming twin of retention_cohorts)
# ---------------------------------------------------------------------------

def test_stream_retention_equals_batch(spark, tmp_path):
    """Incremental bitmask retention over event-time-ordered micro-batches
    must equal the one-shot events_ops.retention_cohorts."""
    import os
    import time

    from bytehub_spark import streaming as st
    from bytehub_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    expect = events_ops.retention_cohorts(ev).toPandas().reset_index(drop=True)

    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    src = str(tmp_path / "ret_src")
    os.makedirs(src)
    bounds = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q, mon = st.stream_retention(stream, str(tmp_path / "ckpt_ret"))
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    got = mon.result().toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)


def test_retention_monitor_activity_bits_commute(spark):
    """Mask merging is order-independent ONCE cohorts are fixed: batch 0
    carries every user's FIRST event (so the cohort assignment is
    identical in both runs — the part that genuinely needs the ordered-
    arrival contract), then the remaining events are split in two and
    fed in either order. Activity bits OR-commute, so the triangles must
    be identical regardless of the fixture's user arrival pattern."""
    from bytehub_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    first = pdf.groupby("user_id", as_index=False).head(1)
    rest = pdf.drop(first.index).reset_index(drop=True)
    b1, b2 = rest.iloc[: len(rest) // 2], rest.iloc[len(rest) // 2 :]

    from bytehub_spark.streaming import RetentionMonitor

    m1 = RetentionMonitor()
    for chunk in (first, b1, b2):
        m1.process_batch(spark.createDataFrame(chunk))
    m2 = RetentionMonitor()
    for chunk in (first, b2, b1):  # later batches swapped
        m2.process_batch(spark.createDataFrame(chunk))
    pd.testing.assert_frame_equal(
        m1.result().toPandas().reset_index(drop=True),
        m2.result().toPandas().reset_index(drop=True),
    )


def test_retention_monitor_state_is_one_row_per_user(spark):
    from bytehub_spark.sources import load_table
    from bytehub_spark.streaming import RetentionMonitor

    ev = load_table(spark, SF, "events")
    mon = RetentionMonitor()
    mon.process_batch(ev)
    n_users = ev.select("user_id").distinct().count()
    assert mon.state.count() == n_users
    assert mon.state.columns == ["user_id", "cohort", "mask"]


# ---------------------------------------------------------------------------
# graph_clusters (mutual-kNN components)
# ---------------------------------------------------------------------------

def test_graph_clusters_planted_twins_cluster_together(spark):
    """Exact duplicate pairs are mutual rank-1 neighbors at cos 1e4, so
    each planted twin pair must share a component (= the lower id)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 8)).astype("float32")
    vecs = np.vstack([base, base[:6]])  # 40..45 duplicate 0..5
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [v.tolist() for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    got = (
        similarity.graph_clusters(
            spark.createDataFrame(pdf), k=3, min_cos_u=9_999,
            n_planes=4, bands=4,
        )
        .toPandas()
        .set_index("vec_id")["component"]
    )
    assert len(got) == len(vecs)  # every vector appears
    for i in range(6):
        assert got[40 + i] == got[i] == i
    # random base vectors at cos<9999: singletons
    for i in range(6, 40):
        assert got[i] == i


def test_graph_clusters_mutuality_suppresses_one_way_edges(spark):
    """A vector close to a pair but not IN either's reciprocal top-k must
    not merge their cluster: one-way edges are dropped."""
    a = np.array([1.0, 0.0, 0.0, 0.0], dtype="float32")
    got = (
        similarity.graph_clusters(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "vec_id": [0, 1, 2],
                        "embedding": [
                            a.tolist(),
                            a.tolist(),               # exact twin of 0
                            (a * 0.9 + 0.1).tolist(), # near but not twin
                        ],
                        "label": [0, 0, 0],
                    }
                )
            ),
            k=1, min_cos_u=9_999, n_planes=2, bands=2,
        )
        .toPandas()
        .set_index("vec_id")["component"]
    )
    # k=1: 0 and 1 pick each other (twin, cos 1e4); 2's cos to them is
    # < 9999 -> no edge survives the threshold, 2 stays a singleton
    assert got[0] == 0 and got[1] == 0
    assert got[2] == 2


# ---------------------------------------------------------------------------
# quantize_int8_audit
# ---------------------------------------------------------------------------

def test_quantize_int8_error_bound_and_constant_dim(spark):
    """Midpoint decode error <= half a code width; constant dims code to
    0 with zero error and one used code."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 4)).astype("float32")
    vecs[:, 2] = 1.5  # constant dimension
    pdf = pd.DataFrame(
        {
            "vec_id": range(200),
            "embedding": [v.tolist() for v in vecs],
            "label": [0] * 200,
        }
    )
    got = (
        similarity.quantize_int8_audit(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("dim")
    )
    assert list(got.index) == [0, 1, 2, 3]
    const = got.loc[2]
    assert const["codes_used"] == 1
    assert const["max_err_nu"] == 0
    for d in (0, 1, 3):
        row = got.loc[d]
        half_width_nu = (row["vmax"] - row["vmin"]) / 255.0 / 2.0 * 1e9
        assert row["max_err_nu"] <= half_width_nu + 1  # floor slack
        assert 2 <= row["codes_used"] <= 256


# ---------------------------------------------------------------------------
# decontaminate_mask
# ---------------------------------------------------------------------------

def test_decontaminate_mask_masks_exact_span_union(spark):
    bench = _doc_frame(spark, [(0, "alpha beta gamma delta epsilon")])
    train = _doc_frame(
        spark,
        [
            # two overlapping hit shingles: positions 2..6 covered
            (1, "intro words alpha beta gamma delta epsilon outro tail"),
            (2, "totally unrelated clean words here padded to length ok"),
            (3, "x y z"),  # < n words: passes through untouched
        ],
    )
    got = (
        dedup.decontaminate_mask(train, bench, 4)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "text_masked"] == (
        "intro words <MASK> <MASK> <MASK> <MASK> <MASK> outro tail"
    )
    assert got.loc[1, "n_masked_tokens"] == 5
    assert got.loc[2, "text_masked"].startswith("totally unrelated")
    assert got.loc[2, "n_masked_tokens"] == 0
    assert got.loc[3, "text_masked"] == "x y z"
    assert got.loc[3, "n_masked_tokens"] == 0


def test_decontaminate_mask_counts_match_flag_op(spark):
    """Docs flagged by decontaminate are exactly the docs with masked
    tokens > 0 (same shingle definition, same benchmark)."""
    from bytehub_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    flagged = set(
        dedup.decontaminate(train, bench, 4).toPandas()["doc_id"]
    )
    masked = dedup.decontaminate_mask(train, bench, 4).toPandas()
    assert set(masked[masked["n_masked_tokens"] > 0]["doc_id"]) == flagged
    assert len(masked) == train.count()  # every train doc appears


# ---------------------------------------------------------------------------
# plans.inspect.plan_report (library twin of the check_plans gate)
# ---------------------------------------------------------------------------

def test_plan_report_join_strategy_and_exchanges(spark):
    from bytehub_spark.plans.inspect import plan_report
    from bytehub_spark.sources import load_table

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_nationkey").count()
    rep = plan_report(j)
    assert any(
        jn["strategy"] in ("BroadcastHashJoin", "SortMergeJoin")
        for jn in rep["joins"]
    )
    assert rep["py_eval"] is False
    assert rep["global_window"] is False

    # forced SMJ: the join must show up as SortMergeJoin w/ exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rep2 = plan_report(o.join(c, o.o_custkey == c.c_custkey))
        assert any(jn["strategy"] == "SortMergeJoin" for jn in rep2["joins"])
        assert rep2["n_exchanges"] >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plan_report_flags_agree_with_gate_machinery(spark):
    """plan_report and structural_flags come from one implementation —
    a no-partition window flags global_window in both."""
    from pyspark.sql import Window as W

    from bytehub_spark.plans.inspect import plan_report

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(W.orderBy("id"))
    )
    rep = plan_report(df)
    assert rep["global_window"] is True


def test_stream_transitions_equals_batch(spark, tmp_path):
    """Incremental Markov counts over event-time-ordered micro-batches
    (within-batch lead + carried per-user boundary event) must equal the
    one-shot events_ops.event_transitions."""
    import os
    import time

    from bytehub_spark import streaming as st
    from bytehub_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    expect = events_ops.event_transitions(ev).toPandas().reset_index(drop=True)

    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    src = str(tmp_path / "trans_src")
    os.makedirs(src)
    bounds = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q, mon = st.stream_transitions(stream, str(tmp_path / "ckpt_trans"))
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    got = mon.result().toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)


def test_transition_monitor_boundary_stitching(spark):
    """A transition split across two batches (user's events in different
    micro-batches) must still be counted once — the carried last-event
    state is the stitch."""
    from bytehub_spark.streaming import TransitionMonitor

    def ev(eid, uid, t, typ):
        return {
            "event_id": eid,
            "ts": pd.Timestamp(t),
            "user_id": uid,
            "event_type": typ,
            "value": 0.0,
            "props": "{}",
        }

    b1 = pd.DataFrame([ev(1, 7, "2024-01-01 00:00:00", "a")])
    b2 = pd.DataFrame([ev(2, 7, "2024-01-01 00:01:00", "b")])
    mon = TransitionMonitor()
    mon.process_batch(spark.createDataFrame(b1))
    mon.process_batch(spark.createDataFrame(b2))
    got = mon.result().toPandas()
    assert len(got) == 1
    assert tuple(got.iloc[0][["prev", "next", "n", "p_ppm"]]) == (
        "a", "b", 1, 1_000_000,
    )


# ---------------------------------------------------------------------------
# seasonal_naive_backtest
# ---------------------------------------------------------------------------

def test_snaive_perfect_seasonality_zero_error(spark):
    """A perfectly 24h-periodic series backtests to MAE == bias == 0."""
    hours = 96
    rows = []
    for h in range(hours):
        rows.append(
            {
                "event_id": h,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                "user_id": 1,
                "event_type": "a",
                "value": float(10 + (h % 24)),  # exact 24h period
                "props": "{}",
            }
        )
    got = events_ops.seasonal_naive_backtest(
        spark.createDataFrame(pd.DataFrame(rows))
    ).toPandas()
    assert len(got) == 1
    assert got.loc[0, "mae_u"] == 0
    assert got.loc[0, "bias_u"] == 0
    assert got.loc[0, "n_scored"] == 48


def test_snaive_missing_hour_does_not_slide_season(spark):
    """Drop one mid-series hour: the forecast stays TIME-keyed (the hour
    after the gap still compares against exactly 24h earlier, and the
    gap's season-later hour is simply unscorable)."""
    rows = []
    for h in range(96):
        if h == 30:  # missing hour in the middle
            continue
        rows.append(
            {
                "event_id": h,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                "user_id": 1,
                "event_type": "a",
                "value": float(10 + (h % 24)),
                "props": "{}",
            }
        )
    got = events_ops.seasonal_naive_backtest(
        spark.createDataFrame(pd.DataFrame(rows))
    ).toPandas()
    # hour 54 (= 30 + 24) has no season-ago observation -> one fewer
    # scorable hour in the 48h window, but every scored hour is exact
    assert got.loc[0, "mae_u"] == 0
    assert got.loc[0, "n_scored"] == 47


# ---------------------------------------------------------------------------
# blob_dedup
# ---------------------------------------------------------------------------

def test_blob_dedup_groups_identical_bytes_only(spark):
    from bytehub_spark.operators import multimodal

    media = multimodal.media_from_documents(
        _doc_frame(
            spark,
            [
                (0, "same payload here"),
                (3, "same payload here"),   # identical bytes, image kind
                (7, "same payload here"),   # identical bytes, audio kind
                (2, "different payload"),
            ],
        )
    )
    got = multimodal.blob_dedup(media).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["canonical_id"] == 0
    assert row["n_copies"] == 3
    assert row["blob_bytes"] == len("same payload here".encode())
    assert row["n_kinds"] >= 2  # 0->image, 3->image, 7->audio
    assert row["bytes_saved"] == 2 * row["blob_bytes"]


# ---------------------------------------------------------------------------
# dup_span_coverage
# ---------------------------------------------------------------------------

def test_dup_span_coverage_hand_case(spark):
    docs = _doc_frame(
        spark,
        [
            # the 4-gram "a b c d" appears in docs 1 and 2 -> covered
            (1, "a b c d x y z w"),
            (2, "p q a b c d r s"),
            (3, "totally unique words only here now"),
            (4, "x y"),  # < n words: contributes tokens, never covered
        ],
    )
    got = dedup.dup_span_coverage(docs).toPandas().set_index("source")
    row = got.loc["src0"]
    assert row["total_tokens"] == 8 + 8 + 6 + 2
    # 4 covered positions in doc1 + 4 in doc2
    assert row["covered_tokens"] == 8
    assert row["coverage_ppm"] == 8 * 1_000_000 // 24


def test_dup_span_coverage_dedup_collapses_it(spark):
    """After exact dedup (drop doc 2, the copy), coverage falls — the
    metric moves the direction the memorization story claims."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact copy
        (3, "one two three four five six"),
    ]
    before = (
        dedup.dup_span_coverage(_doc_frame(spark, rows))
        .toPandas()["covered_tokens"].sum()
    )
    after = (
        dedup.dup_span_coverage(_doc_frame(spark, rows[:1] + rows[2:]))
        .toPandas()["covered_tokens"].sum()
    )
    assert before == 12  # both copies fully covered
    assert after == 0
