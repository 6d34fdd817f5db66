"""Round-3 (continued) operators: line-level boilerplate removal, n-gram
novelty, nearest as-of join, lateness audit, event PMI."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark.operators.asof import asof_join_nearest
from bytehub_spark.operators.dedup import line_dedup
from bytehub_spark.operators.events_ops import event_pmi, lateness_audit
from bytehub_spark.operators.text import ngram_novelty
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

rng = np.random.default_rng(7)


# ---------------------------------------------------------------- line dedup
def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_line_dedup_drops_boilerplate(spark):
    texts = [f"header\nbody {i} unique\nfooter" for i in range(5)]
    out = (
        line_dedup(_docs(spark, texts), min_docs=4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out["n_lines"] == 3).all()
    assert (out["n_kept"] == 1).all()
    assert list(out["kept_text"]) == [f"body {i} unique" for i in range(5)]


def test_line_dedup_min_docs_boundary(spark):
    # 'shared' in exactly 3 docs: kept at min_docs=4, dropped at min_docs=3
    texts = ["shared\nown0", "shared\nown1", "shared\nown2", "alone\nown3"]
    keep4 = line_dedup(_docs(spark, texts), min_docs=4).toPandas()
    assert (keep4["n_kept"] == keep4["n_lines"]).all()
    keep3 = (
        line_dedup(_docs(spark, texts), min_docs=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(keep3["n_kept"]) == [1, 1, 1, 2]
    assert keep3.loc[0, "kept_text"] == "own0"
    assert keep3.loc[3, "kept_text"] == "alone\nown3"


def test_line_dedup_all_boiler_doc_keeps_row(spark):
    # a doc made ENTIRELY of boilerplate still yields a row, empty text
    texts = ["x", "x", "x", "x", "x\nmine"]
    out = (
        line_dedup(_docs(spark, texts), min_docs=4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_kept"] == 0
    assert out.loc[0, "kept_text"] == ""
    assert out.loc[4, "kept_text"] == "mine"


def test_line_dedup_preserves_line_order(spark):
    texts = ["b\na\nc\nzz", "zz\nq", "zz\nr", "zz\ns"]
    out = (
        line_dedup(_docs(spark, texts), min_docs=4)
        .toPandas()
        .set_index("doc_id")
    )
    # original order b,a,c retained (not sorted alphabetically)
    assert out.loc[0, "kept_text"] == "b\na\nc"


# -------------------------------------------------------------- ngram novelty
def test_ngram_novelty_first_doc_is_all_novel(spark):
    texts = ["a b c d", "a b c e", "x y z w"]
    out = (
        ngram_novelty(_docs(spark, texts), n=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc0: grams {a b c, b c d} both first here -> novelty 1
    assert out.loc[0, "novelty"] == 1.0
    # doc1: {a b c (seen), b c e (new)} -> 1/2
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_novel"] == 1
    assert out.loc[1, "novelty"] == 0.5
    # doc2: disjoint vocab -> 1
    assert out.loc[2, "novelty"] == 1.0


def test_ngram_novelty_counts_distinct_grams(spark):
    # repeated gram inside one doc counts once
    texts = ["p q r p q r p q"]
    out = ngram_novelty(_docs(spark, texts), n=3).toPandas()
    # distinct 3-grams: 'p q r', 'q r p', 'r p q' -> 3
    assert out.loc[0, "n_grams"] == 3
    assert out.loc[0, "n_novel"] == 3


def test_ngram_novelty_short_docs_excluded(spark):
    out = ngram_novelty(_docs(spark, ["a b", "a b c"]), n=3).toPandas()
    assert list(out["doc_id"]) == [1]


# ------------------------------------------------------------- nearest as-of
def _ev_frames():
    lt = pd.DataFrame(
        {
            "key": np.repeat([1, 2], 40),
            "time": pd.to_datetime("2021-01-01")
            + pd.to_timedelta(
                np.sort(rng.choice(100_000, 80, replace=False)), unit="s"
            ),
            "lv": np.arange(80),
        }
    )
    rt = pd.DataFrame(
        {
            "key": np.repeat([1, 2], 30),
            "time": pd.to_datetime("2021-01-01")
            + pd.to_timedelta(
                np.sort(rng.choice(100_000, 60, replace=False)) + 500_000,
                unit="ms",
            ),
            "rv": np.arange(60).astype(float),
        }
    )
    return lt, rt


def test_asof_nearest_matches_pandas(spark):
    lt, rt = _ev_frames()
    out = (
        asof_join_nearest(
            spark.createDataFrame(lt),
            spark.createDataFrame(rt),
            time_col="time",
            by=["key"],
            value_cols=["rv"],
        )
        .toPandas()
        .sort_values(["key", "time"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lt.sort_values("time"),
        rt.sort_values("time"),
        on="time",
        by="key",
        direction="nearest",
    ).sort_values(["key", "time"]).reset_index(drop=True)
    assert np.array_equal(
        out["rv_right"].to_numpy(), exp["rv"].to_numpy(), equal_nan=True
    )


def test_asof_nearest_tolerance_and_tie(spark):
    lt = pd.DataFrame(
        {
            "key": [1, 1, 1],
            "time": pd.to_datetime(
                ["2021-01-01 00:10:00", "2021-01-01 05:00:00",
                 "2021-01-01 00:20:00"]
            ),
            "lv": [0, 1, 2],
        }
    )
    # right rows at 00:05 and 00:15: the 00:10 left row ties -> earlier
    rt = pd.DataFrame(
        {
            "key": [1, 1],
            "time": pd.to_datetime(["2021-01-01 00:05:00",
                                    "2021-01-01 00:15:00"]),
            "rv": [10.0, 20.0],
        }
    )
    out = (
        asof_join_nearest(
            spark.createDataFrame(lt),
            spark.createDataFrame(rt),
            time_col="time",
            by=["key"],
            value_cols=["rv"],
            tolerance_us=30 * 60 * 1_000_000,
        )
        .toPandas()
        .set_index("lv")
    )
    assert out.loc[0, "rv_right"] == 10.0  # tie -> earlier
    assert np.isnan(out.loc[1, "rv_right"])  # beyond 30m tolerance
    assert out.loc[2, "rv_right"] == 20.0  # 5m forward beats 15m back


def test_asof_nearest_single_shuffle(spark):
    lt, rt = _ev_frames()
    plan = asof_join_nearest(
        spark.createDataFrame(lt),
        spark.createDataFrame(rt),
        time_col="time",
        by=["key"],
        value_cols=["rv"],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ lateness audit
def _late_events(spark):
    # arrival order 0..n-1; ts deliberately out of order
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        [0, 10, 5, 20, 120, 30, 4000, 50], unit="s"
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": range(8),
                "ts": ts,
                "event_type": ["a"] * 8,
                "user_id": [1] * 8,
                "value": [0.0] * 8,
            }
        )
    )


def test_lateness_audit_exact(spark):
    out = lateness_audit(_late_events(spark), shard_size=3).toPandas()
    # late rows: id2 (ts=5 after max 10 -> 5s), id5 (30 after 120 -> 90s),
    # id7 (50 after 4000 -> 3950s)
    assert out.loc[0, "n_events"] == 8
    assert out.loc[0, "n_late"] == 3
    assert out.loc[0, "max_late_us"] == 3950 * 1_000_000
    assert out.loc[0, "n_late_gt_1m"] == 2
    assert out.loc[0, "n_late_gt_1h"] == 1


def test_lateness_audit_shard_invariance(spark):
    ev = load_table(spark, SF, "events").withColumn(
        "__arr",
        F.expr("div(event_id, 16)") * F.lit(16)
        + F.lit(15)
        - F.col("event_id") % F.lit(16),
    )
    a = lateness_audit(ev, shard_size=97, arrival_col="__arr").toPandas()
    b = lateness_audit(ev, shard_size=1 << 20, arrival_col="__arr").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["n_late"].sum() > 0  # injection makes the audit value-bearing


def test_lateness_audit_no_global_window(spark):
    ev = load_table(spark, SF, "events")
    plan = (
        lateness_audit(ev, shard_size=4096)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # data-sized window partitions by __shard; the only unpartitioned
    # window runs over the #shards-row table
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            assert "__top" in line or "__shard" in line


# ----------------------------------------------------------------- event PMI
def _plog2(c):
    b = np.floor(np.log2(c)).astype(np.int64) + 1  # bit length
    half = np.power(2.0, (b - 1).astype(np.float64))
    return (b - 1).astype(np.float64) + (c.astype(np.float64) - half) / half


def test_event_pmi_matches_numpy(spark):
    ev = load_table(spark, SF, "events")
    out = event_pmi(ev).toPandas()
    pdf = ev.select(F.hour("ts").alias("h"), "event_type").toPandas()
    n = len(pdf)
    cx = pdf.groupby("h").size()
    cy = pdf.groupby("event_type").size()
    cxy = pdf.groupby(["h", "event_type"]).size()
    for _, r in out.iterrows():
        c = cxy.loc[(r["hour"], r["event_type"])]
        exp = (
            _plog2(np.array([c]))[0]
            + _plog2(np.array([n]))[0]
            - _plog2(np.array([cx.loc[r["hour"]]]))[0]
            - _plog2(np.array([cy.loc[r["event_type"]]]))[0]
        )
        assert r["pmi_ubits"] == np.floor(exp * 1e6)
        assert r["c_xy"] == c
    assert len(out) == len(cxy)


def test_event_pmi_independent_is_near_zero(spark):
    # uniform product distribution -> PMI ~ 0 everywhere (|ubits| small)
    pdf = pd.DataFrame(
        {
            "event_id": range(240),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta((np.arange(240) // 2) % 24, unit="h"),
            "event_type": np.tile(["x", "y"], 120),
            "user_id": [1] * 240,
            "value": [0.0] * 240,
        }
    )
    out = event_pmi(spark.createDataFrame(pdf)).toPandas()
    # exact uniformity: every cell PMI == 0 up to plog2 piecewise error
    assert (out["pmi_ubits"].abs() <= 200_000).all()


# -------------------------------------------------------------- simhash pairs
def test_simhash_pairs_exhaustive_vs_bruteforce(spark):
    from bytehub_spark.operators.dedup import simhash64, simhash_pairs

    docs = load_table(spark, SF, "documents")
    # append an exact twin so at least one hamming-0 pair exists
    twin = docs.where(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    d = docs.unionByName(twin)
    got = simhash_pairs(d, max_hamming=3).toPandas()
    # brute force: all-pairs popcount over the signatures
    sigs = simhash64(d).toPandas()
    ids = sigs["doc_id"].to_numpy()
    sv = sigs["simhash"].to_numpy().astype(np.uint64)
    exp = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = int(bin(int(sv[i] ^ sv[j])).count("1"))
            if h <= 3:
                a, b = sorted((int(ids[i]), int(ids[j])))
                exp.append((a, b, h))
    exp_df = (
        pd.DataFrame(exp, columns=["id_a", "id_b", "hamming"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # band blocking at 4x16 bits is EXHAUSTIVE for hamming <= 3
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp_df.astype("int64")
    )
    assert ((got["id_a"] == 7) & (got["id_b"] == 9007)).any()
    assert got.loc[
        (got["id_a"] == 7) & (got["id_b"] == 9007), "hamming"
    ].iloc[0] == 0


def test_simhash_pairs_no_cartesian(spark):
    from bytehub_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, SF, "documents")
    plan = (
        simhash_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------- matryoshka recall
def test_matryoshka_full_width_recall_is_one(spark):
    from bytehub_spark.operators.similarity import matryoshka_recall

    emb = load_table(spark, SF, "embeddings")
    out = matryoshka_recall(emb, [0, 1, 2], k=5, dims=(64,)).toPandas()
    assert (out["recall_at_k"] == 1.0).all()
    assert (out["n_exact"] == 5).all()


def test_matryoshka_recall_bounds_and_shape(spark):
    from bytehub_spark.operators.similarity import matryoshka_recall

    emb = load_table(spark, SF, "embeddings")
    out = matryoshka_recall(emb, [0, 1, 2, 3, 4], k=5).toPandas()
    assert len(out) == 10  # 2 truncations x 5 queries
    assert out["recall_at_k"].between(0.0, 1.0).all()
    assert set(out["trunc_dims"]) == {16, 32}


# ------------------------------------------------- streaming lateness monitor
def test_stream_lateness_monitor_equals_batch(spark, tmp_path):
    """foreachBatch monitor over arrival-ordered micro-batches must equal
    the one-shot batch audit (cummax associativity with the carried
    prefix-max floor)."""
    import os
    import time

    from bytehub_spark import streaming as st

    ev = load_table(spark, SF, "events").withColumn(
        "arr",
        F.expr("div(event_id, 16)") * F.lit(16)
        + F.lit(15)
        - F.col("event_id") % F.lit(16),
    )
    pdf = ev.toPandas().sort_values("arr").reset_index(drop=True)

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # three contiguous arrival-order chunks, written oldest-first so the
    # file source replays them in arrival order
    bounds = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(
            src
        )
        time.sleep(1.1)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q, mon = st.stream_lateness_monitor(
        stream, str(tmp_path / "ckpt_late"), arrival_col="arr"
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    got = mon.result().reset_index(drop=True)
    exp = (
        __import__("bytehub_spark.operators.events_ops", fromlist=["x"])
        .lateness_audit(ev, arrival_col="arr")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "n_late": "int64",
                    "max_late_us": "int64", "n_late_gt_1m": "int64",
                    "n_late_gt_1h": "int64"}),
        exp.astype({"n_events": "int64", "n_late": "int64",
                    "max_late_us": "int64", "n_late_gt_1m": "int64",
                    "n_late_gt_1h": "int64"}),
    )
    assert got["n_late"].sum() > 0


# ------------------------------------------------------- modality mix plan
def test_modality_mix_accounting(spark):
    from bytehub_spark.operators.multimodal import (
        media_from_documents,
        modality_mix_plan,
    )

    docs = load_table(spark, SF, "documents")
    out = modality_mix_plan(media_from_documents(docs), budget_items=9999)
    pdf = out.toPandas().set_index("kind")
    assert set(pdf.index) == {"image", "audio", "video"}
    assert abs(pdf["item_share"].sum() - 1.0) < 1e-9
    assert pdf["alloc_items"].sum() <= 9999
    n_docs = docs.count()
    assert pdf["n_items"].sum() == n_docs
    # images carry pixels, not duration; audio/video the reverse
    assert pdf.loc["image", "total_pixels"] > 0
    assert pdf.loc["image", "total_duration_ms"] == 0
    assert pdf.loc["audio", "total_duration_ms"] > 0
    assert pdf.loc["audio", "total_pixels"] == 0


# ------------------------------------------------------------- basket PMI
def test_basket_pmi_planted_association(spark):
    # types 'p' and 'q' always share a basket; 'r' never joins them
    rows = []
    eid = 0
    for u in range(20):
        for t in ("p", "q"):
            rows.append((eid, pd.Timestamp("2024-01-01") +
                         pd.Timedelta(hours=u * 12), u, t, 1.0, None))
            eid += 1
        rows.append((eid, pd.Timestamp("2024-01-01") +
                     pd.Timedelta(hours=u * 12 + 7), u, "r", 1.0, None))
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    )
    from bytehub_spark.operators.events_ops import basket_pmi

    out = basket_pmi(spark.createDataFrame(pdf), bucket_hours=6).toPandas()
    out = out.set_index(["type_a", "type_b"])
    # perfect co-occurrence: PMI = log2(n_baskets * c_pq / (c_p c_q))
    # = log2(40 * 20 / 400) = 1 bit exactly (powers of two -> plog2 exact)
    assert out.loc[("p", "q"), "pmi_ubits"] == 1_000_000
    assert out.loc[("p", "q"), "c_ab"] == 20
    # r never shares a basket with p or q -> no pair rows
    assert ("p", "r") not in out.index and ("q", "r") not in out.index


# --------------------------------------------------------------- debounce
def test_debounce_sequential_semantics(spark):
    from bytehub_spark.operators.events_ops import debounce

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        [0, 5, 12, 13, 25, 0, 30], unit="s"
    )
    pdf = pd.DataFrame(
        {
            "event_id": range(7),
            "ts": ts,
            "user_id": [1, 1, 1, 1, 1, 2, 2],
            "event_type": ["a"] * 7,
            "value": [float(i) for i in range(7)],
            "props": [None] * 7,
        }
    )
    out = debounce(
        spark.createDataFrame(pdf), cooldown_us=10_000_000
    ).toPandas()
    # user 1: keep 0, suppress 5 (within 10s), keep 12, suppress 13
    # (within 10s OF 12, even though >10s after 5 — sequential!),
    # keep 25; user 2: keep both
    kept = out.groupby("user_id")["event_id"].apply(list).to_dict()
    assert kept == {1: [0, 2, 4], 2: [5, 6]}


def test_debounce_pairwise_gap_invariant(spark):
    from bytehub_spark.operators.events_ops import debounce

    ev = load_table(spark, SF, "events")
    out = debounce(ev, cooldown_us=3_600_000_000).toPandas()
    out = out.sort_values(["user_id", "ts"])
    gaps = (
        out.groupby("user_id")["ts"]
        .diff()
        .dropna()
        .dt.total_seconds()
    )
    assert (gaps >= 3600).all()
    # every user keeps at least its first event
    n_users = ev.select("user_id").distinct().count()
    assert out["user_id"].nunique() == n_users
    # and something was actually suppressed at this cooldown
    assert len(out) < ev.count()
