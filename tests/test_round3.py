"""Round-3 operators: record linkage, time-decay scoring, sketch
accuracy, bigram LM features, k-per-group sampling, cross-source
overlap, stored IVF-PQ, streaming PQ novelty."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.operators import curation, dedup, events_ops, linkage, pq, text
from bytehub_spark.plans import inspect
from bytehub_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- linkage


def test_link_corrupted_docs_recovers_originals(spark):
    docs = load_table(spark, SF, "documents")
    out = linkage.link_corrupted_docs(docs).toPandas()
    n_left = docs.where(F.col("doc_id") % 5 == 0).count()
    # every corrupted doc links somewhere, exactly once
    assert len(out) == n_left
    assert out["left_id"].is_unique
    # the overwhelming majority resolve to their own original at the
    # single-substitution distance (exact-dup texts can steal a tie)
    self_links = (out["left_id"] == out["right_id"]).mean()
    assert self_links > 0.9
    assert (out.loc[out["left_id"] == out["right_id"], "dist"] <= 1).all()


def test_blocked_fuzzy_pairs_no_cartesian(spark):
    docs = load_table(spark, SF, "documents")
    pairs = linkage.blocked_fuzzy_pairs(docs, docs)
    plan = inspect.executed_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- decay / sketch


def test_decayed_user_score_matches_pandas(spark):
    ev = load_table(spark, SF, "events")
    got = events_ops.decayed_user_score(ev).toPandas()
    pdf = ev.select("user_id", "ts", "value").toPandas()
    ref = pdf["ts"].max()
    k = np.minimum(
        np.floor(
            (ref - pdf["ts"]).dt.total_seconds().to_numpy() / (3600.0 * 12)
        ),
        40,
    )
    contrib = np.floor(pdf["value"].to_numpy() * np.power(0.5, k) * 1e10)
    exp = (
        pd.DataFrame({"user_id": pdf["user_id"], "c": contrib.astype(np.int64)})
        .groupby("user_id")["c"]
        .sum()
    )
    merged = got.set_index("user_id")
    assert (merged["score_e10"] == exp).all()
    # emitted double is the exact int64 / 1e10
    np.testing.assert_array_equal(
        merged["decayed_score"].to_numpy(),
        merged["score_e10"].to_numpy().astype(np.float64) / 1e10,
    )


def test_decay_more_recent_scores_higher(spark):
    """Same value at two ages: newer bucket must contribute >= older."""
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-10 00:00:00", "2024-01-01 00:00:00"]),
            "user_id": [1, 2],
            "event_type": ["click", "click"],
            "value": [10.0, 10.0],
            "props": ["{}", "{}"],
        }
    )
    ev = spark.createDataFrame(pdf)
    out = events_ops.decayed_user_score(ev).toPandas().set_index("user_id")
    assert out.loc[1, "decayed_score"] > out.loc[2, "decayed_score"]
    assert out.loc[1, "decayed_score"] == 10.0  # age 0 -> weight 1, exact


def test_distinct_users_sketch_within_bound(spark):
    out = events_ops.distinct_users_sketch(load_table(spark, SF, "events")).toPandas()
    assert out["sketch_ok"].all()
    assert (out["exact_users"] > 0).all()


# ------------------------------------------------------------- bigram LM


def test_bigram_lm_score_tiny_corpus(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b a b", "a b c", "x"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [7, 5, 1],
            }
        )
    )
    out = text.bigram_lm_score(docs).toPandas().set_index("doc_id")
    # corpus: unigrams a=3 b=3 c=1 x=1; bigrams "a b"=3, "b a"=1, "b c"=1
    # doc 0: bigrams [a b, b a, a b]; doc 1: [a b, b c]; doc 2: none
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "min_cond_p"] == pytest.approx(1 / 3)  # b->a = 1/3
    # bits: "a b" count 3 -> len('11')=2; "b a" count 1 -> 1
    assert out.loc[0, "sum_bits"] == 2 + 1 + 2
    assert out.loc[1, "min_cond_p"] == pytest.approx(1 / 3)  # b->c = 1/3
    assert out.loc[1, "sum_bits"] == 2 + 1


# ------------------------------------------------------------- sampling


def test_sample_k_per_group_bounds_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    a = curation.sample_k_per_group(docs, k=3).toPandas()
    sizes = a.groupby(["lang", "source"]).size()
    group_sizes = docs.groupBy("lang", "source").count().toPandas()
    assert (sizes <= 3).all()
    # groups with >= 3 docs yield exactly 3
    big = group_sizes[group_sizes["count"] >= 3]
    for _, r in big.iterrows():
        assert sizes[(r["lang"], r["source"])] == 3
    # layout-independence: different partitioning, identical picks
    b = curation.sample_k_per_group(docs.repartition(17), k=3).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["lang", "source", "pick_rank"]).reset_index(drop=True),
        b.sort_values(["lang", "source", "pick_rank"]).reset_index(drop=True),
    )


def test_sample_k_per_group_uses_window_group_limit(spark):
    docs = load_table(spark, SF, "documents")
    plan = inspect.executed_plan(curation.sample_k_per_group(docs, k=3))
    assert "WindowGroupLimit" in plan  # per-group running top-k, no full sort


# ------------------------------------------------------- source overlap


def test_source_overlap_matrix_synthetic(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "text": ["dup one", "dup one", "dup two", "dup two", "uniq a", "uniq b"],
                "lang": ["en"] * 6,
                "source": ["s1", "s2", "s1", "s3", "s1", "s2"],
                "n_chars": [7] * 6,
            }
        )
    )
    out = dedup.source_overlap_matrix(docs).toPandas()
    got = {(r.source_a, r.source_b): r.n_shared for r in out.itertuples()}
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1}


# ------------------------------------------------------- stored IVF-PQ


def test_stored_ivf_pq_full_probe_matches_memory(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq")
    cents, books = pq.build_ivf_pq_index(emb, path)
    qrows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(3).collect()
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    stored = pq.ivf_pq_query_index(spark, path, cents, books, Q, k=10, n_probe=16).toPandas()
    mem = pq.pq_topk(pq.pq_encode(emb, books), books, Q, k=10).toPandas()
    merged = stored.merge(mem, on=["query_id", "rank"], suffixes=("_st", "_mem"))
    assert len(merged) == len(mem) == len(stored)
    assert (merged["vec_id_st"] == merged["vec_id_mem"]).all()
    assert (merged["approx_dist2_st"] == merged["approx_dist2_mem"]).all()


def test_stored_ivf_pq_partition_pruning(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_prune")
    cents, books = pq.build_ivf_pq_index(emb, path)
    qrows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(2).collect()
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    out = pq.ivf_pq_query_index(spark, path, cents, books, Q, k=5, n_probe=2)
    filters = inspect.partition_filters(out)
    assert any("cell" in f for f in filters)  # static cell-directory pruning
    out.collect()


# ------------------------------------------------- streaming PQ novelty


def test_stream_pq_novelty_vs_batch(spark, tmp_path):
    from bytehub_spark.streaming import ingest as st
    from bytehub_spark.operators.pq import pq_encode, train_codebooks

    emb = load_table(spark, SF, "embeddings")
    hist = emb.where(F.col("vec_id") % 10 != 0)
    new_vecs = emb.where(F.col("vec_id") % 10 == 0)

    src = str(tmp_path / "vec_stream")
    new_vecs.write.parquet(src)
    books = train_codebooks(hist)
    hist_codes = pq_encode(hist, books)
    hist_codes.cache().count()  # static side of the stream-static join

    stream = (
        spark.readStream.schema(new_vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        st.stream_pq_novelty(stream, books, hist_codes)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pq_novelty")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM pq_novelty")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = (
        st.pq_novelty_batch(new_vecs, hist)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    hist_codes.unpersist()
    pd.testing.assert_frame_equal(
        got[["vec_id", "code_key", "is_novel"]],
        exp[["vec_id", "code_key", "is_novel"]],
        check_dtype=False,
    )
    assert len(got) == new_vecs.count()


# ---------------------------------------------------- batch 2: affinity etc.


def test_domain_affinity_tiny_corpus(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["hello world", "bonjour monde"],
                "lang": ["en", "fr"],
                "source": ["s"] * 2,
                "n_chars": [11, 13],
            }
        )
    )
    out = text.domain_affinity_score(docs).toPandas().set_index("doc_id")
    # every token appears once overall; en doc's tokens appear once in-domain
    # bits(1+1)=2, bits(1+1)=2 -> contrast 0 for en tokens;
    # fr tokens: c_dom=0 -> bits(1)=1, c_all=1 -> bits(2)=2 -> -1 each
    assert out.loc[0, "affinity_bits"] == 0
    assert out.loc[1, "affinity_bits"] == -2
    assert out.loc[1, "affinity_per_term"] == -1.0


def test_quality_rebalance_decile_partition(spark):
    docs = load_table(spark, SF, "documents")
    out = curation.quality_rebalance_plan(docs).toPandas()
    # deciles cover each source's docs exactly once
    per_source = out.groupby("source")["n_docs"].sum()
    counts = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    for src, n in counts.items():
        assert per_source[src] == n
    assert out["decile"].between(1, 10).all()


def test_top_user_paths_plan_and_values(spark):
    ev = load_table(spark, SF, "events")
    q = events_ops.top_user_paths(ev, prefix_len=3, k=5)
    plan = inspect.executed_plan(q)
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global sort
    out = q.toPandas()
    assert len(out) <= 5
    assert (out["rank"] == np.arange(1, len(out) + 1)).all()
    # monotone counts
    assert (np.diff(out["n_users"].to_numpy()) <= 0).all()
    # cross-check the top path by recomputing in pandas
    pdf = ev.select("user_id", "ts", "event_id", "event_type").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    seqs = (
        pdf.groupby("user_id")["event_type"]
        .apply(lambda s: ">".join(s.head(3)))
        .value_counts()
    )
    assert out.loc[0, "n_users"] == seqs.iloc[0]


# ---------------------------------------------- batch 3: audit / churn


def test_data_quality_audit_clean_corpus(spark):
    out = events_ops.data_quality_audit(load_table(spark, SF, "events")).toPandas()
    r = out.set_index("rule")["n"]
    assert (r.filter(like="null:") == 0).all()
    assert (r.filter(like="violation:") == 0).all()
    assert r["distinct:event_type"] == 5
    assert r["rows:total"] == r["distinct:event_id"]  # ids unique


def test_data_quality_audit_flags_dirty_rows(spark):
    dirty = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 1, 2],
                "ts": pd.to_datetime(["2024-01-01"] * 3),
                "user_id": [1, 2, 3],
                "event_type": ["click", "weird", "view"],
                "value": [-5.0, 10.0, 2000.0],
                "props": ["{}", None, "{}"],
            }
        )
    )
    r = events_ops.data_quality_audit(dirty).toPandas().set_index("rule")["n"]
    assert r["violation:duplicate_event_id"] == 1
    assert r["violation:value_lt_0"] == 1
    assert r["violation:value_gt_1000"] == 1
    assert r["violation:event_type_unknown"] == 1
    assert r["null:props"] == 1


def test_churn_labels_boundary(spark):
    ev = load_table(spark, SF, "events")
    out = events_ops.churn_labels(ev).toPandas()
    ref = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = ref - pd.Timedelta(days=7)
    assert (out["churned"] == (out["last_ts"] < cutoff)).all()
    assert out["user_id"].is_unique


# --------------------------------------------- incremental rollup store


def test_rollup_store_incremental_equals_full(spark, tmp_path):
    from bytehub_spark.operators import rollup_store as rs

    ev = load_table(spark, SF, "events")
    base = ev.where(F.col("ts") < "2024-01-20")
    inc = ev.where(F.col("ts") >= "2024-01-20")
    path = str(tmp_path / "rollup")
    rs.build_rollup_store(base, path)
    touched = rs.refresh_rollup_store(spark, path, inc)
    # refresh touched only days present in the increment
    inc_days = {
        r["d"]
        for r in inc.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    }
    assert set(touched) == inc_days
    got = rs.read_rollup(spark, path).toPandas()
    exp = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("hour", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rollup_store_refresh_prunes_partitions(spark, tmp_path):
    from bytehub_spark.operators import rollup_store as rs

    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup_prune")
    rs.build_rollup_store(ev.where(F.col("ts") < "2024-01-25"), path)
    inc = ev.where(F.col("ts") >= "2024-01-25")
    days = [
        r["d"]
        for r in inc.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    ]
    # the merge's stored-side read must carry a day partition filter
    stored = spark.read.parquet(path).where(F.col("day").isin(days))
    filters = inspect.partition_filters(stored)
    assert any("day" in f for f in filters)
    # empty increment is a no-op
    assert rs.refresh_rollup_store(spark, path, inc.where(F.lit(False))) == []


# ------------------------------------- heavy hitters / robust outliers


def test_stream_heavy_hitters_vs_batch(spark, tmp_path):
    from bytehub_spark import streaming as st

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "hh_stream")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    q = (
        st.stream_heavy_hitters(stream, min_support=3, watermark="365 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hh")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode holds windows until the watermark passes; push it
        # forward by replaying the source? Not needed: a 365-day
        # watermark never closes inside the corpus, so emitted rows are
        # empty — instead use update mode semantics via the batch twin
        # for value checks and assert the stream runs clean.
        assert q.lastProgress is not None
    finally:
        q.stop()
    batch = st.heavy_hitters_batch(ev, min_support=3).toPandas()
    # batch twin: thresholds honored, ranks contiguous within windows
    assert (batch["n_events"] >= 3).all()
    for _, g in batch.groupby("window_start"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_stream_heavy_hitters_emits_closed_windows(spark, tmp_path):
    """With a tight watermark and file-by-file triggers, windows close
    and emitted rows equal the batch twin for those windows."""
    from bytehub_spark import streaming as st

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "hh_stream2")
    # order files by time so the watermark advances monotonically
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        st.stream_heavy_hitters(stream, min_support=3, watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hh2")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM hh2")
        .toPandas()
        .sort_values(["window_start", "user_id"])
        .reset_index(drop=True)
    )
    batch = (
        st.heavy_hitters_batch(ev, min_support=3)
        .drop("rank")
        .toPandas()
        .sort_values(["window_start", "user_id"])
        .reset_index(drop=True)
    )
    # every emitted (closed) window matches the batch twin exactly
    merged = got.merge(
        batch, on=["window_start", "user_id"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    # and the final window is the only one allowed to be missing
    missing = set(map(tuple, batch[["window_start", "user_id"]].values)) - set(
        map(tuple, got[["window_start", "user_id"]].values)
    )
    if missing:
        last_w = batch["window_start"].max()
        assert {w for w, _ in missing} == {last_w}


def test_mad_outliers_robustness(spark):
    """One enormous value inflates a z-sigma but not the MAD threshold."""
    base = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime(["2024-01-01"] * 100),
            "user_id": [1] * 100,
            "event_type": ["click"] * 100,
            "value": [10.0] * 99 + [10000.0],
            "props": ["{}"] * 100,
        }
    )
    ev = spark.createDataFrame(base)
    out = events_ops.mad_outliers(ev).toPandas()
    assert out.loc[0, "median"] == 10.0
    assert out.loc[0, "mad"] == 0.0
    assert out.loc[0, "n_outliers"] == 1  # only the flood, not the mass


# ------------------------------------ hard negatives / lang-id confusion


def test_hard_negatives_label_mask(spark):
    from bytehub_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    out = similarity.hard_negatives(emb, [0, 1, 2], k=5).toPandas()
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").where(F.col("vec_id") < 3).collect()
    }
    assert len(out) == 15
    for r in out.itertuples():
        assert r.neighbor_label != labels[r.query_id]
        assert r.neighbor_id != r.query_id
    # negatives are weaker than the unconstrained top-1 for each anchor
    plain = similarity.cosine_topk_gemm(emb, [0, 1, 2], 1).toPandas()
    top1 = plain.set_index("query_id")["cosine_sim"]
    for q, g in out.groupby("query_id"):
        assert g["cosine_sim"].max() <= top1[q]


def test_langid_confusion_totals(spark):
    docs = load_table(spark, SF, "documents")
    out = text.langid_confusion(docs).toPandas()
    assert out["n"].sum() == docs.count()
    assert (out["is_hit"] == (out["actual"] == out["predicted"])).all()
    # synthetic token-salad corpus: the marker chain is weak here (~35%
    # hit rate) — the matrix exists precisely to expose that; assert the
    # structural facts, not classifier quality
    assert out.loc[out["is_hit"], "n"].sum() > 0
    assert set(out["actual"]) == {"de", "en", "es", "fr", "zh"}


# ------------------------------------------------------ two-stage dedup


def test_two_stage_dedup_verifies_text(spark):
    """Aligned twins (same embedding, one-char text edit) must pass both
    stages; semantically-close-but-textually-different pairs must be
    rejected by stage 2."""
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    twins_d = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10), F.lit("#"), F.expr("substring(text, 12)")
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    twins_e = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    out = dedup.two_stage_dedup(
        docs.unionByName(twins_d), emb.unionByName(twins_e)
    ).toPandas()
    # every twin pair survives (identical vector -> same buckets, cos 1.0;
    # one-char edit -> jaccard near 1)
    expected_twins = {
        (i, i + 100000)
        for i in range(0, docs.count(), 25)
        if len(docs.where(F.col("doc_id") == i).first()["text"].split()) >= 3
    }
    got_pairs = set(zip(out["id_a"], out["id_b"]))
    assert expected_twins <= got_pairs
    twin_rows = out[out["id_b"] == out["id_a"] + 100000]
    assert (twin_rows["cosine_sim"] == 1.0).all()
    assert (twin_rows["jaccard"] > 0.5).all()
    # unaligned corpus: no non-twin pair passes text verification here
    assert got_pairs == expected_twins


# ---------------------------------------------------- multi-probe LSH


def test_lsh_multiprobe_recall_dominates_plain(spark):
    from bytehub_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk_gemm(emb, qids, 5).toPandas()
    ex = set(zip(exact["query_id"], exact["neighbor_id"]))
    plain = similarity.lsh_cosine_topk(emb, qids, 5).toPandas()
    mp = similarity.lsh_cosine_topk_multiprobe(emb, qids, 5).toPandas()
    r_plain = sum((q, n) in ex for q, n in zip(plain["query_id"], plain["neighbor_id"])) / len(ex)
    r_mp = sum((q, n) in ex for q, n in zip(mp["query_id"], mp["neighbor_id"])) / len(ex)
    # probing the flip buckets can only ADD candidates
    assert r_mp >= r_plain
    assert r_mp >= 0.95  # measured 1.0 at these params/seeded data
    # plan stays a bucket equi-join
    q = similarity.lsh_cosine_topk_multiprobe(emb, qids, 5)
    plan = inspect.executed_plan(q)
    assert "CartesianProduct" not in plan


# ----------------------------------------- cross-entropy / value drift


def test_plog2_accuracy():
    """plog2 matches true log2 within 0.09 bits across count magnitudes."""
    import math

    for c in [1, 2, 3, 5, 7, 8, 100, 1023, 1024, 99999]:
        b = c.bit_length()
        approx = (b - 1) + (c - 2 ** (b - 1)) / 2 ** (b - 1)
        assert abs(approx - math.log2(c)) < 0.09


def test_bigram_cross_entropy_rare_reads_higher(spark):
    """A rare transition out of a COMMON word scores high cross-entropy;
    the corpus's dominant bigram scores low. (A unique transition from a
    unique word is P=1 — zero bits — the conditional model is right to
    call it fluent.)"""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["a b a b a b", "a b", "a z", "a b a b"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [11, 3, 3, 7],
            }
        )
    )
    out = text.bigram_cross_entropy(docs).toPandas().set_index("doc_id")
    # doc 2's only bigram "a z" happens once out of c("a *")=7 starts
    assert out.loc[2, "cross_entropy_bits"] > out.loc[0, "cross_entropy_bits"]
    assert out.loc[2, "cross_entropy_bits"] > 2.0  # ~plog2(7) bits
    assert (out["n_bigrams"] > 0).all()


def test_value_drift_detects_planted_shift(spark):
    base = pd.DataFrame(
        {
            "event_id": range(2000),
            "ts": pd.to_datetime(
                ["2024-01-10"] * 1000 + ["2024-01-20"] * 1000
            ),
            "user_id": [1] * 2000,
            "event_type": ["stable"] * 1000 + ["shifted"] * 0
            + ["stable"] * 500 + ["shifted"] * 500,
            "value": [50.0] * 1000 + [50.0] * 500 + [450.0] * 500,
            "props": ["{}"] * 2000,
        }
    )
    # stable: same distribution both windows; shifted: only-current type
    ev = spark.createDataFrame(base)
    out = events_ops.value_drift(ev).toPandas().set_index("event_type")
    assert out.loc["stable", "chi2"] == 0.0  # identical histograms


# ------------------------------------------------ incremental IVF-PQ


def test_append_ivf_pq_equals_one_shot(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 0)
    inc = emb.where(F.col("vec_id") % 10 == 0)
    p_inc = str(tmp_path / "ivfpq_inc")
    cents, books = pq.build_ivf_pq_index(base, p_inc)
    n = pq.append_ivf_pq_index(spark, p_inc, cents, books, inc)
    assert n == inc.count()
    # one-shot: encode the UNION with the same frozen geometry
    from bytehub_spark.operators import ivf as _ivf

    union_codes = (
        pq.pq_encode(
            _ivf.assign_cells(emb, cents), books, carry_cols=("cell",)
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    stored = (
        spark.read.parquet(p_inc)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(stored) == len(union_codes) == emb.count()
    assert (stored["vec_id"] == union_codes["vec_id"]).all()
    assert (
        stored["codes"].apply(list).tolist()
        == union_codes["codes"].apply(list).tolist()
    )
    assert (stored["cell"].astype(int) == union_codes["cell"].astype(int)).all()
    # and queries over the appended store rank identically to in-memory
    import numpy as np

    qrows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(3).collect()
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    stored_topk = pq.ivf_pq_query_index(
        spark, p_inc, cents, books, Q, k=10, n_probe=16
    ).toPandas()
    mem = pq.pq_topk(
        pq.pq_encode(emb, books), books, Q, k=10
    ).toPandas()
    merged = stored_topk.merge(mem, on=["query_id", "rank"], suffixes=("_st", "_mem"))
    assert (merged["vec_id_st"] == merged["vec_id_mem"]).all()


# ------------------------------------------------- driver-contract guard


def test_driver_contract_integrity():
    """The driver gates the FIRST 50 of queries(): _GATE_FIRST must be
    exactly 50 unique registered names, every registered query must have
    an oracle, and queries() must lead with the gate order."""
    import __spark_entry__ as E

    all_q = E._all_queries()
    oracles = E.oracle_sql()
    assert len(E._GATE_FIRST) == 50
    assert len(set(E._GATE_FIRST)) == 50
    missing = [n for n in E._GATE_FIRST if n not in all_q]
    assert not missing, f"gate names not registered: {missing}"
    no_oracle = sorted(set(all_q) - set(oracles))
    assert not no_oracle, f"queries without oracle_sql: {no_oracle}"
    ordered = list(E.queries())
    assert ordered[:50] == E._GATE_FIRST


# ------------------------------ tile plan / weekly growth / sentences


def test_tile_image_plan_covers_exactly(spark):
    from bytehub_spark.operators import multimodal as mm

    media = mm.media_from_documents(load_table(spark, SF, "documents"))
    tiles = mm.tile_image_plan(media).toPandas()
    imgs = media.where(F.col("kind") == "image").toPandas()
    # per image: tiles tile the full area exactly once (no overlap default)
    area = tiles.assign(a=tiles["tile_w"] * tiles["tile_h"]).groupby("media_id")["a"].sum()
    for r in imgs.itertuples():
        assert area[r.media_id] == r.width * r.height
    assert (tiles["tile_w"] > 0).all() and (tiles["tile_h"] > 0).all()
    assert (tiles["tile_w"] <= 32).all() and (tiles["tile_h"] <= 32).all()


def test_weekly_growth_ratios(spark):
    out = events_ops.weekly_growth(load_table(spark, SF, "events")).toPandas()
    for _, g in out.groupby("event_type"):
        g = g.sort_values("week").reset_index(drop=True)
        assert pd.isna(g.loc[0, "wow_growth"])  # first week has no prior
        for i in range(1, len(g)):
            assert g.loc[i, "wow_growth"] == pytest.approx(
                g.loc[i, "n_events"] / g.loc[i - 1, "n_events"]
            )


def test_sentence_stats_known_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["one two. three four five! six?", "no punct here", "..."],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [30, 13, 3],
            }
        )
    )
    out = text.sentence_stats(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_sentences"] == 3
    assert out.loc[0, "n_sentence_words"] == 2 + 3 + 1
    assert out.loc[0, "max_sentence_words"] == 3
    assert out.loc[1, "n_sentences"] == 1
    assert out.loc[2, "n_sentences"] == 0
    assert out.loc[2, "avg_sentence_words"] == 0.0


def test_ann_recall_eval_consistent_with_direct(spark):
    from bytehub_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    qids = [0, 1, 2, 3, 4]
    out = similarity.ann_recall_eval(emb, qids, 5).toPandas()
    assert len(out) == 5
    assert (out["n_exact"] == 5).all()
    assert out["recall_at_k"].between(0, 1).all()
    # agrees with recomputing hits from the two result sets directly
    exact = similarity.cosine_topk_gemm(emb, qids, 5).toPandas()
    approx = similarity.lsh_cosine_topk(emb, qids, 5).toPandas()
    ex = set(zip(exact["query_id"], exact["neighbor_id"]))
    ap = set(zip(approx["query_id"], approx["neighbor_id"]))
    for r in out.itertuples():
        expected = len({p for p in ex & ap if p[0] == r.query_id})
        assert r.n_hits == expected


# ------------------------------------------------------ plan-shape pins


def test_round3_ops_plan_shapes(spark):
    """Scale-design guarantees for the round-3 operators: no partition-
    less windows (the single-task straggler), no unbroadcast cartesian
    products, and shuffle counts bounded at their measured plan shapes
    (+1 slack for AQE variance)."""
    ev = load_table(spark, SF, "events")
    docs = load_table(spark, SF, "documents")
    bounds = {
        "decay": (events_ops.decayed_user_score(ev), 5),
        "rebalance": (curation.quality_rebalance_plan(docs), 3),
        "weekly": (events_ops.weekly_growth(ev), 5),
        "audit": (events_ops.data_quality_audit(ev), 3),
        "churn": (events_ops.churn_labels(ev), 6),
        "drift": (events_ops.value_drift(ev), 7),
        "mad": (events_ops.mad_outliers(ev), 9),
        "sentence": (text.sentence_stats(docs), 2),
        "xent": (text.bigram_cross_entropy(docs), 7),
        "affinity": (text.domain_affinity_score(docs), 5),
    }
    for name, (df, max_shuffles) in bounds.items():
        plan = inspect.executed_plan(df)
        assert "CartesianProduct" not in plan, name
        assert not inspect.global_windows(df), name
        n = inspect.shuffle_count(df)
        assert n <= max_shuffles, f"{name}: {n} > {max_shuffles}"


def test_split_leakage_audit_detects_planted_leak(spark):
    docs = load_table(spark, SF, "documents")
    clean = curation.split_leakage_audit(docs).toPandas()
    # plant a leak: twin of a test-split doc (residue 3) re-idded into val
    twin = docs.where(F.col("doc_id") == 3).select(
        F.lit(100013).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    leaked = curation.split_leakage_audit(docs.unionByName(twin)).toPandas()
    key = ["split_a", "split_b"]
    c = clean.set_index(key)["n_leaked_contents"]
    l = leaked.set_index(key)["n_leaked_contents"]
    before = c.get(("test", "val"), 0)
    assert l[("test", "val")] == before + 1
