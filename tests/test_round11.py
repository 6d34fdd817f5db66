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


# ------------------------------------------------- qgram_edit_pairs


def test_qgram_pairs_finds_k3_excludes_k4(spark):
    """dist-3 pair found at k=3; dist-4 excluded; below-min-length
    strings excluded by the population contract (len >= q*(k+1))."""
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "thX quick bXown fox jumXs"),   # dist 3 from doc 0
            (2, "XXX Xuick brown fox jumps"),   # dist 4 from doc 0
            (3, "short"),                       # len 5 < 8: excluded
            (4, "shorX"),                       # would be dist-1 pair w/ 3
        ],
        "doc_id long, text string",
    )
    out = dedup.qgram_edit_pairs(docs, k=3, q=2).toPandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs
    assert (3, 4) not in pairs  # population contract, k<=2 op's job
    row = out[(out.doc_a == 0) & (out.doc_b == 1)].iloc[0]
    assert row.dist == 3 and row.len_a == 25 and row.len_b == 25


def test_qgram_pairs_case_fold_and_prefix_truncation(spark):
    """Comparison is on the lowercased 30-char prefix: case-only
    variants are dist 0; edits past char 30 are invisible."""
    docs = spark.createDataFrame(
        [
            (0, "A Common Document Title Here padded well past thirty"),
            (1, "a common document title here PADDED DIFFERENTLY"),
        ],
        "doc_id long, text string",
    )
    out = dedup.qgram_edit_pairs(docs, k=3, q=2).toPandas()
    assert len(out) == 1 and out.dist[0] == 0


def test_qgram_pairs_param_validation(spark):
    docs = spark.createDataFrame([(0, "abcdefgh")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.qgram_edit_pairs(docs, k=0)
    with pytest.raises(ValueError):
        dedup.qgram_edit_pairs(docs, q=1)


# ------------------------------------- persisted LSH index round-trip


def test_lsh_index_persisted_increments_equal_oneshot(spark, tmp_path):
    """The append-only daily pattern end-to-end (build_lsh_index's
    documented persisted form: parquet partitioned on band): write the
    corpus index, check increment B against the STORED table, append
    B's buckets, check increment C against the stored table — the C
    result must EXACTLY equal the one-shot in-memory run against
    build_lsh_index(A ∪ B)."""
    from bytehub_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    part_a = docs.where(F.col("doc_id") % 4 <= 1)   # historical corpus
    part_b = docs.where(F.col("doc_id") % 4 == 2)   # day-1 increment
    part_c = docs.where(F.col("doc_id") % 4 == 3)   # day-2 increment
    path = str(tmp_path / "lsh_index")

    dedup.build_lsh_index(part_a).write.partitionBy("band").parquet(path)
    stored = spark.read.parquet(path)
    out_b = dedup.dedup_against_index(part_b, stored).toPandas()
    ref_b = dedup.dedup_against_index(
        part_b, dedup.build_lsh_index(part_a)
    ).toPandas()
    pd.testing.assert_frame_equal(out_b, ref_b)

    # append day-1's buckets; day-2 sees A ∪ B without any corpus rescan
    dedup.build_lsh_index(part_b).write.mode("append").partitionBy(
        "band"
    ).parquet(path)
    stored2 = spark.read.parquet(path)
    out_c = dedup.dedup_against_index(part_c, stored2).toPandas()
    ref_c = dedup.dedup_against_index(
        part_c, dedup.build_lsh_index(part_a.unionByName(part_b))
    ).toPandas()
    pd.testing.assert_frame_equal(out_c, ref_c)
    assert (~out_c.is_novel).any()  # the check has teeth at this sf


def test_lsh_index_band_partition_prunes(spark, tmp_path):
    """A single-band lookup against the stored index must prune to that
    band's directory (PartitionFilters in the scan), not scan all 32."""
    from bytehub_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "lsh_index")
    dedup.build_lsh_index(docs).write.partitionBy("band").parquet(path)
    scan = spark.read.parquet(path).where(F.col("band") == 7)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    stripped = plan.replace("#", "")
    assert (
        "PartitionFilters: [isnotnull(band" in stripped
        or "band) AND (band" in stripped
    ), "band filter did not reach the parquet partition pruning:\n" + plan


# --------------------------------------------- curation funnel monitor


def test_curation_funnel_flags_semantics(spark):
    """Crafted corpus: gate drops NULL text; exact-dup keeps the min-id
    member; near-dup candidacy is collision with an EARLIER exact-new
    survivor's band bucket; short (<ngram-word) docs are vacuously
    near_new."""
    from bytehub_spark.operators import curation

    long_a = "the quick brown fox jumps over the lazy dog again " * 3
    docs = spark.createDataFrame(
        [
            (0, long_a),
            (1, None),               # gated out
            (2, long_a),             # exact dup of 0
            (3, long_a + "tail"),    # near-dup of 0 (shares buckets)
            (4, "tiny doc"),         # <3 words: no buckets
            (5, "completely different content about spark and parquet"
                " engines measured at scale with care"),
        ],
        "doc_id long, text string",
    )
    out = (
        curation.curation_funnel_flags(docs)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0].tolist() == [True, True, True]
    assert out.loc[1].tolist() == [False, False, False]
    assert out.loc[2].tolist() == [True, False, False]   # exact dup
    g3 = out.loc[3]
    assert g3.gated and g3.exact_new and not g3.near_new  # near cand
    assert out.loc[4].tolist() == [True, True, True]      # vacuous
    assert out.loc[5].tolist() == [True, True, True]


def test_stream_curation_funnel_equals_batch(spark, tmp_path):
    """Per-batch funnel counts from the monitor must equal the batch
    flags aggregated over the same id-ordered batch boundaries — the
    structural stream==batch contract (_funnel_flags is shared)."""
    import os
    import time

    from bytehub_spark import streaming as st
    from bytehub_spark.operators import curation
    from bytehub_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pdf = docs.select("doc_id", "text").toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    src = str(tmp_path / "funnel_src")
    os.makedirs(src)
    bounds = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        spark.createDataFrame(chunk).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q, mon = st.stream_curation_funnel(stream, str(tmp_path / "ck_fn"))
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = mon.result().toPandas()

    flags = curation.curation_funnel_flags(docs).toPandas()
    flags["batch"] = 0
    for i in range(3):
        ids = pdf.iloc[bounds[i] : bounds[i + 1]].doc_id
        flags.loc[flags.doc_id.isin(set(ids)), "batch"] = i
    expect = (
        flags.groupby("batch")
        .agg(
            n_in=("doc_id", "count"),
            n_gate=("gated", "sum"),
            n_exact_new=("exact_new", "sum"),
            n_near_new=("near_new", "sum"),
        )
        .reset_index()
    )
    got2 = got.astype("int64").sort_values("batch").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2, expect.astype("int64"), check_dtype=False
    )
    # the contract has teeth at this sf: some stage actually drops docs
    assert got.n_near_new.sum() < got.n_in.sum()


def test_curation_funnel_monitor_empty_batch_is_zero_row(spark):
    """An empty micro-batch is a REAL all-zero funnel row (dropping it
    would shift later batch indices off the trigger sequence); only
    zero batches raises."""
    from bytehub_spark.streaming import CurationFunnelMonitor

    mon = CurationFunnelMonitor()
    with pytest.raises(RuntimeError, match="before any micro-batch"):
        mon.result()
    empty = spark.createDataFrame([], "doc_id long, text string")
    mon.process_batch(empty)
    mon.process_batch(
        spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    )
    out = mon.result().toPandas()
    assert out.values.tolist() == [[0, 0, 0, 0, 0], [1, 1, 1, 1, 1]]
