"""Curation operators: deterministic splits, mixing quotas, packing
invariants (bin budgets, coverage, determinism across partition layouts)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bytehub_spark.operators import curation
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF, "documents")


def test_split_assignment_stable_and_complete(documents):
    out = curation.train_val_test_split(documents, val_pct=10, test_pct=10).toPandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    # id-keyed: residue decides, regardless of anything else
    for _, row in out.iterrows():
        r = row["doc_id"] % 100
        exp = "test" if r < 10 else ("val" if r < 20 else "train")
        assert row["split"] == exp
    # a second run over a differently-partitioned frame agrees row-for-row
    out2 = (
        curation.train_val_test_split(documents.repartition(7), 10, 10)
        .toPandas()
        .set_index("doc_id")["split"]
        .sort_index()
    )
    assert (out.set_index("doc_id")["split"].sort_index() == out2).all()


def test_mix_sources_quotas(documents):
    out = curation.mix_sources(
        documents, {"src0": 3, "src1": 1}
    ).toPandas()
    counts = out.groupby("source").size()
    assert counts.to_dict() == {"src0": 3, "src1": 1}
    # quota fills in id order: the kept ids are the smallest per source
    all_src0 = sorted(
        documents.where(F.col("source") == "src0").toPandas()["doc_id"]
    )
    assert sorted(out[out.source == "src0"]["doc_id"]) == all_src0[:3]


def test_pack_sequences_cumsum_layout(documents):
    out = curation.pack_sequences(documents, max_tokens=512).toPandas()
    assert len(out) == documents.count()
    # bins tile the concatenated stream: cumulative tokens / 512 at doc start
    cum = out["n_tokens"].cumsum().shift(fill_value=0)
    assert (out["start_bin"] == cum // 512).all()
    assert (out["end_bin"] >= out["start_bin"]).all()
    assert (out["n_bins"] == out["end_bin"] - out["start_bin"] + 1).all()


def test_pack_sequences_greedy_invariants(documents):
    max_tokens = 512
    out = curation.pack_sequences_greedy(documents, max_tokens=max_tokens).toPandas()
    assert len(out) == documents.count()
    per_bin = out.groupby("bin").agg(total=("n_tokens", "sum"), n=("n_tokens", "count"))
    # a bin over budget can only be a single oversized doc
    over = per_bin[per_bin["total"] > max_tokens]
    assert (over["n"] == 1).all()
    # packing is greedy within each shard: consecutive docs share a bin
    # exactly while they fit (verify per shard by replay)
    out = out.sort_values("doc_id")
    for shard, grp in out.groupby(out["bin"] // (1 << 32)):
        used, cur = 0, None
        for _, row in grp.iterrows():
            if cur is not None and used + row["n_tokens"] <= max_tokens:
                assert row["bin"] == cur, "doc should have joined the open bin"
            else:
                assert row["bin"] != cur or cur is None
                used = 0
            cur = row["bin"]
            used += row["n_tokens"]


def test_temperature_sample_consistent_with_stratified(spark):
    """The in-plan temperature sampler keeps exactly the docs that
    stratified_sample keeps when fed the planner's collected rates."""
    from bytehub_spark.operators import curation
    from bytehub_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    budget = 5000
    summary = (
        curation.temperature_sample_summary(docs, token_budget=budget)
        .toPandas()
        .set_index("lang")
    )
    rates = {
        r["lang"]: r["sample_rate"]
        for r in curation.temperature_mix_plan(docs, token_budget=budget)
        .collect()
    }
    kept = curation.stratified_sample(docs, rates).groupBy("lang").count()
    for row in kept.collect():
        assert summary.loc[row["lang"], "n_docs_kept"] == row["count"]
    # budget respected in expectation: kept tokens <= ~budget + slack
    assert summary["n_tokens_kept"].sum() < 3 * budget


def test_corpus_pipeline_funnel_monotone(spark):
    """Each stage only narrows: docs/tokens non-increasing, raw matches
    the table, sampled tokens land near the budget."""
    from bytehub_spark.operators import curation
    from bytehub_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = curation.corpus_pipeline_stats(docs, token_budget=2000).toPandas()
    assert list(got["stage"]) == ["raw", "dedup", "quality", "sampled"]
    assert (got["n_docs"].diff().dropna() <= 0).all()
    assert (got["n_tokens"].diff().dropna() <= 0).all()
    assert got.iloc[0]["n_docs"] == docs.count()
    assert got.iloc[3]["n_tokens"] <= 3 * 2000
