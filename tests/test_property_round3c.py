"""Property-based checks for the third-session round-3 operators:
random knobs (cooldowns, shard counts, epochs, merge counts, funnel
steps, window sizes) over the fixed corpus — invariants that must hold
at ANY parameter value, not just the driver gate's."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from bytehub_spark.operators import curation, events_ops, text
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


@given(cooldown_s=st.integers(min_value=60, max_value=86_400))
@settings(**SETTINGS)
def test_debounce_gap_and_coverage(events, cooldown_s):
    out = events_ops.debounce(
        events, cooldown_us=cooldown_s * 1_000_000
    ).toPandas()
    gaps = (
        out.sort_values(["user_id", "ts"])
        .groupby("user_id")["ts"]
        .diff()
        .dropna()
        .dt.total_seconds()
    )
    # every kept pair respects the cooldown, every user keeps something
    assert (gaps >= cooldown_s).all()
    assert out.groupby("user_id").size().min() >= 1


@given(
    n_shards=st.integers(min_value=1, max_value=64),
    epoch=st.integers(min_value=0, max_value=1000),
)
@settings(**SETTINGS)
def test_epoch_shuffle_is_permutation(documents, n_shards, epoch):
    out = curation.epoch_shuffle(
        documents, n_shards=n_shards, epoch=epoch
    ).toPandas()
    n = documents.count()
    assert len(out) == n and out["doc_id"].is_unique
    assert out["shard"].between(0, n_shards - 1).all()
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


@given(n_merges=st.integers(min_value=1, max_value=4))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_symbol_conservation(documents, n_merges):
    """Each merge with pair_count c removes exactly c symbols from the
    corpus (two symbols fuse into one at every merged occurrence)."""
    merges = text.bpe_train(documents, n_merges=n_merges).toPandas()
    assert len(merges) == n_merges
    # counts are the argmax of their round: round r's winning count can
    # exceed a later round's, never the reverse being forced — but every
    # count is positive and the merged symbol is the concatenation
    assert (merges["pair_count"] > 0).all()
    assert (
        merges["merged"] == merges["left_sym"] + merges["right_sym"]
    ).all()

    words = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .toPandas()["w"]
    )
    total_syms = int(words.str.len().sum())
    # replay the merges in pandas and check conservation per round
    syms = words.map(lambda w: " ".join(w))
    for _, m in merges.sort_values("merge_round").iterrows():
        pat = " " + m.left_sym + "  " + m.right_sym + " "
        rep = " " + m.merged + " "
        doubled = " " + syms.str.replace(" ", "  ", regex=False) + " "
        merged = doubled.str.replace(pat, rep, regex=False)
        syms = merged.str.replace("  ", " ", regex=False).str.strip()
        new_total = int(syms.str.split(" ").map(len).sum())
        assert new_total == total_syms - int(m.pair_count)
        total_syms = new_total


@given(
    steps=st.permutations(["view", "click", "purchase", "signup"]).map(
        lambda p: tuple(p[:3])
    )
)
@settings(**SETTINGS)
def test_funnel_monotone_counts(events, steps):
    out = events_ops.funnel(events, steps=steps).toPandas()
    assert len(out) == 3
    # reached counts can only shrink down the funnel
    assert (out["n_users"].diff().dropna() <= 0).all()
    assert out["ppm_of_first"].iloc[0] == 1_000_000
    assert out["ppm_of_prev"].between(0, 1_000_000).all()


@given(window_days=st.integers(min_value=1, max_value=14))
@settings(**SETTINGS)
def test_active_users_window_monotone(events, window_days):
    out = events_ops.active_users(events, window_days=window_days).toPandas()
    assert (out["wau"] >= out["dau"]).all()
    if window_days == 1:
        assert (out["wau"] == out["dau"]).all()
    assert out["stickiness_ppm"].between(0, 1_000_000).all()


@given(
    k=st.integers(min_value=2, max_value=8),
    threshold_u=st.integers(min_value=0, max_value=1_500_000),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_margin_pairs_threshold_filters_monotonically(spark, k, threshold_u):
    from bytehub_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    out = similarity.margin_pairs(
        emb, k=k, threshold_u=threshold_u
    ).toPandas()
    assert (out["margin_u"] >= threshold_u).all()
    assert out["a_id"].is_unique  # one best pair per a-vector
