"""Round-15 OPTIMIZATION equivalence pins: every structural rewrite in
the optimization round must produce bit-identical rows to the shape it
replaced (the oracle gate pins end-to-end values; these isolate the
operator on adversarial inputs the testdata may not cover).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bytehub_spark.operators import events_ops, text


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


# ---------------------------------------------------------------------
# scd2_history: runs-filter formulation == the _user_runs groupBy shape
# ---------------------------------------------------------------------


def _scd2_via_user_runs(events):
    """The pre-r15 formulation, verbatim: _user_runs groupBy + lead."""
    grouped = events_ops._user_runs(events).withColumnRenamed(
        "run", "version"
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(wv))
        .select(
            "user_id",
            F.col("version").cast("long").alias("version"),
            "event_type",
            "valid_from",
            "valid_to",
            "n_events",
        )
        .orderBy("user_id", "version")
    )


@pytest.fixture(scope="module")
def scd2_events(spark):
    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # user 1: runs a,a | b | a (re-entry gets a NEW version)
        (1, 1, t("2024-01-01T00:00"), "a"),
        (2, 1, t("2024-01-01T01:00"), "a"),
        (3, 1, t("2024-01-01T02:00"), "b"),
        (4, 1, t("2024-01-01T03:00"), "a"),
        # user 2: single event
        (5, 2, t("2024-01-02T00:00"), "x"),
        # user 3: NULL-typed leading run, then NULL again (collapses),
        # then a typed run — null-safe change detection
        (6, 3, t("2024-01-03T00:00"), None),
        (7, 3, t("2024-01-03T01:00"), None),
        (8, 3, t("2024-01-03T02:00"), "c"),
        # user 4: equal timestamps resolve by event_id
        (10, 4, t("2024-01-04T00:00"), "p"),
        (9, 4, t("2024-01-04T00:00"), "q"),
        (11, 4, t("2024-01-04T00:00"), "p"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_scd2_history_equals_user_runs_formulation(spark, scd2_events):
    new = events_ops.scd2_history(scd2_events)
    old = _scd2_via_user_runs(scd2_events)
    assert new.columns == old.columns
    assert _rows(new) == _rows(old)


def test_scd2_history_tiles_and_counts(spark, scd2_events):
    out = events_ops.scd2_history(scd2_events).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    # n_events sums to the user's event count; valid_to chains to the
    # next version's valid_from; the last version is open-ended
    totals = {1: 4, 2: 1, 3: 3, 4: 3}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        assert sum(r.n_events for r in rows) == totals[uid]
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
        assert rows[-1].valid_to is None
    # user 4's tie-break: event 9 (q) sorts before 10 (p) at the equal
    # ts, so runs are q?? no: order is (ts, event_id) -> 9(q),10(p),11(p)
    u4 = by_user[4]
    assert [r.event_type for r in u4] == ["q", "p"]
    assert [r.n_events for r in u4] == [1, 2]


# ---------------------------------------------------------------------
# _bigram_w1_pairs: carried w1 == split(bigram)[0], frame == the old
# single-column explode derivation
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def bigram_docs(spark):
    texts = [
        "the quick brown fox",
        "one",  # < 2 tokens: excluded
        "a a a",  # repeated bigrams
        "x y",  # exactly one bigram
        "",  # empty text -> single empty token, excluded
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bigram_w1_pairs_matches_old_derivation(spark, bigram_docs):
    new = text._bigram_w1_pairs(bigram_docs, {"doc_id": "doc_id"})
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    old = bigram_docs.where(n >= 2).select(
        "doc_id", F.explode(bigrams).alias("bigram")
    )
    assert _rows(new.select("doc_id", "bigram")) == _rows(old)
    # the carried w1 IS the bigram's first token on every row
    assert (
        new.where(
            ~(F.col("w1") == F.split(F.col("bigram"), " ")[0])
        ).count()
        == 0
    )


# ---------------------------------------------------------------------
# repetition_ratio: element-ref n-grams == the slice() formulation
# ---------------------------------------------------------------------


def test_repetition_ratio_matches_slice_formulation(spark, bigram_docs):
    n = 3
    new = text.repetition_ratio(bigram_docs, n=n)
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(0, size(__w) - {n}), "
        f"i -> concat_ws(' ', slice(__w, i + 1, {n}))) "
        f"ELSE array() END"
    )
    old = (
        bigram_docs.withColumn("__w", F.split(F.col("text"), " "))
        .withColumn("__g", grams)
        .select(
            "doc_id",
            F.size("__g").alias("n_ngrams"),
            F.size(F.array_distinct("__g")).alias("n_distinct"),
            F.when(
                F.size("__g") > 0,
                (
                    F.size("__g") - F.size(F.array_distinct("__g"))
                ).cast("double")
                / F.size("__g"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ngram_ratio"),
        )
        .orderBy("doc_id")
    )
    assert _rows(new) == _rows(old)
