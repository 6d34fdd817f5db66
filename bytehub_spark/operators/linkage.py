"""Record linkage / entity resolution: blocked fuzzy matching.

The classic ER pipeline for a 100 TB corpus: (1) BLOCK — cheap
deterministic keys (exact attributes + a length bucket) partition the
candidate space so comparison is an equi-join, never a cross product;
(2) COMPARE — an exact edit-distance on a bounded prefix inside each
block (Levenshtein is O(p^2) per pair; bounding the prefix bounds the
cost per candidate); (3) RESOLVE — best-match-per-record via a window.

Everything is built-in JVM expressions (`levenshtein` is a Catalyst
expression, whole-stage codegen) — no Python in the hot path — and the
whole plan is shuffle-on-block-key + window-on-left-id, both of which
scale linearly with corpus size as long as blocks stay bounded (the
length bucket keeps a degenerate block — all docs one lang/source — from
going quadratic; at 100 TB you would add more blocking keys the same
way, each one multiplies selectivity).

Levenshtein with unit costs is SQL-oracle-able on ASCII data, but the
portability is NARROWER than it looks: Spark's `levenshtein` counts
CODEPOINTS while DuckDB's counts BYTES (measured on this harness:
DuckDB levenshtein('cafe','café') = 2, Spark = 1 — the é is two UTF-8
bytes). The testdata corpus is pure ASCII at every sf, where the two
agree exactly; a multi-byte corpus needs either an ASCII-projected
compare column or a DuckDB-side codepoint DP before the oracle
comparison means anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_block(df: DataFrame, block_cols, text_col: str, len_bucket: int):
    out = df
    if len_bucket:
        out = out.withColumn(
            "_lb", (F.length(text_col) / F.lit(len_bucket)).cast("long")
        )
    return out, (list(block_cols) + ["_lb"]) if len_bucket else list(block_cols)


def blocked_fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols=("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 8,
    prefix_len: int = 40,
    len_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs (left_id, right_id, dist) with
    levenshtein(prefix_left, prefix_right) <= max_dist inside each block.

    ``len_bucket`` adds floor(len/len_bucket) to the block key: near-
    identical records land in the same bucket (an edit changes length by
    ~the edit count, far below the bucket width), while it splits the big
    attribute blocks so no block is quadratic in the corpus. Set 0 to
    disable when lengths are not informative.
    """
    lf, keys = _with_block(left, block_cols, text_col, len_bucket)
    rf, _ = _with_block(right, block_cols, text_col, len_bucket)
    lf = lf.select(
        *keys,
        F.col(id_col).alias("left_id"),
        F.substring(text_col, 1, prefix_len).alias("_lpfx"),
    )
    rf = rf.select(
        *keys,
        F.col(id_col).alias("right_id"),
        F.substring(text_col, 1, prefix_len).alias("_rpfx"),
    )
    # threshold-banded DP (r14 opt): O(max_dist·L) early-exit form,
    # exact on every row it keeps (-1 only above max_dist, which the
    # filter drops) — the where/select pair evaluates the expression
    # twice either way, so each eval is the cheap banded one
    dist = F.levenshtein("_lpfx", "_rpfx", int(max_dist))
    return (
        lf.join(rf, on=keys)
        .where(dist >= 0)
        .select("left_id", "right_id", dist.alias("dist"))
    )


def best_match(
    pairs: DataFrame,
    left_id: str = "left_id",
    right_id: str = "right_id",
    dist_col: str = "dist",
) -> DataFrame:
    """Resolve: one best candidate per left record (min distance,
    lowest right id on ties) — the linkage decision."""
    w = Window.partitionBy(left_id).orderBy(
        F.col(dist_col).asc(), F.col(right_id).asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def link_corrupted_docs(
    documents: DataFrame,
    every: int = 5,
    max_dist: int = 8,
) -> DataFrame:
    """End-to-end linkage demo on the documents table: every ``every``-th
    document arrives as a lightly corrupted duplicate (one substitution at
    a fixed offset — length-preserving, like an OCR/transcription error),
    and blocked fuzzy matching links each corrupted record back to its
    original.

    Returns (left_id, right_id, dist) ordered by left_id — for each
    corrupted doc, its best-matching original. Exact oracle: the same
    corruption + block join + levenshtein is replayed in SQL.
    """
    originals = documents
    corrupted = documents.where(F.col("doc_id") % every == 0).select(
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.substring("text", 1, 10),
            F.lit("#"),
            F.expr("substring(text, 12)"),
        ).alias("text"),
    )
    pairs = blocked_fuzzy_pairs(
        corrupted,
        originals,
        block_cols=("lang", "source"),
        max_dist=max_dist,
    )
    return (
        best_match(pairs)
        .select("left_id", "right_id", "dist")
        .orderBy("left_id")
    )
