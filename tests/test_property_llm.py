"""Property-based checks for the LLM-pipeline operators: random
thresholds/shingle sizes/df-cuts vs a DuckDB oracle at sf0.001 (the
fixed-parameter driver gate generalized to the parameter space), plus
engine-level invariants (layout determinism, exact-vs-GEMM agreement)
for the operators whose hashes DuckDB cannot reproduce."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bytehub_spark.operators import curation, dedup, similarity
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF, "embeddings").cache()


def _match(sdf, ddf):
    s = sdf.toPandas()
    d = ddf.df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    if not len(s):
        return
    cols = sorted(s.columns)
    s = s[cols].sort_values(cols).reset_index(drop=True)
    d = d[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(s[c]):
            assert (abs(s[c] - d[c]) < 1e-12).all(), c
        else:
            assert s[c].tolist() == d[c].tolist(), c


def _jaccard_sql(threshold: float, n: int, max_doc_freq) -> str:
    cut = (
        f"""
        rare AS (
            SELECT shingle AS r_shingle FROM s
            GROUP BY shingle HAVING count(*) <= {max_doc_freq}),
        sp AS (SELECT doc_id, shingle FROM s
               WHERE shingle IN (SELECT r_shingle FROM rare)),
        """
        if max_doc_freq is not None
        else "sp AS (SELECT doc_id, shingle FROM s),"
    )
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            WHERE len(string_split(text, ' ')) >= {n}
        ),
        s AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                range(0, len(ws) - {n - 1}),
                i -> array_to_string(ws[i + 1 : i + {n}], ' ')))) AS shingle
            FROM w
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id),
        {cut}
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sp a JOIN sp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= {threshold}
        ORDER BY doc_a, doc_b
    """


@given(
    threshold=st.sampled_from([0.05, 0.1, 0.2, 0.4]),
    n=st.sampled_from([2, 3, 4]),
    cut=st.sampled_from([None, 5, 20]),
)
@settings(**SETTINGS)
def test_jaccard_any_params(documents, con, threshold, n, cut):
    _match(
        dedup.ngram_jaccard_pairs(documents, threshold, n, max_doc_freq=cut),
        con.execute(_jaccard_sql(threshold, n, cut)),
    )


@given(n=st.sampled_from([3, 4, 5]))
@settings(**SETTINGS)
def test_decontaminate_any_shingle_size(documents, con, n):
    from pyspark.sql import functions as F

    _match(
        dedup.decontaminate(
            documents.where(F.col("doc_id") % 50 != 0),
            documents.where(F.col("doc_id") % 50 == 0),
            n=n,
        ),
        con.execute(f"""
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                WHERE len(string_split(text, ' ')) >= {n}
            ),
            s AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(0, len(ws) - {n - 1}),
                    i -> array_to_string(ws[i + 1 : i + {n}], ' ')))) AS shingle
                FROM w
            ),
            bench AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 50 = 0)
            SELECT doc_id, count(*) AS n_hit_shingles
            FROM s
            WHERE doc_id % 50 <> 0
              AND shingle IN (SELECT shingle FROM bench)
            GROUP BY doc_id ORDER BY doc_id
        """),
    )


@given(max_tokens=st.sampled_from([128, 512, 2048, 8192]))
@settings(**SETTINGS)
def test_pack_sequences_any_budget(documents, con, max_tokens):
    _match(
        curation.pack_sequences(documents, max_tokens),
        con.execute(f"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS cum_before
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor(cum_before / {max_tokens}) AS BIGINT) AS start_bin,
                   CAST(floor((cum_before + n_tokens - 1) / {max_tokens}) AS BIGINT) AS end_bin,
                   CAST(floor((cum_before + n_tokens - 1) / {max_tokens})
                        - floor(cum_before / {max_tokens}) + 1 AS INTEGER) AS n_bins
            FROM c ORDER BY doc_id
        """),
    )


@given(
    n_hashes=st.sampled_from([32, 64]),
    bands=st.sampled_from([8, 16, 32]),
)
@settings(**SETTINGS)
def test_minhash_lsh_layout_invariance(documents, n_hashes, bands):
    """xxhash64-derived signatures cannot be reproduced in DuckDB; the
    engine-level property is determinism: identical candidate pairs and
    estimates regardless of input partition layout, for any banding."""
    if n_hashes % bands:
        bands = n_hashes  # keep the precondition without discarding
    a = dedup.minhash_lsh_pairs(documents, n_hashes, bands).toPandas()
    b = dedup.minhash_lsh_pairs(
        documents.repartition(7), n_hashes, bands
    ).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert ((a["est_jaccard"] >= 0) & (a["est_jaccard"] <= 1)).all()


@given(
    qs=st.lists(
        st.integers(min_value=0, max_value=199), min_size=1, max_size=20, unique=True
    ),
    k=st.sampled_from([1, 3, 10]),
)
@settings(**SETTINGS)
def test_gemm_topk_equals_interpreted_topk(embeddings, qs, k):
    """Both paths are exact with identical rounding/tie rules — results
    must agree for any query set and k."""
    a = similarity.cosine_topk(embeddings, qs, k).toPandas()
    b = similarity.cosine_topk_gemm(embeddings, qs, k).toPandas()
    pd.testing.assert_frame_equal(a, b)


@given(
    span_words=st.integers(min_value=3, max_value=20),
)
@settings(**SETTINGS)
def test_span_dedup_random_span_width(spark, con, documents, span_words):
    """doc_span_dedup generalized over the span width."""
    from bytehub_spark.operators import text

    w = span_words
    sdf = text.span_dedup_stats(documents, span_words=w)
    ddf = con.sql(f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   array_to_string(
                       list_slice(ws, i * {w} + 1, i * {w} + {w}), ' '
                   ) AS span
            FROM w,
                 unnest(range(0, CAST(floor(len(ws) / {w}) AS BIGINT)))
                     AS t(i)
            WHERE len(ws) >= {w}
        ),
        counts AS (
            SELECT span, COUNT(DISTINCT doc_id) AS docs
            FROM spans GROUP BY span
        )
        SELECT s.doc_id,
               COUNT(*) AS n_spans,
               CAST(SUM(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_spans,
               CAST(SUM(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS dup_span_ratio
        FROM spans s JOIN counts c ON s.span = c.span
        GROUP BY s.doc_id ORDER BY s.doc_id
    """)
    _match(sdf, ddf)


@given(cap=st.integers(min_value=1, max_value=30))
@settings(**SETTINGS)
def test_cap_per_group_random_cap(spark, con, documents, cap):
    sdf = curation.cap_per_group(documents, cap=cap)
    ddf = con.sql(f"""
        SELECT source, doc_id, rank_in_group, n_chars
        FROM (
            SELECT source, doc_id, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC
                   ) AS INTEGER) AS rank_in_group
            FROM documents
        )
        WHERE rank_in_group <= {cap}
        ORDER BY source, rank_in_group
    """)
    _match(sdf, ddf)


@given(budget=st.integers(min_value=100, max_value=2_000_000))
@settings(**SETTINGS)
def test_temperature_plan_random_budget(spark, con, documents, budget):
    """Planner generalized over the token budget (weights are budget-
    independent; targets/rates must track it exactly)."""
    sdf = curation.temperature_mix_plan(documents, token_budget=budget)
    ddf = con.sql(f"""
        WITH g AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY lang
        ),
        q AS (
            SELECT lang, n_docs, n_tokens,
                   CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
                        AS DECIMAL(20,0)) AS wq
            FROM g
        ),
        t AS (SELECT SUM(wq) AS wtot FROM q)
        SELECT lang, n_docs, n_tokens,
               CAST(wq AS DOUBLE) / CAST(wtot AS DOUBLE) AS mix_weight,
               CAST(floor((CAST(wq AS DOUBLE) / CAST(wtot AS DOUBLE))
                          * CAST({budget} AS DOUBLE)) AS BIGINT)
                   AS token_target,
               least(CAST(1.0 AS DOUBLE),
                     CAST(CAST(floor((CAST(wq AS DOUBLE)
                                      / CAST(wtot AS DOUBLE))
                                     * CAST({budget} AS DOUBLE)) AS BIGINT)
                          AS DOUBLE)
                     / CAST(n_tokens AS DOUBLE)) AS sample_rate
        FROM q CROSS JOIN t ORDER BY lang
    """)
    _match(sdf, ddf)


@given(k=st.integers(min_value=1, max_value=40))
@settings(**SETTINGS)
def test_bm25_random_k(spark, con, documents, k):
    """BM25 generalized over k — exercises the TakeOrdered tie path."""
    from bytehub_spark.operators import text

    sdf = text.bm25_topk(documents, k=k)
    ddf = con.sql(f"""
        WITH toks AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl,
                   t.term AS term
            FROM documents,
                 unnest(string_split(text, ' ')) AS t(term)
            WHERE t.term IN ('join', 'hash', 'scan')
        ),
        tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, dl, term
        ),
        dfr AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM tf GROUP BY term
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                       / COUNT(*) AS avgdl
            FROM documents
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ((CAST(n_docs AS DOUBLE) / df)
                        * (tf * CAST(2.2 AS DOUBLE)))
                   / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                       + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE))
                         / avgdl)) AS c
            FROM tf
            JOIN dfr ON tf.term = dfr.term
            CROSS JOIN stats
        ),
        agg AS (
            SELECT doc_id,
                   MAX(CASE WHEN term = 'join' THEN c END) AS c0,
                   MAX(CASE WHEN term = 'hash' THEN c END) AS c1,
                   MAX(CASE WHEN term = 'scan' THEN c END) AS c2,
                   COUNT(*) AS n_terms_hit
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id,
               0.0 + COALESCE(c0, 0.0) + COALESCE(c1, 0.0)
                   + COALESCE(c2, 0.0) AS bm25_score,
               n_terms_hit
        FROM agg
        ORDER BY bm25_score DESC, doc_id ASC
        LIMIT {k}
    """)
    _match(sdf, ddf)
