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
