"""Property-based checks for the round-3 operators: random parameters
(corruption cadence, edit thresholds, half-lives, sample sizes, tile
counts, journey lengths) vs a DuckDB oracle at sf0.001 — the driver
gate's fixed parameters generalized over the knob space."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from bytehub_spark.operators import curation, events_ops, linkage
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


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
        elif pd.api.types.is_datetime64_any_dtype(s[c]):
            assert (
                pd.to_datetime(s[c]).astype("datetime64[us]").tolist()
                == pd.to_datetime(d[c]).astype("datetime64[us]").tolist()
            ), c
        else:
            assert s[c].astype(str).tolist() == d[c].astype(str).tolist(), c


@given(every=st.integers(3, 11), max_dist=st.integers(2, 12))
@settings(**SETTINGS)
def test_link_corrupted_docs_random_params(documents, con, every, max_dist):
    sdf = linkage.link_corrupted_docs(documents, every=every, max_dist=max_dist)
    ddf = con.execute(
        f"""
        WITH corrupted AS (
            SELECT doc_id AS left_id, lang, source,
                   substr(text, 1, 10) || '#' || substr(text, 12) AS text
            FROM documents WHERE doc_id % {every} = 0
        ),
        lf AS (
            SELECT left_id, lang, source,
                   CAST(length(text) // 64 AS BIGINT) AS lb,
                   substr(text, 1, 40) AS pfx
            FROM corrupted
        ),
        rf AS (
            SELECT doc_id AS right_id, lang, source,
                   CAST(length(text) // 64 AS BIGINT) AS lb,
                   substr(text, 1, 40) AS pfx
            FROM documents
        ),
        pairs AS (
            SELECT left_id, right_id, levenshtein(lf.pfx, rf.pfx) AS dist
            FROM lf JOIN rf USING (lang, source, lb)
            WHERE levenshtein(lf.pfx, rf.pfx) <= {max_dist}
        ),
        best AS (
            SELECT *, row_number() OVER (
                       PARTITION BY left_id ORDER BY dist, right_id) AS rn
            FROM pairs
        )
        SELECT left_id, right_id, dist FROM best WHERE rn = 1
        ORDER BY left_id
        """
    )
    _match(sdf, ddf)


@given(hl=st.integers(1, 72), cap=st.integers(5, 50))
@settings(**SETTINGS)
def test_decayed_score_random_half_life(events, con, hl, cap):
    sdf = events_ops.decayed_user_score(events, half_life_hours=hl, max_halvings=cap)
    ddf = con.execute(
        f"""
        WITH ref AS (SELECT max(ts) AS r FROM events),
        c AS (
            SELECT user_id,
                   CAST(floor(value * power(0.5, least(CAST(floor(
                           (epoch(r) - epoch(ts)) / {3600.0 * hl}) AS BIGINT),
                           {cap})) * 1e10) AS BIGINT) AS contrib
            FROM events, ref
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(contrib) AS BIGINT) AS score_e10,
               CAST(CAST(SUM(contrib) AS BIGINT) AS DOUBLE) / 1e10
                   AS decayed_score
        FROM c GROUP BY user_id ORDER BY user_id
        """
    )
    _match(sdf, ddf)


@given(k=st.integers(1, 9))
@settings(**SETTINGS)
def test_sample_k_per_group_random_k(documents, con, k):
    sdf = curation.sample_k_per_group(documents, k=k)
    ddf = con.execute(
        f"""
        WITH t AS (
            SELECT lang, source, doc_id,
                   row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{k}'),
                                doc_id
                   ) AS rn
            FROM documents
        )
        SELECT lang, source, doc_id, rn AS pick_rank
        FROM t WHERE rn <= {k}
        ORDER BY lang, source, pick_rank
        """
    )
    _match(sdf, ddf)


@given(n_tiles=st.integers(2, 20))
@settings(**SETTINGS)
def test_quality_rebalance_random_tiles(documents, con, n_tiles):
    sdf = curation.quality_rebalance_plan(documents, n_tiles=n_tiles)
    ddf = con.execute(
        f"""
        WITH scored AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens,
                   0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                       + 0.5 * (1.0 - CAST(len(list_filter(
                           string_split(text, ' '),
                           w -> w IN ('the', 'a', 'and', 'of', 'to')))
                           AS DOUBLE)
                           / len(string_split(text, ' '))) AS q
            FROM documents
        ),
        tiled AS (
            SELECT source, n_tokens,
                   ntile({n_tiles}) OVER (PARTITION BY source
                                          ORDER BY q ASC, doc_id ASC) AS decile
            FROM scored
        )
        SELECT source, CAST(decile AS INTEGER) AS decile,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM tiled GROUP BY source, decile ORDER BY source, decile
        """
    )
    _match(sdf, ddf)


@given(plen=st.integers(1, 8), k=st.integers(3, 40))
@settings(**SETTINGS)
def test_top_paths_random_params(events, con, plen, k):
    sdf = events_ops.top_user_paths(events, prefix_len=plen, k=k)
    ddf = con.execute(
        f"""
        WITH seqs AS (
            SELECT user_id,
                   array_to_string(
                       (list(event_type ORDER BY ts, event_id))[1:{plen}],
                       '>') AS path
            FROM events GROUP BY user_id
        ),
        pc AS (SELECT path, COUNT(*) AS n_users FROM seqs GROUP BY path)
        SELECT CAST(rank AS INTEGER) AS rank, path, n_users FROM (
            SELECT *, row_number() OVER (
                ORDER BY n_users DESC, path ASC) AS rank
            FROM pc
        ) WHERE rank <= {k} ORDER BY rank
        """
    )
    _match(sdf, ddf)


@given(horizon=st.integers(1, 25))
@settings(**SETTINGS)
def test_churn_labels_random_horizon(events, con, horizon):
    sdf = events_ops.churn_labels(events, horizon_days=horizon)
    ddf = con.execute(
        f"""
        WITH ref AS (SELECT max(ts) AS r FROM events)
        SELECT user_id, count(*) AS n_events, max(ts) AS last_ts,
               count(DISTINCT date_trunc('day', ts)) AS n_active_days,
               max(ts) < max(r) - INTERVAL {horizon} DAY AS churned
        FROM events, ref GROUP BY user_id ORDER BY user_id
        """
    )
    _match(sdf, ddf)


@given(ns=st.floats(1.0, 6.0))
@settings(**SETTINGS)
def test_mad_outliers_random_sigma(events, con, ns):
    sdf = events_ops.mad_outliers(events, n_mads=ns)
    ddf = con.execute(
        f"""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ),
        wm AS (
            SELECT e.event_type, e.value, m.med
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
            FROM wm GROUP BY event_type
        )
        SELECT wm.event_type, COUNT(*) AS n,
               count(*) FILTER (abs(value - wm.med) > {ns!r} * mad.mad)
                   AS n_outliers,
               max(wm.med) AS median, max(mad.mad) AS mad
        FROM wm JOIN mad ON mad.event_type = wm.event_type
        GROUP BY wm.event_type ORDER BY wm.event_type
        """
    )
    _match(sdf, ddf)


@given(support=st.integers(2, 6), hours=st.sampled_from([2, 4, 6, 12, 24]))
@settings(**SETTINGS)
def test_heavy_hitters_random_params(spark, events, con, support, hours):
    from bytehub_spark import streaming as stm

    sdf = stm.heavy_hitters_batch(events, min_support=support, window=f"{hours} hours")
    ddf = con.execute(
        f"""
        WITH counts AS (
            SELECT time_bucket(INTERVAL {hours} HOUR, ts) AS window_start,
                   user_id, COUNT(*) AS n_events
            FROM events GROUP BY window_start, user_id
            HAVING COUNT(*) >= {support}
        )
        SELECT window_start, user_id, n_events,
               CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, user_id ASC) AS INTEGER) AS rank
        FROM counts
        ORDER BY window_start, rank
        """
    )
    _match(sdf, ddf)


@given(day=st.integers(5, 27), nb=st.integers(4, 16))
@settings(**SETTINGS)
def test_value_drift_random_split(events, con, day, nb):
    split = f"2024-01-{day:02d}"
    sdf = events_ops.value_drift(events, split_ts=split, n_buckets=nb)
    pq_frac = f"CASE WHEN t.t_ref > 0 THEN CAST(c.n_ref AS DOUBLE) / CAST(t.t_ref AS DOUBLE) ELSE 0.0 END"
    qq_frac = f"CASE WHEN t.t_cur > 0 THEN CAST(c.n_cur AS DOUBLE) / CAST(t.t_cur AS DOUBLE) ELSE 0.0 END"
    ddf = con.execute(
        f"""
        WITH counts AS (
            SELECT event_type,
                   CAST(CASE WHEN value < 0.0 THEN 0
                             WHEN value >= 500.0 THEN {nb + 1}
                             ELSE CAST(floor((value - 0.0) / ((500.0 - 0.0) / {nb}))
                                       AS INTEGER) + 1
                        END AS INTEGER) AS bucket,
                   count(*) FILTER (ts < TIMESTAMP '{split}') AS n_ref,
                   count(*) FILTER (ts >= TIMESTAMP '{split}') AS n_cur
            FROM events GROUP BY event_type, bucket
        ),
        totals AS (
            SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
            FROM counts GROUP BY event_type
        ),
        terms AS (
            SELECT c.event_type, t.t_ref, t.t_cur,
                   CASE WHEN ({pq_frac} + {qq_frac}) > 0.0 THEN
                       CAST(floor(({pq_frac} - {qq_frac}) * ({pq_frac} - {qq_frac})
                                  / ({pq_frac} + {qq_frac}) * 1e12) AS BIGINT)
                   ELSE 0 END AS term
            FROM counts c JOIN totals t USING (event_type)
        )
        SELECT event_type,
               CAST(max(t_ref) AS BIGINT) AS n_ref,
               CAST(max(t_cur) AS BIGINT) AS n_cur,
               CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE) / 1e12 AS chi2
        FROM terms GROUP BY event_type ORDER BY event_type
        """
    )
    _match(sdf, ddf)


@given(dom=st.sampled_from(["en", "de", "es", "fr", "zh"]))
@settings(**SETTINGS)
def test_domain_affinity_random_domain(documents, con, dom):
    from bytehub_spark.operators import text as txt

    sdf = txt.domain_affinity_score(documents, domain_value=dom)
    ddf = con.execute(
        f"""
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        ),
        dt AS (SELECT doc_id, unnest(list_distinct(ws)) AS w FROM toks),
        allc AS (
            SELECT w, COUNT(*) AS c_all FROM (
                SELECT unnest(ws) AS w FROM toks
            ) GROUP BY w
        ),
        domc AS (
            SELECT w, COUNT(*) AS c_dom FROM (
                SELECT unnest(ws) AS w FROM toks WHERE lang = '{dom}'
            ) GROUP BY w
        )
        SELECT doc_id, COUNT(*) AS n_terms,
               CAST(SUM(length(bin(coalesce(c_dom, 0) + 1))
                        - length(bin(c_all + 1))) AS BIGINT)
                   AS affinity_bits,
               CAST(CAST(SUM(length(bin(coalesce(c_dom, 0) + 1))
                        - length(bin(c_all + 1))) AS BIGINT) AS DOUBLE)
                   / COUNT(*) AS affinity_per_term
        FROM dt JOIN allc USING (w) LEFT JOIN domc USING (w)
        GROUP BY doc_id ORDER BY doc_id
        """
    )
    _match(sdf, ddf)


@given(tile=st.integers(8, 64), overlap=st.integers(0, 7))
@settings(**SETTINGS)
def test_tile_plan_random_params(spark, documents, con, tile, overlap):
    from bytehub_spark.operators import multimodal as mm

    stride = tile - overlap
    sdf = mm.tile_image_plan(mm.media_from_documents(documents), tile, overlap)
    ddf = con.execute(
        f"""
        WITH m AS (
            SELECT doc_id AS media_id,
                   CAST(64 + doc_id % 4 AS INTEGER) AS width,
                   64 AS height
            FROM documents WHERE doc_id % 3 = 0
        ),
        g AS (
            SELECT media_id, width, height,
                   CAST(ceil(CAST(width - {overlap} AS DOUBLE) / {stride})
                        AS INTEGER) AS nx,
                   CAST(ceil(CAST(height - {overlap} AS DOUBLE) / {stride})
                        AS INTEGER) AS ny
            FROM m
        ),
        t AS (
            SELECT media_id, width, height, ny, unnest(range(0, nx)) AS tx
            FROM g
        ),
        tt AS (
            SELECT media_id, width, height, tx, unnest(range(0, ny)) AS ty
            FROM t
        )
        SELECT media_id, CAST(tx AS INTEGER) AS tx, CAST(ty AS INTEGER) AS ty,
               CAST(tx * {stride} AS INTEGER) AS x0,
               CAST(ty * {stride} AS INTEGER) AS y0,
               CAST(least({tile}, width - tx * {stride}) AS INTEGER) AS tile_w,
               CAST(least({tile}, height - ty * {stride}) AS INTEGER) AS tile_h
        FROM tt ORDER BY media_id, tx, ty
        """
    )
    _match(sdf, ddf)
