"""Round-3 scratch probe: validate the new operators against draft
DuckDB oracles before registering them (fast iteration outside pytest).

Usage: python scripts/probe_r3.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bytehub_spark.operators import (
    curation,
    dedup,
    events_ops,
    linkage,
    text,
)
from bytehub_spark.session import get_spark
from bytehub_spark.sources import TABLES
from bytehub_spark.sources.tables import load_table

SQL = {
    "link_fuzzy_docs": """
        WITH corrupted AS (
            SELECT doc_id AS left_id, lang, source,
                   substr(text, 1, 10) || '#' || substr(text, 12) AS text
            FROM documents WHERE doc_id % 5 = 0
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
            SELECT left_id, right_id,
                   levenshtein(lf.pfx, rf.pfx) AS dist
            FROM lf JOIN rf USING (lang, source, lb)
            WHERE levenshtein(lf.pfx, rf.pfx) <= 8
        ),
        best AS (
            SELECT *, row_number() OVER (
                       PARTITION BY left_id ORDER BY dist, right_id) AS rn
            FROM pairs
        )
        SELECT left_id, right_id, dist FROM best WHERE rn = 1
        ORDER BY left_id
    """,
    "ts_decay_score": """
        WITH ref AS (SELECT max(ts) AS r FROM events),
        c AS (
            SELECT user_id,
                   CAST(floor(value * power(0.5, least(CAST(floor(
                           (epoch(r) - epoch(ts)) / 43200.0) AS BIGINT), 40))
                         * 1e10) AS BIGINT) AS contrib
            FROM events, ref
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(contrib) AS BIGINT) AS score_e10,
               CAST(CAST(SUM(contrib) AS BIGINT) AS DOUBLE) / 1e10
                   AS decayed_score
        FROM c GROUP BY user_id ORDER BY user_id
    """,
    "ts_sketch_accuracy": """
        SELECT event_type, count(DISTINCT user_id) AS exact_users,
               true AS sketch_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "doc_bigram_lm": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        db AS (
            SELECT doc_id, unnest(list_transform(
                       range(0, len(ws) - 1),
                       i -> ws[i + 1] || ' ' || ws[i + 2])) AS bigram
            FROM toks WHERE len(ws) >= 2
        ),
        uni AS (
            SELECT w1, COUNT(*) AS c1 FROM (
                SELECT unnest(ws) AS w1 FROM toks
            ) GROUP BY w1
        ),
        bi AS (SELECT bigram, COUNT(*) AS c2 FROM db GROUP BY bigram),
        j AS (
            SELECT db.doc_id, bi.c2, uni.c1
            FROM db
            JOIN bi USING (bigram)
            JOIN uni ON uni.w1 = string_split(db.bigram, ' ')[1]
        )
        SELECT doc_id, COUNT(*) AS n_bigrams,
               min(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) AS min_cond_p,
               CAST(SUM(length(bin(c2))) AS BIGINT) AS sum_bits,
               CAST(SUM(length(bin(c2))) AS DOUBLE) / COUNT(*) AS avg_bits
        FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    "cur_sample_k_per_group": """
        WITH t AS (
            SELECT lang, source, doc_id,
                   row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':3'), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT lang, source, doc_id, rn AS pick_rank
        FROM t WHERE rn <= 3
        ORDER BY lang, source, pick_rank
    """,
    "dedup_source_overlap": r"""
        WITH fp AS (
            SELECT DISTINCT source AS src,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
            FROM documents
        )
        SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.f = b.f AND a.src < b.src
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "doc_domain_affinity": """
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        ),
        dt AS (
            SELECT doc_id, unnest(list_distinct(ws)) AS w FROM toks
        ),
        allc AS (
            SELECT w, COUNT(*) AS c_all FROM (
                SELECT unnest(ws) AS w FROM toks
            ) GROUP BY w
        ),
        domc AS (
            SELECT w, COUNT(*) AS c_dom FROM (
                SELECT unnest(ws) AS w FROM toks WHERE lang = 'en'
            ) GROUP BY w
        )
        SELECT doc_id, COUNT(*) AS n_terms,
               CAST(SUM(length(bin(coalesce(c_dom, 0) + 1))
                        - length(bin(c_all + 1))) AS BIGINT) AS affinity_bits,
               CAST(CAST(SUM(length(bin(coalesce(c_dom, 0) + 1))
                        - length(bin(c_all + 1))) AS BIGINT) AS DOUBLE)
                   / COUNT(*) AS affinity_per_term
        FROM dt JOIN allc USING (w) LEFT JOIN domc USING (w)
        GROUP BY doc_id ORDER BY doc_id
    """,
    "cur_quality_rebalance": """
        WITH scored AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens,
                   0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                       + 0.5 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                           w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
                           / len(string_split(text, ' '))) AS q
            FROM documents
        ),
        tiled AS (
            SELECT source, n_tokens,
                   ntile(10) OVER (PARTITION BY source
                                   ORDER BY q ASC, doc_id ASC) AS decile
            FROM scored
        )
        SELECT source, CAST(decile AS INTEGER) AS decile,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM tiled GROUP BY source, decile ORDER BY source, decile
    """,
    "ts_top_paths": """
        WITH seqs AS (
            SELECT user_id,
                   array_to_string(
                       (list(event_type ORDER BY ts, event_id))[1:5],
                       '>') AS path
            FROM events GROUP BY user_id
        ),
        pc AS (SELECT path, COUNT(*) AS n_users FROM seqs GROUP BY path)
        SELECT CAST(rank AS INTEGER) AS rank, path, n_users FROM (
            SELECT *, row_number() OVER (
                ORDER BY n_users DESC, path ASC) AS rank
            FROM pc
        ) WHERE rank <= 20 ORDER BY rank
    """,
    "ts_quality_audit": """
        WITH agg AS (
            SELECT count(*) AS n_rows,
                count(*) FILTER (event_id IS NULL) AS null_event_id,
                count(*) FILTER (ts IS NULL) AS null_ts,
                count(*) FILTER (user_id IS NULL) AS null_user_id,
                count(*) FILTER (event_type IS NULL) AS null_event_type,
                count(*) FILTER (value IS NULL) AS null_value,
                count(*) FILTER (props IS NULL) AS null_props,
                count(DISTINCT event_id) AS d_event_id,
                count(DISTINCT user_id) AS d_user_id,
                count(DISTINCT event_type) AS d_event_type,
                count(*) FILTER (value < 0) AS v_value_lt_0,
                count(*) FILTER (value > 1000) AS v_value_gt_1000,
                count(*) FILTER (event_type NOT IN
                    ('click','view','purchase','signup','error'))
                    AS v_type_unknown,
                count(*) - count(DISTINCT event_id) AS v_dup_event_id
            FROM events
        )
        SELECT rule, CAST(n AS BIGINT) AS n FROM (
            SELECT 'rows:total' AS rule, n_rows AS n FROM agg
            UNION ALL SELECT 'null:event_id', null_event_id FROM agg
            UNION ALL SELECT 'null:ts', null_ts FROM agg
            UNION ALL SELECT 'null:user_id', null_user_id FROM agg
            UNION ALL SELECT 'null:event_type', null_event_type FROM agg
            UNION ALL SELECT 'null:value', null_value FROM agg
            UNION ALL SELECT 'null:props', null_props FROM agg
            UNION ALL SELECT 'distinct:event_id', d_event_id FROM agg
            UNION ALL SELECT 'distinct:user_id', d_user_id FROM agg
            UNION ALL SELECT 'distinct:event_type', d_event_type FROM agg
            UNION ALL SELECT 'violation:value_lt_0', v_value_lt_0 FROM agg
            UNION ALL SELECT 'violation:value_gt_1000', v_value_gt_1000 FROM agg
            UNION ALL SELECT 'violation:event_type_unknown', v_type_unknown FROM agg
            UNION ALL SELECT 'violation:duplicate_event_id', v_dup_event_id FROM agg
        ) ORDER BY rule
    """,
    "ts_churn_labels": """
        WITH ref AS (SELECT max(ts) AS r FROM events)
        SELECT user_id, count(*) AS n_events, max(ts) AS last_ts,
               count(DISTINCT date_trunc('day', ts)) AS n_active_days,
               max(ts) < max(r) - INTERVAL 7 DAY AS churned
        FROM events, ref GROUP BY user_id ORDER BY user_id
    """,
    "ts_mad_outliers": """
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
               count(*) FILTER (abs(value - wm.med) > 3.0 * mad.mad)
                   AS n_outliers,
               max(wm.med) AS median, max(mad.mad) AS mad
        FROM wm JOIN mad ON mad.event_type = wm.event_type
        GROUP BY wm.event_type ORDER BY wm.event_type
    """,
    "ts_heavy_hitters": """
        WITH counts AS (
            SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
                   user_id, COUNT(*) AS n_events
            FROM events GROUP BY window_start, user_id
            HAVING COUNT(*) >= 4
        )
        SELECT window_start, user_id, n_events,
               CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, user_id ASC) AS INTEGER) AS rank
        FROM counts
        ORDER BY window_start, rank
    """,
    "emb_hard_negatives": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
            FROM embeddings WHERE vec_id < 5
        ),
        pairs AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   e.label AS neighbor_label,
                   round(
                       list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.q_vec AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                          * sqrt(list_dot_product(CAST(q.q_vec AS DOUBLE[]),
                                                  CAST(q.q_vec AS DOUBLE[])))),
                       4) AS cosine_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id AND e.label <> q.q_label
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               neighbor_label, cosine_sim
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM pairs
        ) WHERE rank <= 5 ORDER BY query_id, rank
    """,
    "doc_langid_confusion": """
        WITH pred AS (
            SELECT lang AS actual,
                CASE
                    WHEN regexp_matches(text, '(^| )(der|die|das|und|nicht)( |$)') THEN 'de'
                    WHEN regexp_matches(text, '(^| )(el|los|las|una|por)( |$)') THEN 'es'
                    WHEN regexp_matches(text, '(^| )(le|les|des|une|est)( |$)') THEN 'fr'
                    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                    WHEN regexp_matches(text, '(^| )(the|a|and|of|to)( |$)') THEN 'en'
                    ELSE 'unknown'
                END AS predicted
            FROM documents
        )
        SELECT actual, predicted, count(*) AS n,
               actual = predicted AS is_hit
        FROM pred GROUP BY actual, predicted ORDER BY actual, predicted
    """,
    "doc_bigram_xent": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        db AS (
            SELECT doc_id, unnest(list_transform(
                       range(0, len(ws) - 1),
                       i -> ws[i + 1] || ' ' || ws[i + 2])) AS bigram
            FROM toks WHERE len(ws) >= 2
        ),
        uni AS (
            SELECT w1, COUNT(*) AS c1 FROM (
                SELECT unnest(ws) AS w1 FROM toks
            ) GROUP BY w1
        ),
        bi AS (SELECT bigram, COUNT(*) AS c2 FROM db GROUP BY bigram),
        j AS (
            SELECT db.doc_id,
                   (length(bin(c1)) - 1)
                       + (CAST(c1 AS DOUBLE) - power(2.0, CAST(length(bin(c1)) - 1 AS DOUBLE)))
                         / power(2.0, CAST(length(bin(c1)) - 1 AS DOUBLE)) AS l1,
                   (length(bin(c2)) - 1)
                       + (CAST(c2 AS DOUBLE) - power(2.0, CAST(length(bin(c2)) - 1 AS DOUBLE)))
                         / power(2.0, CAST(length(bin(c2)) - 1 AS DOUBLE)) AS l2
            FROM db
            JOIN bi USING (bigram)
            JOIN uni ON uni.w1 = string_split(db.bigram, ' ')[1]
        )
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(CAST(floor((l1 - l2) * 1e9) AS BIGINT)) AS DOUBLE)
                   / 1e9 / COUNT(*) AS cross_entropy_bits
        FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    "ts_value_drift": """
        WITH counts AS (
            SELECT event_type,
                   CAST(CASE WHEN value < 0.0 THEN 0
                             WHEN value >= 500.0 THEN 11
                             ELSE CAST(floor((value - 0.0) / ((500.0 - 0.0) / 10))
                                       AS INTEGER) + 1
                        END AS INTEGER) AS bucket,
                   count(*) FILTER (ts < TIMESTAMP '2024-01-16') AS n_ref,
                   count(*) FILTER (ts >= TIMESTAMP '2024-01-16') AS n_cur
            FROM events GROUP BY event_type, bucket
        ),
        totals AS (
            SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
            FROM counts GROUP BY event_type
        ),
        terms AS (
            SELECT c.event_type, t.t_ref, t.t_cur,
                   CASE WHEN (CASE WHEN t.t_ref > 0 THEN CAST(c.n_ref AS DOUBLE) / CAST(t.t_ref AS DOUBLE) ELSE 0.0 END
                              + CASE WHEN t.t_cur > 0 THEN CAST(c.n_cur AS DOUBLE) / CAST(t.t_cur AS DOUBLE) ELSE 0.0 END) > 0.0 THEN
                       CAST(floor(
                           (CASE WHEN t.t_ref > 0 THEN CAST(c.n_ref AS DOUBLE) / CAST(t.t_ref AS DOUBLE) ELSE 0.0 END
                            - CASE WHEN t.t_cur > 0 THEN CAST(c.n_cur AS DOUBLE) / CAST(t.t_cur AS DOUBLE) ELSE 0.0 END)
                           * (CASE WHEN t.t_ref > 0 THEN CAST(c.n_ref AS DOUBLE) / CAST(t.t_ref AS DOUBLE) ELSE 0.0 END
                              - CASE WHEN t.t_cur > 0 THEN CAST(c.n_cur AS DOUBLE) / CAST(t.t_cur AS DOUBLE) ELSE 0.0 END)
                           / (CASE WHEN t.t_ref > 0 THEN CAST(c.n_ref AS DOUBLE) / CAST(t.t_ref AS DOUBLE) ELSE 0.0 END
                              + CASE WHEN t.t_cur > 0 THEN CAST(c.n_cur AS DOUBLE) / CAST(t.t_cur AS DOUBLE) ELSE 0.0 END)
                           * 1e12) AS BIGINT)
                   ELSE 0 END AS term
            FROM counts c JOIN totals t USING (event_type)
        )
        SELECT event_type,
               CAST(max(t_ref) AS BIGINT) AS n_ref,
               CAST(max(t_cur) AS BIGINT) AS n_cur,
               CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE) / 1e12 AS chi2
        FROM terms GROUP BY event_type ORDER BY event_type
    """,
    "mm_tile_plan": """
        WITH m AS (
            SELECT doc_id AS media_id,
                   CAST(64 + doc_id % 4 AS INTEGER) AS width,
                   64 AS height
            FROM documents WHERE doc_id % 3 = 0
        ),
        g AS (
            SELECT media_id, width, height,
                   CAST(ceil(CAST(width AS DOUBLE) / 32) AS INTEGER) AS nx,
                   CAST(ceil(CAST(height AS DOUBLE) / 32) AS INTEGER) AS ny
            FROM m
        ),
        t AS (
            SELECT media_id, width, height, ny,
                   unnest(range(0, nx)) AS tx
            FROM g
        ),
        tt AS (
            SELECT media_id, width, height, tx,
                   unnest(range(0, ny)) AS ty
            FROM t
        )
        SELECT media_id, CAST(tx AS INTEGER) AS tx, CAST(ty AS INTEGER) AS ty,
               CAST(tx * 32 AS INTEGER) AS x0, CAST(ty * 32 AS INTEGER) AS y0,
               CAST(least(32, width - tx * 32) AS INTEGER) AS tile_w,
               CAST(least(32, height - ty * 32) AS INTEGER) AS tile_h
        FROM tt ORDER BY media_id, tx, ty
    """,
    "ts_weekly_growth": """
        WITH weekly AS (
            SELECT date_trunc('week', ts) AS week, event_type,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        )
        SELECT week, event_type, n_events, n_users,
               CASE WHEN lag(n_events) OVER (
                        PARTITION BY event_type ORDER BY week) IS NOT NULL
                    THEN CAST(n_events AS DOUBLE)
                         / CAST(lag(n_events) OVER (
                               PARTITION BY event_type ORDER BY week)
                           AS DOUBLE)
               END AS wow_growth
        FROM weekly ORDER BY event_type, week
    """,
    "doc_sentence_stats": """
        WITH segs AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_split_to_array(text, '[.!?]+'),
                       s -> trim(s)), s -> s <> '') AS ss
            FROM documents
        ),
        w AS (
            SELECT doc_id, ss,
                   list_transform(ss, s -> len(string_split(s, ' '))) AS wp
            FROM segs
        )
        SELECT doc_id,
               len(ss) AS n_sentences,
               coalesce(CAST(list_sum(wp) AS BIGINT), 0) AS n_sentence_words,
               CASE WHEN len(ss) > 0
                    THEN CAST(coalesce(CAST(list_sum(wp) AS BIGINT), 0)
                              AS DOUBLE) / len(ss)
                    ELSE 0.0 END AS avg_sentence_words,
               CASE WHEN len(ss) > 0 THEN list_max(wp) ELSE 0 END
                   AS max_sentence_words
        FROM w ORDER BY doc_id
    """,
}


def q_link(spark, sf):
    return linkage.link_corrupted_docs(load_table(spark, sf, "documents"))


def q_decay(spark, sf):
    return events_ops.decayed_user_score(load_table(spark, sf, "events"))


def q_sketch(spark, sf):
    return events_ops.distinct_users_sketch(load_table(spark, sf, "events"))


def q_bigram(spark, sf):
    return text.bigram_lm_score(load_table(spark, sf, "documents"))


def q_sample(spark, sf):
    return curation.sample_k_per_group(load_table(spark, sf, "documents"))


def q_overlap(spark, sf):
    return dedup.source_overlap_matrix(load_table(spark, sf, "documents"))


def q_affinity(spark, sf):
    return text.domain_affinity_score(load_table(spark, sf, "documents"))


def q_rebalance(spark, sf):
    return curation.quality_rebalance_plan(load_table(spark, sf, "documents"))


def q_paths(spark, sf):
    return events_ops.top_user_paths(load_table(spark, sf, "events"))


QUERIES = {
    "link_fuzzy_docs": q_link,
    "ts_decay_score": q_decay,
    "ts_sketch_accuracy": q_sketch,
    "doc_bigram_lm": q_bigram,
    "cur_sample_k_per_group": q_sample,
    "dedup_source_overlap": q_overlap,
    "doc_domain_affinity": q_affinity,
    "cur_quality_rebalance": q_rebalance,
    "ts_top_paths": q_paths,
    "ts_quality_audit": lambda spark, sf: events_ops.data_quality_audit(
        load_table(spark, sf, "events")),
    "ts_churn_labels": lambda spark, sf: events_ops.churn_labels(
        load_table(spark, sf, "events")),
    "ts_mad_outliers": lambda spark, sf: events_ops.mad_outliers(
        load_table(spark, sf, "events")),
    "ts_heavy_hitters": lambda spark, sf: __import__(
        "bytehub_spark.streaming", fromlist=["heavy_hitters_batch"]
    ).heavy_hitters_batch(load_table(spark, sf, "events")),
    "emb_hard_negatives": lambda spark, sf: __import__(
        "bytehub_spark.operators.similarity", fromlist=["hard_negatives"]
    ).hard_negatives(load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4], 5),
    "doc_langid_confusion": lambda spark, sf: text.langid_confusion(
        load_table(spark, sf, "documents")),
    "doc_bigram_xent": lambda spark, sf: text.bigram_cross_entropy(
        load_table(spark, sf, "documents")),
    "ts_value_drift": lambda spark, sf: events_ops.value_drift(
        load_table(spark, sf, "events")),
    "mm_tile_plan": lambda spark, sf: __import__(
        "bytehub_spark.operators.multimodal", fromlist=["tile_image_plan"]
    ).tile_image_plan(__import__(
        "bytehub_spark.operators.multimodal", fromlist=["media_from_documents"]
    ).media_from_documents(load_table(spark, sf, "documents"))),
    "ts_weekly_growth": lambda spark, sf: events_ops.weekly_growth(
        load_table(spark, sf, "events")),
    "doc_sentence_stats": lambda spark, sf: text.sentence_stats(
        load_table(spark, sf, "documents")),
}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("probe_r3")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        spark.catalog.clearCache()
        ddf = con.execute(SQL[name]).df()
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duckdb={len(ddf)}")
            fails.append(name)
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            fails.append(name)
            continue
        a, b = normalize(sdf), normalize(ddf)
        ok = True
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    i = int(np.argmin(eq))
                    print(f"FAIL {name}: {c} row {i}: {av[i]!r} vs {bv[i]!r}"
                          f" (maxdiff {np.nanmax(np.abs(av - bv))})")
                    ok = False
                    break
            elif not a[c].astype(str).equals(b[c].astype(str)):
                neq = a[c].astype(str) != b[c].astype(str)
                i = int(neq.idxmax())
                print(f"FAIL {name}: {c} row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}")
                ok = False
                break
        if ok:
            print(f"ok {name}: {len(sdf)} rows exact-match")
        else:
            fails.append(name)
    print("FAILURES:", fails) if fails else print("ALL MATCH")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
