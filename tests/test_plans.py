"""Plan-quality assertions: the things that make this engine scale must be
visible in the physical plan, not just hoped for."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from bytehub_spark.operators import tpch
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _save_daily(fs, name, periods=60):
    fs.create_feature(name)
    idx = pd.date_range("2021-01-01", periods=periods, freq="D")
    fs.save_dataframe(
        pd.DataFrame({"time": idx, "value": np.arange(float(periods))}), name
    )


def test_read_path_pushdown_and_partition_pruning(fs):
    """Ranged loads must prune Hive partitions AND push time filters to
    parquet row groups (SURVEY §4: the reference's hand-rolled pushdown,
    free from Catalyst here — but only because storage.scan derives the
    partition predicates)."""
    _save_daily(fs, "test/plan1")
    df = fs.load_dataframe("test/plan1", from_date="2021-02-01", to_date="2021-02-10")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "partition" in plan.split("PartitionFilters", 1)[1][:200]
    assert "GreaterThanOrEqual(time" in plan
    assert "LessThanOrEqual(time" in plan


def test_read_path_column_pruning(fs):
    """The scan must read only the envelope columns, not partition remnants."""
    _save_daily(fs, "test/plan2")
    df = fs.load_dataframe("test/plan2")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "time:timestamp" in read_schema and "value" in read_schema


def test_broadcast_joins_in_tpch(spark):
    """Dimension joins must go broadcast, not sort-merge shuffle."""
    q5 = tpch.q5_local_supplier_volume(
        *[load_table(spark, SF, t)
          for t in ("region", "nation", "customer", "supplier", "orders", "lineitem")]
    )
    plan = _plan(q5)
    assert "BroadcastHashJoin" in plan
    # the only shuffle joins allowed are on the fact-fact orderkey axis
    assert plan.count("SortMergeJoin") <= 1


def test_lineitem_filter_pushdown(spark):
    # pushdown is a property of the FILE scan. cache_small=False alone is
    # not enough: Spark's CacheManager substitutes a cached InMemoryRelation
    # into ANY matching subplan, so drop caches for this assertion.
    from bytehub_spark.sources.tables import _cache
    spark.catalog.clearCache(); _cache.clear()
    q6 = tpch.q6_forecast_revenue(load_table(spark, SF, "lineitem", cache_small=False))
    plan = _plan(q6)
    pushed = plan.split("PushedFilters:", 1)[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed


def test_whole_stage_codegen_active(spark):
    """Hot-path expressions (text stats) stay JVM-side in codegen spans."""
    from bytehub_spark.operators import text

    stats = text.text_stats(load_table(spark, SF, "documents"))
    stats.collect()  # AQE: codegen spans appear only in the executed final plan
    plan = _plan(stats)
    assert "WholeStageCodegen" in plan or "isFinalPlan=true" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in the plan
    assert "Project" in plan and "FileScan parquet" in plan  # pure JVM pipeline


def test_new_tpch_dims_broadcast(spark):
    """Q9/Q16/Q19: every dimension side must broadcast — a sort-merge join
    against part/supplier/nation at 100 TB fact scale would shuffle the
    fact table once per dim."""
    t = lambda n: load_table(spark, SF, n)
    for df, dims in [
        (tpch.q9_product_profit(t("part"), t("supplier"), t("lineitem"),
                                t("orders"), t("nation")), 3),
        (tpch.q16_parts_supplier_relationship(t("part"), t("supplier"),
                                              t("lineitem")), 2),
        (tpch.q19_disjunctive_predicates(t("part"), t("lineitem")), 1),
    ]:
        plan = _plan(df)
        assert plan.count("BroadcastHashJoin") >= dims, plan[:1500]


def test_q15_revenue_view_not_recomputed(spark):
    """The quarterly revenue agg feeds both the global max and the
    join-back; the plan must reuse one exchange, not rescan lineitem."""
    q15 = tpch.q15_top_supplier(
        load_table(spark, SF, "supplier"), load_table(spark, SF, "lineitem")
    )
    plan = _plan(q15)
    # one aggregation subtree is reused (ReusedExchange/TableCacheQueryStage)
    # OR lineitem appears in at most two scans (agg + join-back sides)
    assert (
        "ReusedExchange" in plan
        or plan.count("lineitem.parquet") <= 2
        or plan.count("InMemoryTableScan") >= 2
    )


def test_q21_self_join_single_shuffle_axis(spark):
    """The EXISTS/NOT-EXISTS double correlation is one aggregated self-join:
    both sides partition on l_orderkey — no extra shuffle axes beyond the
    orderkey exchanges and the final tiny s_name agg."""
    t = lambda n: load_table(spark, SF, n)
    q21 = tpch.q21_waiting_suppliers(t("supplier"), t("lineitem"), t("orders"),
                                     t("nation"))
    plan = _plan(q21)
    import re
    axes = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert axes <= {"l_orderkey", "l_suppkey", "s_name"}, axes


def test_new_ops_plan_shapes(spark):
    """Round-2 operators keep their claimed scale shapes: partitioned
    windows only, bounded exchange counts, no cartesian products."""
    from bytehub_spark import plans
    from bytehub_spark.operators import curation, events_ops, similarity, text

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    ev = load_table(spark, SF, "events")

    # cap_per_group: the row_number window partitions by the group key
    assert not plans.global_windows(curation.cap_per_group(docs))

    # quality_rules: zero shuffles before the presentation sort
    p = _plan(text.quality_rules(docs))
    assert p.count("Exchange") <= 1, p  # only the final orderBy range part.

    # dim_stats: one dim-keyed aggregation shuffle + presentation sort
    p = _plan(similarity.dim_stats(emb))
    assert p.count("Exchange") <= 2, p
    assert "CartesianProduct" not in p

    # retention_cohorts: no cartesian, no global window
    r = events_ops.retention_cohorts(ev)
    p = _plan(r)
    assert "CartesianProduct" not in p
    assert not plans.global_windows(r)

    # span_dedup_stats: count table joined on the hash key, never
    # broadcast-nested-loop / cartesian
    p = _plan(text.span_dedup_stats(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    # temperature_mix_plan: the only broadcast is the 1-row total
    p = _plan(curation.temperature_mix_plan(docs))
    assert "CartesianProduct" not in p


def test_late_round2_ops_plan_shapes(spark):
    """OHLC/gap/level-shift/containment keep their claimed shapes:
    partitioned windows only, no cartesian products."""
    from bytehub_spark import plans
    from bytehub_spark.operators import dedup, events_ops

    ev = load_table(spark, SF, "events")
    docs = load_table(spark, SF, "documents")

    for df in (
        events_ops.ohlc_bars(ev),
        events_ops.gap_report(ev),
        events_ops.level_shifts(ev),
        events_ops.first_touch_attribution(ev),
    ):
        p = _plan(df)
        assert "CartesianProduct" not in p
        assert not plans.global_windows(df)

    p = _plan(dedup.containment_pairs(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_dedup_latest_group_limit_pushdown(spark):
    """ts_dedup_latest (the r02 bench-regression suspect): the rank<=1
    filter must push a PARTIAL WindowGroupLimit below the exchange (map-
    side top-1 per key), leaving exactly one shuffle — and the events NTZ
    cast must stay inside the cached relation, not re-evaluate per query."""
    from bytehub_spark.operators import events_ops

    ev = load_table(spark, SF, "events")
    p = _plan(events_ops.dedup_latest_per_key(ev))
    assert p.count("WindowGroupLimit") >= 2, p  # Partial (map-side) + Final
    assert p.count("Exchange") == 1, p
    # cast evaluated at cache population: the query-side plan reads the
    # InMemoryRelation, with no Project between it and the first sort
    assert "InMemoryTableScan" in p


def test_banded_cosine_lsh_plan_shapes(spark):
    """Banded cosine LSH stays a bucket equi-join: no cartesian products,
    no broadcast nested loops, and the pair self-join carries slim id/
    bucket rows (vectors joined back only after DISTINCT)."""
    from bytehub_spark.operators import dedup, similarity

    emb = load_table(spark, SF, "embeddings")
    p = _plan(dedup.embedding_cosine_dups(emb, 0.4, n_planes=8))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    p2 = _plan(similarity.lsh_cosine_topk(emb, [0, 1, 2], 5))
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoop" not in p2


def test_round3c_ops_plan_shapes(spark):
    """margin_pairs never materializes the |A|x|B| matrix in the plan
    (no cartesian; broadcast-side joins only) and epoch_shuffle is a
    JVM-side keyed window with no Python eval and no global window."""
    from bytehub_spark import plans
    from bytehub_spark.operators import curation, similarity

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")

    mp = similarity.margin_pairs(emb, threshold_u=0)
    p = _plan(mp)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert not plans.global_windows(mp)

    sh = curation.epoch_shuffle(docs)
    p = _plan(sh)
    assert not plans.global_windows(sh)
    # order key is pure JVM arithmetic: no Python evaluation anywhere
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_round3c_graph_funnel_plan_shapes(spark):
    """textrank: keyed windows only, vocab-bounded joins (no cartesian);
    funnel: user-keyed aggs, no cartesian beyond the 1-row ratio join;
    code_detect: pure map stage — at most the presentation sort."""
    from bytehub_spark import plans
    from bytehub_spark.operators import events_ops, text

    docs = load_table(spark, SF, "documents")
    ev = load_table(spark, SF, "events")

    tr = text.textrank_keywords(docs)
    p = _plan(tr)
    assert "CartesianProduct" not in p
    assert not plans.global_windows(tr)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    fu = events_ops.funnel(ev)
    p = _plan(fu)
    assert "CartesianProduct" not in p
    assert not plans.global_windows(fu)

    p = _plan(text.code_detect(docs))
    assert p.count("Exchange") <= 1, p  # only the final orderBy range part


def test_round3c_attribution_diff_bpe_plan_shapes(spark):
    """attribution: user-keyed join, no cartesian; snapshot_diff: one
    co-partitioned full outer join; bpe_train: argmax is TakeOrdered,
    never a global Sort over the pair table."""
    from bytehub_spark.operators import curation, events_ops, text

    ev = load_table(spark, SF, "events")
    docs = load_table(spark, SF, "documents")

    p = _plan(events_ops.linear_attribution(ev))
    assert "CartesianProduct" not in p

    d = curation.snapshot_diff(
        ev.select("event_id", "user_id", "event_type"),
        ev.select("event_id", "user_id", "event_type"),
        ["event_id"],
        ["user_id", "event_type"],
    )
    p = _plan(d)
    assert "CartesianProduct" not in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1

    p = _plan(text.bpe_train(docs, n_merges=2))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_round3d_ops_plan_shapes(spark):
    """classifier: single doc-keyed agg (3 exchanges total incl. the
    flag-join and output sort), no Python stages; blocklist: membership
    is an inline exists() — no extra join beyond the flag-join; shard
    manifest: no cartesian, no Python; ahash band join covered in
    test_round3d. bpe_encode keeps the TakeOrdered argmax and gains a
    1-row broadcast LEFT join (the empty-round passthrough) — never a
    cartesian product."""
    from bytehub_spark.operators import multimodal, text

    docs = load_table(spark, SF, "documents")

    p = _plan(text.quality_classifier(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 3
    assert "CartesianProduct" not in p

    p = _plan(text.url_blocklist_flags(docs))
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") \
        + p.count("BroadcastHashJoin") <= 1

    p = _plan(
        multimodal.shard_manifest(
            multimodal.media_from_documents(docs), docs
        )
    )
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p

    p = _plan(text.bpe_encode(docs, n_merges=2))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_hll_overlap_matrix_plan_shape(spark):
    """The matrix's ONLY nested-loop is the distinct-groups pair build
    (a '<' self-join over a frame bounded by the GROUP CARDINALITY —
    sketch-side, never data-side); the register fan-outs and the
    estimate attaches are hash/broadcast equi-joins, and there is no
    Python anywhere. The raw data is scanned once: exactly one
    events-parquet scan node in the whole plan."""
    from bytehub_spark.operators import sketches

    ev = load_table(spark, SF, "events")
    mat = sketches.hll_overlap_matrix(ev, "user_id", "event_type", 64)
    p = _plan(mat)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the pair build is the only nested-loop shape; its subtree appears
    # once per register fan-out branch (DataFrame reuse gets no CSE),
    # both instances reading the persisted ≤ groups-row register cache
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in p
    # single corpus scan: every register reuse (estimates + both
    # fan-outs + the pair frame's distinct) reads the persisted
    # register table, not the parquet (the plan string still PRINTS
    # the cached frame's lineage per reference, so counting scan nodes
    # is not meaningful — the InMemoryRelation is the contract)
    assert "InMemoryRelation" in p
