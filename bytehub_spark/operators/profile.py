"""Table profiling + declarative data-quality gates — the pre-flight
check a training-data pipeline runs before committing a corpus snapshot
to an expensive job (the Deequ/Great-Expectations capability re-expressed
Spark-first; the reference has no profiling surface — this extends its
catalog/constraint checks, _model.py-adjacent, to data-plane content).

Both operators are single-pass: every metric/rule compiles to one
aggregate expression over ONE full-table aggregation (map-side combined,
no per-column scans), and the long-format output is an explode of the
1-row aggregate — so cost at 100 TB is one scan regardless of how many
columns/rules are profiled. Exact n_distinct uses Spark's multi-distinct
Expand (one logical pass, ~#distinct-cols shuffle width); pass
``approx=True`` to swap in approx_count_distinct (HLL) when exact
cardinalities aren't worth the shuffle — the oracle gates the exact
default.

Cross-engine exactness notes: metrics are counts/lengths/integral
min-max only (no float-to-string casts, no collation-dependent string
min/max); the pattern rule is SQL LIKE (identical semantics in Spark
and DuckDB), never regex (engine dialects differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile in input-schema order: row/null/distinct
    counts for every column, value min/max for integral columns,
    length min/max for string columns (NULL where not applicable).
    One aggregation pass; output is #columns rows.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
    ]
    for c in cols:
        if c not in fields:
            raise ValueError(f"table_profile: unknown column {c!r}")
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs: list[Column] = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        dt = fields[c]
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(nd(F.col(c)).cast("long").alias(f"__d_{i}"))
        if isinstance(dt, _INTEGRAL):
            aggs.append(F.min(F.col(c)).cast("long").alias(f"__lo_{i}"))
            aggs.append(F.max(F.col(c)).cast("long").alias(f"__hi_{i}"))
        elif isinstance(dt, T.StringType):
            aggs.append(
                F.min(F.length(F.col(c))).cast("long").alias(f"__lo_{i}")
            )
            aggs.append(
                F.max(F.length(F.col(c))).cast("long").alias(f"__hi_{i}")
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__lo_{i}"))
            aggs.append(F.lit(None).cast("long").alias(f"__hi_{i}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(i).cast("int").alias("col_idx"),
            F.lit(c).alias("column"),
            F.lit(fields[c].simpleString()).alias("dtype"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{i}")).cast("long").alias("n_null"),
            F.col(f"__d_{i}").alias("n_distinct"),
            F.col(f"__lo_{i}").alias("min_v"),
            F.col(f"__hi_{i}").alias("max_v"),
        )
        for i, c in enumerate(cols)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("col_idx")
    )


def check_constraints(
    df: DataFrame, rules: list[tuple]
) -> DataFrame:
    """Declarative constraint gate. ``rules`` is a list of tuples:

    - ``(rule_id, "not_null", column)`` — NULLs are violations
    - ``(rule_id, "unique", column)`` — violations = non-null rows
      beyond the first per value (count(col) − countDistinct(col))
    - ``(rule_id, "range", column, lo, hi)`` — non-null values outside
      [lo, hi] (inclusive); NULLs are not range violations (pair with
      not_null to forbid them)
    - ``(rule_id, "like", column, pattern)`` — non-null values NOT
      matching the SQL LIKE pattern

    Output: one row per rule (rule_id, kind, column, n_violations,
    passed), computed in a single aggregation pass.
    """
    if not rules:
        # zero aggregates would reach df.agg() / F.array() with no
        # elements and die with an obscure engine error (ADVICE r07);
        # match referential_integrity([])'s explicit contract
        raise ValueError("check_constraints: rules must be non-empty")
    aggs: list[Column] = []
    metas: list[tuple[int, str, str]] = []
    for k, rule in enumerate(rules):
        rid, kind, col = int(rule[0]), str(rule[1]), str(rule[2])
        if kind == "unique":
            expr = F.count(F.col(col)) - F.countDistinct(F.col(col))
        else:
            expr = simple_rule_expr(rule)
        aggs.append(F.coalesce(expr, F.lit(0)).cast("long").alias(f"__v_{k}"))
        metas.append((rid, kind, col))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(rid).cast("int").alias("rule_id"),
            F.lit(kind).alias("kind"),
            F.lit(col).alias("column"),
            F.col(f"__v_{k}").alias("n_violations"),
            (F.col(f"__v_{k}") == 0).alias("passed"),
        )
        for k, (rid, kind, col) in enumerate(metas)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("rule_id")
    )


def simple_rule_expr(rule: tuple) -> Column:
    """Aggregate violation-count expression for one ADDITIVE rule
    (not_null / range / like) — the shared compilation used by both the
    batch ``check_constraints`` and ``streaming.QualityGateMonitor``,
    so the two can never disagree on rule semantics. ``unique`` is NOT
    additive (cross-batch distinctness) and is handled by each caller's
    own state; passing it here raises."""
    kind, col = str(rule[1]), str(rule[2])
    c = F.col(col)
    if kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if kind == "range":
        lo, hi = rule[3], rule[4]
        return F.sum(
            (c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long")
        )
    if kind == "like":
        # Column API, not f-string SQL: handles any column name the
        # other rule kinds handle, and the pattern is data, never
        # spliced into SQL (code-review r07; verified identical
        # semantics incl. quote and backslash patterns)
        pat = str(rule[3])
        return F.sum((c.isNotNull() & ~c.like(pat)).cast("long"))
    raise ValueError(f"unknown (or non-additive) rule kind {kind!r}")


def schema_diff(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """Schema-evolution check between two snapshots (driver-side only —
    no data scan): one row per column name in either schema, with its
    status (``same`` / ``added`` / ``dropped`` / ``type_changed``) and
    both dtypes (NULL on the missing side). The pre-append guard a
    pipeline runs before unioning a new day's data into a table — the
    data-plane extension of the catalog's save-time schema guard
    (storage.py append validation).

    Output is built with createDataFrame from the two schemas (a
    bounded, columns-sized frame) so it composes with the rest of the
    gate family; order = first-seen column order (A's order, then
    B-only columns).
    """
    from pyspark.sql.session import SparkSession

    spark = df_a.sparkSession or SparkSession.getActiveSession()
    a = {f.name: f.dataType.simpleString() for f in df_a.schema.fields}
    b = {f.name: f.dataType.simpleString() for f in df_b.schema.fields}
    order = list(a) + [c for c in b if c not in a]
    rows = []
    for i, c in enumerate(order):
        ta, tb = a.get(c), b.get(c)
        if ta is None:
            status = "added"
        elif tb is None:
            status = "dropped"
        elif ta != tb:
            status = "type_changed"
        else:
            status = "same"
        rows.append((i, c, status, ta, tb))
    return spark.createDataFrame(
        rows,
        "col_idx int, column string, status string, "
        "dtype_a string, dtype_b string",
    )


def profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Snapshot-over-snapshot profile drift — the daily corpus-health
    diff: joins ``table_profile`` of two snapshots on column (columns
    present in BOTH, A's schema order) and emits the per-column deltas
    a pipeline alerts on: row-count delta, null-RATE delta in ppm
    (rate, not count — snapshots differ in size), distinct-count
    delta, and min/max shifts. Two single-pass profiles + a
    columns-sized join; everything integer (ppm rates via BIGINT div),
    exactly replayed by the DuckDB oracle.
    """
    if columns is None:
        cols_b = {f.name for f in df_b.schema.fields}
        columns = [
            f.name for f in df_a.schema.fields if f.name in cols_b
        ]
    pa_ = table_profile(df_a, columns, approx).select(
        "col_idx", "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_null").alias("n_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_v").alias("min_a"),
        F.col("max_v").alias("max_a"),
    )
    pb = table_profile(df_b, columns, approx).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_null").alias("n_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_v").alias("min_b"),
        F.col("max_v").alias("max_b"),
    )
    null_rate = (
        "n_null_{s} * 1000000 div greatest(n_rows_{s}, CAST(1 AS BIGINT))"
    )
    return (
        pa_.join(pb, "column")
        .select(
            "col_idx",
            "column",
            (F.col("n_rows_b") - F.col("n_rows_a"))
            .cast("long")
            .alias("rows_delta"),
            (
                F.expr(null_rate.format(s="b"))
                - F.expr(null_rate.format(s="a"))
            )
            .cast("long")
            .alias("null_rate_delta_ppm"),
            (F.col("n_distinct_b") - F.col("n_distinct_a"))
            .cast("long")
            .alias("distinct_delta"),
            (F.col("min_b") - F.col("min_a")).cast("long").alias("min_shift"),
            (F.col("max_b") - F.col("max_a")).cast("long").alias("max_shift"),
        )
        .orderBy("col_idx")
    )


def referential_integrity(
    checks: list[tuple],
) -> DataFrame:
    """Cross-table foreign-key gate — the constraint the single-table
    ``check_constraints`` can't express: for each check
    ``(check_id, child_df, child_col, parent_df, parent_col)``, count
    child rows (NULLs excluded — pair with a not_null rule to forbid
    them) whose key has no match in the parent. One LAZY aggregation
    per check — a left join against the DISTINCT parent keys computes
    n_child and n_orphans in a single pass over the child (the same
    shape as the DuckDB oracle), and the checks union into one plan so
    the plan-fingerprint gate sees the real joins (code-review r07:
    the first version ran two eager jobs per check and returned a
    driver-built LocalRelation the plan audit couldn't see into). At
    scale the distinct parent key set is dimension-sized and
    broadcastable; the join is the same anti-join shape the engine's
    GC (core.py J4) runs at corpus size.

    Output: one row per check (check_id, child_col, parent_col,
    n_child, n_orphans, passed), ordered by check_id.
    """
    out: DataFrame | None = None
    for chk in checks:
        cid, child, ccol, parent, pcol = (
            int(chk[0]), chk[1], str(chk[2]), chk[3], str(chk[4])
        )
        keyed = child.where(F.col(ccol).isNotNull()).select(
            F.col(ccol).alias("__k")
        )
        pk = (
            parent.select(F.col(pcol).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        agg = (
            keyed.join(pk, "__k", "left")
            .agg(
                F.count("*").cast("long").alias("n_child"),
                F.coalesce(
                    F.sum(F.col("__hit").isNull().cast("long")), F.lit(0)
                )
                .cast("long")
                .alias("n_orphans"),
            )
            .select(
                F.lit(cid).cast("int").alias("check_id"),
                F.lit(ccol).alias("child_col"),
                F.lit(pcol).alias("parent_col"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("passed"),
            )
        )
        out = agg if out is None else out.unionByName(agg)
    if out is None:
        raise ValueError("referential_integrity: empty checks list")
    return out.orderBy("check_id")
