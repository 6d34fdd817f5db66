"""Skew-mitigation operators.

AQE's skew-join splitting (on by default in session.py) handles skewed
JOINS at runtime; skewed AGGREGATIONS still funnel every row of a hot key
through one task's hash-map before the exchange does its partial-agg
magic — fine for algebraic aggregates (Spark's partial aggregation
already combines map-side), but a straggler for high-cardinality
composites like collect_list/count_distinct. ``salted_agg`` is the
classic remedy: scatter each hot key across ``salt`` sub-keys, aggregate
twice.

Two-stage shape (for decomposable aggregates):
    stage 1: groupBy(keys..., salt) -> partial aggregate  (parallel Σ salt)
    stage 2: groupBy(keys...)       -> merge partials     (tiny)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function for each supported decomposable aggregate
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation immune to key skew.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} (the decomposable set; avg = sum/count client-
    side). The salt column is derived from a hash of the whole row's
    monotonic id surrogate — uniform, deterministic per row position.

    Example::

        salted_agg(events, ["event_type"], {"n": ("value", "count"),
                                            "total": ("value", "sum")})
    """
    for out, (col, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{fn} is not decomposable; supported: {sorted(_MERGE)}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )
    return stage2


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 100_000,
    top_n: int = 5,
) -> DataFrame:
    """Join-key skew profiler — the "should I salt this join" prepass:
    the ``top_n`` heaviest values of ``key_col`` with their row counts,
    corpus share, and the salt factor that would cap each key's
    partition at ``target_rows_per_task`` rows, plus table-level skew
    stats. Run it on the join key BEFORE a big shuffle join; a
    salt_factor > 1 on the head keys is the signal to route that join
    through ``salted_agg``-style two-stage plans or AQE skew handling.

    NULL keys are excluded (they never match an equi-join anyway).
    Plan shape: ONE map-side-combined groupBy on the key; the top-n is
    a per-partition TakeOrdered merge of ``top_n`` rows (never a global
    sort); table scalars ride in on a 1-row broadcast. All arithmetic
    integer — share_ppm is exact BIGINT div, skew_ppm (max/mean in ppm)
    the exact two-term divmod identity, salt_factor a ceil-div.
    """
    if top_n <= 0 or target_rows_per_task <= 0:
        raise ValueError(
            "key_skew_profile: top_n and target_rows_per_task must be "
            "positive"
        )
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = counts.agg(
        F.sum("n").cast("long").alias("n_rows_total"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_rows"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(
        int(top_n)
    )
    t = int(target_rows_per_task)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.lit(key_col).alias("key_col"),
            "key",
            F.col("n").alias("n_rows"),
            F.expr("n * 1000000 div n_rows_total").cast("long").alias(
                "share_ppm"
            ),
            F.expr(f"(n + {t} - 1) div {t}").cast("long").alias(
                "salt_factor"
            ),
            "n_rows_total",
            "n_keys",
            "max_key_rows",
            F.expr(
                "(max_key_rows * 1000000 div n_rows_total) * n_keys"
                " + ((max_key_rows * 1000000 % n_rows_total) * n_keys)"
                " div n_rows_total"
            ).cast("long").alias("skew_ppm"),
        )
    )


def salted_join_agg(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    group_col: str,
    value_col: str,
    row_col: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-immune fact→dim equi-join + rollup, executed the SALTED way:
    the fact side gains a deterministic content-keyed salt
    (xxhash64 of ``row_col`` — a PER-ROW id, never the join key itself:
    hashing the key would send every row of the hot key to one salt and
    change nothing — mod ``salt``), the dim side is exploded
    ×``salt`` (one replica per salt value), and the join runs on
    (key, salt) — so a hot key's rows scatter over ``salt`` shuffle
    partitions instead of funneling one task. This is the EXECUTION
    half of key_skew_profile: the profiler's salt_factor output is
    literally this function's ``salt`` argument. The result is provably
    identical to the unsalted join (each fact row meets exactly one
    replica of each matching dim row) — which is what the oracle gate
    checks, since the oracle SQL is the PLAIN join.

    The join is pinned to sort-merge (`hint("merge")`): at 100 TB the
    interesting dims exceed the broadcast threshold, and a broadcast
    join needs no salting in the first place (no shuffle of the fact
    side) — the hint keeps the demonstrated plan the one the technique
    is for, rather than letting a toy-scale dim collapse it to
    broadcast. AQE's skew-join split handles sort-merge skew
    reactively; explicit salting is the proactive form that also covers
    the stragglers AQE cannot re-split (single giant key inside one
    partition after its split floor).

    Values aggregate as floor(value·1e6) BIGINT µ-units (the repo-wide
    no-order-sensitive-double-sum rule), NULL-valued rows contribute
    count but 0 µ-units, and fact rows with NULL keys never match in
    either form (inner equi-join semantics).
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(row_col)), F.lit(int(salt))).cast("int"),
    )
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(int(salt))])),
    )
    mu = F.expr(
        f"CAST(floor(CAST({value_col} AS DOUBLE) * 1000000) AS BIGINT)"
    )
    joined = salted_fact.join(
        replicated_dim.hint("merge"),
        (F.col(fact_key) == F.col(dim_key))
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
    )
    return (
        joined.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum(mu), F.lit(0)).cast("long").alias("value_u"),
        )
        .orderBy(group_col)
    )
