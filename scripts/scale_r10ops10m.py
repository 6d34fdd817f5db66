# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_r10ops10m.py
# Corpora: /tmp/sf100_stream (10M events), /tmp/sf100_docs (500k docs)
"""Round-10 operator scale datapoints:

1. salted_join_agg A/B/C at 10M fact rows with PLANTED skew (30% of
   the fact funneled onto one key): (A) plain sort-merge with AQE
   skew-join OFF — the straggler regime, (B) plain sort-merge with AQE
   skew-join ON — the reactive fix, (C) salted_join_agg — the
   proactive fix. All three must agree row-for-row (the gate's
   salted==plain contract, re-proved at 10M); walls tell the story.
2. scd2_history + intervals_merge at 10M events (per-user windows —
   state bounded by the heaviest user, which the skew planting makes
   honest).
3. ccnet_bucket + kn_bigram_top at 500k docs (corpus bigram LM joins).
"""
import time

from pyspark.sql import functions as F

from bytehub_spark.operators import curation, events_ops, skew, text
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark

spark = get_spark("r10ops10m")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


s0 = steal()
t_all = time.time()

# the operator contract is LTZ timestamps (sources.load_table
# normalizes NTZ parquet the same way; session TZ is UTC)
spark.conf.set("spark.sql.session.timeZone", "UTC")
ev = spark.read.parquet("/tmp/sf100_stream/events.parquet").withColumn(
    "ts", F.col("ts").cast("timestamp")
)
cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")

print(f"warm fact: {ev.count():,} rows")  # page-cache warm before any leg

mu = "CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)"


def planted_fact():
    """REBUILT per leg: reusing one DataFrame lets later jobs skip the
    earlier legs' shuffle map stages and read their files (first run of
    this harness timed leg B at 0.1s that way — stage reuse, not AQE)."""
    return spark.read.parquet("/tmp/sf100_stream/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 3, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )


def plain_join(fact):
    return (
        fact.join(cust.hint("merge"), fact.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.expr(mu)), F.lit(0))
            .cast("long")
            .alias("value_u"),
        )
        .orderBy("c_mktsegment")
    )


# --- 1A. plain sort-merge, AQE skew-join OFF (the straggler)
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
t0 = time.time()
rows_a = plain_join(planted_fact()).collect()
wall_a = time.time() - t0
print(f"A plain merge, AQE-skew OFF: {wall_a:.1f}s")

# --- 1B. plain sort-merge, AQE skew-join ON (reactive split)
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
t0 = time.time()
rows_b = plain_join(planted_fact()).collect()
wall_b = time.time() - t0
print(f"B plain merge, AQE-skew ON:  {wall_b:.1f}s agree={rows_a == rows_b}")

# --- 1C. salted (proactive), AQE skew-join OFF so the salt does the work
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
t0 = time.time()
rows_c = skew.salted_join_agg(
    planted_fact(), cust,
    "user_id", "c_custkey", "c_mktsegment", "value", "event_id",
    salt=32,
).collect()
wall_c = time.time() - t0
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
print(f"C salted(32), AQE-skew OFF:  {wall_c:.1f}s agree={rows_a == rows_c}")
hot = [r for r in rows_a if r.n_rows >= 3_000_000]
print(f"   hot-segment rows: {[(r.c_mktsegment, r.n_rows) for r in hot]}")

# --- 2. SCD2 + intervals at 10M
t0 = time.time()
n_scd = events_ops.scd2_history(ev).count()
print(f"scd2_history 10M: {n_scd:,} versions [{time.time() - t0:.1f}s]")
t0 = time.time()
n_iv = events_ops.intervals_merge(ev).count()
print(f"intervals_merge 10M: {n_iv:,} islands [{time.time() - t0:.1f}s]")

# --- 3. ccnet + KN at 500k docs
docs = spark.read.parquet("/tmp/sf100_docs")
t0 = time.time()
cc = curation.ccnet_bucket(docs).collect()
w_cc = time.time() - t0
release_scratch()
t0 = time.time()
kn = text.kn_bigram_top(docs, k=20).collect()
w_kn = time.time() - t0
release_scratch()
print(f"ccnet_bucket 500k: {len(cc)} rows [{w_cc:.1f}s]; "
      f"kn_bigram_top 500k: {len(kn)} rows [{w_kn:.1f}s]")
print(f"TOTAL {time.time() - t_all:.1f}s steal_delta {steal() - s0}")
