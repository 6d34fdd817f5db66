# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_band_join10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m  (/tmp/sf100_stream)
"""band_join >=100x datapoint (VERDICT r07 item 4 / r08 item 3):

1. plan  — asof.band_plan over 10M events picks the widest ε whose
   EXACT candidate volume fits budget, BEFORE any quadratic work.
2. agree — the decision table's cand_pairs is replayed as the literal
   pre-filter fan-out equi-join COUNT at two ε's: plan == actual must
   hold EXACTLY (it is the same arithmetic the cluster pays).
3. join  — the real band_join runs at the recommended ε (materialized
   count), plus the rejected next-wider ε's replay count to show what
   the planner saved.
4. stream — BandPlanMonitor over the same 10M rows in 10 x 1M files;
   result() must equal the batch plan row-for-row (shared
   band_stats_from_counts), state bounded by Σ_ε occupied buckets.

The raw corpus values are 2-decimal (ties of ~1200 rows), which
degenerates a band join into an equality join — so the harness adds a
deterministic sub-cent jitter derived from event_id, making the value
axis near-continuous the way a real measurement column is. Values
stay reproducible run-to-run (no RNG)."""
import os
import shutil
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytehub_spark.operators import asof
from bytehub_spark.session import get_spark

SRC = "/tmp/sf100_stream/events.parquet"
WORK = "/tmp/band10m_work"
EPS_GRID = (10, 100, 1_000)
BUDGET = 200_000_000

spark = get_spark("band_join10m")

ev = (
    spark.read.parquet(SRC)
    .select(
        "event_id",
        "event_type",
        (
            F.col("value")
            + (F.col("event_id") % 9973).cast("double") / 997300.0
        ).alias("value"),
    )
)


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


s0 = steal()

# --- 1. the plan
t0 = time.time()
plan = asof.band_plan(ev, ["event_type"], "value", EPS_GRID, BUDGET).toPandas()
t_plan = time.time() - t0
print(plan.to_string(), flush=True)
recommended = plan.loc[plan.recommended, "eps_u"]
if recommended.empty:
    raise SystemExit(
        f"no eps in {EPS_GRID} fits budget {BUDGET:,} "
        f"(smallest candidate volume {int(plan.cand_pairs.min()):,}) — "
        "shrink the grid or raise the budget; that verdict IS the "
        "planner working"
    )
rec = int(recommended.iloc[0])
print(f"plan: {len(EPS_GRID)} eps over 10M rows in {t_plan:.1f}s; "
      f"recommended eps_u={rec}", flush=True)


# --- 2. plan == literal pre-filter equi-join volume, exactly
def prefilter_count(eps: int) -> int:
    v_u = F.expr("CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)")
    q = (
        ev.select("event_type", v_u.alias("v_u"))
        .where(F.col("v_u").isNotNull())
        .withColumn(
            "bucket",
            F.expr(
                f"CAST((v_u div {eps}) - (CASE WHEN v_u % {eps} < 0 "
                f"THEN 1 ELSE 0 END) AS BIGINT)"
            ),
        )
    )
    l = q.withColumn(
        "bucket",
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ),
    )
    return l.join(
        q.withColumnRenamed("v_u", "v_u_b"), ["event_type", "bucket"]
    ).count()


by_eps = plan.set_index("eps_u")
for eps in [EPS_GRID[0], rec]:
    t0 = time.time()
    actual = prefilter_count(eps)
    dt = time.time() - t0
    predicted = int(by_eps.loc[eps, "cand_pairs"])
    print(f"agreement eps_u={eps}: plan={predicted:,} actual={actual:,} "
          f"EXACT={predicted == actual} [{dt:.1f}s]", flush=True)
    assert predicted == actual

# --- 3. the real join at the recommendation (and the avoided cost)
t0 = time.time()
n_out = asof.band_join(
    ev, ev, ["event_type"], "value", rec, ["event_id"], ["event_id"]
).count()
t_join = time.time() - t0
rej = [int(e) for e in EPS_GRID if int(by_eps.loc[e, "cand_pairs"]) > BUDGET]
print(f"band_join @ recommended eps_u={rec}: {n_out:,} matched pairs in "
      f"{t_join:.1f}s (candidate volume "
      f"{int(by_eps.loc[rec, 'cand_pairs']):,})", flush=True)
if rej:
    e = rej[0]
    print(f"planner rejected eps_u={e}: predicted "
          f"{int(by_eps.loc[e, 'cand_pairs']):,} candidate pairs "
          f"({int(by_eps.loc[e, 'cand_pairs']) / BUDGET:.0f}x budget) "
          f"WITHOUT running it", flush=True)

# --- 4. BandPlanMonitor over the same rows as a 10-file stream
from bytehub_spark.streaming import stream_band_plan

shutil.rmtree(WORK, ignore_errors=True)
src_dir = os.path.join(WORK, "ev_src")
os.makedirs(src_dir)
n_files = 10
for i in range(n_files):
    (
        ev.where(F.col("event_id") % n_files == i)
        .write.mode("overwrite")
        .parquet(os.path.join(src_dir, f"slice={i}"))
    )
schema = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 4)
    .parquet(os.path.join(src_dir, "slice=*"))
)
t0 = time.time()
q, mon = stream_band_plan(
    stream, os.path.join(WORK, "ck"), ["event_type"], "value",
    EPS_GRID, BUDGET,
)
q.awaitTermination(2400)
res = mon.result().toPandas()
dt = time.time() - t0
state_rows = mon.state.count()
print(f"BandPlanMonitor: 10,000,000 events in {dt:.1f}s = "
      f"{10_000_000 / dt:,.0f} ev/s; state rows={state_rows} "
      f"(= sum of occupied buckets per eps: "
      f"{int(plan['n_buckets'].sum())})", flush=True)
cols = list(plan.columns)
b = plan[cols].sort_values("eps_u").reset_index(drop=True)
g = res[cols].sort_values("eps_u").reset_index(drop=True)
print("stream==batch:", b.equals(g), flush=True)
s1 = steal()
print(f"steal ticks over run: {s1 - s0}", flush=True)
shutil.rmtree(WORK, ignore_errors=True)
