# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_r12ops10m.py
# Corpora: python scripts/gen_scale_corpora.py ev10m    (/tmp/sf100_stream)
#          python scripts/gen_scale_corpora.py docs10m  (/tmp/sf100_docs10m)
"""Round-12 operator datapoints at 10M (the per-operator scale-proof
convention every new operator carries):

- hll_estimate_corrected over 10M events per event_type: the corrected
  estimator at REAL cardinality (~1,500 users → the raw/harmonic
  branch), plus the register scan cost — the grouped groupBy is capped
  at groups·m rows per partition by map-side combine, same as
  hll_registers' law.
- hll_overlap over two 10M-event slices (event_id % 2 / % 3 — every
  6th event in both): three corrected estimates + inclusion-exclusion
  from two register scans; union is free (max-merge of ≤ m-row
  register files), no rescan.
- qgram_plan on the 10M-doc corpus (2,000-copy islands): the pricer's
  DECIMAL-range proof — the direct join volume here is ~4e12 tuples
  (2,000² per identical-prefix island), priced from a ~5k-row
  distinct-prefix aggregate without running anything quadratic. ALSO
  the honest output-size lesson: island_pairs ≈ 1e10 at this dup rate
  — the ANSWER itself is 10B rows, so the right pipeline move is
  exact-dedup FIRST (the plan row exposes exactly that), not a routed
  join that materializes the full pair set. qgram_edit_pairs_routed's
  refusal path is exercised at a budget below the collapsed volume.
"""
import time

from pyspark.sql import functions as F

from bytehub_spark.operators import dedup, sketches
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark

spark = get_spark("r12ops_10m")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


ev = spark.read.parquet("/tmp/sf100_stream/events.parquet")
n_ev = ev.count()
print(f"events: {n_ev:,}")
keyed = ev.where(F.col("user_id").isNotNull())

# ---- corrected estimator per event_type at 10M ----
s0, t0 = steal(), time.time()
regs = sketches.hll_registers(keyed, "user_id", "event_type", 64)
rows = (
    sketches.hll_estimate_corrected(regs, 64, ["event_type"])
    .orderBy("event_type")
    .collect()
)
dt = time.time() - t0
exact = {
    r["event_type"]: r["x"]
    for r in keyed.groupBy("event_type")
    .agg(F.countDistinct("user_id").alias("x"))
    .collect()
}
print(f"hll_estimate_corrected (grouped, 10M): {dt:.1f}s (steal {steal() - s0})")
for r in rows:
    ex = exact[r["event_type"]]
    print(
        f"  {r['event_type']}: occ={r['occupied']} raw={r['est_raw']}"
        f" est={r['est_distinct']} exact={ex}"
        f" err={abs(r['est_distinct'] - ex) / ex:.3f}"
    )
release_scratch()

# ---- overlap algebra on two 10M-event slices ----
a = keyed.where(F.col("event_id") % 2 == 0)
b = keyed.where(F.col("event_id") % 3 == 0)
s0, t0 = steal(), time.time()
row = sketches.hll_overlap(a, b, "user_id", 64).collect()[0]
dt = time.time() - t0
da = a.select("user_id").distinct()
db = b.select("user_id").distinct()
ex_inter = da.join(db, "user_id").count()
print(
    f"hll_overlap (2 x ~{n_ev // 2:,} events): {dt:.1f}s"
    f" (steal {steal() - s0}) est_a={row['est_a']} est_b={row['est_b']}"
    f" est_union={row['est_union']} est_inter={row['est_inter']}"
    f" exact_inter={ex_inter}"
)
release_scratch()

# ---- pricer at 10M docs / 2,000-copy islands ----
docs = spark.read.parquet("/tmp/sf100_docs10m/documents.parquet").select(
    "doc_id", "text"
)
print(f"docs: {docs.count():,}")
s0, t0 = steal(), time.time()
plan = dedup.qgram_plan(docs, k=3, q=2).collect()[0]
dt = time.time() - t0
print(
    f"qgram_plan (10M docs): {dt:.1f}s (steal {steal() - s0}) — "
    f"{plan['n_distinct_prefixes']:,} distinct prefixes, max_island "
    f"{plan['max_island']:,}, seg_join_tuples "
    f"{int(plan['seg_join_tuples']):,}, island_pairs "
    f"{int(plan['island_pairs']):,} (the OUTPUT mass: at this dup rate "
    "the answer is ~1e10 pairs — exact-dedup first, as the row says)"
)
release_scratch()

# ---- refusal honesty at 10M (budget below even the collapsed volume) ----
s0, t0 = steal(), time.time()
try:
    dedup.qgram_edit_pairs_routed(docs, budget=100_000, k=3, q=2)
    raise SystemExit("expected QgramBudgetExceeded")
except dedup.QgramBudgetExceeded as e:
    print(
        f"routed refusal (10M): {time.time() - t0:.1f}s (steal "
        f"{steal() - s0}) — direct {e.plan_direct['seg_join_tuples']:,} / "
        f"collapsed {e.plan_collapsed['seg_join_tuples']:,} vs 100,000"
    )
release_scratch()
