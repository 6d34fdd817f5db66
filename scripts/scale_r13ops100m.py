# Run with: PYTHONPATH=/root/repo python scripts/scale_r13ops100m.py
# Corpus: python scripts/gen_scale_corpora.py ev100m  (/tmp/sf100_stream100m)
"""Round-13 operators at 100M events — the per-operator scale-proof
convention applied to the grouped Count-Min and the HLL overlap
matrix:

- cms_build(group_col=) + per-type top-2 cms_probe: the grouped
  sketch's shuffle is bounded at groups·depth·width rows per map
  partition at ANY key cardinality; the probe joins ≤ 10 key rows
  against a ≤ 5·1024-cell broadcast sketch. est ≥ true asserted per
  row (the CM one-sided contract) — at 100M events each type holds
  ~20M rows over ~1.5k users, so collisions are real and the
  domination check is non-vacuous.
- hll_overlap_matrix: 5 event types → 10 pairs from ONE corpus scan
  (the k-sources-one-scan claim at its intended scale); per-pair
  est_union/est_inter sanity-checked against per-type exact distincts
  (|est − exact| within the ~13% SE at m = 64, asserted loosely at
  25% to keep the harness non-flaky).
"""
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from bytehub_spark.operators import sketches
from bytehub_spark.session import get_spark


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


SRC = "/tmp/sf100_stream100m/events.parquet"
spark = get_spark("r13ops_100m")
ev = spark.read.parquet(SRC).where(F.col("user_id").isNotNull())
n = ev.count()
print(f"events: {n:,}")

# ---- grouped Count-Min + probe ----
s0, t0 = steal(), time.time()
cms = sketches.cms_build(ev, "user_id", 4, 256, group_col="event_type")
cells = cms.count()
t_build = time.time() - t0
counts = ev.groupBy("event_type", "user_id").agg(
    F.count("*").cast("long").alias("true_cnt")
)
w = Window.partitionBy("event_type").orderBy(
    F.desc("true_cnt"), F.asc("user_id")
)
top = (
    counts.withColumn("__rk", F.row_number().over(w))
    .where(F.col("__rk") <= 2)
    .drop("__rk")
)
t0 = time.time()
rows = sketches.cms_probe(
    cms, top, "user_id", 4, 256, group_col="event_type"
).collect()
t_probe = time.time() - t0
assert all(r["est_cnt"] >= r["true_cnt"] for r in rows), "CM domination"
over = max(r["est_cnt"] - r["true_cnt"] for r in rows)
print(
    f"grouped cms: build {t_build:.1f}s = {n / t_build:,.0f} ev/s, "
    f"{cells} cells; top-2 probe {t_probe:.1f}s, {len(rows)} rows, "
    f"est >= true ALL, max over_cnt {over:,} (steal {steal() - s0})"
)

# ---- HLL overlap matrix ----
s0, t0 = steal(), time.time()
mat = sketches.hll_overlap_matrix(ev, "user_id", "event_type", 64).collect()
t_mat = time.time() - t0
exact = {
    r["event_type"]: r["d"]
    for r in ev.groupBy("event_type")
    .agg(F.countDistinct("user_id").alias("d"))
    .collect()
}
worst = 0.0
for r in mat:
    for side, col in (("group_a", "est_a"), ("group_b", "est_b")):
        err = abs(r[col] - exact[r[side]]) / exact[r[side]]
        worst = max(worst, err)
assert worst <= 0.25, f"per-side est err {worst:.1%} outside 25%"
print(
    f"hll matrix: {len(mat)} pairs in {t_mat:.1f}s from one scan "
    f"= {n / t_mat:,.0f} ev/s; per-side est err <= {worst:.1%} "
    f"(m=64 SE ~13%); est_inter range "
    f"[{min(r['est_inter'] for r in mat):,}, "
    f"{max(r['est_inter'] for r in mat):,}] (steal {steal() - s0})"
)
