# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_qgram_routed500k.py
# Corpus: python scripts/gen_scale_corpora.py docs500k  (/tmp/sf100_docs)
"""qgram_edit_pairs_routed 500k-doc datapoint (round 12): the r11
manual recipe (scale_qgram500k.py — price, refuse, collapse by hand,
re-price, join) is now ONE public API call, and this records that the
API reproduces the manual numbers end-to-end on the same corpus:

- budget 2e8 (the repo's standing candidate-tuple budget): the pricer
  sees the ~5.25e9-tuple direct join without running it, collapses the
  100x-copy islands, re-prices at ~467k, runs the rep join, expands —
  output = 27.3M dist-0 island pairs (exact arithmetic, the mass exact
  dedup would find) + the handful of genuine cross-prefix near pairs
  the r11 manual run found;
- budget 100k (below even the collapsed volume): QgramBudgetExceeded
  with both plan rows, NOT a 30 GB spill — the failure mode the
  operator exists to make unreachable.
"""
import time

from bytehub_spark.operators import dedup
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark

spark = get_spark("qgram_routed_500k")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


docs = (
    spark.read.parquet("/tmp/sf100_docs/documents.parquet")
    .select("doc_id", "text")
)
print(f"corpus: {docs.count():,} docs")

# ---- routed run at the standing 2e8 budget ----
from pyspark.sql import functions as F

s0, t0 = steal(), time.time()
out = dedup.qgram_edit_pairs_routed(docs, budget=200_000_000, k=3, q=2)
# one aggregate materializes the full pair set (count + cross split)
row = out.agg(
    F.count("*").alias("n"),
    F.sum((F.col("dist") > 0).cast("long")).alias("n_cross"),
).collect()[0]
wall = time.time() - t0
print(
    f"routed(budget=2e8): {row['n']:,} pairs ({row['n_cross']} "
    f"cross-prefix, rest dist-0 island arithmetic) in {wall:.1f}s "
    f"(steal {steal() - s0})"
)
release_scratch()

# ---- refusal at an under-collapsed budget ----
s0, t0 = steal(), time.time()
try:
    dedup.qgram_edit_pairs_routed(docs, budget=100_000, k=3, q=2)
    raise SystemExit("expected QgramBudgetExceeded")
except dedup.QgramBudgetExceeded as e:
    print(
        f"refusal [{time.time() - t0:.1f}s, steal {steal() - s0}]: "
        f"direct {e.plan_direct['seg_join_tuples']:,} / collapsed "
        f"{e.plan_collapsed['seg_join_tuples']:,} tuples vs budget 100,000 "
        f"(max_island {e.plan_direct['max_island']:,})"
    )
release_scratch()
