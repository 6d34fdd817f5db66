# Run with: PYTHONPATH=/root/repo python scripts/scale_jaccard_routed500k.py
# Corpus: python scripts/gen_scale_corpora.py docs500k  (/tmp/sf100_docs)
"""jaccard_plan + jaccard_pairs_routed at 500k docs (round 13) — the
scale_qgram_routed500k convention applied to the exact-Jaccard family:

1. PRICE both routes on the duplicate-heavy 500k corpus (100 exact
   copies per doc → every shingle's df ≥ 100 → both Σ C(f,2) masses
   are astronomically large) WITHOUT running any join — the whole
   point of the pricer is that this costs two aggregates, not a spill.
2. REFUSE: jaccard_pairs_routed under a budget below both masses must
   return in seconds carrying both plan rows — the honest alternative
   to the unpriced inverted-index join this corpus would detonate
   (compare scripts/scale_prefix500k.py: at τ=0.9 even the PRUNED
   prefix join is 3.2e9 candidates; the r12 qgram lesson in Jaccard
   form — a dup-heavy corpus's ANSWER is quadratic in island size, so
   the right pipeline move is exact_dedup FIRST, and the plan row
   exposes exactly that).

The executed-join datapoints for this family live in
scale_prefix500k.py (the pruned exact join at τ=0.9); this harness
proves the ROUTING layer's scale contract: price fast, refuse fast,
never join blind.
"""
import time

from bytehub_spark.operators import dedup
from bytehub_spark.session import get_spark


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


spark = get_spark("jaccard_routed_500k")
docs = spark.read.parquet("/tmp/sf100_docs/documents.parquet").select(
    "doc_id", "text"
)
n = docs.count()
print(f"docs: {n:,}")

s0, t0 = steal(), time.time()
plan = dedup.jaccard_plan(docs, 900_000).collect()[0]
t_plan = time.time() - t0
print(
    f"jaccard_plan tau=0.9: inverted={int(plan['inverted_pairs']):,} "
    f"prefix={int(plan['prefix_pairs']):,} "
    f"(brute={int(plan['brute_pairs']):,}, max_freq={plan['max_freq']:,}) "
    f"priced in {t_plan:.1f}s (steal {steal() - s0})"
)
assert int(plan["prefix_pairs"]) < int(plan["inverted_pairs"])

budget = 1_000_000  # far below both masses on this corpus
s0, t0 = steal(), time.time()
try:
    dedup.jaccard_pairs_routed(docs, budget, 900_000)
    raise SystemExit("expected JaccardBudgetExceeded")
except dedup.JaccardBudgetExceeded as e:
    t_refuse = time.time() - t0
    print(
        f"refusal at budget {budget:,}: {t_refuse:.1f}s, "
        f"plan_inverted.cand_pairs={int(e.plan_inverted['cand_pairs']):,} "
        f"plan_prefix.cand_pairs={int(e.plan_prefix['cand_pairs']):,} "
        f"(steal {steal() - s0})"
    )
    assert int(e.plan_inverted["cand_pairs"]) == int(plan["inverted_pairs"])
    assert int(e.plan_prefix["cand_pairs"]) == int(plan["prefix_pairs"])
print("plan == refusal plan rows EXACT (one pricing definition)")
