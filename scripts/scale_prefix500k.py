# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_prefix500k.py
# Corpus: /tmp/sf100_docs (500k near-dup-heavy docs; scale_pipeline500k's input)
"""prefix_filter_pairs 500k-doc datapoint (r10 headline: lossless
candidate pruning for EXACT Jaccard, the prefix-lemma counterpart of
the MinHash band planners):

1. decision table — for tau in the grid, the EXACT candidate-pair
   volume the prefix join would generate (sum over prefix shingles of
   C(f_p, 2), the same before-the-join arithmetic band_plan uses) vs
   the brute-force inverted-index volume sum C(f, 2) that
   ngram_jaccard_pairs pays. No quadratic work happens to produce
   either number.
2. run — the real prefix_filter_pairs at the tightest grid tau
   (materialized pair count + wall), with the decision table having
   told us in advance what the join would cost at looser taus.

The corpus is near-dup-heavy by construction (10k planted groups), so
exact-tau pair volume is itself large at low tau — the honest regime
for a pre-join radar."""
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from bytehub_spark.operators import dedup
from bytehub_spark.plans.scratch import release_scratch, scratch_persist
from bytehub_spark.session import get_spark

SRC = "/tmp/sf100_docs"
TAUS = (500_000, 700_000, 900_000)

spark = get_spark("prefix500k")
docs = spark.read.parquet(SRC)


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


s0 = steal()

# --- 1. decision table: exact candidate volume per tau, pre-join
t0 = time.time()
sh = scratch_persist(
    dedup._shingle_pair_source(docs, 3, "text", "doc_id", None)
)
dfc = sh.groupBy("shingle").agg(F.count("*").alias("f"))
brute = dfc.agg(
    F.sum("f").alias("index_rows"),
    F.sum(F.col("f") * (F.col("f") - 1) / 2).cast("long").alias("cand_pairs"),
).collect()[0]
print(
    f"brute inverted-index: rows={brute['index_rows']:,} "
    f"cand_pairs={brute['cand_pairs']:,}  [{time.time() - t0:.1f}s]"
)

ranked = scratch_persist(
    sh.join(dfc.withColumnRenamed("f", "__df"), "shingle").withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("__df", "shingle")
        ),
    )
)
for tau in TAUS:
    t1 = time.time()
    plen = (
        F.col("n_sh")
        - F.expr(f"(CAST({tau} AS BIGINT) * n_sh + 999999) div 1000000")
        + F.lit(1)
    )
    pstats = (
        ranked.where(F.col("__rk") <= plen)
        .groupBy("shingle")
        .agg(F.count("*").alias("fp"))
        .agg(
            F.sum("fp").alias("prefix_rows"),
            F.sum(F.col("fp") * (F.col("fp") - 1) / 2)
            .cast("long")
            .alias("cand_pairs"),
        )
        .collect()[0]
    )
    print(
        f"tau={tau}: prefix_rows={pstats['prefix_rows']:,} "
        f"cand_pairs={pstats['cand_pairs']:,} "
        f"(={pstats['cand_pairs'] * 100 // max(brute['cand_pairs'], 1)}% of brute)"
        f"  [{time.time() - t1:.1f}s]"
    )

# --- 2. the real join, SHARDED per the decision table's verdict.
# First full-corpus run of this harness: even the tau=0.9 prefix
# volume is 3.2e9 candidate tuples (1% of brute's 227e9, but 16x a
# 2e8 budget) — the driver process died attempting it. That is the
# radar working: on a near-dup-heavy corpus (10k planted groups of
# ~50), EXACT Jaccard belongs on a hash-shard (the repo's documented
# ground-truth-audit pattern) or behind LSH (two_stage_dedup); the
# full corpus is what minhash_lsh_pairs is for. A 10% doc shard cuts
# per-shingle prefix frequency ~10x and C(f,2) ~100x -> ~3e7 tuples.
# (r10 follow-up: adding PPJoin's positional filter took this shard
# audit from 234.6s to 146.0s at the same 21,454 pairs — lossless.)
t2 = time.time()
tau_run = TAUS[-1]
shard = docs.where(F.xxhash64("doc_id") % 10 == 0)
n_docs = shard.count()
pairs = dedup.prefix_filter_pairs(shard, threshold_ppm=tau_run)
n_pairs = pairs.count()
print(
    f"prefix_filter_pairs(tau={tau_run}) on a 10% shard "
    f"({n_docs:,} docs): {n_pairs:,} matched pairs "
    f"[{time.time() - t2:.1f}s]"
)
release_scratch()
print(f"TOTAL {time.time() - t0:.1f}s steal_delta {steal() - s0}")
