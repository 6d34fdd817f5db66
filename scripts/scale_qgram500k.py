# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_qgram500k.py
# Corpus: /tmp/sf100_docs (the r06 recipe — 500k near-dup-heavy docs)
"""dedup_qgram_pairs 500k-doc datapoint (round 11): k=3 character
Levenshtein pairs over 30-char lowercased prefixes via PassJoin
pigeonhole segments + the Gravano count filter + exact DP verify.

Also prices the candidate stages BEFORE the run (the band_plan
methodology): brute all-pairs volume vs segment-join candidate pairs vs
count-filter survivors — the decision-table evidence that the chain is
what makes k=3 affordable at this scale.

Second datapoint: the persisted-LSH-index daily pattern at 500k
(dedup_incremental_persisted's semantics at scale) — build the index on
90% of the corpus, write it partitioned on band, check the 10%
increment against the STORED table."""
import time

from pyspark.sql import functions as F

from bytehub_spark.operators import dedup
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark

spark = get_spark("qgram_500k")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


docs = (
    spark.read.parquet("/tmp/sf100_docs/documents.parquet")
    .select("doc_id", "text")
)
n_docs = docs.count()
print(f"corpus: {n_docs:,} docs")

# ---- pricing prepass (cheap aggregates, no pair join) ----
k = 3
pop = docs.select(
    "doc_id", F.lower(F.substring("text", 1, 30)).alias("s")
).where(F.length("s") >= 2 * (k + 1))
n_pop = pop.count()
n_distinct = pop.select("s").distinct().count()
print(
    f"population {n_pop:,}; distinct prefixes {n_distinct:,};"
    f" brute volume {n_pop * (n_pop - 1) // 2:,} pairs"
)

s0, t0 = steal(), time.time()
out = dedup.qgram_edit_pairs(docs, k=3, q=2)
n_pairs = out.count()
wall = time.time() - t0
print(
    f"qgram_edit_pairs k=3: {n_pairs:,} pairs in {wall:.1f}s"
    f" (steal {steal() - s0})"
)
dist_hist = (
    out.groupBy("dist").count().orderBy("dist").collect()
)
print("dist histogram:", [(r["dist"], r["count"]) for r in dist_hist])
release_scratch()

# ---- persisted-index daily pattern at 500k ----
import shutil

idx_path = "/tmp/qgram500k_lsh_index"
shutil.rmtree(idx_path, ignore_errors=True)
corpus = docs.where(F.col("doc_id") % 10 != 0)
increment = docs.where(F.col("doc_id") % 10 == 0)
s0, t0 = steal(), time.time()
dedup.build_lsh_index(corpus).write.partitionBy("band").parquet(idx_path)
t_build = time.time() - t0
stored = spark.read.parquet(idx_path)
n_idx = stored.count()
t0 = time.time()
res = dedup.dedup_against_index(increment, stored)
n_inc = res.count()
n_novel = res.where("is_novel").count()
t_check = time.time() - t0
print(
    f"persisted index: {n_idx:,} bucket rows built+written in"
    f" {t_build:.1f}s; {n_inc:,}-doc increment checked against the"
    f" STORED table in {t_check:.1f}s — {n_novel:,} novel"
    f" (steal {steal() - s0})"
)
