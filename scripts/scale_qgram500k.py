# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_qgram500k.py
# Corpus: python scripts/gen_scale_corpora.py docs500k  (/tmp/sf100_docs)
"""dedup_qgram_pairs 500k-doc datapoint (round 11): k=3 character
Levenshtein pairs over 30-char lowercased prefixes via PassJoin
pigeonhole segments + the Gravano count filter + exact DP verify.

PRICE FIRST (dedup.qgram_plan — the band_plan methodology on the
PassJoin side): the 500k corpus is 100 exact copies of every doc, so
identical-prefix islands are ≥ 100-hot and the unpriced segment join
is quadratic PER ISLAND — the first attempt spilled 30 GB into a
single task before being killed. The pricer sees this from a
distinct-prefix aggregate WITHOUT running the join, and the decision
rule collapses identical-PREFIX islands (one representative per
distinct lowercased 30-char prefix — the EXACT key the operator
measures on, so island members are at raw distance 0 by definition
and dropped pairs reconstruct by island arithmetic: rep_a within d of
rep_b ⟺ every cross-island member pair is; full-text exact_dedup
would be WRONG here — its normalized fingerprint merges docs whose
raw prefixes differ, silently dropping real pairs). If the re-priced
volume is STILL over budget (distinct docs behind shared boilerplate
prefixes — collapsing removes nothing), the script refuses to run the
join and says so, instead of recreating the spill.

Second datapoint: the persisted-LSH-index daily pattern at 500k
(dedup_incremental_persisted's semantics at scale) — build the index
on 90% of the corpus, write it partitioned on band, check the 10%
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

# ---- pricing prepass: EXACT seg-join volume, no pair join ----
s0, t0 = steal(), time.time()
plan = dedup.qgram_plan(docs, k=3, q=2).collect()[0]
t_plan = time.time() - t0
print(
    f"qgram_plan [{t_plan:.1f}s, steal {steal() - s0}]: "
    f"{plan['n_docs']:,} docs, {plan['n_distinct_prefixes']:,} distinct "
    f"prefixes, max_island {plan['max_island']:,}, island_pairs "
    f"{int(plan['island_pairs']):,}, brute {int(plan['brute_pairs']):,}, "
    f"seg_join_tuples {int(plan['seg_join_tuples']):,}"
)
release_scratch()

BUDGET = 200_000_000
if int(plan["seg_join_tuples"]) > BUDGET:
    print(
        f"-> over budget ({int(plan['seg_join_tuples']):,} > {BUDGET:,}):"
        " collapsing identical-prefix islands (the decision rule;"
        " prefix-level, NOT full-text exact_dedup — see module doc)"
    )
    s0, t0 = steal(), time.time()
    # one representative per distinct lowercased 30-char prefix — the
    # operator's own measurement key, so dropped pairs are distance-0
    # island members reconstructible by arithmetic
    from pyspark.sql import Window

    pfx = F.lower(F.substring("text", 1, 30))
    w = F.row_number().over(
        Window.partitionBy("__pfx").orderBy("doc_id")
    )
    canon = (
        docs.withColumn("__pfx", pfx)
        .withColumn("__r", w)
        .where(F.col("__r") == 1)
        .select("doc_id", "text")
    ).persist()
    n_canon = canon.count()
    t_dedup = time.time() - t0
    print(
        f"prefix-island collapse: {n_docs:,} -> {n_canon:,}"
        f" representatives in {t_dedup:.1f}s (steal {steal() - s0})"
    )
    target = canon
    # ---- re-price the routed frame and HONOR the budget ----
    s0, t0 = steal(), time.time()
    plan2 = dedup.qgram_plan(target, k=3, q=2).collect()[0]
    print(
        f"re-priced: seg_join_tuples {int(plan2['seg_join_tuples']):,},"
        f" max_island {plan2['max_island']:,} [{time.time() - t0:.1f}s]"
    )
    release_scratch()
    if int(plan2["seg_join_tuples"]) > BUDGET:
        raise SystemExit(
            "re-priced volume still over budget — islands are DISTINCT"
            " docs behind shared boilerplate prefixes; collapsing"
            " cannot help. Shard the corpus or use"
            " edit_distance_pairs at k <= 2 (refusing to recreate the"
            " 30 GB spill)."
        )
else:
    target = docs
    n_canon = n_docs

s0, t0 = steal(), time.time()
out = dedup.qgram_edit_pairs(target, k=3, q=2)
n_pairs = out.count()
wall = time.time() - t0
print(
    f"qgram_edit_pairs k=3 on {n_canon:,} canonicals: {n_pairs:,} pairs"
    f" in {wall:.1f}s (steal {steal() - s0})"
)
dist_hist = out.groupBy("dist").count().orderBy("dist").collect()
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
shutil.rmtree(idx_path, ignore_errors=True)
print("OK")
