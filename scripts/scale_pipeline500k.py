# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_pipeline500k.py
# Corpus: /tmp/sf100_docs (r06 recipe in NEXT.md); benchmark = sf0.1 docs sample
"""Combined-pipeline scale datapoint (VERDICT r07 item 5 / r08 item 5):
the full training-data curation chain as ONE run over 500k documents,
each stage feeding the next, per-stage wall times reported —

  1. profile gate   check_constraints: the corpus must pass its
                    contract before any compute is spent on it
  2. exact dedup    fingerprint groupBy -> keep min-id per content
  3. planned LSH    minhash_band_balance picks (b, r) under a pair
                    budget, THEN minhash_lsh_pairs runs at that shape;
                    near-dup partners of a kept lower id are dropped
  4. decontaminate  word-4-gram overlap vs a benchmark corpus
                    (broadcast semi-join); contaminated docs dropped
  5. pack           concat-then-chunk sequence packing of survivors

Composition rules that make this work at scale (and bit-reproducibly):
- every stage's survivor frame is persisted ONCE and released after
  its consumer finishes (scratch registry, never clearCache);
- the LSH shape is chosen by the prepass's EXACT candidate-pair count,
  not a heuristic — the same signature table feeds the prepass and
  the committed join (scratch-persisted, computed once);
- stages communicate by slim id frames (anti-joins), never by
  re-materialized text.
"""
import time

from pyspark.sql import functions as F

from bytehub_spark.operators import curation, dedup, profile
from bytehub_spark.plans.scratch import release_scratch, scratch_persist
from bytehub_spark.session import get_spark

DOCS = "/tmp/sf100_docs/documents.parquet"
BENCH = "/root/testdata/sf0.1/documents.parquet"
PAIR_BUDGET = 200_000_000
JACCARD_CUT = 0.5


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


spark = get_spark("pipeline500k")
s0 = steal()
t_all = time.time()

docs = scratch_persist(spark.read.parquet(DOCS).repartition(64))
n0 = docs.count()
walls: list[tuple[str, float, str]] = []


def record(name: str, dt: float, note: str) -> None:
    walls.append((name, dt, note))
    print(f"{name:<18} {dt:7.1f}s  {note}", flush=True)

# --- 1. profile gate: fail fast if the corpus breaks its contract
t0 = time.time()
gate = profile.check_constraints(
    docs,
    [
        (0, "not_null", "text"),
        (1, "not_null", "doc_id"),
        (2, "unique", "doc_id"),
        (3, "range", "n_chars", 1, 1_000_000),
        (4, "like", "lang", "__"),
    ],
).toPandas()
ok = bool(gate["passed"].all())
record("1 profile gate", time.time() - t0,
       f"{len(gate)} rules, all passed={ok}")
assert ok, gate.to_string()

# --- 2. exact dedup: one fingerprint agg, survivors by anti-join on
# the (fingerprint, keep_id) frame
t0 = time.time()
groups = dedup.exact_dedup(docs)
keep = groups.select(F.col("keep_id").alias("doc_id"))
survivors1 = scratch_persist(docs.join(keep, "doc_id", "left_semi"))
n1 = survivors1.count()
record("2 exact dedup", time.time() - t0, f"{n0:,} -> {n1:,} docs")

# --- 3. band-planned MinHash LSH near-dedup
t0 = time.time()
plan = dedup.minhash_band_balance(
    survivors1, 64, (32, 16, 8)
).toPandas()
per_shape = (
    plan.groupby("bands")["cand_pairs"].sum().sort_index()
)
fitting = [int(b) for b, c in per_shape.items() if c <= PAIR_BUDGET]
if not fitting:
    raise SystemExit(
        f"no band shape in {sorted(dict(per_shape))} fits pair budget "
        f"{PAIR_BUDGET:,} (volumes {dict(per_shape)}) — add a sharper "
        "shape (fewer bands, more rows/band) or raise the budget; "
        "that verdict IS the planner working"
    )
bands = max(fitting)  # most bands = loosest threshold that still fits
t_plan = time.time() - t0
t0 = time.time()
pairs = dedup.minhash_lsh_pairs(survivors1, 64, bands)
drop = (
    pairs.where(F.col("est_jaccard") >= JACCARD_CUT)
    .select(F.col("doc_b").alias("doc_id"))
    .distinct()
)
# localCheckpoint TRUNCATES the LSH lineage before the scratch frames
# feeding it (signatures, survivors1) are released — a plain persist
# would silently re-run the whole LSH chain on any block recompute
survivors2 = survivors1.join(drop, "doc_id", "left_anti").localCheckpoint()
n2 = survivors2.count()
record("3a LSH band plan", t_plan,
       f"shapes {dict(per_shape)} -> b={bands}, r={64 // bands}")
record("3b LSH dedup", time.time() - t0, f"{n1:,} -> {n2:,} docs")
release_scratch()  # signature table + survivors1 done

# --- 4. decontaminate vs the benchmark corpus
t0 = time.time()
bench = spark.read.parquet(BENCH).where(F.col("doc_id") % 101 == 0)
contaminated = dedup.decontaminate(survivors2, bench, n=4).select("doc_id")
survivors3 = scratch_persist(
    survivors2.join(contaminated, "doc_id", "left_anti")
)
n3 = survivors3.count()
record("4 decontaminate", time.time() - t0, f"{n2:,} -> {n3:,} docs")

# --- 5. pack the survivors into 2048-token sequences
t0 = time.time()
packed = curation.pack_sequences(survivors3, 2048)
n_chunks = packed.agg(
    (F.max("end_bin") + 1).alias("n")
).collect()[0]["n"]
n_rows = packed.count()
record("5 pack", time.time() - t0,
       f"{n3:,} docs ({n_rows:,} packed rows) -> {n_chunks:,} chunks "
       f"of 2048 tokens")

total = time.time() - t_all
s1 = steal()
print(f"{'TOTAL':<18} {total:7.1f}s  {n0:,} -> {n3:,} docs "
      f"({100 * n3 / n0:.1f}% kept); steal ticks {s1 - s0}", flush=True)
release_scratch()
