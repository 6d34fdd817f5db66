# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_monitors100m.py
# Corpus: python scripts/gen_scale_corpora.py ev100m  (/tmp/sf100_stream100m)
"""Bounded-state monitors at 100M events (round 12) — the 10x
scale-up of the repo's 10M datapoints, answering the only question
that matters for these monitors: does the STATE stay put while the
input grows? 20 x 5M micro-batches through each of the three sketch
monitors over the SAME replay source:

- CountMinMonitor: state <= depth*width = 1,024 ints at 100M exactly
  as at 10M; stream == batch EXACT to the integer (additive law).
- HllDistinctMonitor: m = 64 ints; registers == one-shot EXACT.
- GroupedHllMonitor: groups*m = 320 ints; register-exact per group.

Batch-side one-shot contrasts included (cms_build / hll_registers on
the full 100M frame) so the per-event overhead of micro-batching is
readable from the same log.
"""
import os
import shutil
import time

from pyspark.sql import functions as F

from bytehub_spark import streaming as st
from bytehub_spark.operators import sketches
from bytehub_spark.session import get_spark

SRC_PARQUET = "/tmp/sf100_stream100m/events.parquet"
work = "/tmp/monitors100m_work"
shutil.rmtree(work, ignore_errors=True)
src = os.path.join(work, "ev_src")
os.makedirs(work)

spark = get_spark("monitors_100m")
ev = spark.read.parquet(SRC_PARQUET)
n_events = ev.count()
print(f"events: {n_events:,}")
# 8 MB row groups: with maxFilesPerTrigger=1 a micro-batch's scan
# parallelism IS the trigger file's row-group count — the r13 lesson:
# a default-block-size rewrite gave ONE ~80 MB row group per 5M-event
# file and every batch ran its scan+hash on a single task ((20+1)/21
# straggler stages, 4.4s/batch serial); the r12 numbers were taken on
# files that happened to split 19 ways. Pin the layout so the
# datapoint measures the monitors, not parquet writer luck. (Real
# deployments: size ingest row groups for per-trigger parallelism.)
ev.repartition(20).write.option(
    "parquet.block.size", 8 * 1024 * 1024
).parquet(src)
keyed = spark.read.parquet(src).where(F.col("user_id").isNotNull())


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run(label, attach):
    s0, t0 = steal(), time.time()
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q, mon = attach(stream, os.path.join(work, f"ck_{label}"))
    finished = q.awaitTermination(3600)
    if not finished:
        q.stop()
        raise SystemExit(f"{label}: stream did not drain within 3600s")
    wall = time.time() - t0
    print(
        f"{label}: {n_events:,} events in {wall:.1f}s"
        f" = {n_events / wall:,.0f} ev/s (steal {steal() - s0})"
    )
    return mon


# ---- Count-Min ----
mon = run("cms_monitor", st.stream_cms)
print(f"  state: {len(mon.cells)} occupied cells (bound 1,024)")
t0 = time.time()
want = {
    (r["row"], r["col"]): r["cnt"]
    for r in sketches.cms_build(keyed, "user_id").collect()
}
print(f"  one-shot cms_build: {time.time() - t0:.1f}s")
assert mon.cells == want, "cms stream != batch"
print(f"  stream == batch EXACT ({sum(want.values()):,} total count)")

# ---- HLL (ungrouped) ----
mon = run("hll_monitor", st.stream_hll_distinct)
print(f"  state: {len(mon.regs)} registers (bound 64)")
t0 = time.time()
want = {
    r["bucket"]: r["rho"]
    for r in sketches.hll_registers(keyed, "user_id", None, 64).collect()
}
print(f"  one-shot hll_registers: {time.time() - t0:.1f}s")
assert mon.regs == want, "hll stream != batch"
print("  stream == batch EXACT (register level)")

# ---- HLL (grouped) ----
mon = run("grouped_hll_monitor", st.stream_hll_by_group)
print(f"  state: {len(mon.regs)} (group, bucket) registers (bound 320)")
got = sorted(map(tuple, mon.result().collect()))
want = sorted(
    map(
        tuple,
        sketches.hll_registers(keyed, "user_id", "event_type", 64)
        .select(F.col("event_type").cast("string"), "bucket", "rho")
        .collect(),
    )
)
assert got == want, "grouped hll stream != batch"
print("  stream == batch EXACT (register level)")

shutil.rmtree(work, ignore_errors=True)
