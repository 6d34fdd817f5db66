# Run with: SPARK_DRIVER_MEMORY=48g PYTHONPATH=/root/repo python scripts/scale_sketch10m.py
# Corpus: python scripts/gen_scale_corpora.py ev10m  (/tmp/sf100_stream)
"""Sketch-family 10M-event datapoints (round 11):

1. Batch cms_build (4×256) and hll_registers (m=64, per event_type)
   over 10M events — the bounded-shuffle aggregation shapes (map-side
   combine caps shuffle rows at cells/registers per partition, the
   whole point vs an exact per-key groupBy, which is also timed for
   contrast).
2. CountMinMonitor (16th monitor) over 10 × 1M micro-batches:
   stream == batch must hold EXACTLY (additive counters — no arrival
   contract), state ≤ depth·width cells; throughput recorded.
"""
import os
import shutil
import time

import pyarrow.parquet as pq_
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytehub_spark import streaming as st
from bytehub_spark.operators import sketches as S
from bytehub_spark.session import get_spark

work = "/tmp/sketch_10m_work"
shutil.rmtree(work, ignore_errors=True)
src = os.path.join(work, "ev_src")
os.makedirs(src)
t = pq_.read_table("/tmp/sf100_stream/events.parquet")
rows_per = t.num_rows // 10
for i in range(10):
    # no arrival-order contract for additive sketches — any slicing works
    sl = t.slice(i * rows_per) if i == 9 else t.slice(i * rows_per, rows_per)
    pq_.write_table(sl, f"{src}/part-{i:03d}.parquet")
    time.sleep(0.05)  # distinct modTimes -> deterministic batch order
n_total = t.num_rows
del t

spark = get_spark("sketch_10m")
spark.conf.set("spark.sql.session.timeZone", "UTC")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def ev():
    # rebuilt per leg (stage-reuse lesson, scale_r10ops10m.py)
    return spark.read.parquet("/tmp/sf100_stream/events.parquet")


print(f"warm: {ev().count():,} rows")

# --- leg A: batch CMS ------------------------------------------------
s0, t0 = steal(), time.time()
cms_batch = S.cms_build(ev(), "user_id").orderBy("row", "col")
cms_rows = cms_batch.collect()
wall_cms = time.time() - t0
print(
    f"cms_build 10M: {len(cms_rows)} cells, "
    f"{sum(r['cnt'] for r in cms_rows):,} total cnt, "
    f"{wall_cms:.1f}s ({n_total / wall_cms / 1000:.0f}k ev/s), "
    f"steal {steal() - s0}"
)

# --- leg B: batch HLL registers -------------------------------------
s0, t0 = steal(), time.time()
regs = S.hll_registers(ev(), "user_id", "event_type", 64)
est = S.hll_estimate(regs, 64, ["event_type"]).orderBy("event_type").collect()
wall_hll = time.time() - t0
print(
    f"hll_registers 10M: {len(est)} groups, "
    f"ests {[int(r['est_distinct']) for r in est]}, "
    f"{wall_hll:.1f}s, steal {steal() - s0}"
)

# --- leg C: exact groupBy contrast ----------------------------------
s0, t0 = steal(), time.time()
n_exact = (
    ev().where(F.col("user_id").isNotNull())
    .groupBy("user_id").count().count()
)
wall_ex = time.time() - t0
print(
    f"exact per-key groupBy 10M: {n_exact:,} keys, {wall_ex:.1f}s, "
    f"steal {steal() - s0}"
)

# --- leg D: CountMinMonitor stream ----------------------------------
EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
s0, t0 = steal(), time.time()
stream = (
    spark.readStream.schema(EV_SCHEMA)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
q, mon = st.stream_cms(stream, os.path.join(work, "ck"))
if not q.awaitTermination(1800):
    q.stop()
    raise SystemExit("stream did not drain in 30 min")
wall_st = time.time() - t0
got = {(r, c): n for (r, c), n in mon.cells.items()}
want = {(r["row"], r["col"]): r["cnt"] for r in cms_rows}
assert got == want, (
    f"stream != batch: {len(got)} vs {len(want)} cells, "
    f"first diff {next(iter(set(got.items()) ^ set(want.items())))}"
)
assert mon.n_batches == 10, mon.n_batches
print(
    f"CountMinMonitor 10M x10 batches: stream==batch EXACT "
    f"({len(got)} cells), {wall_st:.1f}s "
    f"({n_total / wall_st / 1000:.0f}k ev/s), steal {steal() - s0}"
)

# --- leg E: HllDistinctMonitor stream (idempotent max-merge) --------
s0, t0 = steal(), time.time()
stream2 = (
    spark.readStream.schema(EV_SCHEMA)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
q2, hmon = st.stream_hll_distinct(stream2, os.path.join(work, "ck_hll"))
if not q2.awaitTermination(1800):
    q2.stop()
    raise SystemExit("hll stream did not drain in 30 min")
wall_h = time.time() - t0
want_regs = {
    (r["bucket"], r["rho"])
    for r in S.hll_registers(ev(), "user_id", m=64).collect()
}
got_regs = {(b, r) for b, r in hmon.regs.items()}
assert got_regs == want_regs, (len(got_regs), len(want_regs))
est = S.hll_estimate(hmon.result(), m=64).collect()[0]
print(
    f"HllDistinctMonitor 10M x10 batches: stream==batch EXACT "
    f"({len(got_regs)} registers, est {int(est['est_distinct'])}), "
    f"{wall_h:.1f}s ({n_total / wall_h / 1000:.0f}k ev/s), "
    f"steal {steal() - s0}"
)
shutil.rmtree(work, ignore_errors=True)
print("OK")
